"""Cross-validate checkpoint interchangeability: OUR trained flax weights,
exported to the reference's .pth layout (utils/torch_import.py::
save_torch_checkpoint), loaded into the ACTUAL torch reference model and
sampled with ITS own `sample_by_dpmsolver`
(`/root/reference/GeneralModel/diffusion_general.py:227-255`), scored with
the same metrics as every other eval here.

This is the reverse direction of tests/test_torch_checkpoint.py (torch →
flax import, golden-pinned): it proves a user can train on TPU with this
framework and hand the checkpoint straight back to the upstream PyTorch
stack. Pass bar: reference-sampled scores from our exported weights beat
the lms identity baseline on every sensor and land near our own sampler's
scores for the same checkpoint (exact equality is not expected — the two
samplers draw different x_T noise).

Usage:
  python tools/cross_validate_export.py \
      --ckpt /tmp/tmdiff_convergence/experiments/<exp>/checkpoint \
      --root /tmp/tmdiff_convergence --out benchmarks/cross_validate_r4.json

CLIP is the deterministic placeholder on both sides (same table, see
tools/reference_headtohead.py).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Importing the head-to-head tool installs the shared pywt/torchvision
# stubs and the /root/reference sys.path entry at ITS module level — one
# stubbing prologue, not two copies to keep in sync.
from tools import reference_headtohead  # noqa: E402,F401


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help="orbax checkpoint dir of a trained run")
    p.add_argument("--root", default="/tmp/tmdiff_convergence",
                   help="dir holding the synthetic test_*_data_RR.h5 sets")
    p.add_argument("--out", default="/tmp/cross_validate.json")
    p.add_argument("--channels", default="16,32,64,128")
    p.add_argument("--timesteps", type=int, default=500)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch

    from tools.reference_headtohead import FakeClip, neutralise_cuda

    neutralise_cuda()

    # ---- our side: restore the trained flax checkpoint -------------------
    from tmdiff_tpu.data.h5 import PanDataset
    from tmdiff_tpu.diffusion.schedules import NoiseSchedule
    from tmdiff_tpu.eval import metrics as M
    from tmdiff_tpu.models import WavBEST
    from tmdiff_tpu.train import checkpoint as ckpt_lib
    from tmdiff_tpu.train.trainer import Trainer
    from tmdiff_tpu.utils import torch_import as ti

    channels = [int(c) for c in args.channels.split(",")]
    val_sets = {
        s: PanDataset(os.path.join(args.root, f"test_{s.lower()}_data_RR.h5"))
        for s in ["QB", "GF2", "WV3"]
    }
    model = WavBEST(channels=tuple(channels))
    trainer = Trainer(model=model,
                      schedule=NoiseSchedule.create("cosine", args.timesteps))
    b0 = val_sets["QB"].batch(np.arange(1))
    state0 = trainer.init_state(b0, np.zeros(768, np.float32))
    state = ckpt_lib.restore_checkpoint(args.ckpt, state0)
    print(f"restored step {int(state.step)} from {args.ckpt}", flush=True)

    # ---- export to the reference's .pth layout ---------------------------
    pth = os.path.join(args.root, f"I{int(state.step)}_gen.pth")
    ti.save_torch_checkpoint(state.params, pth)
    print(f"exported {pth}", flush=True)

    # ---- reference side: load OUR weights, sample with ITS solver --------
    import GeneralModel.Hyper_unet_general as ref_unet

    ref_unet.FrozenCLIPEmbedder = FakeClip
    from GeneralModel.diffusion_general import GeneralDiffusion

    torch.manual_seed(3407)
    ref_model = ref_unet.WavBEST(channels=channels)
    diffusion = GeneralDiffusion(ref_model, loss_type="l1")
    sd = torch.load(pth, map_location="cpu", weights_only=True)
    missing, unexpected = diffusion.load_state_dict(sd, strict=False)
    assert not unexpected, f"keys the reference does not know: {unexpected[:5]}"
    # missing = the dead reference leaves we never materialise + frozen CLIP:
    # modulated-conv biases (bias=None at call sites), WaveletUPorDown.dense2,
    # and the cond-encoder's temb projections (flag=True skips time emb,
    # `Hyper_unet_general.py:237-241,400-401` — torch allocates them anyway)
    def _dead(k):
        if "clip_text" in k or ".dense2." in k:
            return True
        if k.endswith((".conv21.bias", ".conv24.bias", ".Conv_1.bias")):
            return True
        cond_stage = any(f".down{i}_1." in k or k.startswith(f"denoise_fn.down{i}_1.")
                         for i in (1, 2, 3))
        return cond_stage and (".dense1." in k or ".Dense_0." in k)

    live_missing = [k for k in missing if not _dead(k)]
    print(f"missing (dead/frozen) keys: {len(missing)}; live: {live_missing}",
          flush=True)
    diffusion.set_loss("cpu")
    diffusion.set_new_noise_schedule(
        {"schedule": "cosine", "n_timestep": args.timesteps}, "cpu")
    diffusion.eval()

    results = {"ckpt": args.ckpt, "step": int(state.step),
               "exported_pth": pth,
               "sampler": "reference sample_by_dpmsolver (30-step "
                          "singlestep order-3 logSNR), batch 1",
               "live_missing_keys": live_missing}
    ok = True
    for sensor, ds in val_sets.items():
        batch = [ds[i] for i in range(len(ds))]
        x_in = {k: torch.from_numpy(
            np.stack([np.asarray(b[k], np.float32) for b in batch]))
            for k in ("Res", "PAN", "MS", "HR")}
        torch.manual_seed(1000)
        preds = []
        with torch.no_grad():
            for i in range(len(batch)):
                one = {k: x_in[k][i:i + 1] for k in ("Res", "PAN", "MS")}
                preds.append(diffusion.sample_by_dpmsolver(one, sensor)[0])
        sr = torch.stack(preds)
        scores = M.mean_scores(x_in["HR"].numpy(), sr.numpy())
        lms = M.mean_scores(x_in["HR"].numpy(), x_in["MS"].numpy())
        results[f"ref_sampled_{sensor}"] = scores
        results[f"lms_{sensor}"] = lms
        ok = ok and scores["sam"] < lms["sam"] and scores["ergas"] < lms["ergas"]
        print(sensor, "ours-weights-through-reference-sampler:", scores,
              "lms:", lms, flush=True)

    results["beats_lms_everywhere"] = bool(ok)
    # A partially-transferred checkpoint (live reference layers left at
    # torch random init) must FAIL even if the weak lms bar still holds.
    ok = ok and not live_missing
    results["all_live_keys_transferred"] = not live_missing
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("RESULT", json.dumps(results), flush=True)
    print("PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
