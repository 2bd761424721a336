"""Trained head-to-head: the torch reference vs this rebuild (VERDICT r3 #2).

Trains the ACTUAL torch reference through its own training semantics
(`/root/reference/general_sharpening_joint_random_batch_finetune.py:155-175`:
AdamW wd=1e-4 + HF linear warmup-100, 4:4:8 probabilistic sensor mixing,
`GeneralDiffusion.p_losses_dynamic` x0-L1) on the IDENTICAL synthetic h5
sets and config as tools/train_convergence.py (channels (16,32,64,128),
64² scenes, T=500 cosine, lr 2e-4, batch 8), samples via its own
`sample_by_dpmsolver` (`diffusion_general.py:227-255` — the 30-step
singlestep order-3 logSNR path our "dpm++" method mirrors), and scores
with the SAME metrics module (tmdiff_tpu.eval.metrics) used to score the
rebuild. CLIP is stubbed to the same deterministic placeholder table on
both sides (tools/make_goldens.py FakeClip == models/clip_text.py), so the
two models are conditioned on identical per-sensor constants.

Like-for-like protocol (the VERDICT ask):
  * identical training data: data/synthetic.py write_h5, seeds 0/1/2
    (train) and 100/101/102 (val), noise 0.002 — byte-identical files;
  * identical step count / batch / LR / schedule / loss / init family
    (kaiming) / T / beta schedule;
  * same sampler family (reference-default DPM-Solver++ 30-step) and the
    same metric implementations.
  Residual differences (documented, irreducible): independent RNG streams
  for init/noise/mixing, torch-CPU vs jax-TPU arithmetic.

Output: --out JSON with the torch-reference scores; pass --ours
benchmarks/train_convergence_r3b.json to emit the side-by-side table that
BASELINE.md records.
"""
import argparse
import importlib.machinery
import json
import os
import random
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import fake_pywt  # noqa: E402

sys.modules["pywt"] = fake_pywt


class _AnyTransform:
    def __getattr__(self, name):
        return lambda *a, **k: (lambda x: x)


_tv = types.ModuleType("torchvision")
_tv.transforms = _AnyTransform()
_tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
_tv.__version__ = "0.0.0"
sys.modules["torchvision"] = _tv
sys.modules["torchvision.transforms"] = _tv.transforms
_tvu = types.ModuleType("torchvision.utils")
_tvu.save_image = lambda *a, **k: None
_tvu.make_grid = lambda *a, **k: None
_tv.utils = _tvu
sys.modules["torchvision.utils"] = _tvu

sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402
import torch  # noqa: E402


def neutralise_cuda():
    """Reference code hard-codes .to('cuda')/.cuda(); strip on CPU."""
    _orig_to = torch.Tensor.to

    def _cpu_to(self, *args, **kwargs):
        args = tuple(
            a for a in args
            if not (isinstance(a, (str, torch.device)) and "cuda" in str(a))
        )
        if "cuda" in str(kwargs.get("device", "")):
            kwargs.pop("device")
        if not args and not kwargs:
            return self
        return _orig_to(self, *args, **kwargs)

    torch.Tensor.to = _cpu_to
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


class FakeClip:
    """Same deterministic placeholder as models/clip_text.py (and
    tools/make_goldens.py): sha256(prompt) seeds a unit-scaled vector."""

    def __init__(self, *a, **k):
        pass

    def encode(self, text):
        import hashlib

        seed = int.from_bytes(
            hashlib.sha256(text.encode()).digest()[:8], "little")
        vec = np.random.default_rng(seed).standard_normal(768)
        vec = vec / np.linalg.norm(vec) * np.sqrt(768)
        return torch.from_numpy(vec.astype(np.float32))[None]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/reference_headtohead.json")
    p.add_argument("--root", default="/tmp/tmdiff_headtohead")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--scenes", type=int, default=64)
    p.add_argument("--timesteps", type=int, default=500)
    p.add_argument("--noise", type=float, default=0.002)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--channels", default="16,32,64,128")
    p.add_argument("--ours", default=None,
                   help="train_convergence JSON to tabulate against")
    p.add_argument("--seed", type=int, default=3407,
                   help="torch/np/random training seed (r5 parity sweep: "
                        "the reference side was single-seed until now)")
    args = p.parse_args(argv)

    # tmdiff_tpu imports pull jax in transitively; keep it off the TPU
    # tunnel (this tool is pure torch-CPU + numpy metrics)
    import jax

    jax.config.update("jax_platforms", "cpu")

    neutralise_cuda()

    from tmdiff_tpu.data.synthetic import write_h5

    os.makedirs(args.root, exist_ok=True)
    paths = {}
    for i, sensor in enumerate(["qb", "gf2", "wv3"]):
        scale = 1023.0 if sensor == "gf2" else 2047.0
        bands = 8 if sensor == "wv3" else 4
        paths[f"train_{sensor}"] = write_h5(
            os.path.join(args.root, f"train_{sensor}_data.h5"),
            n=args.scenes, bands=bands, size=args.size, seed=i,
            img_scale=scale, noise=args.noise)
        paths[f"val_{sensor}"] = write_h5(
            os.path.join(args.root, f"test_{sensor}_data_RR.h5"),
            n=8, bands=bands, size=args.size, seed=100 + i, img_scale=scale,
            noise=args.noise)

    # --- reference model stack, built the way define_General does ---------
    import GeneralModel.Hyper_unet_general as ref_unet

    ref_unet.FrozenCLIPEmbedder = FakeClip
    from GeneralModel.diffusion_general import GeneralDiffusion
    from GeneralModel.networks import init_weights
    from data.LRHR_dataset import LRHRDataset
    from torch.utils.data import DataLoader
    from transformers import get_scheduler

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)  # p_losses_dynamic draws t via np.random
    random.seed(args.seed)     # sensor mixing
    torch.set_num_threads(max(1, os.cpu_count()))

    channels = [int(c) for c in args.channels.split(",")]
    model = ref_unet.WavBEST(channels=channels)
    diffusion = GeneralDiffusion(model, loss_type="l1")
    init_weights(diffusion, init_type="kaiming")
    diffusion.set_loss("cpu")
    diffusion.set_new_noise_schedule(
        {"schedule": "cosine", "n_timestep": args.timesteps}, "cpu")

    optim_params = [p_ for n, p_ in diffusion.named_parameters()
                    if "clip_text" not in n]
    optG = torch.optim.AdamW(optim_params, lr=args.lr, weight_decay=1e-4)
    scheduler = get_scheduler("linear", optG, num_warmup_steps=100,
                              num_training_steps=args.steps)

    loaders = {}
    for s in ["qb", "gf2", "wv3"]:
        ds = LRHRDataset(paths[f"train_{s}"], phase="train")
        loaders[s.upper()] = DataLoader(
            ds, batch_size=args.batch, shuffle=True, num_workers=0)

    def infinite(loader):
        while True:
            yield from loader

    gens = {k: infinite(v) for k, v in loaders.items()}
    total = (4 * len(loaders["QB"]) + 4 * len(loaders["GF2"])
             + 8 * len(loaders["WV3"]))
    qb_prob = 4 * len(loaders["QB"]) / total
    gf2_prob = 4 * len(loaders["GF2"]) / total

    def sample_data():
        r = random.random()
        if r < qb_prob:
            return next(gens["QB"]), "QB"
        if r < qb_prob + gf2_prob:
            return next(gens["GF2"]), "GF2"
        return next(gens["WV3"]), "WV3"

    diffusion.train()
    t_start = time.time()
    for step in range(1, args.steps + 1):
        data, prompt = sample_data()
        l_pix = diffusion(data, prompt).sum()
        l_pix.backward()
        optG.step()
        scheduler.step()
        optG.zero_grad()
        if step % 100 == 0 or step == 10:
            el = time.time() - t_start
            print(f"step {step}/{args.steps} l_pix {float(l_pix):.4f} "
                  f"({el / step:.2f}s/step, eta "
                  f"{(args.steps - step) * el / step / 60:.0f}min)",
                  flush=True)

    # --- sample each val set with the reference's own dpm-solver path -----
    from tmdiff_tpu.eval import metrics as M

    def score(gt_b, pred_b):
        return M.mean_scores(gt_b, pred_b)

    diffusion.eval()
    results = {"config": {"channels": channels, "steps": args.steps,
                          "size": args.size, "timesteps": args.timesteps,
                          "lr": args.lr, "batch": args.batch,
                          "seed": args.seed,
                          "sampler": "reference sample_by_dpmsolver "
                                     "(30-step singlestep order-3 logSNR)"}}
    from tmdiff_tpu.models.clip_text import clip_mode
    
    results["clip_mode"] = clip_mode()
    for sensor in ["QB", "GF2", "WV3"]:
        ds = LRHRDataset(paths[f"val_{sensor.lower()}"], phase="val")
        batch = [ds[i] for i in range(len(ds))]
        x_in = {k: torch.stack([b[k] for b in batch])
                for k in ("Res", "PAN", "MS", "HR")}
        # batch 1, like the reference val loop: the vendored model_wrapper's
        # x_start branch multiplies an UNexpanded (B,) alpha_t
        # (`core/dpm_solver_pytorch.py:304-306`), so sample_by_dpmsolver is
        # broadcast-correct only at batch 1 upstream (their val loaders are
        # batch_size=1, `data/__init__.py:17`). Documented reference wart.
        torch.manual_seed(1000)  # sampler x_T draws
        preds = []
        with torch.no_grad():
            for i in range(len(batch)):
                one = {k: x_in[k][i : i + 1] for k in ("Res", "PAN", "MS")}
                preds.append(diffusion.sample_by_dpmsolver(one, sensor)[0])
        sr = torch.stack(preds)
        results[f"reference_{sensor}"] = score(
            x_in["HR"].numpy(), sr.numpy())
        lms = score(x_in["HR"].numpy(), x_in["MS"].numpy())
        results[f"lms_{sensor}"] = lms
        print(sensor, "reference:", results[f"reference_{sensor}"],
              "lms:", lms, flush=True)

    if args.ours and os.path.exists(args.ours):
        with open(args.ours) as f:
            ours = json.load(f)
        table = []
        for sensor in ["QB", "GF2", "WV3"]:
            row = {"sensor": sensor}
            for k in ("sam", "ergas", "ssim"):
                ref_v = results[f"reference_{sensor}"][k]
                our_v = ours[f"trained_{sensor}"][k]
                row[f"ref_{k}"] = ref_v
                row[f"ours_{k}"] = our_v
                row[f"delta_{k}_pct"] = 100.0 * (our_v - ref_v) / ref_v
            table.append(row)
        results["side_by_side"] = table
        print(json.dumps(table, indent=2), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("RESULT", json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
