"""ControlNet end-task learning proof: the adapter measurably LEARNS.

r4 pinned the adapter's structure (zero-init identity, grad routing, SPMD
equivalence, 1.46x TPU cost — tests/test_controlnet.py,
benchmarks/controlnet_bench.py) but never showed it learning a task. This
driver closes that gap with a synthetic hint task, end to end:

  1. train a LegacyUNet diffusion base on synthetic pansharpening scenes
     (x0-prediction L1, the reference objective) until it converges to a
     useful SAM;
  2. adopt it into ControlledLegacyUNet (`inject_base_params` +
     `init_control_from_base`) and score the UNTRAINED adapter: by the
     zero-init identity its val metrics must equal the base's EXACTLY;
  3. fine-tune ONLY the control branch (sd_locked `trainable_labels` +
     optax.multi_transform) with an information-bearing hint. Task design
     matters: a first r5 attempt used a noisy copy of 3 residual bands and
     the adapter learned NOTHING (l_pix flat at any LR) because on these
     synthetic scenes (pan, ms) already nearly determines gt — the hint
     held no NEW information. The task is therefore **sensor-failure
     inpainting**: the first `--dead-bands` MS bands are zeroed out of
     EVERY conditioning input (a dead detector), so their spectra are
     genuinely underdetermined from (pan, ms); the hint is a noisy copy of
     what the dead bands should read (an auxiliary instrument — the
     UniControl tasks' role, `/root/reference/utils/cldm_unicontrol.py:
     364-424`);
  4. score the trained adapter: val SAM/ERGAS must beat the no-hint base,
     which cannot know the dead bands' spectral content.

Protocol mirrors tools/train_convergence.py: data stays ON DEVICE (batches
are gathered inside the jitted step — no per-step H2D through the relay),
one process, four compiles. Results JSON -> --out; headline table in
BASELINE.md "ControlNet end-task learning proof".
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/controlnet_task_eval.json")
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--scenes", type=int, default=64)
    p.add_argument("--val-scenes", type=int, default=8)
    p.add_argument("--bands", type=int, default=8)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--channels", default="32,64,128,256")
    p.add_argument("--timesteps", type=int, default=500)
    p.add_argument("--base-steps", type=int, default=1500)
    p.add_argument("--ctrl-steps", type=int, default=2000)
    p.add_argument("--ctrl-lr", type=float, default=5e-4,
                   help="control-branch fine-tune LR. The zero-init'ed "
                        "adapter path needs a hotter LR than the base "
                        "(r5 measured: 1e-4 x 1000 steps moves nothing; "
                        "ControlNet's 'sudden convergence' needs budget)")
    p.add_argument("--sample-steps", type=int, default=10)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--hint-noise", type=float, default=0.01)
    p.add_argument("--dead-bands", type=int, default=3,
                   help="zero this many leading MS bands from all "
                        "conditioning (the sensor-failure task); the hint "
                        "carries their ground truth")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    from tmdiff_tpu.data.synthetic import make_arrays
    from tmdiff_tpu.diffusion import gaussian
    from tmdiff_tpu.diffusion.schedules import NoiseSchedule
    from tmdiff_tpu.eval.metrics import mean_scores
    from tmdiff_tpu.models.clip_text import clip_mode, get_prompt_embedding
    from tmdiff_tpu.models.controlnet import (
        TASKS_TO_ID,
        ControlledLegacyUNet,
        init_control_from_base,
        inject_base_params,
        task_feature,
        trainable_labels,
    )
    from tmdiff_tpu.models.legacy_unet import LegacyUNet
    from tmdiff_tpu.train.trainer import hf_linear_schedule

    channels = tuple(int(c) for c in args.channels.split(","))
    D, S = args.bands, args.size
    TASK = "control_hed"  # soft dense map — closest UniControl task id
    tid, tfeat = TASKS_TO_ID[TASK], task_feature(TASK)

    def stage(split_seed, n):
        d = make_arrays(n, bands=D, size=S, seed=split_seed)
        gt = d["gt"].astype(np.float32).copy()
        # Per-scene random spectral gains on the dead bands: decorrelated
        # from every live input, so their amplitude is GENUINELY
        # unknowable from (pan, ms) — without this, the synthetic bands
        # are so cross-correlated the base infers dead bands from live
        # ones and the hint holds no new information (r5 measured: flat
        # val SAM at any fine-tune budget).
        g_rng = np.random.default_rng(split_seed + 555)
        # gains stay <= 1: the sampler clips x0_hat to [-1,1] and the
        # metrics clip images to [0,1], so amplification (>1) information
        # would be destroyed downstream of the model (r5 measured: train
        # loss halves while val SAM stays flat — the clip eats the win)
        gains = g_rng.uniform(0.35, 1.0,
                              (n, args.dead_bands, 1, 1)).astype(np.float32)
        gt[:, :args.dead_bands] *= gains
        lms = d["lms"].astype(np.float32).copy()
        lms[:, :args.dead_bands] = 0.0  # dead detector: no MS for these
        res = gt - lms
        pan = np.repeat(d["pan"], D, axis=1).astype(np.float32)
        return {
            "res": jnp.asarray(res),
            "pan": jnp.asarray(pan),
            "ms": jnp.asarray(lms),
            "gt": gt,
            "lms": lms,
        }

    train_d = stage(args.seed, args.scenes)
    val_d = stage(args.seed + 1000, args.val_scenes)

    # hint = noisy copy of what the dead bands should read, (B, H, W, k):
    # information that exists NOWHERE in the degraded (pan, ms) inputs.
    # (res bands :k equal gt bands :k here since their lms is zeroed.)
    def make_hint(res, key):
        h = jnp.transpose(res[:, :args.dead_bands], (0, 2, 3, 1))
        return h + args.hint_noise * jax.random.normal(key, h.shape)

    hint_key = jax.random.key(args.seed + 7)
    val_hint = make_hint(val_d["res"], hint_key)

    ns = NoiseSchedule.create("cosine", args.timesteps)
    emb = jnp.asarray(get_prompt_embedding("WV3"))
    base = LegacyUNet(channels=channels)
    ctrl = ControlledLegacyUNet(channels=channels)

    B = args.batch
    root_rng = jax.random.key(args.seed + 13)

    def diffusion_batch(rng, apply_fn):
        """Gather a batch on device, noise it, return L1(x0_hat, res)."""
        r_idx, r_t, r_n = jax.random.split(rng, 3)
        idx = jax.random.randint(r_idx, (B,), 0, args.scenes)
        res = jnp.take(train_d["res"], idx, axis=0)
        pan = jnp.take(train_d["pan"], idx, axis=0)
        ms = jnp.take(train_d["ms"], idx, axis=0)
        t = jax.random.randint(r_t, (B,), 1, args.timesteps + 1)
        gamma = ns.sqrt_alphas_cumprod_prev[t][:, None, None, None]
        noise = jax.random.normal(r_n, res.shape)
        x_t = gamma * res + jnp.sqrt(1.0 - gamma**2) * noise
        x0_hat = apply_fn(x_t, t.astype(jnp.float32), pan, ms, res, r_idx)
        return jnp.mean(jnp.abs(x0_hat - res))

    t0 = time.time()

    # ---- phase 1: train the base --------------------------------------------
    bp = base.init(jax.random.key(args.seed + 1),
                   train_d["res"][:1], jnp.ones((1,)), train_d["pan"][:1],
                   train_d["ms"][:1], emb)["params"]
    tx = optax.adamw(hf_linear_schedule(args.lr, 100, args.base_steps),
                     weight_decay=1e-4)

    # remat both train forwards: halves activation HBM AND restructures the
    # backward HLO so the dev tunnel's remote compiler doesn't SIGILL (the
    # r2 finding that made Trainer default remat=True — confirmed again
    # here r5: the un-remat'ed base backward SIGILLs, remat'ed compiles)
    def base_apply(params):
        @jax.checkpoint
        def fwd(p, x_t, t, pan, ms):
            return base.apply({"params": p}, x_t, t, pan, ms, emb)

        def fn(x_t, t, pan, ms, res, r_idx):
            del res, r_idx
            return fwd(params, x_t, t, pan, ms)
        return fn

    @jax.jit
    def base_step(params, opt_state, rng):
        loss, g = jax.value_and_grad(
            lambda q: diffusion_batch(rng, base_apply(q)))(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    opt_state = tx.init(bp)
    for k in range(args.base_steps):
        bp, opt_state, loss = base_step(
            bp, opt_state, jax.random.fold_in(root_rng, k))
        if (k + 1) % 200 == 0:
            print(f"base step {k + 1} l_pix {float(loss):.4f}", flush=True)
    print(f"base trained in {time.time() - t0:.0f}s", flush=True)

    # ---- eval helpers -------------------------------------------------------
    def score(denoise_fn, label):
        x = gaussian.ddim_sample(
            denoise_fn, ns, jax.random.key(args.seed + 99),
            None, None, val_d["res"].shape, steps=args.sample_steps)
        pred = np.asarray(x) + val_d["lms"]
        sc = mean_scores(val_d["gt"], pred, round_to=5)
        print(label, sc, flush=True)
        return sc, np.asarray(x)

    @jax.jit
    def base_sample_fn(params, x, t, pan, ms):
        return base.apply({"params": params}, x, t.astype(jnp.float32),
                          pan, ms, emb)

    base_scores, base_x = score(
        lambda x, t, *_: base_sample_fn(
            bp, x, t, val_d["pan"], val_d["ms"]), "base")

    # ---- phase 2: adopt into the controlled model ---------------------------
    cp = ctrl.init(jax.random.key(args.seed + 2),
                   train_d["res"][:1], jnp.ones((1,)), train_d["pan"][:1],
                   train_d["ms"][:1], emb, hint=val_hint[:1], task_id=tid,
                   task_feat=tfeat)["params"]
    cp = init_control_from_base(inject_base_params(cp, bp))

    @jax.jit
    def ctrl_sample_fn(params, x, t, pan, ms, hint):
        return ctrl.apply({"params": params}, x, t.astype(jnp.float32),
                          pan, ms, emb, hint=hint, task_id=tid,
                          task_feat=tfeat)

    untrained_scores, untrained_x = score(
        lambda x, t, *_: ctrl_sample_fn(
            cp, x, t, val_d["pan"], val_d["ms"], val_hint),
        "controlled-untrained")
    identity = bool(np.array_equal(base_x, untrained_x))
    print(f"zero-init identity through the full {args.sample_steps}-step "
          f"sampler: {'EXACT' if identity else 'BROKEN'}", flush=True)

    # ---- phase 3: fine-tune the control branch only -------------------------
    labels = trainable_labels(cp, sd_locked=True)
    ctx = optax.multi_transform(
        {"train": optax.adamw(
            hf_linear_schedule(args.ctrl_lr, 50, args.ctrl_steps),
            weight_decay=1e-4),
         "freeze": optax.set_to_zero()}, labels)

    def ctrl_apply(params):
        @jax.checkpoint
        def fwd(p, x_t, t, pan, ms, hint):
            return ctrl.apply({"params": p}, x_t, t, pan, ms, emb,
                              hint=hint, task_id=tid, task_feat=tfeat)

        def fn(x_t, t, pan, ms, res, r_idx):
            # fresh hint noise each step (r_idx is the step's gather key)
            hint = make_hint(res, jax.random.fold_in(r_idx, 1))
            return fwd(params, x_t, t, pan, ms, hint)
        return fn

    @jax.jit
    def ctrl_step(params, opt_state, rng):
        loss, g = jax.value_and_grad(
            lambda q: diffusion_batch(rng, ctrl_apply(q)))(params)
        upd, opt_state = ctx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    c_opt = ctx.init(cp)
    t1 = time.time()
    for k in range(args.ctrl_steps):
        cp, c_opt, loss = ctrl_step(
            cp, c_opt, jax.random.fold_in(root_rng, 10**6 + k))
        if (k + 1) % 200 == 0:
            print(f"ctrl step {k + 1} l_pix {float(loss):.4f}", flush=True)
    print(f"control branch trained in {time.time() - t1:.0f}s", flush=True)

    # base weights must not have moved (sd_locked)
    frozen = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(cp["conv1"]),
                        jax.tree.leaves(bp["conv1"])))

    trained_scores, _ = score(
        lambda x, t, *_: ctrl_sample_fn(
            cp, x, t, val_d["pan"], val_d["ms"], val_hint),
        "controlled-trained")

    out = {
        "config": vars(args),
        "clip_mode": clip_mode(),
        "base": base_scores,
        "controlled_untrained": untrained_scores,
        "controlled_trained": trained_scores,
        "zero_init_identity_exact": identity,
        "base_frozen_during_finetune": frozen,
        "adapter_learns": bool(
            trained_scores["sam"] < base_scores["sam"]
            and trained_scores["ergas"] < base_scores["ergas"]),
        "wall_s": round(time.time() - t0, 1),
    }
    json.dump(out, open(args.out, "w"), indent=2)
    print("->", args.out)
    print(json.dumps({k: out[k] for k in
                      ("zero_init_identity_exact", "adapter_learns",
                       "base_frozen_during_finetune")}))


if __name__ == "__main__":
    main()
