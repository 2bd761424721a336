"""Gaussian diffusion process: training objective and ancestral sampler.

Behavioral contract (`/root/reference/GeneralModel/diffusion_general.py`):

  * Training (`p_losses_dynamic:349-370`): draw integer t ∈ [1, T] per
    sample, noise the residual with √ᾱ_t (`q_sample:341-347`), feed the
    *integer timestep* to the denoiser, and compute L1/L2/smooth-L1 between
    the clean residual and the network output — the network is an
    **x0-predictor**.
  * Ancestral sampling (`p_sample_loop:210-225`): T-step reverse loop from
    pure noise over the residual shape. The reference's default path
    (`p_mean_variance:154-171`) inverts the network output as if it were a
    noise prediction — inconsistent with the training objective; the
    x0-consistent variant exists as `p_mean_variance_xo:173-190`. We default
    to the **correct x0 semantics** and expose the legacy inversion behind
    `legacy_noise_inversion=True` for bit-level replication (SURVEY.md §7
    "reference warts").
  * Clipping (`dynamic_clip:192-200`): static clamp to [-1, 1] by default;
    "dynamic" divides by max |x| when > 1.

TPU-native deltas: the whole reverse loop is a single `jax.lax.scan` inside
one jit (the reference runs a Python loop with one CUDA dispatch per step);
timestep randomness uses threaded `jax.random` keys, not host numpy.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tmdiff_tpu.diffusion.schedules import NoiseSchedule

# denoise_fn(x_t, t, pan, ms) -> x0 prediction; conditioning closed over.
DenoiseFn = Callable[..., jnp.ndarray]


def q_sample(x_start, sqrt_alpha_cumprod, noise):
    """Forward noising with a (possibly continuous) √ᾱ level."""
    c = sqrt_alpha_cumprod
    return c * x_start + jnp.sqrt(1.0 - c**2) * noise


def pixel_loss(pred, target, loss_type: str = "l1"):
    if loss_type == "l1":
        return jnp.mean(jnp.abs(target - pred))
    if loss_type == "l2":
        return jnp.mean((target - pred) ** 2)
    if loss_type == "smooth_l1":
        diff = jnp.abs(target - pred)
        return jnp.mean(jnp.where(diff < 1.0, 0.5 * diff**2, diff - 0.5))
    raise NotImplementedError(loss_type)


def diffusion_loss(
    denoise_fn: DenoiseFn,
    ns: NoiseSchedule,
    rng: jax.Array,
    res: jnp.ndarray,
    pan: jnp.ndarray,
    ms: jnp.ndarray,
    loss_type: str = "l1",
):
    """Monte-Carlo denoising loss over a batch of residuals (B, C, H, W)."""
    b = res.shape[0]
    rng_t, rng_noise = jax.random.split(rng)
    t = jax.random.randint(rng_t, (b,), 1, ns.num_timesteps + 1)
    gamma = ns.sqrt_alphas_cumprod_prev[t][:, None, None, None]
    noise = jax.random.normal(rng_noise, res.shape, res.dtype)
    x_noisy = q_sample(res, gamma, noise)
    x_recon = denoise_fn(x_noisy, t, pan, ms)
    return pixel_loss(x_recon, res, loss_type)


def clip_x0(x_recon, mode: str = "static"):
    if mode == "static":
        return jnp.clip(x_recon, -1.0, 1.0)
    if mode == "dynamic":
        s = jnp.maximum(jnp.max(jnp.abs(x_recon)), 1.0)
        return x_recon / s
    if mode == "none":
        return x_recon
    raise NotImplementedError(mode)


def posterior_mean_logvar(ns: NoiseSchedule, x_start, x_t, t):
    mean = ns.posterior_mean_coef1[t] * x_start + ns.posterior_mean_coef2[t] * x_t
    return mean, ns.posterior_log_variance_clipped[t]


def predict_start_from_noise(ns: NoiseSchedule, x_t, t, noise):
    return (
        ns.sqrt_recip_alphas_cumprod[t] * x_t
        - ns.sqrt_recipm1_alphas_cumprod[t] * noise
    )


def ancestral_sample(
    denoise_fn: DenoiseFn,
    ns: NoiseSchedule,
    rng: jax.Array,
    pan: jnp.ndarray,
    ms: jnp.ndarray,
    shape: tuple,
    *,
    clip_mode: str = "static",
    legacy_noise_inversion: bool = False,
    num_frames: Optional[int] = None,
    x_init: Optional[jnp.ndarray] = None,
    step_noise: Optional[jnp.ndarray] = None,
):
    """Full T-step ancestral reverse loop as one `lax.scan`.

    Returns the final residual sample, or (final, frames) when `num_frames`
    requests intermediate snapshots (frame f = state after step t where
    t % (T // num_frames) == 0, mirroring the reference's `sample_inter`).

    `x_init` (initial x_T) and `step_noise` ((T, *shape), row t = the noise
    added after timestep t; row 0 is ignored) override the PRNG draws — the
    injection hook that lets golden tests replay the torch reference's exact
    noise sequence through the compiled scan.
    """
    T = ns.num_timesteps
    rng, rng_init = jax.random.split(rng)
    if x_init is None:
        x_init = jax.random.normal(rng_init, shape)
    # (The reference's display interval is the quirky `1 | (T // 10)`,
    # `p_sample_loop:213`; with an explicit frame count we use exact spacing.)
    interval = max(1, T // (num_frames or 10))
    n_slots = (T + interval - 1) // interval if num_frames else 0
    frames_init = (
        jnp.zeros((n_slots, *shape), x_init.dtype) if num_frames else None
    )

    def step(carry, t):
        x, frames = carry
        step_rng = jax.random.fold_in(rng, t)
        if legacy_noise_inversion:
            out = denoise_fn(x, jnp.full((shape[0],), t + 1), pan, ms)
            x_recon = predict_start_from_noise(ns, x, t, out)
        else:
            x_recon = denoise_fn(x, jnp.full((shape[0],), t + 1), pan, ms)
        x_recon = clip_x0(x_recon, clip_mode)
        mean, logvar = posterior_mean_logvar(ns, x_recon, x, t)
        drawn = (
            step_noise[t] if step_noise is not None
            else jax.random.normal(step_rng, shape)
        )
        noise = jnp.where(t > 0, drawn, jnp.zeros(shape))
        x = mean + noise * jnp.exp(0.5 * logvar)
        if frames is not None:
            slot = t // interval
            frames = jax.lax.cond(
                t % interval == 0,
                lambda f: jax.lax.dynamic_update_slice(
                    f, x[None], (slot,) + (0,) * len(shape)
                ),
                lambda f: f,
                frames,
            )
        return (x, frames), None

    (x, frames), _ = jax.lax.scan(
        step, (x_init, frames_init), jnp.arange(T - 1, -1, -1)
    )
    if num_frames:
        return x, frames
    return x


def ddim_jump(ns: NoiseSchedule, x_t, x0_hat, t, s):
    """One deterministic DDIM (η=0) jump t → s in the x0 parameterisation:

        x_s = α_s·x̂0 + (σ_s/σ_t)·(x_t − α_t·x̂0)

    with α(u) = `ns.sqrt_alphas_cumprod_prev[u]` (the model-time convention
    of `diffusion_loss`: u ∈ [1, T], α(0) = 1 is the clean endpoint, so a
    jump to s = 0 returns x̂0 exactly). `t`/`s` are scalars or (B,) int
    arrays; requires t ≥ 1 (σ_t > 0). The reference has no deterministic
    ancestral path — its closest is DPM-Solver++ order 1; this is the
    distillation-friendly form (train/distill.py builds the progressive
    targets from two of these jumps)."""
    bshape = (-1,) + (1,) * (x_t.ndim - 1)
    a = lambda u: jnp.reshape(ns.sqrt_alphas_cumprod_prev[u], bshape) \
        if jnp.ndim(u) else ns.sqrt_alphas_cumprod_prev[u]
    sigma = lambda au: jnp.sqrt(jnp.maximum(1.0 - au * au, 0.0))
    a_t, a_s = a(t), a(s)
    ratio = sigma(a_s) / jnp.maximum(sigma(a_t), 1e-12)
    return a_s * x0_hat + ratio * (x_t - a_t * x0_hat)


def ddim_sample(
    denoise_fn: DenoiseFn,
    ns: NoiseSchedule,
    rng: jax.Array,
    pan: jnp.ndarray,
    ms: jnp.ndarray,
    shape: tuple,
    *,
    steps: int = 50,
    clip_mode: str = "static",
    x_init: Optional[jnp.ndarray] = None,
):
    """Deterministic DDIM sampler: `steps` x0-parameterised jumps down a
    uniform integer model-time grid T = t_0 > t_1 > … > t_steps = 0, one
    `lax.scan`. This is the sampler progressive distillation students are
    trained for (train/distill.py): an N-step student is scored with
    `ddim_sample(steps=N)` on exactly its training grid."""
    T = ns.num_timesteps
    grid = np.round(np.linspace(T, 0, steps + 1)).astype(np.int32)
    if len(np.unique(grid)) != steps + 1:
        raise ValueError(f"steps={steps} > T={T}: grid degenerates")
    x = x_init if x_init is not None else jax.random.normal(rng, shape)
    b = shape[0]

    def step(x, ts):
        t, s = ts
        x0 = denoise_fn(x, jnp.full((b,), t, jnp.int32), pan, ms)
        return ddim_jump(ns, x, clip_x0(x0, clip_mode), t, s), None

    pairs = jnp.stack(
        [jnp.asarray(grid[:-1]), jnp.asarray(grid[1:])], axis=1)
    x, _ = jax.lax.scan(step, x, pairs)
    return x


def ddim_sample_blockcached(
    full_fn,
    reuse_fn,
    ns: NoiseSchedule,
    rng: jax.Array,
    pan: jnp.ndarray,
    ms: jnp.ndarray,
    shape: tuple,
    *,
    steps: int = 20,
    refresh_every: int = 2,
    clip_mode: str = "static",
    x_init: Optional[jnp.ndarray] = None,
    forecast: bool = False,
    refresh_mask: Optional[Sequence[bool]] = None,
):
    """DDIM with cross-step deep-feature caching (training-free NFE cost
    reduction; Δ-DiT / block-caching family, PAPERS.md). The grid is split
    into chunks of `refresh_every` steps: the first step of each chunk calls
    `full_fn(x, t) -> (x0_hat, deep)` (full network, returning the deep-trunk
    features), the remaining steps call `reuse_fn(x, t, deep) -> x0_hat`
    (shallow path consuming the cached trunk). With `refresh_every=1` this is
    exactly `ddim_sample`. One `lax.scan` over chunks; the compiled graph
    holds one full + one reuse forward regardless of step count.

    `refresh_mask` (length `steps`, `mask[0]` must be True) replaces the
    uniform chunking with an arbitrary refresh schedule — schedule-aware
    caching: concentrate refreshes where staleness is measured to hurt and
    coast elsewhere, at any full/reuse budget (e.g. 7 refreshes in 20 steps
    sits between refresh_every 2 and 4). Implemented as one `lax.scan` over
    steps whose body `lax.cond`-selects the full or reuse branch, so the
    compiled graph still holds exactly one of each forward and only the
    selected branch executes per step. Overrides `refresh_every`; mutually
    exclusive with `forecast` (a measured quality negative here anyway —
    BASELINE.md).

    The mask may be a TRACED `(steps,)` bool array (i.e. this function may
    be jitted with the mask as an argument): the schedule is then pure
    runtime data and ONE compiled program serves every schedule of that
    length — which is what makes on-device schedule search cheap
    (tools/schedule_search.py evaluates hundreds of candidate masks against
    a single compile). Only the static shape is checked in that case; the
    `mask[0] is True` contract cannot be read off a tracer, so traced
    callers must enforce it themselves (a False first entry silently
    consumes the all-zeros trunk placeholder) — `Pansharpener.sample`
    validates it eagerly on the host before tracing.

    A CONCRETE mask instead *specializes* the compiled program to that one
    schedule: each refresh step opens a chunk (one full step + its trailing
    reuse steps), and consecutive equal-length chunks roll into ONE
    `lax.scan` of the same chunk-step body the uniform `refresh_every` path
    uses — no per-step `lax.cond`, and a uniform mask compiles to the
    identical single-scan program as `refresh_every`. The traced-mask
    program pays a measured ~15% per-step branch-dispatch tax over the
    specialized one, and every extra top-level scan segment costs ~15 ms
    (dispatch + lost cross-segment fusion — the earlier one-scan-per-run
    form measured ~8% slower; BASELINE.md "Searched refresh schedules"), so
    searches trace the mask (hundreds of schedules, one compile) while
    deployments bake it in (one schedule, full speed). Compile cost scales
    with the number of maximal runs of consecutive equal-length chunks (a
    clustered searched schedule compiles in a handful of bodies); a
    pathological alternating-length schedule (e.g. lens 2,3,2,3) still
    compiles one scan body per chunk.

    `forecast=True` linearly extrapolates the trunk instead of reusing it
    stale (first-order feature forecasting — the "Predict to Skip" /
    TaylorSeer family, PAPERS.md): with deep_k, deep_{k-1} the features at
    the current/previous refresh (one chunk = `refresh_every` uniform grid
    steps apart), reuse step i ∈ [1, refresh_every) of chunk k consumes

        deep_k + (i / refresh_every) · (deep_k − deep_{k−1})

    The first chunk has no history, so its slope is zero (≡ stale reuse);
    the extrapolation is elementwise over trunk leaves (negligible cost
    next to a forward). The deep features evolve smoothly along the
    sampler trajectory, so the first-order hold cuts the staleness error
    from O(Δ) to O(Δ²) — it's what makes deeper cache boundaries / longer
    refresh intervals usable (measured in BASELINE.md).

    The reference has no analogue — its samplers re-run the whole network
    every NFE (`diffusion_general.py:227-255`). No model type restriction
    beyond what the two callables encode.
    """
    if refresh_mask is None and steps % refresh_every:
        raise ValueError(
            f"steps={steps} must be divisible by refresh_every={refresh_every}")
    T = ns.num_timesteps
    grid = np.round(np.linspace(T, 0, steps + 1)).astype(np.int32)
    if len(np.unique(grid)) != steps + 1:
        raise ValueError(f"steps={steps} > T={T}: grid degenerates")
    x = x_init if x_init is not None else jax.random.normal(rng, shape)
    b = shape[0]
    # (steps, 2) of (t, s) jump endpoints
    pairs = jnp.stack([jnp.asarray(grid[:-1]), jnp.asarray(grid[1:])], axis=1)

    def deep_zeros():
        deep_sd = jax.eval_shape(
            full_fn, jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((b,), jnp.int32))[1]
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), deep_sd)

    if refresh_mask is not None:
        if forecast:
            raise ValueError("forecast is not supported with refresh_mask")
        if isinstance(refresh_mask, jax.core.Tracer):
            # runtime schedule: shape is static, values are not — the
            # mask[0]=True contract is the (host-side) caller's to enforce
            if refresh_mask.shape != (steps,):
                raise ValueError(
                    f"refresh_mask must have length steps={steps}, "
                    f"got shape {refresh_mask.shape}")
            mask = jnp.asarray(refresh_mask, jnp.bool_)
        else:
            mask = np.asarray(refresh_mask, bool)
            if mask.shape != (steps,):
                raise ValueError(
                    f"refresh_mask must have length steps={steps}, "
                    f"got shape {mask.shape}")
            if not mask[0]:
                raise ValueError(
                    "refresh_mask[0] must be True — no cached trunk exists "
                    "yet")
            # concrete mask → specialized program: chunk decomposition.
            # Each refresh step opens a chunk = [full, reuse × (len-1)];
            # consecutive equal-length chunks roll into one scan of the
            # refresh_every chunk-step body. Segment boundaries measured
            # ~15 ms each, so fewer rolled segments beat one-scan-per-run
            # (BASELINE.md "Searched refresh schedules").
            starts = [i for i in range(steps) if mask[i]]
            lens = [hi - lo for lo, hi in zip(starts, starts[1:] + [steps])]

            def chunk_group(x, chunk_pairs):
                # chunk_pairs: (m, l, 2) — m chunks of l grid jumps each
                def chunk_step(x, ts):
                    t0, s0 = ts[0, 0], ts[0, 1]
                    x0, deep = full_fn(x, jnp.full((b,), t0, jnp.int32))
                    x = ddim_jump(ns, x, clip_x0(x0, clip_mode), t0, s0)

                    def inner(x, ts_i):
                        x0_i = reuse_fn(
                            x, jnp.full((b,), ts_i[0], jnp.int32), deep)
                        return ddim_jump(ns, x, clip_x0(x0_i, clip_mode),
                                         ts_i[0], ts_i[1]), None

                    if chunk_pairs.shape[1] > 1:
                        x, _ = jax.lax.scan(inner, x, ts[1:])
                    return x, None

                x, _ = jax.lax.scan(chunk_step, x, chunk_pairs)
                return x

            i = 0
            while i < len(lens):
                j = i
                while j < len(lens) and lens[j] == lens[i]:
                    j += 1
                hi = starts[j] if j < len(lens) else steps
                x = chunk_group(
                    x, pairs[starts[i]:hi].reshape(j - i, lens[i], 2))
                i = j
            return x

        def mask_step(carry, xs):
            x, deep = carry
            (t, s), refresh = xs
            tb = jnp.full((b,), t, jnp.int32)
            x0, deep = jax.lax.cond(
                refresh,
                lambda x, d: full_fn(x, tb),
                lambda x, d: (reuse_fn(x, tb, d), d),
                x, deep)
            return (ddim_jump(ns, x, clip_x0(x0, clip_mode), t, s), deep), None

        (x, _), _ = jax.lax.scan(
            mask_step, (x, deep_zeros()),
            ((pairs[:, 0], pairs[:, 1]), jnp.asarray(mask)))
        return x

    chunks = pairs.reshape(steps // refresh_every, refresh_every, 2)

    def inner_jump(x, t, s, deep):
        x0 = reuse_fn(x, jnp.full((b,), t, jnp.int32), deep)
        return ddim_jump(ns, x, clip_x0(x0, clip_mode), t, s)

    if not forecast:
        def chunk_step(x, ts):
            t0, s0 = ts[0, 0], ts[0, 1]
            x0, deep = full_fn(x, jnp.full((b,), t0, jnp.int32))
            x = ddim_jump(ns, x, clip_x0(x0, clip_mode), t0, s0)

            def inner(x, ts_i):
                return inner_jump(x, ts_i[0], ts_i[1], deep), None

            if refresh_every > 1:
                x, _ = jax.lax.scan(inner, x, ts[1:])
            return x, None

        x, _ = jax.lax.scan(chunk_step, x, chunks)
        return x

    # forecast: carry the previous refresh's trunk; shape/dtype come from an
    # abstract trace of full_fn (zeros + have_prev=0 make chunk 0's slope 0)
    deep0 = deep_zeros()
    fracs = jnp.asarray(
        np.arange(1, refresh_every, dtype=np.float32) / refresh_every)

    def chunk_step(carry, ts):
        x, deep_prev, have_prev = carry
        t0, s0 = ts[0, 0], ts[0, 1]
        x0, deep = full_fn(x, jnp.full((b,), t0, jnp.int32))
        x = ddim_jump(ns, x, clip_x0(x0, clip_mode), t0, s0)
        slope = jax.tree.map(
            lambda d, p: (have_prev * (d - p).astype(jnp.float32)).astype(d.dtype),
            deep, deep_prev)

        def inner(x, ts_i):
            (t, s), frac = ts_i
            deep_i = jax.tree.map(
                lambda d, sl: d + frac.astype(d.dtype) * sl, deep, slope)
            return inner_jump(x, t, s, deep_i), None

        if refresh_every > 1:
            x, _ = jax.lax.scan(inner, x, ((ts[1:, 0], ts[1:, 1]), fracs))
        return (x, deep, jnp.float32(1.0)), None

    (x, _, _), _ = jax.lax.scan(
        chunk_step, (x, deep0, jnp.float32(0.0)), chunks)
    return x


def regression_sample(denoise_fn: DenoiseFn, rng, pan, ms, shape):
    """1-NFE regression shortcut (`sample_by_regression:289-298`): single
    forward at t = T+1 from pure noise."""
    x_T = jax.random.normal(rng, shape)
    t = jnp.full((shape[0],), 1001)
    return denoise_fn(x_T, t, pan, ms)


def cfg_denoise(denoise_fn: DenoiseFn, guidance: float):
    """Classifier-free guidance combinator: zero the MS conditioning for the
    unconditional branch (`classifier_free_guidance_sample:140-152`), batched
    2x rather than two serial calls."""

    def fn(x, t, pan, ms):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        pan2 = jnp.concatenate([pan, pan], axis=0)
        ms2 = jnp.concatenate([ms, jnp.zeros_like(ms)], axis=0)
        out = denoise_fn(x2, t2, pan2, ms2)
        cond, uncond = jnp.split(out, 2, axis=0)
        return (guidance + 1.0) * cond - guidance * uncond

    return fn


def cfg_dropout_condition(rng, cond, p_uncond: float, per_sample: bool = False):
    """Training-side CFG: zero the conditioning with probability p_uncond
    (`classifier_free_guidance_train:385-397` — an orphaned helper upstream:
    it has zero callers, so the reference never actually trains the
    unconditional branch; BASELINE.md's sampler zoo quantifies the resulting
    CFG failure). Default matches the reference helper exactly (one coin per
    batch); `per_sample=True` is the standard Ho & Salimans recipe (one coin
    per example) — strictly better gradient coverage per step and what the
    Trainer uses."""
    if per_sample:
        keep = jax.random.uniform(rng, (cond.shape[0],)) >= p_uncond
        shape = (cond.shape[0],) + (1,) * (cond.ndim - 1)
        return cond * keep.reshape(shape).astype(cond.dtype)
    drop = jax.random.uniform(rng, ()) < p_uncond
    return jnp.where(drop, jnp.zeros_like(cond), cond)
