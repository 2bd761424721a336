"""High-level pansharpening facade: the reference `GeneralDiffusion` +
`DDPM.test` surface (`/root/reference/GeneralModel/diffusion_general.py:210-339`,
`GeneralModel/model.py:49-58`) as one functional object.

Samplers:
  * "ancestral"   — full-T reverse loop (`p_sample_loop`), correct
    x0-semantics by default, `legacy_noise_inversion` replicates the
    reference's noise-inversion wart;
  * "dpm++"       — `sample_by_dpmsolver`: 30-step singlestep order-3
    logSNR, dynamic thresholding, denoise-to-zero;
  * "dpm++_noise" — `sample_by_dpmsolver_noise` schedule shape (50-step
    multistep order 3) for noise-prediction checkpoints;
  * "dpm++_cfg"   — classifier-free guided multistep order 2
    (`sample_by_dpmsolver_guidance`);
  * "regression"  — 1-NFE shortcut (`sample_by_regression`);
  * "ddim"        — deterministic η=0 sampler on a uniform grid (`steps=`),
    the sampler progressively-distilled students are trained for
    (train/distill.py); no reference counterpart.

TPU-first details:
  * each sampler config compiles ONCE (cached by (method, shape, steps, …));
    params are jit arguments, so EMA/online swaps don't retrace;
  * the time-independent conditional encoder runs once per image and its
    features are reused across every solver step (the reference recomputes
    them per NFE — see models/wavbest.py);
  * outputs are images in [0, 1] (residual + upsampled MS, clipped).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tmdiff_tpu.diffusion import gaussian
from tmdiff_tpu.diffusion.dpm_solver import DPMSolver, NoiseScheduleVP, WrappedModel
from tmdiff_tpu.diffusion.schedules import NoiseSchedule, make_beta_schedule
from tmdiff_tpu.models.clip_text import load_prompt_table
from tmdiff_tpu.utils.residual import res2img


@dataclasses.dataclass
class Pansharpener:
    """Bundles a denoiser (model + params), a noise schedule, and the frozen
    sensor-prompt table into a sampling API."""

    model: Any
    params: Any
    schedule_name: str = "cosine"
    n_timestep: int = 1000
    model_type: str = "x_start"  # training objective of `params`
    mesh: Any = None  # optional jax.sharding.Mesh ("data","space") for SPMD sampling

    def __post_init__(self):
        self.ns = NoiseSchedule.create(self.schedule_name, self.n_timestep)
        self.betas = make_beta_schedule(self.schedule_name, self.n_timestep)
        self.nsvp = NoiseScheduleVP("discrete", betas=self.betas)
        table, index, self.is_real_clip = load_prompt_table()
        self.prompt_table = jnp.asarray(table)
        self.prompt_index = index
        self._compiled: dict = {}
        self._replicated_params = None  # lazy device_put cache (mesh mode)
        from tmdiff_tpu.ops.modconv import check_spmd_lowering

        check_spmd_lowering(self.mesh)

    def prompt_embedding(self, sensor):
        """(768,) for one sensor name, or (B, 768) for a sequence of names —
        the model broadcasts a single vector and modulates per-sample when
        given rows (WavBEST.prompt_embed), so mixed-sensor batches are
        first-class (the reference can only run one sensor per batch)."""
        if isinstance(sensor, str):
            return self.prompt_table[self.prompt_index[sensor]]
        rows = np.array([self.prompt_index[s] for s in sensor])
        return self.prompt_table[rows]

    # -- sampler program builders (compiled once per config) -------------------

    def _encode(self, params, pan, ms, prompt_emb):
        return self.model.apply(
            params, pan, ms, prompt_emb, method=self.model.encode_condition
        )

    def _denoise(self, params, x, t, cache):
        return self.model.apply(params, x, t, cache, method=self.model.denoise)

    def _build(self, method: str, steps: Optional[int],
               legacy: bool, num_frames: Optional[int] = None,
               refresh_every: int = 2, cache_level: int = 1,
               forecast: bool = False, has_mask: bool = False,
               static_mask=None):
        def run(params, pan, ms, prompt_emb, seed, x_init=None,
                step_noise=None, guidance=3.0, refresh_mask=None):
            rng = jax.random.fold_in(jax.random.key(0), seed)
            shape = ms.shape
            cache = self._encode(params, pan, ms, prompt_emb)
            denoise = lambda x, t, *_: self._denoise(params, x, t, cache)
            # x_T for the solver paths (ancestral draws its own unless injected)
            x_T = x_init if x_init is not None else jax.random.normal(rng, shape)

            if method == "ancestral":
                res = gaussian.ancestral_sample(
                    denoise, self.ns, rng, pan, ms, shape,
                    legacy_noise_inversion=legacy,
                    num_frames=num_frames,
                    x_init=x_init, step_noise=step_noise,
                )
                if num_frames:
                    final, frames = res
                    return (
                        jnp.clip(res2img(final, ms), 0.0, 1.0),
                        jnp.clip(res2img(frames, ms[None]), 0.0, 1.0),
                    )
            elif method == "regression":
                res = gaussian.regression_sample(denoise, rng, pan, ms, shape)
            elif method == "ddim":
                res = gaussian.ddim_sample(
                    denoise, self.ns, rng, pan, ms, shape,
                    steps=steps or 50, x_init=x_init,
                )
            elif method == "ddim_cached":
                # Cross-step deep-trunk caching (PAPERS.md block-caching
                # family): refresh the deep trunk (down3+middle at
                # cache_level=1, +up1 at cache_level=2, +down2/up2 at
                # cache_level=3) every `refresh_every`-th NFE, run the
                # shallow path in between; `forecast=True` linearly
                # extrapolates the trunk instead of reusing it stale.
                # Training-free; quality cost measured in BASELINE.md
                # ("Cross-step block caching").
                if not hasattr(self.model, "denoise_deep"):
                    raise ValueError(
                        f"{type(self.model).__name__} has no deep-trunk "
                        "split; ddim_cached needs denoise_deep/denoise_reuse")
                full = lambda x, t: self.model.apply(
                    params, x, t, cache, cache_level=cache_level,
                    method=self.model.denoise_deep)
                reuse = lambda x, t, deep: self.model.apply(
                    params, x, t, cache, deep, cache_level=cache_level,
                    method=self.model.denoise_reuse)
                res = gaussian.ddim_sample_blockcached(
                    full, reuse, self.ns, rng, pan, ms, shape,
                    steps=steps or 20, refresh_every=refresh_every,
                    x_init=x_init, forecast=forecast,
                    # traced (steps,) bool schedule — runtime data, so one
                    # compiled program serves every mask of this length
                    # (schedule sweeps / search recompile nothing); a
                    # static_mask instead SPECIALIZES the program to one
                    # schedule (deployment: no per-step branch tax)
                    refresh_mask=(
                        refresh_mask if has_mask
                        else np.asarray(static_mask, bool)
                        if static_mask is not None else None),
                )
            elif method == "dpm++_cfg":
                # CFG over the MS conditioning (`sample_by_dpmsolver_guidance`,
                # diffusion_general.py:300-321); both branches' cond features
                # are time-independent → encoded once each, tree-concatenated
                # along batch by the guidance wrapper.
                wrapped = WrappedModel(
                    lambda x, t, c: self._denoise(params, x, t, c),
                    model_type=self.model_type,
                    guidance_type="classifier-free",
                    guidance_scale=guidance,
                    condition=cache,
                    unconditional_condition=self._encode(
                        params, pan, jnp.zeros_like(ms), prompt_emb
                    ),
                )
                res = DPMSolver(wrapped, self.nsvp).sample(
                    x_T,
                    steps=steps or 50, order=2, skip_type="logSNR",
                    method="multistep",
                )
            else:  # dpm++ / dpm++_noise
                wrapped = WrappedModel(denoise, model_type=self.model_type)
                solver = DPMSolver(wrapped, self.nsvp)
                if method == "dpm++":
                    res = solver.sample(
                        x_T,
                        steps=steps or 30, order=3, skip_type="logSNR",
                        method="singlestep", denoise_to_zero=True,
                    )
                elif method == "dpm++_noise":
                    res = solver.sample(
                        x_T,
                        steps=steps or 50, order=3, skip_type="logSNR",
                        method="multistep", denoise_to_zero=True,
                    )
                else:
                    raise ValueError(f"unknown sampler {method!r}")
            return jnp.clip(res2img(res, ms), 0.0, 1.0)

        return jax.jit(run)

    # -- public sampling API -------------------------------------------------

    def sample(
        self,
        batch: dict,
        sensor="QB",  # one sensor name, or one name per batch element
        method: str = "dpm++",
        seed: int = 0,
        steps: Optional[int] = None,
        guidance: float = 3.0,
        legacy_noise_inversion: bool = False,
        num_frames: Optional[int] = None,
        params=None,
        x_init=None,
        step_noise=None,
        refresh_every: int = 2,
        cache_level: int = 1,
        forecast: bool = False,
        refresh_mask=None,  # ddim_cached: explicit per-step refresh schedule
        refresh_mask_static: bool = False,  # bake the schedule into the
        # compiled program (deployment: one schedule, no branch tax) instead
        # of tracing it (search: many schedules, one compile)
    ):
        """Pansharpen one batch {PAN, MS[, …]} → images in [0, 1].

        `num_frames` (ancestral only) additionally returns intermediate
        snapshots — the reference's `continous=True` mode
        (`p_sample_loop:210-225`). `x_init` / `step_noise` (ancestral only)
        replay an explicit noise sequence — the golden-test hook."""
        pan = jnp.asarray(batch["PAN"])
        ms = jnp.asarray(batch["MS"])
        # guidance is a traced argument, NOT part of the compile key: a
        # guidance sweep (or per-request guidance in serving) reuses one
        # compiled CFG sampler.
        # refresh_every/cache_level/forecast only shape the ddim_cached
        # program — keep them out of every other method's compile key so
        # sweeps don't re-jit them. refresh_mask VALUES are runtime data
        # (traced argument): only presence/absence is in the key, so any
        # number of schedules of one length share a single compile.
        if method != "ddim_cached":
            refresh_every, cache_level, forecast = 2, 1, False
            refresh_mask = None
        static_mask = None
        if refresh_mask is not None:
            mask = np.asarray(refresh_mask, bool)
            n_steps = steps or 20
            if mask.shape != (n_steps,):
                raise ValueError(
                    f"refresh_mask must have length steps={n_steps}, "
                    f"got shape {mask.shape}")
            if not mask[0]:
                raise ValueError(
                    "refresh_mask[0] must be True — no cached trunk exists "
                    "yet")
            if forecast:
                raise ValueError("forecast is not supported with "
                                 "refresh_mask")
            if refresh_mask_static:
                # the schedule becomes part of the compile key: the program
                # is specialized to it (runs of full/reuse scans, no
                # per-step branch — the deployment-speed path)
                static_mask, refresh_mask = tuple(bool(v) for v in mask), None
            else:
                refresh_mask = jnp.asarray(mask)
            refresh_every = 2  # ignored under a mask; normalized for the key
        key = (method, steps, legacy_noise_inversion, num_frames,
               refresh_every, cache_level, forecast,
               refresh_mask is not None, static_mask)
        if key not in self._compiled:
            self._compiled[key] = self._build(
                method, steps, legacy_noise_inversion, num_frames,
                refresh_every, cache_level, forecast,
                has_mask=refresh_mask is not None,
                static_mask=static_mask,
            )
        prompt_emb = self.prompt_embedding(sensor)
        use_params = params if params is not None else self.params
        x_init = None if x_init is None else jnp.asarray(x_init)
        step_noise = None if step_noise is None else jnp.asarray(step_noise)
        if self.mesh is not None:
            # SPMD sampling: batch over "data", image height over "space"
            # (conv halo exchange emitted by XLA); weights replicated. One
            # Pansharpener on an N-chip mesh is the multi-chip serving cell —
            # the batching engine (serve/) needs no changes.
            from tmdiff_tpu.parallel.mesh import batch_sharding, replicated

            def put(a):
                return (
                    None if a is None else jax.device_put(
                        a, batch_sharding(self.mesh, a.ndim, a.shape))
                )

            pan, ms, x_init, step_noise = map(put, (pan, ms, x_init, step_noise))
            prompt_emb = jax.device_put(prompt_emb, replicated(self.mesh))
            if refresh_mask is not None:
                refresh_mask = jax.device_put(
                    refresh_mask, replicated(self.mesh))
            if params is None:
                if self._replicated_params is None:
                    self._replicated_params = jax.device_put(
                        self.params, replicated(self.mesh))
                use_params = self._replicated_params
            else:
                use_params = jax.device_put(params, replicated(self.mesh))
        out = self._compiled[key](
            use_params, pan, ms, prompt_emb, seed, x_init, step_noise,
            # scalar, or per-sample (B,) guidance (mixed-scale co-batching);
            # traced either way — scalar↔vector is the only retrace boundary
            jnp.asarray(guidance, jnp.float32),
            refresh_mask,
        )
        if method == "ancestral" and num_frames:
            final, frames = out
            return np.asarray(final), np.asarray(frames)
        return np.asarray(out)

    def sample_tiled(
        self,
        batch: dict,
        sensor="QB",
        tile: int = 256,
        overlap: int = 32,
        tile_batch: int = 8,
        **kw,
    ):
        """Pansharpen scenes LARGER than the compiled tile size.

        The reference handles big scenes only offline (16→1 patch
        merge/split utilities, `LRHR_dataset.py:28-53,136-178`); here the
        scene is split into overlapping `tile`×`tile` crops, each crop runs
        through the NORMAL compiled sampler (`tile_batch` crops per device
        batch — one compiled program regardless of scene size), and crops
        are blended with a separable linear feather over the overlap, then
        normalised by the accumulated weights (scene borders come out
        exactly). A scene that already fits one tile reproduces `sample()`
        bitwise. Diffusion noise is drawn per-crop (seed folded by tile
        index), so overlapping crops disagree only within the feathered
        band — `overlap` ≥ the UNet's receptive-field halo keeps seams
        below the sampler's own noise floor.
        """
        pan = np.asarray(batch["PAN"], np.float32)
        ms = np.asarray(batch["MS"], np.float32)
        B, C, H, W = ms.shape
        if H <= tile and W <= tile:
            return self.sample(batch, sensor=sensor, **kw)
        if not 0 <= overlap < tile:
            raise ValueError(f"need 0 <= overlap={overlap} < tile={tile}")
        if H < tile or W < tile:
            # one long dimension: edge-pad the short one up to a full tile,
            # tile normally, crop back
            padH, padW = max(0, tile - H), max(0, tile - W)
            spec = ((0, 0), (0, 0), (0, padH), (0, padW))
            full = self.sample_tiled(
                {"PAN": np.pad(pan, spec, mode="edge"),
                 "MS": np.pad(ms, spec, mode="edge")},
                sensor=sensor, tile=tile, overlap=overlap,
                tile_batch=tile_batch, **kw,
            )
            return full[:, :, :H, :W]

        def starts(size):
            if size <= tile:
                return [0]
            stride = tile - overlap
            ss = list(range(0, size - tile, stride))
            ss.append(size - tile)  # last tile flush with the border
            return ss

        ys, xs = starts(H), starts(W)
        # separable feather: linear ramp over the overlap at each tile edge
        ramp = np.minimum(np.arange(1, tile + 1),
                          np.arange(tile, 0, -1)).astype(np.float32)
        ramp = np.minimum(ramp, max(overlap, 1))
        win = ramp[:, None] * ramp[None, :]  # (tile, tile)

        out = np.zeros((B, C, H, W), np.float32)
        wsum = np.zeros((H, W), np.float32)
        crops = [(y, x) for y in ys for x in xs]
        seed0 = int(kw.pop("seed", 0))
        # A per-sample (B,) guidance vector must follow the batch tiling:
        # crops are stacked len(chunk)·B per device batch, so replicate the
        # vector per crop (a scalar passes through untouched).
        guidance = kw.pop("guidance", None)
        per_sample_guidance = (
            guidance is not None and np.ndim(guidance) > 0)
        if per_sample_guidance and len(np.atleast_1d(guidance)) != B:
            raise ValueError(
                f"per-sample guidance has {len(np.atleast_1d(guidance))} "
                f"entries but the scene batch is {B}")
        for c0 in range(0, len(crops), tile_batch):
            chunk = crops[c0:c0 + tile_batch]
            n_real = len(chunk)
            if len(crops) > tile_batch and n_real < tile_batch:
                # pad the final short chunk to the full device batch so the
                # whole scene runs through ONE compiled program
                chunk = chunk + [chunk[-1]] * (tile_batch - n_real)
            pan_t = np.concatenate(
                [pan[:, :, y:y + tile, x:x + tile] for y, x in chunk])
            ms_t = np.concatenate(
                [ms[:, :, y:y + tile, x:x + tile] for y, x in chunk])
            sensors = (
                sensor if isinstance(sensor, str)
                else list(sensor) * len(chunk))
            g_kw = {}
            if guidance is not None:
                g_kw["guidance"] = (
                    np.tile(np.atleast_1d(guidance), len(chunk))
                    if per_sample_guidance else guidance)
            preds = self.sample(
                {"PAN": pan_t, "MS": ms_t}, sensor=sensors,
                seed=seed0 + c0, **g_kw, **kw,
            )
            for i, (y, x) in enumerate(chunk[:n_real]):
                out[:, :, y:y + tile, x:x + tile] += (
                    preds[i * B:(i + 1) * B] * win)
            # weights are batch/channel-independent
            for y, x in chunk[:n_real]:
                wsum[y:y + tile, x:x + tile] += win
        return out / wsum
