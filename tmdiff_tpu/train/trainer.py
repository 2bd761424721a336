"""Training loop: jitted SPMD train step, AdamW + warmup-linear schedule, EMA.

Reference contract (`/root/reference/GeneralModel/model.py:14-47`):
AdamW(lr, weight_decay=1e-4) over all non-CLIP params, HF "linear" schedule
(100 warmup steps, decay to zero at max_iter), loss = L1 on the residual,
one optimizer step per batch. The CLIP tower never enters the param tree
here (prompt embeddings are precomputed constants), so no filtering is
needed.

TPU-native deltas:
  * the whole step (loss, grads, optimizer, EMA) is ONE jitted SPMD program
    over the ("data", "space") mesh with donated state — no per-step Python
    between forward and update, no DataParallel scatter/gather;
  * timestep/noise randomness comes from a threaded `jax.random` key derived
    from the step counter (deterministic resume);
  * optional bfloat16 compute via the model's dtype with fp32 params/optim.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from tmdiff_tpu.diffusion import gaussian
from tmdiff_tpu.diffusion.schedules import NoiseSchedule
from tmdiff_tpu.parallel import mesh as mesh_lib
from tmdiff_tpu.train.ema import ema_update


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any


def hf_linear_schedule(base_lr: float, warmup_steps: int, total_steps: int):
    """HF transformers get_scheduler("linear") semantics: linear 0→lr over
    `warmup_steps`, then linear lr→0 at `total_steps`."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = (total_steps - step) / jnp.maximum(1.0, total_steps - warmup_steps)
        return base_lr * jnp.clip(jnp.minimum(warm, decay), 0.0, 1.0)

    return fn


@dataclasses.dataclass
class Trainer:
    """Owns the optimizer, the jitted step, and the mesh placement."""

    model: Any  # flax Module: apply(params, x_t, t, pan, ms, prompt, train=)
    schedule: NoiseSchedule
    lr: float = 1e-4
    weight_decay: float = 1e-4
    warmup_steps: int = 100
    max_iter: int = 300_000
    loss_type: str = "l1"
    ema_decay: float = 0.9999
    ema_start: int = 0
    grad_clip: Optional[float] = None
    # Per-sample probability of zeroing the MS conditioning (classifier-free
    # guidance training). The reference ships this as an orphaned helper
    # (`diffusion_general.py:385-397`, zero callers) and consequently its CFG
    # sampler extrapolates garbage (BASELINE.md sampler zoo); >0 here makes
    # `method="dpm++_cfg"` actually work.
    p_uncond: float = 0.0
    mesh: Optional[Any] = None  # jax.sharding.Mesh
    seed: int = 3407
    # Rematerialise the model in the backward pass: ~halves activation HBM
    # at 256² (recompute is cheap next to conv FLOPs), and — on the dev TPU
    # tunnel — restructures the backward HLO so the remote-compile helper
    # doesn't SIGILL (benchmarks/train_bisect.py). Default on.
    remat: bool = True

    def __post_init__(self):
        self.lr_fn = hf_linear_schedule(self.lr, self.warmup_steps, self.max_iter)
        chain = []
        if self.grad_clip:
            chain.append(optax.clip_by_global_norm(self.grad_clip))
        chain.append(
            optax.adamw(learning_rate=self.lr_fn, weight_decay=self.weight_decay)
        )
        self.tx = optax.chain(*chain)
        if self.mesh is None:
            self.mesh = mesh_lib.make_mesh()
        from tmdiff_tpu.ops.modconv import check_spmd_lowering

        check_spmd_lowering(self.mesh)
        self._jit_step = None

    # -- state ---------------------------------------------------------------

    def init_state(self, sample_batch: dict, prompt_emb) -> TrainState:
        rng = jax.random.key(self.seed)
        res = jnp.asarray(sample_batch["Res"])
        params = self.model.init(
            rng,
            res,
            jnp.ones((res.shape[0],), jnp.int32),
            jnp.asarray(sample_batch["PAN"]),
            jnp.asarray(sample_batch["MS"]),
            jnp.asarray(prompt_emb),
        )
        params = jax.device_put(params, mesh_lib.replicated(self.mesh))
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
            # Materialise a distinct buffer: ema aliasing params would make
            # the donated jitted step donate the same buffer twice.
            ema_params=jax.tree.map(lambda x: x.copy(), params),
        )
        return jax.device_put(state, mesh_lib.replicated(self.mesh))

    def state_from_params(self, params) -> TrainState:
        """TrainState seeded from EXISTING params (a teacher/checkpoint
        pytree) — fresh optimizer and EMA state, no model.init trace (which
        costs a full-model compile per call on the TPU tunnel). Buffers are
        copied so the donated step never sees aliased inputs."""
        params = jax.device_put(
            jax.tree.map(lambda x: jnp.asarray(x).copy(), params),
            mesh_lib.replicated(self.mesh),
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
            ema_params=jax.tree.map(lambda x: x.copy(), params),
        )
        return jax.device_put(state, mesh_lib.replicated(self.mesh))

    # -- the step ------------------------------------------------------------

    def _loss_fn(self, params, rng, batch, prompt_emb):
        def apply(p, x, t, pan, ms, emb):
            # static kwargs closed over: jax.checkpoint traces every explicit
            # argument (a bare `train=True` would become a tracer).
            return self.model.apply(
                p, x, t, pan, ms, emb,
                train=True, rngs={"dropout": jax.random.fold_in(rng, 1)},
            )

        if self.remat:
            apply = jax.checkpoint(apply)

        def denoise(x, t, pan, ms):
            return apply(params, x, t, pan, ms, prompt_emb)

        ms = batch["MS"]
        if self.p_uncond > 0.0:
            ms = gaussian.cfg_dropout_condition(
                jax.random.fold_in(rng, 2), ms, self.p_uncond, per_sample=True
            )
        return gaussian.diffusion_loss(
            denoise, self.schedule, jax.random.fold_in(rng, 0),
            batch["Res"], batch["PAN"], ms, self.loss_type,
        )

    def _step(self, state: TrainState, batch: dict, prompt_emb, *extra):
        rng = jax.random.fold_in(jax.random.key(self.seed), state.step)
        loss, grads = jax.value_and_grad(self._loss_fn)(
            state.params, rng, batch, prompt_emb, *extra
        )
        updates, opt_state = self.tx.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        step = state.step + 1
        ema = ema_update(
            state.ema_params, params, step, self.ema_decay, self.ema_start
        )
        metrics = {
            "l_pix": loss,
            "lr": self.lr_fn(state.step),
            "grad_norm": optax.global_norm(grads),
        }
        return (
            TrainState(step=step, params=params, opt_state=opt_state, ema_params=ema),
            metrics,
        )

    def compiled_step(self):
        if self._jit_step is None:
            self._jit_step = jax.jit(self._step, donate_argnums=(0,))
        return self._jit_step

    def train_step(self, state: TrainState, batch: dict, prompt_emb, *extra):
        """One optimization step; `batch` is a host numpy dict. `*extra` is
        forwarded to `_loss_fn` (subclass hook — e.g. DistillTrainer threads
        the teacher params through the jit boundary instead of closing over
        them, which would bake them into the executable as constants)."""
        device_batch = mesh_lib.shard_batch(self.mesh, {
            k: batch[k] for k in ("Res", "PAN", "MS")
        })
        return self.compiled_step()(
            state, device_batch, jnp.asarray(prompt_emb), *extra)
