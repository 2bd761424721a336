"""Progressive distillation: halve the sampler NFE while keeping quality.

Beyond-reference capability (nothing like it exists in
`/root/reference` — its cheapest quality path is the 30(+1)-NFE DPM-Solver++
run, `GeneralModel/diffusion_general.py:227-255`): following Salimans & Ho,
"Progressive Distillation for Fast Sampling of Diffusion Models" (ICLR 2022),
an N-step deterministic (DDIM) student is trained so that ONE of its jumps
lands where TWO jumps of a 2N-step teacher land. Each phase halves NFE;
sampling throughput is denoise-bound (BASELINE.md), so img/s scales ≈ 30/N.

Mechanics (x0-parameterisation, matching this framework's training
objective):

  * student grid: model times t_i = i·(T/N), i ∈ [1, N]; requires
    T % 2N == 0 so the teacher's half-jumps stay on integer times.
  * target: run the teacher twice (t → t−T/2N → t−T/N with `ddim_jump`),
    then solve the one-jump equation for the x0 the student must predict:

        x̃0 = (x_{t''} − (σ_{t''}/σ_t)·x_t) / (α_{t''} − (σ_{t''}/σ_t)·α_t)

    (`progressive_target`). A perfect teacher with a consistent x0 field
    yields x̃0 = x0 exactly — pinned by tests/test_distill.py.
  * loss: truncated-SNR-weighted pixel loss max(α²/σ², 1)·‖x̂0 − x̃0‖
    (the paper's recommended weighting for x-prediction), student in train
    mode, teacher frozen (params threaded through the jit boundary as an
    argument — see Trainer.train_step's `*extra` hook).

The whole phase step (2 teacher forwards + student grad + AdamW + EMA) is
ONE jitted SPMD program over the ("data","space") mesh, like Trainer's.
Drive phases with `tools/distill_eval.py`; score students with
`Pansharpener.sample(method="ddim", steps=N)`.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tmdiff_tpu.diffusion import gaussian
from tmdiff_tpu.diffusion.schedules import NoiseSchedule
from tmdiff_tpu.train.trainer import Trainer


def progressive_target(ns: NoiseSchedule, x_t, x_t2, t, t2):
    """Solve one DDIM jump t → t2 for the implied x0 target given the
    endpoint x_{t2} (produced by two teacher half-jumps): the x0 a one-jump
    student must predict to land exactly on x_{t2}. `t` (B,) ints ≥ 1,
    `t2` (B,) ints ≥ 0. Denominator α_{t2} − (σ_{t2}/σ_t)·α_t is strictly
    positive (α decreases, σ grows with model time)."""
    bshape = (-1,) + (1,) * (x_t.ndim - 1)
    a = lambda u: jnp.reshape(ns.sqrt_alphas_cumprod_prev[u], bshape)
    sigma = lambda au: jnp.sqrt(jnp.maximum(1.0 - au * au, 0.0))
    a_t, a_2 = a(t), a(t2)
    ratio = sigma(a_2) / jnp.maximum(sigma(a_t), 1e-12)
    return (x_t2 - ratio * x_t) / (a_2 - ratio * a_t)


@dataclasses.dataclass
class DistillTrainer(Trainer):
    """Trainer whose loss is the progressive-distillation objective.

    `n_student_steps` is this phase's N; the teacher is an (N·2)-step-capable
    model — either the original all-t model or the previous phase's student.
    Teacher params are passed per-call:
    `train_step(state, batch, emb, teacher_params)`.
    """

    n_student_steps: int = 5
    snr_weight: bool = True  # max(SNR, 1) weighting (paper §4, x-prediction)

    def __post_init__(self):
        super().__post_init__()
        T, N = self.schedule.num_timesteps, self.n_student_steps
        if T % (2 * N):
            raise ValueError(
                f"T={T} must be divisible by 2·N={2 * N} so teacher "
                "half-jumps stay on integer model times")

    def _loss_fn(self, params, rng, batch, prompt_emb, teacher_params):
        ns, N = self.schedule, self.n_student_steps
        seg = ns.num_timesteps // N
        res = batch["Res"]
        pan, ms = batch["PAN"], batch["MS"]
        b = res.shape[0]
        bshape = (-1,) + (1,) * (res.ndim - 1)

        rng_i, rng_noise = jax.random.split(jax.random.fold_in(rng, 0))
        i = jax.random.randint(rng_i, (b,), 1, N + 1)
        t = i * seg
        t1 = t - seg // 2
        t2 = t - seg

        a = lambda u: jnp.reshape(ns.sqrt_alphas_cumprod_prev[u], bshape)
        noise = jax.random.normal(rng_noise, res.shape, res.dtype)
        x_t = gaussian.q_sample(res, a(t), noise)

        def teacher(x, u):
            out = self.model.apply(teacher_params, x, u, pan, ms, prompt_emb)
            return gaussian.clip_x0(out, "static")

        x_t1 = gaussian.ddim_jump(ns, x_t, teacher(x_t, t), t, t1)
        x_t2 = gaussian.ddim_jump(ns, x_t1, teacher(x_t1, t1), t1, t2)
        target = jax.lax.stop_gradient(
            progressive_target(ns, x_t, x_t2, t, t2))

        def student_apply(p, x, u, pan_, ms_, emb):
            return self.model.apply(
                p, x, u, pan_, ms_, emb,
                train=True, rngs={"dropout": jax.random.fold_in(rng, 1)},
            )

        if self.remat:
            student_apply = jax.checkpoint(student_apply)
        x0_hat = student_apply(params, x_t, t, pan, ms, prompt_emb)

        if self.snr_weight:
            a_t = a(t)
            snr = a_t * a_t / jnp.maximum(1.0 - a_t * a_t, 1e-12)
            w = jnp.maximum(snr, 1.0)
        else:
            w = 1.0
        err = (
            jnp.abs(x0_hat - target) if self.loss_type == "l1"
            else jnp.square(x0_hat - target)
        )
        return jnp.mean(w * err)
