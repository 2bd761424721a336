"""Diffusion noise schedules and derived tables.

Semantics pinned against the reference
(`/root/reference/GeneralModel/diffusion_general.py:29-132`):

  * ``linear``: scale = 1000/T, betas = linspace(scale·1e-6, scale·1e-2, T).
  * ``cosine``: betas_for_alpha_bar with ᾱ(t) = cos((t+0.008)/1.008 · π/2)²,
    clipped at max_beta = 0.999.
  * ``sqrt_alphas_cumprod_prev`` is the length-(T+1) table
    √(append(1, ᾱ₁..ᾱ_T)) — index t ∈ [1, T] gives √ᾱ_t; index 0 gives 1.
    Training indexes it with integer timesteps drawn from [1, T]
    (`diffusion_general.py:349-366`).

Everything here is pure numpy computed once at schedule construction (fp64),
then exposed as fp32 jnp constants that XLA folds into the compiled program —
unlike the reference, nothing is rebuilt in the hot loop.
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


def make_beta_schedule(schedule: str, n_timestep: int) -> np.ndarray:
    if schedule == "linear":
        scale = 1000.0 / n_timestep
        return np.linspace(scale * 1e-6, scale * 1e-2, n_timestep, dtype=np.float64)
    if schedule == "cosine":
        return betas_for_alpha_bar(
            n_timestep, lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        )
    raise NotImplementedError(schedule)


def betas_for_alpha_bar(n: int, alpha_bar, max_beta: float = 0.999) -> np.ndarray:
    betas = []
    for i in range(n):
        t1 = i / n
        t2 = (i + 1) / n
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Precomputed diffusion tables (all fp32 jnp arrays, length T unless noted)."""

    num_timesteps: int
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    # Length T+1: index t ∈ [0, T], √ᾱ_t with ᾱ_0 := 1.
    sqrt_alphas_cumprod_prev: jnp.ndarray

    @classmethod
    def create(cls, schedule: str = "cosine", n_timestep: int = 1000) -> "NoiseSchedule":
        betas = make_beta_schedule(schedule, n_timestep)
        alphas = 1.0 - betas
        acp = np.cumprod(alphas, axis=0)
        acp_prev = np.append(1.0, acp[:-1])
        posterior_variance = betas * (1.0 - acp_prev) / (1.0 - acp)
        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls(
            num_timesteps=int(n_timestep),
            betas=f32(betas),
            alphas_cumprod=f32(acp),
            alphas_cumprod_prev=f32(acp_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(acp)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - acp)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / acp)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / acp - 1.0)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(
                np.log(np.maximum(posterior_variance, 1e-20))
            ),
            posterior_mean_coef1=f32(betas * np.sqrt(acp_prev) / (1.0 - acp)),
            posterior_mean_coef2=f32(
                (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)
            ),
            sqrt_alphas_cumprod_prev=f32(np.sqrt(np.append(1.0, acp))),
        )
