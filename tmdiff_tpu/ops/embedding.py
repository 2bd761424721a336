"""Sinusoidal timestep embeddings.

Matches the reference `gamma_embedding`
(`/root/reference/GeneralModel/Hyper_unet_general.py:80-97`): frequencies
exp(-log(10000)·k/half) for k < half, embedding = [cos(t·f), sin(t·f)],
zero-padded when dim is odd.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def gamma_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """(N,) fractional timesteps → (N, dim) sinusoidal embedding."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb
