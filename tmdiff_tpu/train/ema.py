"""Exponential moving average of parameters, as a pure pytree transform.

Reference semantics (`/root/reference/utils/EmaUpdater.py:23-38`): while
iteration ≤ start_iter the EMA copies the online params verbatim; afterwards
ema = decay·ema + (1−decay)·params with decay 0.9999. The reference keeps the
EMA in a second full DDPM instance and never wires it into the shipped entry
script; here it is a first-class trainer feature (one extra param pytree in
the train state, updated inside the jitted step).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, step, decay: float = 0.9999,
               start_iter: int = 0):
    """One EMA step; `step` may be a traced scalar."""
    factor = jnp.where(step > start_iter, decay, 0.0)
    return jax.tree.map(
        lambda e, p: e * factor + p * (1.0 - factor), ema_params, params
    )
