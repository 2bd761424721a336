"""Deep-image-prior style utilities.

Parity surface: `/root/reference/utils/common_utils.py` (`get_noise:59`,
`optimize:96`, `tv_loss:34`) and `utils/sr_utils.py` — unused leftovers in
the reference, provided here as small working library functions.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def get_noise(
    rng: jax.Array,
    shape: tuple,
    method: str = "noise",
    noise_type: str = "u",
    var: float = 1.0 / 10,
):
    """Input tensor for DIP optimisation: random noise or a meshgrid."""
    if method == "noise":
        if noise_type == "u":
            return jax.random.uniform(rng, shape) * var
        return jax.random.normal(rng, shape) * var
    if method == "meshgrid":
        b, h, w, c = shape
        yy, xx = jnp.meshgrid(
            jnp.linspace(0, 1, h), jnp.linspace(0, 1, w), indexing="ij"
        )
        grid = jnp.stack([xx, yy], axis=-1)
        return jnp.broadcast_to(grid[None], (b, h, w, 2))
    raise ValueError(method)


def tv_loss(x: jnp.ndarray, beta: float = 0.5):
    """Total variation over (B, H, W, C)."""
    dh = (x[:, 1:, :-1] - x[:, :-1, :-1]) ** 2
    dw = (x[:, :-1, 1:] - x[:, :-1, :-1]) ** 2
    return jnp.sum((dh + dw) ** beta)


def optimize(
    loss_fn: Callable,
    params,
    num_iter: int = 100,
    lr: float = 1e-2,
    optimizer: str = "adam",
):
    """Simple optax loop (the reference's adam/LBFGS closure driver)."""
    tx = {"adam": optax.adam(lr), "sgd": optax.sgd(lr)}[optimizer]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for _ in range(num_iter):
        params, opt_state, loss = step(params, opt_state)
    return params, loss
