"""Dynamic (CondConv / DyConv) convolutions.

Reference: `/root/reference/core/dynamic_conv.py` — a softmax-over-K gate
(global-avg-pool → 2 pointwise convs → softmax with an annealed temperature,
`attention1d/2d/3d:6,99,194`) mixes K candidate kernels per sample, executed
as a batch-grouped conv with aggregated weights (`Dynamic_conv3d:220-268`).

TPU form: the conv is linear in its weights, so per-sample kernel mixing is
exactly the per-sample mixing of K *shared-kernel conv outputs*:

    conv(x_b, Σ_k a_bk W_k) = Σ_k a_bk conv(x_b, W_k)

K large batched convs on the MXU (K is small, typically 4) replace a
groups=batch conv that XLA cannot tile. Bias mixes the same way.

The temperature is a call argument rather than mutated module state — anneal
it from the training loop (reference `updata_temperature:32-35` subtracts 3
per epoch from 34 down to 1).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class _KernelGate(nn.Module):
    """softmax(fc2(relu(fc1(gap(x)))) / temperature) over K kernels."""

    num_kernels: int
    ratio: float = 0.25

    @nn.compact
    def __call__(self, x, temperature: float = 1.0):
        # x: (B, *spatial, C); global average pool over spatial dims.
        c = x.shape[-1]
        pooled = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))
        hidden = self.num_kernels if c == 3 else int(c * self.ratio) + 1
        h = nn.Dense(hidden, use_bias=False, name="fc1")(pooled)
        h = jax.nn.relu(h)
        h = nn.Dense(self.num_kernels, use_bias=False, name="fc2")(h)
        return jax.nn.softmax(h / temperature, axis=-1)


class DynamicConv(nn.Module):
    """Rank-agnostic dynamic conv: kernel_size length selects 1-D/2-D/3-D.

    Input (B, *spatial, Cin) channels-last; returns (B, *spatial', Cout).
    """

    features: int
    kernel_size: Sequence[int]
    num_kernels: int = 4
    ratio: float = 0.25
    stride: int = 1
    padding: str = "SAME"
    use_bias: bool = True
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x, temperature: float = 1.0):
        cin = x.shape[-1]
        k = self.num_kernels
        gate = _KernelGate(k, self.ratio, name="attention")(x, temperature)  # (B, K)
        kernels = self.param(
            "kernels",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (k, *self.kernel_size, cin // self.feature_group_count, self.features),
            jnp.float32,
        )
        strides = (self.stride,) * len(self.kernel_size)

        def one(kernel):
            return jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype),
                window_strides=strides,
                padding=self.padding,
                dimension_numbers=_dim_numbers(len(self.kernel_size)),
                feature_group_count=self.feature_group_count,
            )

        outs = jax.vmap(one)(kernels)  # (K, B, *spatial', Cout)
        gate_b = gate.T.reshape(k, -1, *([1] * (outs.ndim - 2)))
        out = jnp.sum(outs * gate_b.astype(outs.dtype), axis=0)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (k, self.features), jnp.float32
            )
            out = out + jnp.einsum("bk,kf->bf", gate, bias).reshape(
                gate.shape[0], *([1] * (out.ndim - 2)), self.features
            ).astype(out.dtype)
        return out


def _dim_numbers(rank: int):
    spatial = "DHW"[-rank:]
    return (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C")


class DynamicConv1d(DynamicConv):
    pass


class DynamicConv2d(DynamicConv):
    pass


class DynamicConv3d(DynamicConv):
    pass


def anneal_temperature(temperature: float, step_delta: int = 1,
                       rate: float = 3.0, floor: float = 1.0) -> float:
    """Reference annealing: subtract 3 per epoch until 1 (`:32-35`)."""
    return max(floor, temperature - rate * step_delta)
