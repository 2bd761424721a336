"""Pallas TPU 3×3 SAME conv (NHWC) — the band-into-lanes workhorse shape.

XLA's conv at the model's dominant shapes ((8,256,256,256)→256,
(8,128,128,512)→512 after band-folding) measures ~87 TFLOP/s (44% of v5e
peak; benchmarks/conv_probe.py). This kernel expresses the conv as 9
accumulated MXU matmuls over an H-strip held in VMEM:

    y[i·bh:(i+1)·bh, :, :] = Σ_{dy,dx} strip[dy:dy+bh, dx:dx+W, :] @ W[dy,dx]

The strip is the block's bh rows of the (H+2, W+2)-padded input plus a
2-row halo; rather than manual DMA, the halo rows are pre-gathered into a
small side tensor (2/bh duplication) so both stream through ordinary
BlockSpec pipelining. fp32 accumulation, bf16-friendly inputs.

Used by ops/modconv.py's band-into-lanes lowering when
TMDIFF_BANDLANES_CONV=pallas.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xm_ref, xh_ref, w_ref, o_ref, *, bh, w_out):
    strip = jnp.concatenate([xm_ref[0], xh_ref[0, 0]], axis=0)  # (bh+2, W+2, C)
    cout = w_ref.shape[-1]
    acc = jnp.zeros((bh * w_out, cout), jnp.float32)
    for dy in range(3):
        rows = strip[dy : dy + bh]  # (bh, W+2, C)
        for dx in range(3):
            patch = rows[:, dx : dx + w_out, :].reshape(bh * w_out, -1)
            acc = acc + jax.lax.dot(
                patch, w_ref[dy, dx], preferred_element_type=jnp.float32
            )
    o_ref[0] = acc.reshape(bh, w_out, cout).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_h", "interpret"))
def conv3x3_nhwc(
    x: jax.Array,
    w: jax.Array,
    block_h: int = 8,
    interpret: bool | None = None,
):
    """SAME/stride-1 3×3 conv: x (B, H, W, C), w (3, 3, C, Cout).

    H must be divisible by `block_h`. Designed for C, Cout ≥ 128 (the MXU
    shapes the band-folded model produces); correctness holds for any size.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w_in, c = x.shape
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3) and cin == c
    assert h % block_h == 0, (h, block_h)
    bh = block_h

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # (B, H+2, W+2, C)
    n_strips = h // bh
    # Halo: rows [i·bh + bh, i·bh + bh + 2) of xp for each strip i — gathered
    # by padding the tail to a multiple of bh and strided-reshaping.
    rows_after = jnp.pad(
        xp[:, bh:], ((0, 0), (0, bh - 2), (0, 0), (0, 0))
    )  # (B, n_strips·bh, W+2, C)
    halo = rows_after.reshape(b, n_strips, bh, w_in + 2, c)[:, :, :2]

    out = pl.pallas_call(
        functools.partial(_kernel, bh=bh, w_out=w_in),
        out_shape=jax.ShapeDtypeStruct((b, h, w_in, cout), x.dtype),
        grid=(b, n_strips),
        in_specs=[
            pl.BlockSpec((1, bh, w_in + 2, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, w_in + 2, c), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, cout), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w_in, cout), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, halo, w)
    return out
