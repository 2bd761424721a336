"""Pallas TPU fused band-banded 3-D conv (the VERDICT r3 #1 experiment).

The model's hot op is a 3×3×3 conv over (B, D, H, W, C) with the spectral
band axis as depth (reference `Hyper_unet_general.py:51-77`). The shipped
`bandlanes` lowering (ops/modconv.py) folds all D bands into MXU lanes —
full 128-lane tiles but D/kd× the algorithmic FLOPs (2.67× at D=8). The
XLA `bandtiles` variant cut that to (tile_d+2)/kd× by tiling output bands,
but lost more to per-tile concat/transpose fusion breaks than it gained
(BASELINE.md r2). This kernel runs the band-tile loop *inside* one Pallas
program so nothing intermediate touches HBM:

  * input strip (bh+2 rows of the spatially-padded image, ALL depth lanes)
    lives in VMEM once per (batch, strip) grid step;
  * for each output band tile t (tile_d bands · Cout = 128 lanes), the
    kernel lane-slices the tile's span = tile_d + 2·pad input bands out of
    the strip and accumulates the 9 spatial-tap MXU matmuls
    (M = bh·W, K = span·Cin, N = tile_d·Cout);
  * the banded weight block is the SAME for every tile (band structure is
    translation-invariant once the depth axis is zero-padded), so one
    (3, 3, span·Cin, tile_d·Cout) tensor stays resident in VMEM.

Executed-FLOP inflation is span/kd — 2.0× at Cout=32 (tile_d=4) and 1.33×
at Cout=64 (tile_d=2) vs bandlanes' 2.67× at D=8. Whether that converts to
wall-clock (Mosaic may pad K=192 lanes up to 256 at the Cout=32 level, and
the kernel must match XLA's ~109 TFLOP/s conv rate) is settled by
measurement in benchmarks/banded_conv_bench.py — results in BASELINE.md.

Gradient support: `banded_conv3d` carries a custom VJP whose backward runs
the mathematically-identical XLA lowering (`_conv3d_fold2d` reference
semantics via lax), so the kernel is safe under jax.grad without a
hand-written transpose kernel.

Not SPMD-partitionable: pallas_call is opaque to the XLA sharding
propagator. ops/modconv.py only selects this lowering when explicitly
enabled (TMDIFF_CONV3D_IMPL=banded) — single-device jit paths only.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def eligible(d, kd, kh, kw, h, w, cout, block_h: int = 8) -> bool:
    """Shapes this kernel handles AND expects to win at: 3×3×3 windows,
    lane-starved Cout (<128, dividing 128), more bands than one tile, and
    an H divisible by the strip height."""
    return (
        (kd, kh, kw) == (3, 3, 3)
        and cout < 128
        and 128 % cout == 0
        and d > 128 // cout  # tile_d < d, else bandlanes already optimal
        and h % block_h == 0
        and h >= 3
        and w >= 3
    )


def _kernel(xm_ref, xh_ref, w_ref, o_ref, *, bh, w_out, n_tiles,
            tile_cin, span_cin, tile_cout):
    strip = jnp.concatenate([xm_ref[0], xh_ref[0, 0]], axis=0)  # (bh+2, W+2, L)
    for t in range(n_tiles):
        off = t * tile_cin
        sub = strip[:, :, off : off + span_cin]  # (bh+2, W+2, span·Cin)
        acc = jnp.zeros((bh * w_out, tile_cout), jnp.float32)
        for dy in range(3):
            rows = sub[dy : dy + bh]
            for dx in range(3):
                patch = rows[:, dx : dx + w_out, :].reshape(bh * w_out, -1)
                acc = acc + jax.lax.dot(
                    patch, w_ref[dy, dx], preferred_element_type=jnp.float32
                )
        o_ref[0, :, :, t * tile_cout : (t + 1) * tile_cout] = (
            acc.reshape(bh, w_out, tile_cout).astype(o_ref.dtype))


def _banded_weight(kernel: jax.Array, tile_d: int) -> jax.Array:
    """(kd, kh, kw, Cin, Cout) → the shared per-tile banded block
    (kh, kw, span·Cin, tile_d·Cout): local input band j feeds local output
    band o through spatial tap K[j − o] when 0 ≤ j − o < kd, else zero."""
    import numpy as np

    kd, kh, kw, cin, cout = kernel.shape
    pad = kd // 2
    span = tile_d + 2 * pad
    j = np.arange(span)[:, None]
    o = np.arange(tile_d)[None, :]
    idx = j - o
    valid = (0 <= idx) & (idx < kd)
    kg = kernel[np.clip(idx, 0, kd - 1)]  # (span, tile_d, kh, kw, cin, cout)
    kg = kg * jnp.asarray(valid, kernel.dtype)[:, :, None, None, None, None]
    return kg.transpose(2, 3, 0, 4, 1, 5).reshape(
        kh, kw, span * cin, tile_d * cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def banded_conv3d(x: jax.Array, kernel: jax.Array,
                  block_h: int = 8, interpret: bool | None = None):
    """SAME/stride-1 3-D conv, band-tiled inside one Pallas kernel.

    Args:
      x: (B, D, H, W, Cin) activations (band-as-depth layout).
      kernel: (3, 3, 3, Cin, Cout) weights; Cout must divide 128 and be <128.
    Returns (B, D, H, W, Cout).
    """
    return _forward(x, kernel, block_h, interpret)


def _forward(x, kernel, block_h, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, d, h, w, c = x.shape
    kd, kh, kw, cin, cout = kernel.shape
    assert eligible(d, kd, kh, kw, h, w, cout, block_h), (
        "shape not eligible for the banded kernel; route via ops.modconv")
    pad = kd // 2
    tile_d = 128 // cout
    n_tiles = -(-d // tile_d)
    d_pad = n_tiles * tile_d
    span = tile_d + 2 * pad
    # depth: pad to [pad | d (+tail) | pad] so every tile slices a valid
    # span and the banded weight block is tile-invariant; spatial: SAME pad
    xt = x.transpose(0, 2, 3, 1, 4)  # (B, H, W, D, C)
    xt = jnp.pad(xt, ((0, 0), (1, 1), (1, 1),
                      (pad, d_pad - d + pad), (0, 0)))
    L = (d_pad + 2 * pad) * cin
    xp = xt.reshape(b, h + 2, w + 2, L)

    bh = block_h
    n_strips = h // bh
    rows_after = jnp.pad(
        xp[:, bh:], ((0, 0), (0, bh - 2), (0, 0), (0, 0)))
    halo = rows_after.reshape(b, n_strips, bh, w + 2, L)[:, :, :2]

    wt = _banded_weight(kernel, tile_d).astype(x.dtype)

    out = pl.pallas_call(
        functools.partial(
            _kernel, bh=bh, w_out=w, n_tiles=n_tiles,
            tile_cin=tile_d * cin, span_cin=span * cin,
            tile_cout=tile_d * cout),
        out_shape=jax.ShapeDtypeStruct((b, h, w, d_pad * cout), x.dtype),
        grid=(b, n_strips),
        in_specs=[
            pl.BlockSpec((1, bh, w + 2, L), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, w + 2, L), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, kw, span * cin, tile_d * cout),
                         lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w, d_pad * cout),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, halo, wt)
    out = out.reshape(b, h, w, d_pad, cout)[:, :, :, :d]
    return out.transpose(0, 3, 1, 2, 4)


def _kernel_v2(xm_ref, xh_ref, w_ref, o_ref, *, bh, w_out, tile_cout):
    strip = jnp.concatenate([xm_ref[0, 0], xh_ref[0, 0, 0]], axis=0)
    acc = jnp.zeros((bh * w_out, tile_cout), jnp.float32)
    for dy in range(3):
        rows = strip[dy : dy + bh]
        for dx in range(3):
            patch = rows[:, dx : dx + w_out, :].reshape(bh * w_out, -1)
            acc = acc + jax.lax.dot(
                patch, w_ref[dy, dx], preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(bh, w_out, tile_cout).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def banded_conv3d_v2(x: jax.Array, kernel: jax.Array,
                     block_h: int = 8, interpret: bool | None = None):
    """Variant: per-tile input slabs pre-gathered OUTSIDE the kernel (an XLA
    lane-slice stack, span/tile_d ≈ 1.5× input HBM traffic) so the kernel
    body is a dense 9-matmul strip conv with no in-kernel lane slicing —
    the v1 A/B showed Mosaic lane-shift relayouts dominating. Grid is
    (batch, band_tile, strip); each program writes one 128-lane output tile.
    """
    return _forward_v2(x, kernel, block_h, interpret)


def _forward_v2(x, kernel, block_h, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, d, h, w, c = x.shape
    kd, kh, kw, cin, cout = kernel.shape
    assert eligible(d, kd, kh, kw, h, w, cout, block_h), (
        "shape not eligible for the banded kernel; route via ops.modconv")
    pad = kd // 2
    tile_d = 128 // cout
    n_tiles = -(-d // tile_d)
    d_pad = n_tiles * tile_d
    span = tile_d + 2 * pad
    xt = x.transpose(0, 2, 3, 1, 4)
    xt = jnp.pad(xt, ((0, 0), (1, 1), (1, 1),
                      (pad, d_pad - d + pad), (0, 0)))
    xp = xt.reshape(b, h + 2, w + 2, (d_pad + 2 * pad) * cin)
    sc = span * cin
    # (B, n_tiles, H+2, W+2, span·Cin): tile t's slab = lanes [t·tile_d·Cin,
    # +span·Cin) — overlapping windows, hence the explicit gather
    slabs = jnp.stack(
        [xp[..., t * tile_d * cin : t * tile_d * cin + sc]
         for t in range(n_tiles)], axis=1)

    bh = block_h
    n_strips = h // bh
    rows_after = jnp.pad(
        slabs[:, :, bh:], ((0, 0), (0, 0), (0, bh - 2), (0, 0), (0, 0)))
    halo = rows_after.reshape(b, n_tiles, n_strips, bh, w + 2, sc)[:, :, :, :2]

    wt = _banded_weight(kernel, tile_d).astype(x.dtype)
    tc = tile_d * cout

    out = pl.pallas_call(
        functools.partial(_kernel_v2, bh=bh, w_out=w, tile_cout=tc),
        out_shape=jax.ShapeDtypeStruct((b, h, w, d_pad * cout), x.dtype),
        grid=(b, n_tiles, n_strips),
        in_specs=[
            pl.BlockSpec((1, 1, bh, w + 2, sc),
                         lambda i, t, j: (i, t, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 2, w + 2, sc),
                         lambda i, t, j: (i, t, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, kw, sc, tc), lambda i, t, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w, tc),
                               lambda i, t, j: (i, j, 0, t),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(slabs, halo, wt)
    out = out.reshape(b, h, w, d_pad, cout)[:, :, :, :d]
    return out.transpose(0, 3, 1, 2, 4)


def _fwd_v2(x, kernel, block_h, interpret):
    return _forward_v2(x, kernel, block_h, interpret), (x, kernel)


def _reference(x, kernel):
    """XLA twin used for the backward pass (same math, autodiff-friendly)."""
    return lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _fwd(x, kernel, block_h, interpret):
    return _forward(x, kernel, block_h, interpret), (x, kernel)


def _bwd(block_h, interpret, res, g):
    x, kernel = res
    _, vjp = jax.vjp(_reference, x, kernel)
    return vjp(g)


banded_conv3d.defvjp(_fwd, _bwd)
banded_conv3d_v2.defvjp(_fwd_v2, _bwd)
