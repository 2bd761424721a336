"""Per-sample weight-modulated 3-D convolution, TPU-first.

The reference implements StyleGAN-style modulated conv by materialising a
per-sample weight tensor and dispatching one grouped conv with groups=batch
(`/root/reference/GeneralModel/Hyper_unet_general.py:51-77`):
    w_b[o, i, ·] = w[o, i, ·] · s[b, i]
Because the style scales *input channels only* and the modulated call passes
no bias and no demodulation, the conv is linear in its input channel and the
op collapses analytically to

    y_b = conv(x_b ⊙ s_b, w)          (scale activations, shared weights)

which keeps a single large batched conv on the MXU instead of a batch-grouped
conv that XLA cannot tile well. `tests/test_ops.py` pins this identity
against the torch reference golden (tests/golden/modulated_conv.npz).

Layout: activations are (B, D, H, W, C) with the spectral-band axis as conv
depth D (the reference's band-as-depth 5-D layout, `Hyper_unet_general.py:120-127`)
and features C innermost (TPU lane dimension).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

import numpy as np

# (batch, spatial..., features) / (spatial..., in, out)
DIMENSION_NUMBERS_3D = ("NDHWC", "DHWIO", "NDHWC")
DIMENSION_NUMBERS_2D = ("NHWC", "HWIO", "NHWC")

# 3-D conv lowering:
#   "fold2d"    — depth(band)-axis taps become channel blocks of ONE 2-D NHWC
#                 conv with bands folded into *batch* (B·D, H, W, kd·C).
#   "bandlanes" — bands folded into *lanes* (B, H, W, D·C) with a dense
#                 block-banded (kh, kw, D·Cin, D·Cout) kernel: D/kd× the true
#                 FLOPs, but fills all 128 MXU output lanes when Cout < 128.
#   "bandtiles" — bandlanes with the output bands tiled in groups whose
#                 tile_d·Cout = 128 lanes, consuming tile_d+2 input bands
#                 (halo) each: smaller FLOP blow-up (1.33× at Cout=64) at
#                 still-full lanes. Wins only at 64 ≤ Cout < 128.
#   "banded"    — fused Pallas kernel: the bandtiles math with the tile loop
#                 INSIDE one kernel (ops/pallas/banded_conv3d.py) — no
#                 per-tile concat/transpose, (tile_d+2)/kd× FLOPs. Not
#                 SPMD-partitionable: single-device jit only (opt-in).
#                 Falls back to the auto rule at ineligible shapes.
#   "lax"       — XLA's native 3-D convolution.
#   "auto"      — bandlanes where it wins (see `_bandlanes_wins`); fold2d for
#                 1-tap convs (windowless — just a reshape + 1×1 2-D conv,
#                 measured SPMD-exact); native lax for the remaining
#                 multi-tap Cout≥128 convs, where it beats fold2d anyway
#                 (BASELINE.md probe: 2.87 vs 3.00 ms @C128/64²) AND is
#                 partitioned exactly by XLA SPMD. The multi-tap fold2d's
#                 depth-shift concat mis-partitions under a sharded mesh
#                 (wrong results, not just slow — tests/test_sharded_sampling
#                 + the modconv SPMD suite pin this), so auto never selects
#                 it for kd>1.
# Same math in all cases. Selectable for benchmarking.
CONV3D_IMPL = os.environ.get("TMDIFF_CONV3D_IMPL", "auto")

# Global-override impls that are NOT SPMD-exact on a >1-device mesh:
# `banded` is an opaque pallas_call the sharding propagator can't partition;
# `bandtiles`/`fold2d` force the multi-tap depth-shift concat everywhere,
# which mis-partitions under a sharded mesh (the auto rule restricts fold2d
# to 1-tap convs for exactly this reason — DESIGN.md, tests/test_parallel.py
# SPMD-exactness pins).
_SPMD_UNSAFE_IMPLS = ("banded", "bandtiles", "fold2d")


def check_spmd_lowering(mesh) -> None:
    """Fail fast when a multi-device mesh meets an SPMD-unsafe conv-lowering
    override (e.g. TMDIFF_CONV3D_IMPL=banded left over from a single-chip
    bench shell). Called by Trainer/Pansharpener when they adopt a mesh, so
    the error names the env var instead of surfacing as a partitioner
    failure (or silently wrong numerics) deep inside compile."""
    if mesh is None or getattr(mesh, "size", 1) <= 1:
        return
    if CONV3D_IMPL in _SPMD_UNSAFE_IMPLS:
        raise ValueError(
            f"TMDIFF_CONV3D_IMPL={CONV3D_IMPL!r} is not SPMD-exact and the "
            f"mesh spans {mesh.size} devices — unset it (or use "
            f"'auto'/'bandlanes'/'lax') for multi-device runs")

# Backend for the band-into-lanes 3×3 conv: "xla" (conv_general_dilated) or
# "pallas" (ops/pallas/conv2d.py halo-strip kernel).
BANDLANES_CONV = os.environ.get("TMDIFF_BANDLANES_CONV", "xla")


# Couts the auto rule routes to the native lax conv even where bandlanes'
# win rule matches — A/B hook for per-level auto-rule experiments (e.g. the
# r4 isolated grid measured native 5.09 vs bandlanes 5.36 ms at the 8-band
# C=64 level). Comma-separated, e.g. TMDIFF_CONV3D_AUTO_NATIVE=64.
AUTO_NATIVE_COUTS = frozenset(
    int(c) for c in os.environ.get("TMDIFF_CONV3D_AUTO_NATIVE", "").split(",")
    if c.strip())

# Symmetric A/B hook: Couts forced BACK to bandlanes under auto even where
# the deep-band native exclusion matches (e.g. TMDIFF_CONV3D_AUTO_BANDLANES=64
# reproduces the r3 routing of the big config's C64 level — the r5 full-model
# A/B that settled the 10.36-vs-10.09 question, BASELINE.md r5).
AUTO_BANDLANES_COUTS = frozenset(
    int(c) for c in os.environ.get(
        "TMDIFF_CONV3D_AUTO_BANDLANES", "").split(",")
    if c.strip())


def _bandlanes_wins(d: int, kd: int, cout: int, h: int = 0) -> bool:
    """Empirical win rule for the band-into-lanes lowering, from the v5e A/B
    grid in BASELINE.md: every lane-starved level (Cout < 128) wins — the
    D/kd FLOP blow-up is repaid by full 128-lane MXU tiles PLUS skipping the
    fold2d concat's HBM round-trip (measured 2.0×/1.2× @8-band and
    3.6×/1.9× @4-band for C=32/64). At Cout ≥ 128 there is no lane gain and
    the FLOP blow-up is a pure loss; 1-tap (kd=1) convs have no depth
    coupling to amortise. r4 re-measure: at deep-band half-lane levels
    (d ≥ 8 AND cout ≥ 64) XLA's native 3-D conv is faster at H ≤ 128
    (isolated 5.09 vs 5.36 ms at C64·D8@128²; full-model headline 31.5 vs
    30.0 steps/s) — and it is the SPMD-exact-everywhere lowering, so auto
    routes those levels native. r5 per-shape re-measure (BASELINE.md r5
    "conv auto-rule"): the native routing is resolution-dependent IN
    CONTEXT — at C64·D8@**256²** (the big config's level-0 shape) the
    ISOLATED conv still favours native (0.91-0.92×) but the FULL MODEL runs
    10.35 steps/s with bandlanes vs 10.11 native (fusion-context effect:
    the 2-D bandlanes form fuses with the surrounding modulate/add/swish
    where the native 3-D conv's layout does not). The native exclusion is
    therefore gated on h ≤ 128; h=0 (unknown) keeps the r4 behaviour."""
    native_excl = (d >= 8 and cout >= 64 and (h == 0 or h <= 128))
    return (kd > 1 and d > 1 and cout < 128
            and (cout in AUTO_BANDLANES_COUTS or not native_excl)
            and cout not in AUTO_NATIVE_COUTS)


def _conv3d_bandlanes(x: jax.Array, kernel: jax.Array):
    """SAME/stride-1 3-D conv with the band (depth) axis folded into lanes.

    Output band d_out draws from input bands d_out+i−pad, tap K[i]; expressed
    over the flattened (B, H, W, D·Cin) layout that is one dense 2-D conv
    whose (kh, kw, D·Cin, D·Cout) kernel is block-banded over band pairs:
        W2[·, ·, d_in·Cin:, d_out·Cout:] = K[d_in − d_out + pad]   (|Δd| ≤ pad)
    and zero elsewhere. The banded kernel is assembled at trace time from the
    compact (kd, kh, kw, Cin, Cout) parameter — O(D²·k²·Cin·Cout) elements,
    negligible next to the conv itself."""
    b, d, h, w, c = x.shape
    kd, kh, kw, cin, cout = kernel.shape
    if h < kh or w < kw:
        # Window overhangs the whole image. Numerically fine single-device,
        # but the XLA SPMD partitioner mis-partitions THIS layout when the
        # sharded spatial dim is smaller than the window (measured: wrong
        # results at global H=2 / 1-row shards on an ("data","space") mesh,
        # jax 0.9.0, while the native conv stays exact). Such levels are
        # FLOP-trivial, so route them to the native lowering unconditionally.
        return lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1, 1), "SAME",
            dimension_numbers=DIMENSION_NUMBERS_3D,
        )
    pad = kd // 2
    din = np.arange(d)[:, None]
    dout = np.arange(d)[None, :]
    idx = din - dout + pad  # tap index per (d_in, d_out) block
    valid = (0 <= idx) & (idx < kd)
    kg = kernel[np.clip(idx, 0, kd - 1)]  # (d, d, kh, kw, cin, cout)
    kg = kg * jnp.asarray(valid, kernel.dtype)[:, :, None, None, None, None]
    w2 = kg.transpose(2, 3, 0, 4, 1, 5).reshape(kh, kw, d * cin, d * cout)
    x2 = x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d * c)
    if (
        BANDLANES_CONV == "pallas"
        and (kh, kw) == (3, 3)
        and h % 8 == 0
    ):
        from tmdiff_tpu.ops.pallas.conv2d import conv3x3_nhwc

        y = conv3x3_nhwc(x2, w2.astype(x.dtype))
    else:
        y = lax.conv_general_dilated(
            x2, w2.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=DIMENSION_NUMBERS_2D,
        )
    return y.reshape(b, h, w, d, cout).transpose(0, 3, 1, 2, 4)


def _conv3d_bandtiles(x: jax.Array, kernel: jax.Array, tile_d: int):
    """Band-tiled variant of bandlanes: output bands in groups of `tile_d`,
    each consuming tile_d+2·pad input bands (halo) as lanes. FLOP blow-up is
    (tile_d+2·pad)/kd — e.g. 1.33× at tile_d=2/kd=3 vs bandlanes' D/kd=2.67×
    at D=8 — at full 128 output lanes when tile_d·Cout = 128. Measured 13%
    faster than bandlanes at the C=64 level (BASELINE.md bandtiles A/B);
    LOSES at C=32 (two dispatches + halo traffic outweigh the FLOP cut), so
    `auto` selects it only for 64 ≤ Cout < 128."""
    b, d, h, w, c = x.shape
    kd, kh, kw, cin, cout = kernel.shape
    if h < kh or w < kw:
        return lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1, 1), "SAME",
            dimension_numbers=DIMENSION_NUMBERS_3D,
        )
    tile_d = min(tile_d, d)  # Cout≤8 would give tile_d=16 > d=8
    pad = kd // 2
    span = tile_d + 2 * pad
    # zero-pad the depth tail so a short final tile (d % tile_d != 0) still
    # slices a full `span` slab; the surplus output bands are dropped below
    tail = (-d) % tile_d
    xp = jnp.pad(x, ((0, 0), (pad, pad + tail), (0, 0), (0, 0), (0, 0)))
    din = np.arange(span)[:, None]
    dout = np.arange(tile_d)[None, :]
    idx = din - (dout + pad) + pad  # tap index for (in-slab, out-in-tile)
    valid = (0 <= idx) & (idx < kd)
    kg = kernel[np.clip(idx, 0, kd - 1)]
    kg = kg * jnp.asarray(valid, kernel.dtype)[:, :, None, None, None, None]
    wt = kg.transpose(2, 3, 0, 4, 1, 5).reshape(kh, kw, span * cin, tile_d * cout)
    outs = []
    for t0 in range(0, d, tile_d):
        slab = xp[:, t0 : t0 + span]
        x2 = slab.transpose(0, 2, 3, 1, 4).reshape(b, h, w, span * c)
        y = lax.conv_general_dilated(
            x2, wt.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=DIMENSION_NUMBERS_2D,
        )
        outs.append(y.reshape(b, h, w, tile_d, cout))
    out = jnp.concatenate(outs, axis=3)[:, :, :, :d]
    return out.transpose(0, 3, 1, 2, 4)


def _conv3d_fold2d(x: jax.Array, kernel: jax.Array):
    """SAME/stride-1 3-D conv as a single folded 2-D conv.

    y[b,d] = Σ_i conv2d(x_pad[b, d+i], K[i])  — so concatenating the kd
    depth-shifted views along channels and flattening the kernel's depth
    taps into input channels yields one (kh, kw, kd·C, Cout) NHWC conv over
    a (B·D, H, W, kd·C) batch."""
    b, d, h, w, c = x.shape
    kd, kh, kw, cin, cout = kernel.shape
    if kd == 1:
        x2 = x.reshape(b * d, h, w, c)
        y = lax.conv_general_dilated(
            x2, kernel[0].astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=DIMENSION_NUMBERS_2D,
        )
        return y.reshape(b, d, h, w, cout)
    pad = kd // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    xcat = jnp.concatenate([xp[:, i : i + d] for i in range(kd)], axis=-1)
    kflat = kernel.transpose(1, 2, 0, 3, 4).reshape(kh, kw, kd * cin, cout)
    y = lax.conv_general_dilated(
        xcat.reshape(b * d, h, w, kd * c), kflat.astype(x.dtype), (1, 1),
        "SAME", dimension_numbers=DIMENSION_NUMBERS_2D,
    )
    return y.reshape(b, d, h, w, cout)


def conv3d(x: jax.Array, kernel: jax.Array, *, padding="SAME", stride=(1, 1, 1)):
    """3-D conv: x (B, D, H, W, Cin), kernel (kd, kh, kw, Cin, Cout)."""
    if padding == "SAME" and tuple(stride) == (1, 1, 1):
        impl = CONV3D_IMPL
        d, kd, cout = x.shape[1], kernel.shape[0], kernel.shape[-1]
        if impl == "banded":
            from tmdiff_tpu.ops.pallas import banded_conv3d as banded

            kd_, kh, kw = kernel.shape[:3]
            h, w = x.shape[2], x.shape[3]
            if banded.eligible(d, kd_, kh, kw, h, w, cout):
                return banded.banded_conv3d(x, kernel)
            impl = "auto"  # ineligible shape: fall through to the auto rule
        if impl == "auto":
            if _bandlanes_wins(d, kd, cout, x.shape[2]):
                # NOT bandtiles: in isolation it beats bandlanes 13% at
                # Cout=64 (1.33× vs 2.67× FLOPs at full lanes), but in the
                # full model the headline DROPS 29.7 vs 30.1 — the per-tile
                # concat/transpose breaks XLA fusion with the surrounding
                # ops. Kept selectable via TMDIFF_CONV3D_IMPL=bandtiles for
                # future shapes; auto stays on the fused single conv.
                impl = "bandlanes"
            elif kd == 1:
                impl = "fold2d"
            else:
                impl = "lax"
        if impl == "bandtiles":
            return _conv3d_bandtiles(x, kernel, max(1, 128 // cout))
        if impl == "bandlanes":
            return _conv3d_bandlanes(x, kernel)
        if impl == "fold2d":
            return _conv3d_fold2d(x, kernel)
    return lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=DIMENSION_NUMBERS_3D,
    )


def conv3d_cat(parts, kernel: jax.Array, *, padding="SAME", stride=(1, 1, 1)):
    """conv3d(concatenate(parts, axis=-1), kernel) WITHOUT materialising the
    concat: the kernel's input-channel axis is sliced per part at trace time
    and the partial convolutions are summed. Mathematically identical (up to
    summation order); skips one full HBM round-trip of the concatenated
    activation — measured 11% faster per decoder conv at the outer 256²
    levels (BASELINE.md r2 concat A/B)."""
    _, _, h, w, _ = parts[0].shape
    kd, kh, kw = kernel.shape[:3]
    if h < kh or w < kw:
        # window overhangs the image: the XLA SPMD partitioner mis-computes
        # the (in-jit kernel slice → conv) pattern at these sizes on a
        # sharded mesh (pre-sliced kernels are exact — measured, see
        # tests/test_sharded_sampling.py). Such levels are tiny; the concat
        # costs nothing here.
        return conv3d(jnp.concatenate(parts, axis=-1), kernel,
                      padding=padding, stride=stride)
    off, out = 0, None
    for p in parts:
        kpart = kernel[..., off : off + p.shape[-1], :]
        off += p.shape[-1]
        y = conv3d(p, kpart, padding=padding, stride=stride)
        out = y if out is None else out + y
    assert off == kernel.shape[-2], (off, kernel.shape)
    return out


def modulated_conv3d(
    x: jax.Array,
    kernel: jax.Array,
    style: jax.Array,
    *,
    padding="SAME",
    stride=(1, 1, 1),
):
    """y_b = conv3d(x_b · s_b, kernel): exact equivalent of the reference's
    batch-grouped modulated conv (no bias, no demodulation — see module doc).

    Args:
      x: (B, D, H, W, Cin) activations.
      kernel: (kd, kh, kw, Cin, Cout) shared weights.
      style: (B, Cin) per-sample, per-input-channel scales.
    """
    scaled = x * style.astype(x.dtype)[:, None, None, None, :]
    return conv3d(scaled, kernel, padding=padding, stride=stride)


def modulated_conv_transpose3d(
    x: jax.Array,
    kernel: jax.Array,
    style: jax.Array,
    *,
    stride=(1, 1, 1),
    padding="SAME",
):
    """Transposed-conv twin (reference `modulated_convTranspose3d`,
    `Hyper_unet_general.py:21-48`; library-only — the active model upsamples
    via IDWT instead). Same activation-scaling identity applies."""
    scaled = x * style.astype(x.dtype)[:, None, None, None, :]
    return lax.conv_transpose(
        scaled,
        kernel.astype(x.dtype),
        strides=stride,
        padding=padding,
        dimension_numbers=DIMENSION_NUMBERS_3D,
    )
