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
conv that XLA cannot tile well. `tests/test_modconv.py` pins this identity
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

# (batch, spatial..., features) / (spatial..., in, out)
DIMENSION_NUMBERS_3D = ("NDHWC", "DHWIO", "NDHWC")
DIMENSION_NUMBERS_2D = ("NHWC", "HWIO", "NHWC")

# 3-D conv lowering: "fold2d" rewrites the depth(band)-axis taps as channel
# blocks of ONE 2-D NHWC conv (bands folded into batch) — the shape XLA maps
# best onto the MXU; "lax" is the direct 3-D convolution. Same math, see
# `_conv3d_fold2d`. Selectable for benchmarking.
CONV3D_IMPL = os.environ.get("TMDIFF_CONV3D_IMPL", "fold2d")


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
    if (
        CONV3D_IMPL == "fold2d"
        and padding == "SAME"
        and tuple(stride) == (1, 1, 1)
    ):
        return _conv3d_fold2d(x, kernel)
    return lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=DIMENSION_NUMBERS_3D,
    )


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
