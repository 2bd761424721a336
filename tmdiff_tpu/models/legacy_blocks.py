"""Legacy non-wavelet UNet blocks (strided-conv down / transpose-conv up).

Parity target: `/root/reference/GeneralModel/unet_util.py` — the earlier
ablation of the modulated blocks before wavelet down/up sampling was adopted.
Kept as library modules documenting the ablation (the reference imports them
with `*` but shadows every name, `Hyper_unet_general.py:13`).

Differences from the active blocks (models/blocks.py):
  * downsampling: stride-(1,2,2) 3-D conv with padding (1,0,0) instead of
    Haar DWT (`unet_util.py:136-149`);
  * upsampling: ConvTranspose3d stride (1,2,2) instead of IDWT with
    high-frequency skips (`unet_util.py:152-168`);
  * FinalBlock has only two ResBlocks (`unet_util.py:196-210`).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from tmdiff_tpu.models.blocks import ResBlockModulate, swish
from tmdiff_tpu.ops.modconv import DIMENSION_NUMBERS_3D


class StridedDownStage(nn.Module):
    """ResBlock then stride-2 spatial conv (depth/band axis untouched)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, zemb, *, train: bool = False):
        h = ResBlockModulate(self.features, name="conv20", dtype=self.dtype)(
            x, temb, zemb, train=train
        )
        h = swish(h)
        # torch Conv3d(k=3, stride=(1,2,2), padding=(1,0,0)): band axis SAME,
        # spatial axes VALID with stride 2.
        return nn.Conv(
            self.features, (3, 3, 3), strides=(1, 2, 2),
            padding=((1, 1), (0, 0), (0, 0)), name="down", dtype=self.dtype,
        )(h)


class TransposedUpStage(nn.Module):
    """Concat [x, skip, cond] → ResBlock → transpose-conv ×2 upsampling."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, zemb, skip, cond, *, train: bool = False):
        h = jnp.concatenate([x, skip, cond], axis=-1)
        h = ResBlockModulate(self.features, name="conv20", dtype=self.dtype)(
            h, temb, zemb, train=train
        )
        h = swish(h)
        kernel = self.param(
            "up_kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, h.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("up_bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        # Matches ConvTranspose3d(k=3, stride=(1,2,2), padding=(1,0,0),
        # output_padding=(0,1,1)): torch pad p / output_padding op map to
        # lax.conv_transpose padding (k-1-p, k-1-p+op) per dim → depth (1,1),
        # spatial (2,3); transpose_kernel=True reproduces torch's
        # gradient-of-conv semantics and expects (spatial, out, in) layout
        # (empirically pinned by tests/test_unet_legacy.py goldens).
        out = lax.conv_transpose(
            h, kernel.astype(h.dtype).swapaxes(-1, -2), strides=(1, 2, 2),
            padding=((1, 1), (2, 3), (2, 3)),
            dimension_numbers=DIMENSION_NUMBERS_3D,
            transpose_kernel=True,
        )
        return out + bias.astype(out.dtype)


class LegacyFinalBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, zemb, *, train: bool = False):
        h = ResBlockModulate(self.features, name="conv20", dtype=self.dtype)(
            x, temb, zemb, train=train
        )
        h = swish(h)
        return ResBlockModulate(self.features, name="conv21", dtype=self.dtype)(
            h, temb, zemb, train=train
        )
