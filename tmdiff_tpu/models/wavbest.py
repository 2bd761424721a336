"""WavBEST: text-modulated wavelet UNet denoiser, TPU-native.

Behavioral contract from `/root/reference/GeneralModel/Hyper_unet_general.py:523-636`:

  * Inputs are the noisy residual x_t (B, bands, H, W), integer timesteps
    (B,), PAN (B, 1, H, W), upsampled MS (B, bands, H, W) and a frozen
    per-sensor prompt embedding (768,).
  * The conditioning image is `PAN − MS` broadcast over bands; both streams
    are lifted to the 5-D band-as-depth layout so every conv is a 3-D conv
    with the spectral axis as depth — one network serves 4- and 8-band
    sensors (`:606-609`, to3D `:120-127`).
  * Two wavelet encoders (conditional branch without time embedding,
    noisy-residual branch with it), a middle ResBlock, and three wavelet-up
    stages whose inputs concatenate [decoder, cond-skip, x_t-skip] per scale
    (`:629-634`). Only the *conditional* encoder's high-frequency DWT bands
    feed the upsampling path — the x_t encoder's are collected but unused in
    the reference (`:631-633`), replicated here.
  * Time → gamma_embedding(t, 32) → MLP(128); prompt (768) → MLP → zemb(128)
    which modulates conv weights per input channel (see ops/modconv.py).

Layout note: (B, bands, H, W) maps to (B, D, H, W, C=1) with no transpose —
the band axis is already axis 1.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from tmdiff_tpu.models.blocks import (
    AdaptionHead,
    DownStage,
    FinalBlock,
    ResBlockModulate,
    UpStage,
    swish,
)
from tmdiff_tpu.ops.embedding import gamma_embedding


class TimeMLP(nn.Module):
    embed_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb):
        h = nn.Dense(self.embed_dim, name="lin0", dtype=self.dtype)(emb)
        h = swish(h)
        return nn.Dense(self.embed_dim, name="lin1", dtype=self.dtype)(h)


class PromptMLP(nn.Module):
    embed_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb):
        h = nn.Dense(self.embed_dim * 4, name="lin0", dtype=self.dtype)(emb)
        h = swish(h)
        h = nn.Dense(self.embed_dim * 4, name="lin1", dtype=self.dtype)(h)
        h = swish(h)
        return nn.Dense(self.embed_dim, name="lin2", dtype=self.dtype)(h)


class WavBEST(nn.Module):
    """Flagship denoiser. Call with NCHW-convention arrays (see module doc)."""

    channels: Sequence[int] = (32, 64, 128, 256)
    embed_dim: int = 128
    inter_dim: int = 32  # gamma-embedding width
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_t, t, pan, ms, prompt_emb, *, train: bool = False):
        """
        Args:
          x_t: (B, bands, H, W) noisy residual.
          t: (B,) integer (or fractional) timesteps.
          pan: (B, 1, H, W) panchromatic image.
          ms: (B, bands, H, W) upsampled multispectral image.
          prompt_emb: (768,) or (B, 768) frozen sensor prompt embedding.
          train: enables dropout (rng collection "dropout").

        Returns:
          (B, bands, H, W) prediction of the clean residual (x0-prediction).
        """
        c0, c1, c2, c3 = self.channels
        compute = self.dtype

        if prompt_emb.ndim == 1:
            prompt_emb = jnp.broadcast_to(prompt_emb, (x_t.shape[0], prompt_emb.shape[0]))
        zemb = swish(PromptMLP(self.embed_dim, name="embed2", dtype=compute)(
            prompt_emb.astype(compute)
        ))
        temb = swish(TimeMLP(self.embed_dim, name="embed", dtype=compute)(
            gamma_embedding(jnp.reshape(t, (-1,)), self.inter_dim).astype(compute)
        ))

        # (B, bands, H, W) -> (B, D=bands, H, W, C=1); cond = PAN − MS.
        cond = (pan - ms).astype(compute)[..., None]
        xt = x_t.astype(compute)[..., None]

        # Conditional encoder (no time embedding — reference flag=True).
        c_h0 = AdaptionHead(c0, name="conv1", dtype=compute)(cond, zemb)
        c_h1, c_s1 = DownStage(c1, use_temb=False, name="down1_1", dtype=compute)(
            c_h0, temb, zemb, train=train
        )
        c_h2, c_s2 = DownStage(c2, use_temb=False, name="down2_1", dtype=compute)(
            c_h1, temb, zemb, train=train
        )
        c_h3, c_s3 = DownStage(c3, use_temb=False, name="down3_1", dtype=compute)(
            c_h2, temb, zemb, train=train
        )

        # Noisy-residual encoder (with time embedding). Its DWT skips are
        # intentionally unused downstream — reference behavior (`:631-633`).
        x_h0 = AdaptionHead(c0, name="conv2", dtype=compute)(xt, zemb)
        x_h1, _ = DownStage(c1, name="down1", dtype=compute)(x_h0, temb, zemb, train=train)
        x_h2, _ = DownStage(c2, name="down2", dtype=compute)(x_h1, temb, zemb, train=train)
        x_h3, _ = DownStage(c3, name="down3", dtype=compute)(x_h2, temb, zemb, train=train)

        h = ResBlockModulate(c3, name="middle1", dtype=compute)(
            x_h3, temb, zemb, train=train
        )

        h = UpStage(c2, name="up1", dtype=compute)(
            jnp.concatenate([h, c_h3, x_h3], axis=-1), temb, zemb, c_s3, train=train
        )
        h = UpStage(c1, name="up2", dtype=compute)(
            jnp.concatenate([h, c_h2, x_h2], axis=-1), temb, zemb, c_s2, train=train
        )
        h = UpStage(c0, name="up3", dtype=compute)(
            jnp.concatenate([h, c_h1, x_h1], axis=-1), temb, zemb, c_s1, train=train
        )
        out = FinalBlock(c0, name="final", dtype=compute)(
            jnp.concatenate([h, c_h0, x_h0], axis=-1), temb, zemb, train=train
        )

        return out[..., 0].astype(jnp.float32)
