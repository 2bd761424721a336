"""PGCU: probability-guided cross-modal MS upsampling.

Reference: `/root/reference/utils/PGCU.py:18-103` — per-band attention
between fine-scale (PAN + nearest-upsampled MS) feature vectors and
coarse-scale vectors, softmax over the coarse spatial grid, expectation over
coarse values produces the 4× upsampled MS.

TPU form: the reference's Python loop over bands with per-band nn.Linear
projections becomes one einsum over a (bands, VecLen, L) projection tensor
with per-band LayerNorm; the batched softmax-attention runs as standard
einsum attention (the coarse grid is small — (H/8)² tokens). Channels-last.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class DownSamplingBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        # torch Conv2d(k=3, stride=2, padding=1) pads symmetrically; flax
        # "SAME" at stride 2 would pad (0, 1) and shift every window.
        h = nn.Conv(
            self.features, (3, 3), strides=(2, 2),
            padding=((1, 1), (1, 1)), name="Conv",
        )(x)
        return nn.max_pool(h, (2, 2), strides=(2, 2))


class _BandProjection(nn.Module):
    """Per-band Linear(VecLen → L) + per-band LayerNorm, vectorised.

    The reference keeps a ModuleList of Sequential(Linear, LayerNorm) per
    band (`PGCU.py:53-55`); here one einsum over a stacked (bands, VecLen, L)
    tensor with per-band norm scale/bias — same parameters, one MXU call."""

    bands: int
    band_vec_len: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):  # (..., VecLen) -> (..., bands, L)
        vec_len = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(batch_axis=(0,)),
            (self.bands, vec_len, self.band_vec_len), jnp.float32,
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.bands, self.band_vec_len),
            jnp.float32,
        )
        h = jnp.einsum("...v,cvl->...cl", x, w) + b
        mean = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.var(h, axis=-1, keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param(
            "norm_scale", nn.initializers.ones,
            (self.bands, self.band_vec_len), jnp.float32,
        )
        shift = self.param(
            "norm_bias", nn.initializers.zeros,
            (self.bands, self.band_vec_len), jnp.float32,
        )
        return h * scale + shift


class PGCU(nn.Module):
    """4× probability-guided upsampling: (pan (B,H,W,1), ms (B,H/4,W/4,C))
    → (B, H, W, C)."""

    channels: int = 4
    vec_len: int = 128
    num_blocks: int = 3

    @nn.compact
    def __call__(self, pan, ms):
        c = self.channels
        band_len = self.vec_len // c
        up_ms = jax.image.resize(
            ms, (ms.shape[0], pan.shape[1], pan.shape[2], ms.shape[3]), "nearest"
        )

        # Fine-scale features F over the full grid.
        fm = nn.Conv(c, (3, 3), name="FMConv")(up_ms)
        fp = nn.Conv(c, (3, 3), name="FPConv")(pan)
        f = nn.Conv(self.vec_len, (3, 3), name="FConv")(
            jnp.concatenate([fm, fp], axis=-1)
        )

        # Coarse-scale features G and values V via downsampling towers.
        def tower(x, prefix, first_from_pan):
            h = x
            for i in range(self.num_blocks if first_from_pan else self.num_blocks - 1):
                h = DownSamplingBlock(c, name=f"{prefix}DSBlock{i}")(h)
            return h

        gm = tower(ms, "GM", False)
        gp = tower(pan, "GP", True)
        g = nn.Conv(self.vec_len, (3, 3), name="GConv")(
            jnp.concatenate([gm, gp], axis=-1)
        )
        vm = tower(ms, "VM", False)
        vp = tower(pan, "VP", True)
        v = nn.Conv(c, (3, 3), name="VConv")(
            jnp.concatenate([vm, vp], axis=-1)
        )

        b, hh, ww, _ = f.shape
        _, oh, ow, _ = g.shape
        # Per-band projections and coarse-grid attention.
        fq = _BandProjection(c, band_len, name="FLinear")(f)   # (B,H,W,C,L)
        gk = _BandProjection(c, band_len, name="GLinear")(g)   # (B,oh,ow,C,L)
        logits = jnp.einsum("bhwcl,bijcl->bhwcij", fq, gk) / jnp.sqrt(
            jnp.asarray(band_len, f.dtype)
        )
        prob = jax.nn.softmax(logits.reshape(b, hh, ww, c, oh * ow), axis=-1)
        prob = prob.reshape(b, hh, ww, c, oh, ow)
        out = jnp.einsum("bhwcij,bijc->bhwc", prob, v)
        return nn.Conv(c, (3, 3), name="FineAdjust")(out)
