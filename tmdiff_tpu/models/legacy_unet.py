"""LegacyUNet: the pre-wavelet WavBEST ablation assembled end to end.

The reference keeps the strided-conv/transpose-conv blocks (`unet_util.py`)
importable but never assembles the full legacy model (every name is shadowed
by the wavelet variants, `Hyper_unet_general.py:13`). This module completes
the family: same dual-encoder wiring and conditioning as WavBEST, with
strided-conv downsampling and transpose-conv upsampling instead of DWT/IDWT
— useful as an ablation baseline and as documentation of the architecture
the wavelet design replaced.

Note the legacy blocks' quirky spatial math (VALID stride-2 down: H → H/2−1;
transpose up maps it back exactly) requires H ≡ 0 (mod 2^3) ≥ 16.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from tmdiff_tpu.models.blocks import AdaptionHead, ResBlockModulate, swish
from tmdiff_tpu.models.legacy_blocks import (
    LegacyFinalBlock,
    StridedDownStage,
    TransposedUpStage,
)
from tmdiff_tpu.models.wavbest import PromptMLP, TimeMLP
from tmdiff_tpu.ops.embedding import gamma_embedding


# Shared forward pieces. Plain helpers called from inside a @nn.compact
# __call__ bind their submodules to the CALLER's scope, so both LegacyUNet
# and models/controlnet.py::ControlledLegacyUNet (which inserts
# stop_gradient + control residuals between these stages) produce identical
# param trees — one definition, no wiring drift between the two.

def embeds(mod, x_t, t, prompt_emb):
    """(gemb, temb, zemb): gamma time embedding + the two conditioning MLPs."""
    d = mod.dtype
    if prompt_emb.ndim == 1:
        prompt_emb = jnp.broadcast_to(prompt_emb, (x_t.shape[0], prompt_emb.shape[0]))
    gemb = gamma_embedding(jnp.reshape(t, (-1,)), mod.inter_dim).astype(d)
    zemb = swish(PromptMLP(mod.embed_dim, name="embed2", dtype=d)(
        prompt_emb.astype(d)))
    temb = swish(TimeMLP(mod.embed_dim, name="embed", dtype=d)(gemb))
    return gemb, temb, zemb


def encode(mod, cond, xt, temb, zemb, *, train):
    """Dual encoder: (cond taps), (x taps) at scales c0..c3."""
    c0, c1, c2, c3 = mod.channels
    d = mod.dtype
    c_h0 = AdaptionHead(c0, name="conv1", dtype=d)(cond, zemb)
    c_h1 = StridedDownStage(c1, name="down1_1", dtype=d)(c_h0, temb, zemb, train=train)
    c_h2 = StridedDownStage(c2, name="down2_1", dtype=d)(c_h1, temb, zemb, train=train)
    c_h3 = StridedDownStage(c3, name="down3_1", dtype=d)(c_h2, temb, zemb, train=train)

    x_h0 = AdaptionHead(c0, name="conv2", dtype=d)(xt, zemb)
    x_h1 = StridedDownStage(c1, name="down1", dtype=d)(x_h0, temb, zemb, train=train)
    x_h2 = StridedDownStage(c2, name="down2", dtype=d)(x_h1, temb, zemb, train=train)
    x_h3 = StridedDownStage(c3, name="down3", dtype=d)(x_h2, temb, zemb, train=train)
    return (c_h0, c_h1, c_h2, c_h3), (x_h0, x_h1, x_h2, x_h3)


def middle(mod, x_h3, temb, zemb, *, train):
    return ResBlockModulate(mod.channels[3], name="middle1",
                            dtype=mod.dtype)(x_h3, temb, zemb, train=train)


def decode(mod, h, c_taps, x_taps, xt, temb, zemb, *, train):
    c0, c1, c2, _ = mod.channels
    d = mod.dtype
    c_h0, c_h1, c_h2, c_h3 = c_taps
    x_h0, x_h1, x_h2, x_h3 = x_taps

    def crop_to(h, ref):
        # The legacy blocks' size math (down: H → (H-1)//2, up: h → 2h+2)
        # over-shoots by 1-2 pixels per stage; crop to the skip's grid.
        return h[:, :, : ref.shape[2], : ref.shape[3], :]

    h = TransposedUpStage(c2, name="up1", dtype=d)(h, temb, zemb, c_h3, x_h3, train=train)
    h = crop_to(h, c_h2)
    h = TransposedUpStage(c1, name="up2", dtype=d)(h, temb, zemb, c_h2, x_h2, train=train)
    h = crop_to(h, c_h1)
    h = TransposedUpStage(c0, name="up3", dtype=d)(h, temb, zemb, c_h1, x_h1, train=train)
    h = crop_to(h, xt)
    h = LegacyFinalBlock(c0, name="final", dtype=d)(
        jnp.concatenate([h, c_h0, x_h0], axis=-1), temb, zemb, train=train
    )
    out = nn.Dense(1, name="out_proj", dtype=d)(h)
    return out[..., 0].astype(jnp.float32)


class LegacyUNet(nn.Module):
    channels: Sequence[int] = (32, 64, 128, 256)
    embed_dim: int = 128
    inter_dim: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_t, t, pan, ms, prompt_emb, *, train: bool = False):
        d = self.dtype
        _, temb, zemb = embeds(self, x_t, t, prompt_emb)
        cond = (pan - ms).astype(d)[..., None]
        xt = x_t.astype(d)[..., None]
        c_taps, x_taps = encode(self, cond, xt, temb, zemb, train=train)
        h = middle(self, x_taps[3], temb, zemb, train=train)
        return decode(self, h, c_taps, x_taps, xt, temb, zemb, train=train)
