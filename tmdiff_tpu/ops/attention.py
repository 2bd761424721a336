"""Attention blocks (library parity with the reference's experimental stack).

Covers `/root/reference/core/Attention.py` (SD-style cross/self attention,
GEGLU feed-forward, BasicTransformerBlock, SpatialTransformer,
SpatialSelfAttention) and the NCSN++ channel attention defined inside the
UNet file (`GeneralModel/Hyper_unet_general.py:483-515`, `NIN:471-480`).
None of these are wired into the active WavBEST model — same as upstream —
but they are first-class library modules here.

TPU-first: multi-head attention routes through the fused Pallas
flash-attention kernel (ops/pallas/flash_attention.py) instead of the
xformers CUDA path; layouts are channels-last; gradient checkpointing is
`jax.checkpoint` via `flax.linen.remat` at the block level.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tmdiff_tpu.ops.pallas.flash_attention import attention_reference, flash_attention


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when no context is given
    (`Attention.py:165-214`). Softmax in fp32."""

    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    use_flash: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, *, train: bool = False):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        out_dim = x.shape[-1]
        q = nn.Dense(inner, use_bias=False, name="to_q", dtype=self.dtype)(x)
        k = nn.Dense(inner, use_bias=False, name="to_k", dtype=self.dtype)(context)
        v = nn.Dense(inner, use_bias=False, name="to_v", dtype=self.dtype)(context)

        def split(t):
            b, s, _ = t.shape
            return t.reshape(b, s, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        if self.use_flash:
            out = flash_attention(q, k, v)
        else:
            out = attention_reference(q, k, v)
        b, h, s, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        out = nn.Dense(out_dim, name="to_out", dtype=self.dtype)(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class GEGLU(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.features * 2, name="proj", dtype=self.dtype)(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * jax.nn.gelu(gate)


class FeedForward(nn.Module):
    mult: int = 4
    glu: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dim = x.shape[-1]
        inner = dim * self.mult
        if self.glu:
            h = GEGLU(inner, name="geglu", dtype=self.dtype)(x)
        else:
            h = jax.nn.gelu(nn.Dense(inner, name="lin_in", dtype=self.dtype)(x))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(dim, name="lin_out", dtype=self.dtype)(h)


class BasicTransformerBlock(nn.Module):
    """self-attn → cross-attn → GEGLU FF, pre-LayerNorm residuals
    (`Attention.py:266-296`)."""

    heads: int
    dim_head: int
    dropout: float = 0.0
    disable_self_attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, *, train: bool = False):
        ctx1 = context if self.disable_self_attn else None
        x = CrossAttention(
            self.heads, self.dim_head, self.dropout, name="attn1", dtype=self.dtype
        )(nn.LayerNorm(name="norm1", dtype=self.dtype)(x), ctx1, train=train) + x
        x = CrossAttention(
            self.heads, self.dim_head, self.dropout, name="attn2", dtype=self.dtype
        )(nn.LayerNorm(name="norm2", dtype=self.dtype)(x), context, train=train) + x
        x = FeedForward(dropout=self.dropout, name="ff", dtype=self.dtype)(
            nn.LayerNorm(name="norm3", dtype=self.dtype)(x), train=train
        ) + x
        return x


class SpatialTransformer(nn.Module):
    """Image transformer: norm → 1×1 proj in → blocks over (h·w) tokens →
    zero-init proj out + residual (`Attention.py:299-362`). Channels-last
    (B, H, W, C)."""

    heads: int
    dim_head: int
    depth: int = 1
    dropout: float = 0.0
    use_checkpoint: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, *, train: bool = False):
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        x = nn.Conv(inner, (1, 1), name="proj_in", dtype=self.dtype)(x)
        x = x.reshape(b, h * w, inner)
        block_cls = BasicTransformerBlock
        if self.use_checkpoint:
            block_cls = nn.remat(BasicTransformerBlock, static_argnums=())
        for i in range(self.depth):
            x = block_cls(
                self.heads, self.dim_head, self.dropout,
                name=f"block{i}", dtype=self.dtype,
            )(x, context, train=train)
        x = x.reshape(b, h, w, inner)
        x = nn.Conv(
            c, (1, 1), name="proj_out", dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
        )(x)
        return x + x_in


class SpatialSelfAttention(nn.Module):
    """Single-head conv-projected spatial self-attention
    (`Attention.py:112-162`). Channels-last (B, H, W, C)."""

    use_flash: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        q = nn.Conv(c, (1, 1), name="q", dtype=self.dtype)(hn).reshape(b, 1, h * w, c)
        k = nn.Conv(c, (1, 1), name="k", dtype=self.dtype)(hn).reshape(b, 1, h * w, c)
        v = nn.Conv(c, (1, 1), name="v", dtype=self.dtype)(hn).reshape(b, 1, h * w, c)
        if self.use_flash:
            out = flash_attention(q, k, v)
        else:
            out = attention_reference(q, k, v)
        out = out.reshape(b, h, w, c)
        return x + nn.Conv(c, (1, 1), name="proj_out", dtype=self.dtype)(out)


class ChannelSelfAttention(nn.Module):
    """NCSN++ `AttnBlockpp`: attention over spatial positions with
    channel-folded features (`Hyper_unet_general.py:483-515`); the NIN 1×1
    projections become Dense on channels-last. Input (B, H, W, C); optional
    skip rescale by 1/√2."""

    skip_rescale: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        groups = min(c // 4, 32) or 1
        hn = nn.GroupNorm(num_groups=groups, epsilon=1e-6, name="GroupNorm_0")(x)
        q = nn.Dense(c, name="NIN_0", dtype=self.dtype)(hn)
        k = nn.Dense(c, name="NIN_1", dtype=self.dtype)(hn)
        v = nn.Dense(c, name="NIN_2", dtype=self.dtype)(hn)
        s = jnp.einsum("bhwc,bijc->bhwij", q, k) * (c ** -0.5)
        s = jax.nn.softmax(s.reshape(b, h, w, h * w), axis=-1).reshape(b, h, w, h, w)
        out = jnp.einsum("bhwij,bijc->bhwc", s, v)
        out = nn.Dense(
            c, name="NIN_3", dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(1e-10, "fan_avg", "uniform"),
        )(out)
        if self.skip_rescale:
            return (x + out) / jnp.sqrt(2.0).astype(x.dtype)
        return x + out
