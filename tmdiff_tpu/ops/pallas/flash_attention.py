"""Fused flash attention (Pallas TPU kernel).

Replaces the reference's optional xformers `memory_efficient_attention` CUDA
path (`/root/reference/core/Attention.py:217-263`) with a TPU-native online
-softmax kernel. KV is a sequential grid axis, so VMEM residency is
O(block_k·D) regardless of sequence length (the memory-efficiency xformers
claims) while Pallas pipelines the next KV tile's HBM→VMEM DMA behind the
current tile's MXU work; fp32 accumulation, bf16-friendly inputs.

Non-causal (image token sequences have no ordering), optional source-length
masking for padded sequences. Falls back to the interpreter off-TPU so the
same code path is exercised in CPU tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
            *, scale, kv_len, block_k):
    """One (batch·head, q-block, kv-block) grid cell.

    The KV axis is the innermost *grid* dimension (sequential on TPU), so
    only ONE (block_k, D) K/V tile is VMEM-resident at a time — O(block)
    residency however long the sequence — while Pallas double-buffers the
    next tile's DMA behind the current tile's compute. The online-softmax
    state (m, l, acc) persists across KV steps in VMEM scratch."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full(m_ref.shape, _NEG_INF, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    q = q_ref[0].astype(jnp.float32)  # (Bq, D)
    k = k_ref[0].astype(jnp.float32)  # (Bk, D)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Bq, Bk)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
        p, v, preferred_element_type=jnp.float32
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool | None = None,
):
    """Softmax(q·kᵀ·scale)·v over (B, H, S, D) tensors.

    D is padded to the 128-lane width and S to the block size internally;
    outputs are sliced back. `interpret=None` auto-selects interpreter mode
    off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if scale is None:
        scale = d ** -0.5

    qf = _pad_to(_pad_to(q.reshape(b * h, sq, d), 2, 128), 1, block_q)
    kf = _pad_to(_pad_to(k.reshape(b * h, skv, d), 2, 128), 1, block_k)
    vf = _pad_to(_pad_to(v.reshape(b * h, skv, d), 2, 128), 1, block_k)
    bh, sq_p, d_p = qf.shape
    skv_p = kf.shape[1]

    grid = (bh, sq_p // block_q, skv_p // block_k)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, kv_len=skv, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d_p), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d_p), lambda i, qi, j: (i, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_k, d_p), lambda i, qi, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_k, d_p), lambda i, qi, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d_p), lambda i, qi, j: (i, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max m
            pltpu.VMEM((block_q, 128), jnp.float32),  # running denom l
            pltpu.VMEM((block_q, d_p), jnp.float32),  # unnormalised acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :sq, :d].reshape(b, h, sq, d)


def attention_reference(q, k, v, scale=None):
    """Plain einsum attention (fp32 softmax) for correctness checks."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
