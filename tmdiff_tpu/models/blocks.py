"""WavBEST building blocks (flax.linen), band-as-depth channels-last layout.

Activations are (B, D, H, W, C): D = spectral bands as conv depth, C = feature
channels innermost (TPU lane dim). Module/param names mirror the reference
classes (`/root/reference/GeneralModel/Hyper_unet_general.py`) so torch
checkpoints transplant mechanically (see utils/torch_import.py):

  reference                              here
  ───────────────────────────────────────────────────────────────
  AdaptionModulateBEST        :158-173   AdaptionHead
  ResBlockModulateBEST        :220-249   ResBlockModulate
  WaveletUPorDown             :334-414   WaveletDown / WaveletUp
  ResblockDownOneModulateBEST :176-196   DownStage
  ResblockUpOneModulateBEST   :199-217   UpStage
  FinalBlockModulateBEST      :252-273   FinalBlock

Design deltas from the reference (all documented):
  * modulated conv = activation scaling + shared conv (ops/modconv.py) — a
    proven identity, not a per-sample grouped conv.
  * Haar DWT/IDWT = reshape butterflies (ops/wavelet.py), not per-call numpy
    matrices.
  * the reference's modulated convs carry a dead bias parameter (created by
    nn.Conv3d but never applied since the modulated call passes bias=None,
    `Hyper_unet_general.py:74`) and WaveletUPorDown carries an unused
    `dense2`; neither is reproduced here.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tmdiff_tpu.ops import wavelet
from tmdiff_tpu.ops.modconv import conv3d, conv3d_cat, modulated_conv3d


def swish(x):
    return x * jax.nn.sigmoid(x)


class Conv3d(nn.Module):
    """Plain biased 3-D conv routed through ops.modconv.conv3d so the whole
    model obeys the TMDIFF_CONV3D_IMPL lowering switch (fold2d vs lax).
    Param structure matches flax nn.Conv ({kernel, bias}) for transplant."""

    features: int
    kernel_size: Sequence[int] = (3, 3, 3)
    dtype: jnp.dtype = jnp.float32
    # Default zeros keeps every existing checkpoint/golden bit-identical;
    # models/controlnet.py overrides with the torch U(±1/√fan_in) init the
    # reference hint path relies on to bootstrap (see HintEncoderMoE).
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        """`x` may be a tuple of parts — convolved as their channel concat
        without materialising it (ops/modconv.py::conv3d_cat); the kernel
        parameter is identical either way (transplant-stable)."""
        parts = x if isinstance(x, tuple) else None
        cin = sum(p.shape[-1] for p in parts) if parts else x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, cin, self.features), jnp.float32,
        )
        bias = self.param("bias", self.bias_init, (self.features,),
                          jnp.float32)
        if parts:
            y = conv3d_cat(
                tuple(p.astype(self.dtype) for p in parts),
                kernel.astype(self.dtype),
            )
        else:
            y = conv3d(x.astype(self.dtype), kernel.astype(self.dtype))
        return y + bias.astype(y.dtype)


class ModConv3d(nn.Module):
    """3-D conv whose weights are modulated per input channel by a style
    vector projected from the prompt embedding (no bias, no demodulation).

    Init deviation (documented): the style projection's bias initialises to
    ONE (StyleGAN convention) so styles start near identity. With zero bias
    AND a small-variance kernel the styles start near zero and every
    modulated branch — and its gradients — is attenuated to ~nothing at
    init (exactly zero for a zero prompt embedding). The reference does NOT
    hit that failure mode: its init_weights('kaiming') gives the style
    Linear kaiming-normal weights (std √(2/768)) with zero bias, so styles
    start as O(1) mean-zero randoms — reproduced by init_type="torch"
    (models/init_styles.py), which measured 2.5× faster early convergence
    than this default (BASELINE.md "Trained head-to-head"). Transplanted
    checkpoints are unaffected (both leaves are overwritten)."""

    features: int
    kernel_size: Sequence[int] = (3, 3, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, zemb):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, cin, self.features),
            jnp.float32,
        )
        style = nn.Dense(
            cin, name="style", dtype=self.dtype,
            bias_init=nn.initializers.ones,
        )(zemb)
        return modulated_conv3d(x, kernel.astype(self.dtype), style)


class ResBlockModulate(nn.Module):
    """Residual block: (+temb) → swish → drop → conv → swish → drop →
    modulated conv → + 1×1-projected skip."""

    features: int
    use_temb: bool = True  # reference `flag` is the negation
    dropout: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, zemb, *, train: bool = False):
        """`x` may be a tuple of channel parts (the decoder's 3-way skip
        concat) — processed without ever materialising the concatenated
        tensor: the temb projection/swish/dropout apply per part and both
        convs slice their kernels (conv3d_cat). In training the per-part
        dropout masks come from independent RNG folds — same marginal
        semantics as one mask over the concat, different bit-stream
        (determinism per seed still holds; pinned by test_train.py)."""
        parts = x if isinstance(x, tuple) else None
        cin = sum(p.shape[-1] for p in parts) if parts else x.shape[-1]
        if parts:
            hs = parts
            if self.use_temb:
                d = nn.Dense(cin, name="dense1", dtype=self.dtype)(temb)[
                    :, None, None, None, :
                ]
                off, shifted = 0, []
                for p in hs:
                    shifted.append(p + d[..., off : off + p.shape[-1]])
                    off += p.shape[-1]
                hs = shifted
            hs = tuple(
                nn.Dropout(self.dropout, deterministic=not train)(swish(p))
                for p in hs
            )
            h = Conv3d(self.features, (3, 3, 3), name="conv20",
                       dtype=self.dtype)(hs)
        else:
            h = x
            if self.use_temb:
                h = h + nn.Dense(cin, name="dense1", dtype=self.dtype)(temb)[
                    :, None, None, None, :
                ]
            h = swish(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = Conv3d(self.features, (3, 3, 3), name="conv20", dtype=self.dtype)(h)
        h = swish(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = ModConv3d(self.features, name="conv21", dtype=self.dtype)(h, zemb)
        if cin != self.features:
            x = Conv3d(self.features, (1, 1, 1), name="res_conv", dtype=self.dtype)(x)
        elif parts:
            x = jnp.concatenate(parts, axis=-1)  # unreachable in WavBEST (cin=3C≠C)
        return h + x


class AdaptionHead(nn.Module):
    """Entry head: 1×1×1 channel expansion → swish → modulated 3×3×3 conv."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, zemb):
        h = Conv3d(self.features, (1, 1, 1), name="conv20", dtype=self.dtype)(x)
        h = swish(h)
        return ModConv3d(self.features, name="conv21", dtype=self.dtype)(h, zemb)


class WaveletDown(nn.Module):
    """Residual wavelet downsampling: conv both branches, Haar-DWT H/W,
    keep LL/2 and return the conv branch's (LH, HL, HH) as the skip."""

    features: int
    use_temb: bool = True
    dropout: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, zemb, *, train: bool = False):
        h = swish(x)
        h = Conv3d(self.features, (3, 3, 3), name="Conv_0", dtype=self.dtype)(h)
        x = Conv3d(self.features, (1, 1, 1), name="Conv_2", dtype=self.dtype)(x)

        # DWT acts on (H, W) per band/feature — layout (B, D, H/2, W/2, C).
        h_ll, h_lh, h_hl, h_hh = wavelet.dwt2d(h)
        x_ll, _, _, _ = wavelet.dwt2d(x)
        skip = (h_lh, h_hl, h_hh)
        h = h_ll * 0.5
        x = x_ll * 0.5

        if self.use_temb:
            h = h + nn.Dense(self.features, name="Dense_0", dtype=self.dtype)(temb)[
                :, None, None, None, :
            ]
        h = swish(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = ModConv3d(self.features, name="Conv_1", dtype=self.dtype)(h, zemb)
        return x + h, skip


class GroupedSkipConv(nn.Module):
    """3-group conv applied to the three HF subbands WITHOUT concatenating
    them: group g's kernel/bias block convolves part g directly (groups never
    mix channels). Parameter names and shapes match
    `nn.Conv(features*3, (3,3,3), feature_group_count=3)` — kernel
    (3,3,3,C,3C), bias (3C,) — so torch transplants are untouched."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, parts):
        c = parts[0].shape[-1]
        n = len(parts)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, c, n * self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (n * self.features,), jnp.float32
        )
        _, _, h, w, _ = parts[0].shape
        if h < 3 or w < 3:
            # window-overhang + in-jit kernel slice mis-partitions under a
            # sharded mesh (see ops/modconv.py::conv3d_cat); tiny level —
            # run the real grouped conv on the concat instead
            x = jnp.concatenate(parts, axis=-1).astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(self.dtype), (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                feature_group_count=n,
            ) + bias.astype(self.dtype)
            return tuple(jnp.split(y, n, axis=-1))
        outs = []
        for g, p in enumerate(parts):
            kg = kernel[..., g * self.features : (g + 1) * self.features]
            bg = bias[g * self.features : (g + 1) * self.features]
            y = conv3d(p.astype(self.dtype), kg.astype(self.dtype))
            outs.append(y + bg.astype(y.dtype))
        return tuple(outs)


class WaveletUp(nn.Module):
    """Residual wavelet upsampling: conv both branches, project the encoder's
    high-frequency skip through a 3-group conv, IDWT back to full resolution."""

    features: int
    use_temb: bool = True
    dropout: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, zemb, skip, *, train: bool = False):
        h = swish(x)
        h = Conv3d(self.features, (3, 3, 3), name="Conv_0", dtype=self.dtype)(h)
        x = Conv3d(self.features, (1, 1, 1), name="Conv_2", dtype=self.dtype)(x)

        # Grouped conv over [LH ∥ HL ∥ HH]: three independent 3×3×3 convs, one
        # per subband (reference convH_0, groups=3, `Hyper_unet_general.py:359-361`).
        # Groups never mix, so each subband is convolved directly with its
        # kernel block — no concat materialisation, no split. Param layout is
        # identical to flax nn.Conv(feature_group_count=3) (transplant-stable).
        lh, hl, hh = GroupedSkipConv(
            self.features, name="convH_0", dtype=self.dtype
        )(tuple(s * 0.5 for s in skip))
        lh, hl, hh = lh * 2.0, hl * 2.0, hh * 2.0

        h = wavelet.idwt2d(2.0 * h, lh, hl, hh)
        x = wavelet.idwt2d(2.0 * x, lh, hl, hh)

        if self.use_temb:
            h = h + nn.Dense(self.features, name="Dense_0", dtype=self.dtype)(temb)[
                :, None, None, None, :
            ]
        h = swish(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = ModConv3d(self.features, name="Conv_1", dtype=self.dtype)(h, zemb)
        return x + h


class DownStage(nn.Module):
    """ResBlock (cin→cout) followed by wavelet downsampling."""

    features: int
    use_temb: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, zemb, *, train: bool = False):
        h = ResBlockModulate(
            self.features, use_temb=self.use_temb, name="conv20", dtype=self.dtype
        )(x, temb, zemb, train=train)
        return WaveletDown(
            self.features, use_temb=self.use_temb, name="down", dtype=self.dtype
        )(h, temb, zemb, train=train)


class UpStage(nn.Module):
    """ResBlock on the 3-way skip concat, then wavelet upsampling."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, zemb, skip, *, train: bool = False):
        h = ResBlockModulate(self.features, name="conv20", dtype=self.dtype)(
            x, temb, zemb, train=train
        )
        return WaveletUp(self.features, name="up1", dtype=self.dtype)(
            h, temb, zemb, skip, train=train
        )


class ChannelWiseAttention(nn.Module):
    """Squeeze-excitation-style channel gating
    (`Hyper_unet_general.py:130-155`, defined-but-unused in the reference):
    global max + avg pool over (D, H, W) → 2-layer MLP → sigmoid gate per
    channel. Layout (B, D, H, W, C)."""

    reduction_ratio: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gmax = jnp.max(x, axis=(1, 2, 3))
        gavg = jnp.mean(x, axis=(1, 2, 3))
        pooled = jnp.concatenate([gmax, gavg], axis=-1)  # (B, 2C)
        h = nn.Dense(2 * c // self.reduction_ratio, name="fc1",
                     dtype=self.dtype)(pooled)
        h = swish(h)
        gate = jax.nn.sigmoid(nn.Dense(c, name="fc2", dtype=self.dtype)(h))
        return x * gate[:, None, None, None, :]


def _agn_bias_init(key, shape, dtype=jnp.float32):
    """AdaptiveGroupNorm style bias: gamma half 1, beta half 0
    (`Hyper_unet_general.py:318-320`)."""
    c = shape[0] // 2
    return jnp.concatenate([jnp.ones((c,), dtype), jnp.zeros((shape[0] - c,), dtype)])


class AdaptiveGroupNorm(nn.Module):
    """Style-conditioned group norm (`Hyper_unet_general.py:311-331`,
    defined-but-unused in the reference): non-affine GroupNorm followed by
    γ·x̂ + β with (γ, β) projected from the style vector (γ biased to start
    at identity). Layout (B, D, H, W, C)."""

    num_groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        c = x.shape[-1]
        out = nn.GroupNorm(
            num_groups=self.num_groups, epsilon=1e-6,
            use_bias=False, use_scale=False, name="norm",
        )(x)
        st = nn.Dense(2 * c, name="style", dtype=self.dtype,
                      bias_init=_agn_bias_init)(style)
        gamma, beta = jnp.split(st, 2, axis=-1)
        expand = (slice(None), None, None, None, slice(None))
        return gamma[expand] * out + beta[expand]


class FinalBlock(nn.Module):
    """Four ResBlocks then a modulated 1×1×1 projection to one feature."""

    features: int
    out_features: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, zemb, *, train: bool = False):
        h = ResBlockModulate(self.features, name="conv20", dtype=self.dtype)(
            x, temb, zemb, train=train
        )
        h = ResBlockModulate(self.features, name="conv21", dtype=self.dtype)(
            h, temb, zemb, train=train
        )
        h = ResBlockModulate(self.features, name="conv22", dtype=self.dtype)(
            h, temb, zemb, train=train
        )
        h = ResBlockModulate(self.features, name="conv23", dtype=self.dtype)(
            h, temb, zemb, train=train
        )
        h = swish(h)
        return ModConv3d(
            self.out_features, kernel_size=(1, 1, 1), name="conv24", dtype=self.dtype
        )(h, zemb)
