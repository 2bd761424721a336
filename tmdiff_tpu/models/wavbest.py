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

TPU-first split: because the conditional branch takes no time embedding, its
features are **constant across diffusion steps** — the reference recomputes
them every NFE (`:611-618` inside each denoiser call). `encode_condition`
computes them once per image; `denoise` consumes the cached features. XLA
cost analysis puts the cond encoder at 36.5% of the fused forward's
algorithmic FLOPs (0.92 of 2.52 TFLOP/image @256², flagship — see
BASELINE.md "FLOP accounting"), so caching cuts per-NFE cost by ~⅓ when the
sampler issues separate encode/denoise dispatches. Inside one fully-fused
scan XLA's LICM already hoists the loop-invariant encoder, so the measured
in-jit gain is small (~5%); the split's value there is the honest per-NFE
cost accounting and the CFG double-encode path. `__call__` remains the fused
single-shot forward (training path; exact reference semantics).

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

    def setup(self):
        c0, c1, c2, c3 = self.channels
        d = self.dtype
        self.embed2 = PromptMLP(self.embed_dim, dtype=d)
        self.embed = TimeMLP(self.embed_dim, dtype=d)
        self.conv1 = AdaptionHead(c0, dtype=d)
        self.conv2 = AdaptionHead(c0, dtype=d)
        self.down1_1 = DownStage(c1, use_temb=False, dtype=d)
        self.down2_1 = DownStage(c2, use_temb=False, dtype=d)
        self.down3_1 = DownStage(c3, use_temb=False, dtype=d)
        self.down1 = DownStage(c1, dtype=d)
        self.down2 = DownStage(c2, dtype=d)
        self.down3 = DownStage(c3, dtype=d)
        self.middle1 = ResBlockModulate(c3, dtype=d)
        self.up1 = UpStage(c2, dtype=d)
        self.up2 = UpStage(c1, dtype=d)
        self.up3 = UpStage(c0, dtype=d)
        self.final = FinalBlock(c0, dtype=d)

    # -- embeddings -----------------------------------------------------------

    def prompt_embed(self, prompt_emb, batch: int):
        if prompt_emb.ndim == 1:
            prompt_emb = jnp.broadcast_to(prompt_emb, (batch, prompt_emb.shape[0]))
        return swish(self.embed2(prompt_emb.astype(self.dtype)))

    def time_embed(self, t):
        return swish(
            self.embed(
                gamma_embedding(jnp.reshape(t, (-1,)), self.inter_dim).astype(self.dtype)
            )
        )

    # -- conditional branch (time-independent; cacheable across NFE) ----------

    def encode_condition(self, pan, ms, prompt_emb, *, train: bool = False):
        """→ dict of cond features + HF skips, constant across diffusion steps."""
        h, w = ms.shape[-2], ms.shape[-1]
        if h % 8 or w % 8:
            raise ValueError(
                f"WavBEST needs H and W divisible by 8 (three Haar wavelet "
                f"halvings); got {h}x{w}"
            )
        zemb = self.prompt_embed(prompt_emb, ms.shape[0])
        cond = (pan - ms).astype(self.dtype)[..., None]
        temb = None  # cond branch never consumes it (use_temb=False)
        c_h0 = self.conv1(cond, zemb)
        c_h1, c_s1 = self.down1_1(c_h0, temb, zemb, train=train)
        c_h2, c_s2 = self.down2_1(c_h1, temb, zemb, train=train)
        c_h3, c_s3 = self.down3_1(c_h2, temb, zemb, train=train)
        return {
            "zemb": zemb,
            "feats": (c_h0, c_h1, c_h2, c_h3),
            "skips": (c_s1, c_s2, c_s3),
        }

    # -- denoising given cached condition --------------------------------------

    def _denoise_impl(self, x_t, t, cond_cache, deep=None, *,
                      cache_level: int = 1, train: bool = False):
        """Shared denoise body. `deep`, when given, is the cached deep-trunk
        state from a previous call and the corresponding blocks are skipped
        entirely (cross-step block caching; see `denoise_reuse`):
          * cache_level=1 — deep = `(x_h3, h_mid)`; skips down3 + middle1.
          * cache_level=2 — deep = `h_up1` (the up1 output; x_h3 feeds only
            the skipped blocks, so it needn't be carried); skips down3 +
            middle1 + up1.
          * cache_level=3 — deep = `h_up2` (the up2 output; x_h2 likewise
            feeds only skipped blocks); skips down2 + down3 + middle1 +
            up1 + up2 — the whole ≤64²-spatial trunk.
        Returns `(out, deep_out)` with `deep_out` at the same level."""
        if cache_level not in (1, 2, 3):
            raise ValueError(f"cache_level must be 1, 2 or 3, got {cache_level}")
        zemb = cond_cache["zemb"]
        c_h0, c_h1, c_h2, c_h3 = cond_cache["feats"]
        c_s1, c_s2, c_s3 = cond_cache["skips"]
        temb = self.time_embed(t)
        xt = x_t.astype(self.dtype)[..., None]

        x_h0 = self.conv2(xt, zemb)
        x_h1, _ = self.down1(x_h0, temb, zemb, train=train)

        # 3-way skip concats are passed as PARTS — the consuming ResBlock
        # slices its kernels instead of materialising the concatenated
        # activation (~0.8 GB of HBM traffic per outer-level concat at 256²;
        # measured 11% faster per decoder conv — ops/modconv.py::conv3d_cat).
        if deep is not None and cache_level == 3:
            h = deep
        else:
            x_h2, _ = self.down2(x_h1, temb, zemb, train=train)
            if deep is not None and cache_level == 2:
                h = deep
            else:
                if deep is None:
                    x_h3, _ = self.down3(x_h2, temb, zemb, train=train)
                    h = self.middle1(x_h3, temb, zemb, train=train)
                else:
                    x_h3, h = deep
                if cache_level == 1:
                    deep_out = (x_h3, h)
                h = self.up1((h, c_h3, x_h3), temb, zemb, c_s3, train=train)
            if cache_level == 2:
                deep_out = h
            h = self.up2((h, c_h2, x_h2), temb, zemb, c_s2, train=train)
        if cache_level == 3:
            deep_out = h
        h = self.up3((h, c_h1, x_h1), temb, zemb, c_s1, train=train)
        out = self.final((h, c_h0, x_h0), temb, zemb, train=train)
        return out[..., 0].astype(jnp.float32), deep_out

    def denoise(self, x_t, t, cond_cache, *, train: bool = False):
        return self._denoise_impl(x_t, t, cond_cache, train=train)[0]

    def denoise_deep(self, x_t, t, cond_cache, *, cache_level: int = 1,
                     train: bool = False):
        """Full denoise that ALSO returns the deep-trunk features for
        cross-step reuse (training-free block caching à la Δ-DiT / "Cache Me
        if You Can", PAPERS.md): at adjacent sampler steps x_t changes
        slowly, and the deepest (lowest-resolution) features change slowest
        of all, so a sampler can refresh them every k-th NFE and run the
        shallow path in between (`denoise_reuse`). cache_level=1 caches
        `(x_h3, h_mid)` (down3+middle skipped on reuse); cache_level=2
        caches `h_up1` (down3+middle+up1 skipped); cache_level=3 caches
        `h_up2` (down2+down3+middle+up1+up2 skipped). Pairs with
        `diffusion.gaussian.ddim_sample_blockcached` (whose `forecast`
        option linearly extrapolates the cached trunk instead of reusing
        it stale — the quality lever that makes the deeper levels usable)."""
        return self._denoise_impl(x_t, t, cond_cache,
                                  cache_level=cache_level, train=train)

    def denoise_reuse(self, x_t, t, cond_cache, deep, *, cache_level: int = 1,
                      train: bool = False):
        """Denoise consuming a cached deep trunk: skips `down3` + `middle1`
        (+ `up1` at cache_level=2, + `down2`/`up2` at cache_level=3; the
        stale features carry the previous step's t through the skipped
        blocks; everything else — shallow encoder, decoder, time
        embedding — is computed fresh at the current t)."""
        return self._denoise_impl(x_t, t, cond_cache, deep,
                                  cache_level=cache_level, train=train)[0]

    # -- fused single-shot forward (reference semantics) -----------------------

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
        cache = self.encode_condition(pan, ms, prompt_emb, train=train)
        return self.denoise(x_t, t, cache, train=train)
