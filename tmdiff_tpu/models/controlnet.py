"""TPU-native ControlNet adapter over the legacy UNet.

Parity target: `/root/reference/utils/cldm_unicontrol.py` (the Salesforce
UniControl lift). Upstream this file cannot even be imported — it depends on
a vendored `ldm` package that does not ship (`cldm_unicontrol.py:16-30`) —
so there is no runnable behavior to golden-match; instead this module
reproduces the architecture and its defining invariants TPU-natively and
pins them in tests (tests/test_controlnet.py):

  * `ControlledUnetModel` (`cldm_unicontrol.py:69-93`): the frozen base UNet
    whose middle output and encoder skips receive additive control
    residuals (`h += control.pop()`), with `only_mid_control` dropping the
    skip-level residuals. Here: `ControlledLegacyUNet`, wired exactly like
    `models/legacy_unet.py::LegacyUNet` with identical submodule names so a
    trained LegacyUNet checkpoint is a drop-in base (the "frozen copy"
    workflow of ControlNet).
  * `ControlNet` (`cldm_unicontrol.py:95-424`): a trainable copy of the base
    encoder + middle, a task-MoE hint encoder (13 per-task stems + shared
    trunk, `:212-239`), and per-tap zero convolutions whose weights are
    modulated per sample by a task embedding through a hypernetwork
    (`task_id_hypernet:194-199`, `task_id_layernet`, applied `:409-424`).
    Here: `ControlBranch` + `HintEncoderMoE` + `ModulatedZeroConv`.
  * `modulated_conv2d` (`cldm_unicontrol.py:36-66`, demodulate=False at
    every call site) is mathematically `conv(x · s) + b` — the same
    activation-scaling identity the whole rebuild uses
    (`ops/modconv.py::modulated_conv3d`); no batch-grouped conv needed.
  * The ControlNet init recipe: control branch = copy of the base encoder
    weights, zero convs = exact zeros, so at initialisation the controlled
    model computes EXACTLY the base model (the residuals are identically
    zero). `init_control_from_base` performs the copy;
    `test_controlnet.py::test_zero_init_identity` pins the invariant.
  * `ControlLDM` training semantics (`cldm_unicontrol.py:418+` and the
    standard ControlNet optimiser split): the base encoder + middle run
    under `torch.no_grad()` inside the controlled forward (`:72-79`) — here
    `stop_gradient` on the base taps — and `sd_locked` decides whether the
    base decoder trains at all. `trainable_labels` emits an
    `optax.multi_transform` label tree implementing that split.

Deliberate divergences (documented, TPU-first):
  * The reference hint stems downsample 8× (stride-2 convs, `:218-236`)
    because its UNet runs in a VAE latent space; this model runs at image
    resolution, so the stems keep the exact channel progression
    (hint→16→16→32 per task; shared 32→96→96→256) at stride 1 and the
    hint enters at the head resolution.
  * Task selection is static per call (`task_id` is a Python int), matching
    the reference's one-task-per-batch contract (`cldm_unicontrol.py:409`
    "BS = 1 # one batch one task"); under jit each task compiles its own
    specialisation of the hint stem.
  * The reference `.detach()`es the task style at every modulated conv
    (`:418-424` i.a.) — reproduced with `lax.stop_gradient` (and the same
    odd consequence: the task hypernetwork itself receives no gradient).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tmdiff_tpu.models import legacy_unet
from tmdiff_tpu.models.blocks import (
    AdaptionHead,
    Conv3d,
    ResBlockModulate,
    swish,
)
from tmdiff_tpu.models.legacy_blocks import StridedDownStage
from tmdiff_tpu.models.wavbest import PromptMLP, TimeMLP
from tmdiff_tpu.ops.modconv import conv3d, modulated_conv3d

# `cldm_unicontrol.py:146-150` — the 13 UniControl task ids, verbatim.
TASKS_TO_ID = {
    "control_hed": 0, "control_canny": 1, "control_seg": 2,
    "control_depth": 3, "control_normal": 4, "control_openpose": 5,
    "control_img": 6, "control_hedsketch": 7, "control_bbox": 8,
    "control_outpainting": 9, "control_grayscale": 10, "control_blur": 11,
    "control_inpainting": 12,
}

# `cldm_unicontrol.py:422-428` (ControlLDM.mapping_task) — the natural-
# language task prompts fed to the frozen text encoder to obtain the 768-d
# task feature. Behavioral-contract data, not code.
TASK_PROMPTS = {
    "control_hed": "hed edge to image",
    "control_canny": "canny edge to image",
    "control_seg": "segmentation map to image",
    "control_depth": "depth map to image",
    "control_normal": "normal surface map to image",
    "control_openpose": "human pose skeleton to image",
    "control_img": "image editing",
    "control_hedsketch": "sketch to image",
    "control_bbox": "bounding box to image",
    "control_outpainting": "image outpainting",
    "control_grayscale": "gray image to color image",
    "control_blur": "deblur image to clean image",
    "control_inpainting": "image inpainting",
}

ALL_TASKS_NUM = len(TASKS_TO_ID)  # 13


def torch_conv_bias_init(fan_in: int):
    """torch `_ConvNd.reset_parameters` bias init: U(±1/√fan_in).

    Load-bearing for trainability, not a cosmetic fidelity detail: the hint
    path is gated by TWO chained zero convs (`zeroconv0` before the shared
    trunk, `zeroconv1` after it). With zero conv biases the trunk's output
    at zeroconv0's exactly-zero init would itself be exactly zero, so
    zeroconv1's gradient — ∝ its input — would be identically zero, and
    zeroconv0's — gated by zeroconv1's kernel — too: the hint path could
    NEVER leave zero under training. The reference escapes this only because
    torch convs ship nonzero default biases; reproduce that here.
    (Regression: tests/test_controlnet.py::test_hint_path_bootstraps.)"""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def task_feature(task_name: str) -> jnp.ndarray:
    """768-d feature for a task name via the frozen text-encoder machinery.

    The reference encodes `mapping_task[task]` with its frozen CLIP
    (`cldm_unicontrol.py:430-436`); here the task prompt goes through the
    same deterministic embedding scheme as the sensor prompts
    (`models/clip_text.py` — placeholder-mode caveats apply here too; a
    real-CLIP table export would replace this the same way).
    """
    from tmdiff_tpu.models.clip_text import placeholder_text_embedding

    return jnp.asarray(placeholder_text_embedding(TASK_PROMPTS[task_name]))


class TaskHypernet(nn.Module):
    """`task_id_hypernet` (`cldm_unicontrol.py:194-199`): 768 → 4·C → 4·C
    with SiLU after each linear."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feature):
        h = swish(nn.Dense(self.time_embed_dim, name="fc1",
                           dtype=self.dtype)(feature.astype(self.dtype)))
        return swish(nn.Dense(self.time_embed_dim, name="fc2",
                              dtype=self.dtype)(h))


class ModulatedZeroConv(nn.Module):
    """Zero-initialised conv modulated per input channel by the task style.

    `make_zero_conv` + `task_id_layernet` + the `modulated_conv2d` call
    pattern (`cldm_unicontrol.py:361-362, 409-424`): weight and bias start
    at exact zero (`zero_module`), the style is a per-task linear projection
    of the hypernet output, detached from the gradient graph upstream —
    reproduced with stop_gradient. With demodulate=False the torch grouped
    conv is exactly conv(x · style) + bias (`ops/modconv.py` module doc)."""

    features: int
    kernel_size: Sequence[int] = (1, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, task_emb):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.zeros,
            (*self.kernel_size, cin, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        # task_id_layernet: Linear(time_embed_dim → cin); style detached
        # exactly as upstream does at every call site.
        style = nn.Dense(cin, name="style", dtype=self.dtype)(task_emb)
        style = jax.lax.stop_gradient(style)
        if style.ndim == 1:
            style = jnp.broadcast_to(style, (x.shape[0], cin))
        y = modulated_conv3d(x.astype(self.dtype),
                             kernel.astype(self.dtype), style)
        return y + bias.astype(y.dtype)


class HintEncoderMoE(nn.Module):
    """Task-MoE hint encoder (`cldm_unicontrol.py:212-239, 409-421`).

    Per-task stem (`input_hint_block_list_moe`): hint → 16 → 16 → 32 with
    SiLU; then a modulated zero conv 32→32 (`input_hint_block_zeroconv_0`);
    the shared trunk (`input_hint_block_share`): 32 → 32 → 96 → 96 → 256;
    then a modulated zero conv 256 → model_channels
    (`input_hint_block_zeroconv_1`). Stride-1 everywhere (see module doc —
    no latent space to downsample into).

    The hint is a 2-D per-pixel map (B, H, W, hint_channels); the output is
    broadcast over the band/depth axis by the caller.
    """

    model_channels: int
    hint_channels: int = 3
    all_tasks_num: int = ALL_TASKS_NUM
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hint, task_id: int, task_emb):
        d = self.dtype
        h = hint.astype(d)[:, None]  # (B, 1, H, W, C) — depth-1 3-D conv

        # MoE: one stacked param per layer covers every task (the checkpoint
        # is task-independent); the static task_id slices out the selected
        # expert at trace time, so only one stem's convs are compiled — the
        # one-task-per-batch contract, `cldm_unicontrol.py:409`.
        widths = ((self.hint_channels, 16), (16, 16), (16, 32))
        for li, (cin, cout) in enumerate(widths):
            # batch_axis: the stacked task axis is NOT receptive field —
            # fan_in must be the per-expert 9·cin, not 13·9·cin.
            kernel = self.param(
                f"stem{li}_kernel",
                nn.initializers.lecun_normal(batch_axis=(0,)),
                (self.all_tasks_num, 1, 3, 3, cin, cout), jnp.float32,
            )
            bias = self.param(f"stem{li}_bias",
                              torch_conv_bias_init(9 * cin),
                              (self.all_tasks_num, cout), jnp.float32)
            h = swish(conv3d(h, kernel[task_id].astype(d))
                      + bias[task_id].astype(d))

        h = ModulatedZeroConv(32, name="zeroconv0", dtype=d)(h, task_emb)

        # Nonzero trunk biases (torch default) are what let the chained
        # zero convs bootstrap under training — see torch_conv_bias_init.
        h = swish(Conv3d(32, (1, 3, 3), name="share0", dtype=d,
                         bias_init=torch_conv_bias_init(9 * 32))(h))
        h = swish(Conv3d(96, (1, 3, 3), name="share1", dtype=d,
                         bias_init=torch_conv_bias_init(9 * 32))(h))
        h = swish(Conv3d(96, (1, 3, 3), name="share2", dtype=d,
                         bias_init=torch_conv_bias_init(9 * 96))(h))
        h = swish(Conv3d(256, (1, 3, 3), name="share3", dtype=d,
                         bias_init=torch_conv_bias_init(9 * 96))(h))

        h = ModulatedZeroConv(self.model_channels, name="zeroconv1",
                              dtype=d)(h, task_emb)
        return h  # (B, 1, H, W, model_channels)


class ControlBranch(nn.Module):
    """Trainable copy of the base x-encoder + middle with zero-conv taps.

    Mirrors `ControlNet.forward` (`cldm_unicontrol.py:364-424`): the guided
    hint is added to the first block's output, every encoder tap goes
    through a task-modulated zero conv, and the middle output through
    `middle_block_out`. Submodule names match `LegacyUNet`'s x-side
    (`conv2`, `down1..3`, `middle1`) so `init_control_from_base` is a
    straight tree copy."""

    channels: Sequence[int] = (32, 64, 128, 256)
    hint_channels: int = 3
    embed_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xt, gemb, prompt_emb, hint, task_id: int, task_emb,
                 *, train: bool = False):
        c0, c1, c2, c3 = self.channels
        d = self.dtype

        # The ControlNet owns a trainable COPY of the base time/prompt embeds
        # (upstream `ControlNet.time_embed`, `cldm_unicontrol.py:190-193` —
        # copied from the base at init like the rest of the encoder); the
        # base's own embeds run under no_grad in the controlled forward.
        temb = swish(TimeMLP(self.embed_dim, name="embed", dtype=d)(gemb))
        zemb = swish(PromptMLP(self.embed_dim, name="embed2", dtype=d)(
            prompt_emb))

        guided = HintEncoderMoE(
            c0, hint_channels=self.hint_channels, name="hint", dtype=d
        )(hint, task_id, task_emb)

        h0 = AdaptionHead(c0, name="conv2", dtype=d)(xt, zemb)
        h0 = h0 + guided  # broadcast over the band/depth axis
        h1 = StridedDownStage(c1, name="down1", dtype=d)(h0, temb, zemb, train=train)
        h2 = StridedDownStage(c2, name="down2", dtype=d)(h1, temb, zemb, train=train)
        h3 = StridedDownStage(c3, name="down3", dtype=d)(h2, temb, zemb, train=train)
        mid = ResBlockModulate(c3, name="middle1", dtype=d)(h3, temb, zemb, train=train)

        taps = (h0, h1, h2, h3, mid)
        feats = (c0, c1, c2, c3, c3)
        return tuple(
            ModulatedZeroConv(f, name=f"zero{i}", dtype=d)(h, task_emb)
            for i, (h, f) in enumerate(zip(taps, feats))
        )


class ControlledLegacyUNet(nn.Module):
    """LegacyUNet + additive control residuals (`ControlledUnetModel`,
    `cldm_unicontrol.py:69-93`).

    Base submodule names are IDENTICAL to `models/legacy_unet.py::LegacyUNet`
    — a trained LegacyUNet param tree drops in via `inject_base_params` —
    and the base encoder + middle taps are stop_gradient'ed exactly where
    the reference wraps them in `torch.no_grad()` (`:72-79`). With
    `hint=None` (or at zero-init of the control branch) the forward equals
    the plain LegacyUNet bit for bit."""

    channels: Sequence[int] = (32, 64, 128, 256)
    hint_channels: int = 3
    embed_dim: int = 128
    inter_dim: int = 32
    only_mid_control: bool = False
    control_scales: Sequence[float] = (1.0,) * 5  # `self.control_scales`, :429
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_t, t, pan, ms, prompt_emb, *, hint=None,
                 task_id: int = 0, task_feat=None, train: bool = False):
        c0 = self.channels[0]
        d = self.dtype
        if prompt_emb.ndim == 1:
            prompt_emb = jnp.broadcast_to(
                prompt_emb, (x_t.shape[0], prompt_emb.shape[0]))

        # The base forward IS LegacyUNet's own stage helpers
        # (legacy_unet.embeds/encode/middle/decode) — one wiring definition,
        # no drift between the plain and the controlled model.
        gemb, temb, zemb = legacy_unet.embeds(self, x_t, t, prompt_emb)
        # Upstream computes the base time embed inside the same
        # torch.no_grad() that freezes the encoder (`cldm_unicontrol.py:72`);
        # the decoder consumes the detached emb. Mirror that exactly so the
        # base embed MLPs receive zero gradient in the controlled forward.
        temb = jax.lax.stop_gradient(temb)
        zemb = jax.lax.stop_gradient(zemb)

        cond = (pan - ms).astype(d)[..., None]
        xt = x_t.astype(d)[..., None]

        # Base encoder (cond + x sides) + middle, then torch.no_grad() over
        # input_blocks + middle_block (:72-79) as stop_gradient on the taps.
        c_taps, x_taps = legacy_unet.encode(self, cond, xt, temb, zemb,
                                            train=train)
        h = legacy_unet.middle(self, x_taps[3], temb, zemb, train=train)
        c_taps = tuple(map(jax.lax.stop_gradient, c_taps))
        x_h0, x_h1, x_h2, x_h3 = map(jax.lax.stop_gradient, x_taps)
        h = jax.lax.stop_gradient(h)

        if hint is not None:
            if task_feat is None:
                raise ValueError("hint conditioning requires task_feat "
                                 "(768-d, see task_feature())")
            task_emb = TaskHypernet(4 * c0, name="task_hypernet", dtype=d)(
                jnp.asarray(task_feat))
            r0, r1, r2, r3, r_mid = ControlBranch(
                self.channels, hint_channels=self.hint_channels,
                embed_dim=self.embed_dim, name="control", dtype=d,
            )(xt, gemb, prompt_emb.astype(d), hint, task_id, task_emb,
              train=train)
            s = self.control_scales
            h = h + s[4] * r_mid  # `h += control.pop()` (:81-82)
            if not self.only_mid_control:  # (:84-88)
                x_h3 = x_h3 + s[3] * r3
                x_h2 = x_h2 + s[2] * r2
                x_h1 = x_h1 + s[1] * r1
                x_h0 = x_h0 + s[0] * r0

        return legacy_unet.decode(self, h, c_taps, (x_h0, x_h1, x_h2, x_h3),
                                  xt, temb, zemb, train=train)


# --- parameter plumbing -----------------------------------------------------

_BASE_ENCODER_KEYS = (
    "embed", "embed2", "conv1", "down1_1", "down2_1", "down3_1",
    "conv2", "down1", "down2", "down3", "middle1",
)
_BASE_DECODER_KEYS = ("up1", "up2", "up3", "final", "out_proj")
_CONTROL_KEYS = ("control", "task_hypernet")
# ControlBranch submodules that are copies of base modules (x-side encoder
# plus the time/prompt embed MLPs, `cldm_unicontrol.py:190-193`).
_COPY_PAIRS = (("conv2", "conv2"), ("down1", "down1"), ("down2", "down2"),
               ("down3", "down3"), ("middle1", "middle1"),
               ("embed", "embed"), ("embed2", "embed2"))


def inject_base_params(controlled_params: dict, base_params: dict) -> dict:
    """Load a plain LegacyUNet param tree into a ControlledLegacyUNet tree.

    The frozen-base workflow (`ControlLDM` instantiates the diffusion model
    from the pretrained checkpoint): every base leaf is replaced; control
    leaves are untouched."""
    out = dict(controlled_params)
    for k in _BASE_ENCODER_KEYS + _BASE_DECODER_KEYS:
        out[k] = base_params[k]
    return out


def init_control_from_base(controlled_params: dict) -> dict:
    """The ControlNet init recipe: control branch := copy of the base
    encoder weights (zero convs stay zero). Mirrors `ControlLDM` loading the
    SD encoder weights into `control_model` (ControlNet paper / repo
    convention the reference copies)."""
    out = dict(controlled_params)
    control = dict(out["control"])
    for src, dst in _COPY_PAIRS:
        control[dst] = jax.tree.map(lambda x: x, out[src])
    out["control"] = control
    return out


def trainable_labels(params: dict, *, sd_locked: bool = True) -> dict:
    """`optax.multi_transform` labels implementing the ControlNet optimiser
    split: control branch always trains; the base decoder trains only when
    not sd_locked; the base encoder never does (it runs under no_grad in the
    controlled forward, `cldm_unicontrol.py:72-79`)."""
    def label_for(key):
        if key in _CONTROL_KEYS:
            return "train"
        if key in _BASE_DECODER_KEYS and not sd_locked:
            return "train"
        return "freeze"

    return {k: jax.tree.map(lambda _: label_for(k), v)
            for k, v in params.items()}
