"""Golden transplant parity for the reference's defined-but-unused UNet
blocks: ChannelWiseAttention (`Hyper_unet_general.py:130-155`) and
AdaptiveGroupNorm (`:311-331`). Fixture from tools/make_goldens.py."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmdiff_tpu.models.blocks import AdaptiveGroupNorm, ChannelWiseAttention

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def g():
    return np.load(os.path.join(GOLDEN, "orphan_blocks.npz"))


def _to_channels_last(x):
    # torch (B, C, D, H, W) → ours (B, D, H, W, C)
    return np.transpose(x, (0, 2, 3, 4, 1))


def test_channel_wise_attention_golden(g):
    x = jnp.asarray(_to_channels_last(g["x"]))
    m = ChannelWiseAttention(reduction_ratio=16)
    params = m.init(jax.random.key(0), x)
    params = jax.tree.map(lambda v: v, params)  # unfreeze-agnostic copy
    params["params"]["fc1"]["kernel"] = jnp.asarray(g["cwa.fc1.weight"].T)
    params["params"]["fc1"]["bias"] = jnp.asarray(g["cwa.fc1.bias"])
    params["params"]["fc2"]["kernel"] = jnp.asarray(g["cwa.fc2.weight"].T)
    params["params"]["fc2"]["bias"] = jnp.asarray(g["cwa.fc2.bias"])
    y = m.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y), _to_channels_last(g["y_cwa"]), atol=1e-5
    )


def test_adaptive_group_norm_golden(g):
    x = jnp.asarray(_to_channels_last(g["x"]))
    style = jnp.asarray(g["style"])
    m = AdaptiveGroupNorm(num_groups=4)
    params = m.init(jax.random.key(0), x, style)
    params["params"]["style"]["kernel"] = jnp.asarray(g["agn.style.weight"].T)
    params["params"]["style"]["bias"] = jnp.asarray(g["agn.style.bias"])
    y = m.apply(params, x, style)
    np.testing.assert_allclose(
        np.asarray(y), _to_channels_last(g["y_agn"]), atol=2e-5
    )


def test_agn_identity_at_init():
    """γ bias starts at 1, β at 0 — with a zero style the block reduces to
    plain GroupNorm (the StyleGAN identity-start convention)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 3, 6, 6, 16)), jnp.float32)
    m = AdaptiveGroupNorm(num_groups=4)
    params = m.init(jax.random.key(0), x, jnp.zeros((2, 8)))
    y = m.apply(params, x, jnp.zeros((2, 8)))
    import flax.linen as nn

    ref = nn.GroupNorm(num_groups=4, epsilon=1e-6, use_bias=False,
                       use_scale=False).apply({"params": {}}, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-6)
