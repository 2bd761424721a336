"""Legacy (non-wavelet) UNet blocks: golden parity with unet_util.py."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmdiff_tpu.models.legacy_blocks import StridedDownStage, TransposedUpStage
from tmdiff_tpu.utils.torch_import import import_state_dict

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def fixture():
    g = np.load(os.path.join(GOLDEN, "unet_legacy.npz"))
    down_sd = {k[5:]: g[k] for k in g.files if k.startswith("down.")}
    up_sd = {k[3:]: g[k] for k in g.files if k.startswith("up.")}
    return g, down_sd, up_sd


def _to_dhwc(x):
    # torch (B, C, D, H, W) -> ours (B, D, H, W, C)
    return np.moveaxis(x, 1, -1)


def test_strided_down_golden(fixture):
    g, down_sd, _ = fixture
    x = jnp.asarray(_to_dhwc(g["x"]))
    temb = jnp.asarray(g["embed"])
    zemb = jnp.asarray(g["ctx"])
    m = StridedDownStage(features=6)
    params = m.init(jax.random.key(0), x, temb, zemb)
    params = import_state_dict(down_sd, params, prefix="")
    y = m.apply(params, x, temb, zemb)
    np.testing.assert_allclose(np.asarray(y), _to_dhwc(g["y_down"]), atol=2e-4)


def test_transposed_up_golden(fixture):
    g, _, up_sd = fixture
    xu = jnp.asarray(_to_dhwc(g["xu"]))
    temb = jnp.asarray(g["embed"])
    zemb = jnp.asarray(g["ctx"])
    m = TransposedUpStage(features=6)
    params = m.init(jax.random.key(0), xu, temb, zemb, xu, xu)
    params = import_state_dict(up_sd, params, prefix="")
    y = m.apply(params, xu, temb, zemb, xu, xu)
    np.testing.assert_allclose(np.asarray(y), _to_dhwc(g["y_up"]), atol=2e-4)


def test_legacy_unet_assembled(rng):
    """Full legacy-family model runs end to end and shape-round-trips."""
    from tmdiff_tpu.models.legacy_unet import LegacyUNet

    m = LegacyUNet(channels=(4, 8, 8, 16))
    B, bands, H, W = 1, 4, 32, 32
    x = jnp.asarray(rng.standard_normal((B, bands, H, W)), jnp.float32)
    t = jnp.array([7])
    pan = jnp.asarray(rng.standard_normal((B, 1, H, W)), jnp.float32)
    ms = jnp.asarray(rng.standard_normal((B, bands, H, W)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal(768), jnp.float32)
    params = m.init(jax.random.key(0), x, t, pan, ms, emb)
    out = m.apply(params, x, t, pan, ms, emb)
    assert out.shape == (B, bands, H, W)
    assert bool(jnp.isfinite(out).all())
