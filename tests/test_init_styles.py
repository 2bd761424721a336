"""init_type styles (normal / kaiming / orthogonal) parity semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmdiff_tpu.models import WavBEST
from tmdiff_tpu.models.init_styles import apply_init_style


@pytest.fixture(scope="module")
def params():
    m = WavBEST(channels=(4, 8, 8, 16))
    x = jnp.ones((1, 4, 16, 16))
    return m.init(jax.random.key(0), x, jnp.array([1]), jnp.ones((1, 1, 16, 16)),
                  x, jnp.zeros(768))


def _leaves(p):
    return {
        "/".join(str(k.key) for k in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(p)[0]
    }


def test_normal(params):
    out = _leaves(apply_init_style(params, "normal", jax.random.key(1)))
    k = out["params/middle1/conv20/kernel"]
    assert abs(k.std() - 0.02) < 0.005
    assert out["params/middle1/conv20/bias"].sum() == 0


def test_orthogonal(params):
    out = _leaves(apply_init_style(params, "orthogonal", jax.random.key(1)))
    k = out["params/embed/lin0/kernel"]  # (32, 128): rows orthonormal
    gram = k @ k.T
    np.testing.assert_allclose(gram, np.eye(k.shape[0]), atol=1e-5)


def test_kaiming_quirk(params):
    """kaiming touches Linear (Dense) only — conv kernels keep their init
    (the reference matches classname 'Conv2d', never 'Conv3d')."""
    before = _leaves(params)
    out = _leaves(apply_init_style(params, "kaiming", jax.random.key(1)))
    conv = "params/middle1/conv20/kernel"
    dense = "params/embed/lin0/kernel"
    np.testing.assert_array_equal(out[conv], before[conv])
    assert not np.allclose(out[dense], before[dense])
    fan_in = before[dense].shape[0]
    assert abs(out[dense].std() - np.sqrt(2.0 / fan_in)) < 0.03


def test_torch_reference_state(params):
    """'torch' = the reference's exact post-init_weights('kaiming') state:
    conv kernels/biases at torch Conv3d defaults (U(±1/√fan_in)), Linear
    kernels kaiming-normal, ALL Linear biases zero (style bias included —
    the one place this deliberately diverges from our 'kaiming' bias=1)."""
    out = _leaves(apply_init_style(params, "torch", jax.random.key(1)))
    conv = out["params/middle1/conv20/kernel"]
    bound = 1.0 / np.sqrt(np.prod(conv.shape[:-1]))
    assert conv.min() >= -bound and conv.max() <= bound
    # uniform on ±bound has std bound/√3
    assert abs(conv.std() - bound / np.sqrt(3)) < 0.2 * bound
    cbias = out["params/middle1/conv20/bias"]
    assert cbias.min() >= -bound and cbias.max() <= bound
    assert np.abs(cbias).max() > 0  # NOT zeroed (torch default kept)
    dense = out["params/embed/lin0/kernel"]
    assert abs(dense.std() - np.sqrt(2.0 / dense.shape[0])) < 0.03
    # every style bias is zero (upstream zeroes Linear biases)
    styles = [k for k in out if k.endswith("style/bias")]
    assert styles
    for k in styles:
        assert np.abs(out[k]).sum() == 0, k
    # style kernels get kaiming-normal, so styles are mean-0 random — the
    # model must still pass gradients (upstream trains in this regime)


def test_unknown_style(params):
    with pytest.raises(NotImplementedError):
        apply_init_style(params, "xavier", jax.random.key(0))


def test_torch_state_transpose_and_stacked_leaves():
    """'torch' on module families outside WavBEST:
    * ConvTranspose3d (`up_kernel`/`up_bias`) keeps torch defaults where
      fan_in reads weight.size(1) — the OUT channels for transposed convs —
      so bound = 1/√(out·prod(k)), bias included (not zero);
    * Dynamic_conv stacked `kernels` (K, *k, in, out): per-expert DEFAULT
      kaiming_uniform_ (bound √(6/(in·prod(k))), K excluded from fan), and
      its bias stays exactly zero (created as zeros, never re-initialised —
      reference core/dynamic_conv.py:61-72)."""
    from tmdiff_tpu.models.legacy_unet import LegacyUNet
    from tmdiff_tpu.ops.dynamic_conv import DynamicConv3d

    x = jnp.ones((1, 4, 16, 16))
    lp = LegacyUNet(channels=(8, 12, 16, 20), embed_dim=16, inter_dim=8).init(
        jax.random.key(0), x, jnp.array([1.0]), x, x, jnp.zeros(768))
    out = _leaves(apply_init_style(lp, "torch", jax.random.key(1)))
    upk = out["params/up1/up_kernel"]
    upb = out["params/up1/up_bias"]
    bound = 1.0 / np.sqrt(np.prod(upk.shape[:-2]) * upk.shape[-1])
    assert upk.min() >= -bound and upk.max() <= bound
    assert abs(upk.std() - bound / np.sqrt(3)) < 0.2 * bound
    assert np.abs(upb).max() > 0 and np.abs(upb).max() <= bound

    dc = DynamicConv3d(features=6, kernel_size=(3, 3, 3))
    dp = dc.init(jax.random.key(0), jnp.ones((1, 2, 8, 8, 4)))
    dout = _leaves(apply_init_style(dp, "torch", jax.random.key(1)))
    ks = dout["params/kernels"]
    b6 = np.sqrt(6.0 / np.prod(ks.shape[1:-1]))
    assert ks.min() >= -b6 and ks.max() <= b6
    assert abs(ks.std() - b6 / np.sqrt(3)) < 0.2 * b6
    assert np.abs(dout["params/bias"]).sum() == 0
