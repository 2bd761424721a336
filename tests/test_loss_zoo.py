"""Named reference loss zoo vs torch goldens (tools/make_goldens.py).

Layout note: goldens are torch NCHW; the zoo takes channels-last."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tmdiff_tpu.train import loss_zoo as Z

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def g():
    return np.load(os.path.join(GOLDEN, "loss_zoo.npz"))


def _hwc(x):
    return jnp.asarray(np.moveaxis(x, 1, -1))


def test_image_losses_golden(g):
    ref, out = _hwc(g["ref"]), _hwc(g["out"])
    pan, ms = _hwc(g["pan"]), _hwc(g["ms"])
    np.testing.assert_allclose(
        Z.loss_func1(ref, pan, ms, out), g["loss_func1"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func2(ref, pan, ms, out), g["loss_func2"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func8(pan, ms, out), g["loss_func8"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func22(ref, out), g["loss_func22"], rtol=1e-5)


def test_loss_func9_runs(g):
    """The torch original is unrunnable under current torch (4-D target to
    cosine_embedding_loss, mylib:676-678); ours implements the intended
    semantics — sanity-check value range only."""
    pan, ms, out = _hwc(g["pan"]), _hwc(g["ms"]), _hwc(g["out"])
    val = float(Z.loss_func9(pan, ms, out))
    assert np.isfinite(val) and val > 0


def test_feature_losses_golden(g):
    q, k, v = (jnp.asarray(g[x]) for x in ("q", "k", "v"))
    q1, k1, v1 = (jnp.asarray(g[x]) for x in ("q1", "k1", "v1"))
    ref, out = _hwc(g["ref"]), _hwc(g["out"])
    np.testing.assert_allclose(
        Z.loss_func6(ref, out, (q, k, v), (q1, k1, v1)),
        g["loss_func6"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.sam_loss(ref, out), g["sam_loss"], rtol=1e-5)


def test_dwt_mwcnn_golden(g):
    ll, lh, hl, hh = Z.dwt_mwcnn(_hwc(g["ref"]))
    for ours, name in ((ll, "dwt_ll"), (lh, "dwt_lh"), (hl, "dwt_hl"),
                       (hh, "dwt_hh")):
        np.testing.assert_allclose(
            np.asarray(ours), np.moveaxis(g[name], 1, -1), atol=1e-5)


def test_floss_golden(g):
    val = Z.floss(
        jnp.asarray(g["floss_f1"]), jnp.asarray(g["floss_f2"]),
        jnp.asarray(g["floss_w1"]), jnp.asarray(g["floss_b1"]),
        jnp.asarray(g["floss_w2"]), jnp.asarray(g["floss_b2"]),
        lambd=0.005,
    )
    np.testing.assert_allclose(val, g["floss"], rtol=1e-4)


def test_zoo_registry():
    assert set(Z.LOSS_ZOO) >= {
        "loss_func1", "loss_func2", "loss_func3", "loss_func6",
        "loss_func8", "loss_func9", "loss_func22", "sam_loss", "floss",
    }
