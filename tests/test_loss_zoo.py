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


def test_triplet_combos_golden(g):
    """r3 closure: loss_func4/5/7/10 (triplet + l3 combinations)."""
    ref, out = _hwc(g["ref"]), _hwc(g["out"])
    pan, ms = _hwc(g["pan"]), _hwc(g["ms"])
    qkv = tuple(jnp.asarray(g[x]) for x in ("q", "k", "v"))
    qkv1 = tuple(jnp.asarray(g[x]) for x in ("q1", "k1", "v1"))
    qkv2 = tuple(jnp.asarray(g[x]) for x in ("q2", "k2", "v2"))
    np.testing.assert_allclose(
        Z.loss_func4(ref, pan, ms, out, qkv), g["loss_func4"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func5(ref, out, qkv), g["loss_func5"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func7(ref, out, qkv, qkv2, qkv1), g["loss_func7"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func10(ref, out), g["loss_func10"], rtol=1e-5)


def test_frequency_separated_golden(g):
    """loss_func12/13: elementwise — layout-invariant, pass raw NCHW."""
    args = tuple(jnp.asarray(g[x]) for x in ("out_l", "out_h", "ms_l", "pan_h"))
    np.testing.assert_allclose(Z.loss_func12(*args), g["loss_func12"], rtol=1e-5)
    np.testing.assert_allclose(Z.loss_func13(*args), g["loss_func13"], rtol=1e-5)


def _flp(g, prefix):
    return tuple(jnp.asarray(g[f"{prefix}_{s}"]) for s in ("w1", "b1", "w2", "b2"))


def test_floss_combos_golden(g):
    """loss_func15-18: L1 + FLoss on pyramid latents (latents raw NCHW —
    torch row-major flattening is what the projections see)."""
    ref, out = _hwc(g["ref8"]), _hwc(g["out8"])
    pc2, mc2 = jnp.asarray(g["pc2"]), jnp.asarray(g["mc2"])
    pgc2, mgc2 = jnp.asarray(g["pgc2"]), jnp.asarray(g["mgc2"])
    pgc1, mgc1 = jnp.asarray(g["pgc1"]), jnp.asarray(g["mgc1"])
    np.testing.assert_allclose(
        Z.loss_func15(ref, out, pc2, mc2, _flp(g, "f15")),
        g["loss_func15"], rtol=1e-4)
    np.testing.assert_allclose(
        Z.loss_func16(ref, out, pc2, mc2, _flp(g, "f16")),
        g["loss_func16"], rtol=1e-4)
    np.testing.assert_allclose(
        Z.loss_func17(ref, out, pgc2, mgc2, pgc1, mgc1,
                      _flp(g, "f17_h2"), _flp(g, "f17_h1")),
        g["loss_func17"], rtol=1e-4)
    np.testing.assert_allclose(
        Z.loss_func18(ref, out, pc2, mc2, pgc2, mgc2, pgc1, mgc1,
                      _flp(g, "f18_l"), _flp(g, "f18_h2"), _flp(g, "f18_h1")),
        g["loss_func18"], rtol=1e-4)


def test_floss_variants_golden(g):
    np.testing.assert_allclose(
        Z.floss2(jnp.asarray(g["pc2"]), jnp.asarray(g["pgc2"]),
                 *_flp(g, "floss2"), lambd=0.5),
        g["floss2"], rtol=1e-4)
    p1 = tuple(jnp.asarray(g[f"floss3_p1_{s}"]) for s in ("wa", "ba", "wb", "bb"))
    p2 = tuple(jnp.asarray(g[f"floss3_p2_{s}"]) for s in ("wa", "ba", "wb", "bb"))
    np.testing.assert_allclose(
        Z.floss3(jnp.asarray(g["floss3_f1"]), jnp.asarray(g["floss3_f2"]),
                 p1, p2, lambd=0.5),
        g["floss3"], rtol=1e-4)
    la, lb = jnp.asarray(g["lat_la"]), jnp.asarray(g["lat_lb"])
    np.testing.assert_allclose(Z.floss4(la, lb), g["floss4"], rtol=1e-5)
    np.testing.assert_allclose(Z.floss5(la, lb), g["floss5"], rtol=1e-5)


def test_pyramid_and_latent_combos_golden(g):
    ref, out = _hwc(g["ref"]), _hwc(g["out"])
    ms2, o2 = _hwc(g["ms2"]), _hwc(g["o2"])
    ms1, o1 = _hwc(g["ms1"]), _hwc(g["o1"])
    L = {k[4:]: jnp.asarray(g[k]) for k in g.files if k.startswith("lat_")}
    np.testing.assert_allclose(
        Z.loss_func20(ref, out, ms2, o2), g["loss_func20"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func21(ref, out, ms2, o2, ms1, o1), g["loss_func21"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func23(ref, out, ms2, o2), g["loss_func23"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func25(ref, out, L["la"], L["lb"], L["ha"], L["hb"]),
        g["loss_func25"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func26(ref, out, L["la"], L["lb"], L["ha"], L["hb"]),
        g["loss_func26"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func27(ref, out, L["la"], L["lb"], L["ha"], L["hb"]),
        g["loss_func27"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func28(ref, out, L["la"], L["lb"]), g["loss_func28"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func29(ref, out, L["la"], L["lb"], L["l1a"], L["l1b"]),
        g["loss_func29"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func29_h(ref, out, L["ha"], L["hb"], L["lha"], L["lhb"]),
        g["loss_func29_h"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func29_h_3(ref, out, L["ha"], L["hb"], L["lha"], L["lhb"],
                          L["llha"], L["llhb"]),
        g["loss_func29_h_3"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func29_lh(ref, out, L["l1a"], L["l1b"], L["la"], L["lb"],
                         L["ha"], L["hb"], L["lha"], L["lhb"]),
        g["loss_func29_lh"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func29_c(ref, out, L["la"], L["lb"], L["l1a"], L["l1b"]),
        g["loss_func29_c"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func29_3layer(ref, out, L["la"], L["lb"], L["l1a"], L["l1b"],
                             L["l3a"], L["l3b"]),
        g["loss_func29_3layer"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func29_a(ref, out, L["la"], L["lb"], L["l1a"], L["l1b"]),
        g["loss_func29_a"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func29_1(ref, out, L["la"], L["lb"], L["l1a"], L["l1b"]),
        g["loss_func29_1"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func30(ref, out, L["la"], L["lb"], L["l1a"], L["l1b"]),
        g["loss_func30"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func31(ref, out, L["la"], L["lb"], L["l1a"], L["l1b"],
                      L["ha"], L["hb"], L["lha"], L["lhb"]),
        g["loss_func31"], rtol=1e-5)
    np.testing.assert_allclose(
        Z.loss_func32(ref, out, L["ha"], L["hb"], L["lha"], L["lhb"]),
        g["loss_func32"], rtol=1e-4)


def test_zoo_registry():
    # every live loss in mylib.py:310-1540 (dead-upstream 11/14/19/24 excluded)
    assert set(Z.LOSS_ZOO) >= {
        "loss_func1", "loss_func2", "loss_func3", "loss_func4", "loss_func5",
        "loss_func6", "loss_func7", "loss_func8", "loss_func9", "loss_func10",
        "loss_func12", "loss_func13", "loss_func15", "loss_func16",
        "loss_func17", "loss_func18", "loss_func20", "loss_func21",
        "loss_func22", "loss_func23", "loss_func25", "loss_func26",
        "loss_func27", "loss_func28", "loss_func29", "loss_func29_h",
        "loss_func29_h_3", "loss_func29_lh", "loss_func29_c",
        "loss_func29_3layer", "loss_func29_a", "loss_func29_1",
        "loss_func30", "loss_func31", "loss_func32",
        "sam_loss", "floss", "floss2", "floss3", "floss4", "floss5",
    }
