"""On-device metric twins vs the torch reference twins (golden) and the
numpy suite (where conventions coincide)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmdiff_tpu.eval import metrics as M
from tmdiff_tpu.eval import metrics_jnp as MJ

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def g():
    return np.load(os.path.join(GOLDEN, "metrics_jnp.npz"))


def test_torch_twin_goldens(g):
    np.testing.assert_allclose(
        MJ.sam(jnp.asarray(g["xt"]), jnp.asarray(g["xp"])),
        g["sam"], rtol=1e-5)
    np.testing.assert_allclose(
        MJ.scc(jnp.asarray(g["x1"]), jnp.asarray(g["y1"])),
        g["scc"], rtol=1e-4)
    np.testing.assert_allclose(
        MJ.q_index(jnp.asarray(g["a"]), jnp.asarray(g["b"])),
        g["qindex"], rtol=1e-4)
    np.testing.assert_allclose(
        MJ.d_lambda(jnp.asarray(g["lms"]), jnp.asarray(g["ps"])),
        g["d_lambda"], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        MJ.d_s(jnp.asarray(g["lms"]), jnp.asarray(g["pan"]),
               jnp.asarray(g["lpan"]), jnp.asarray(g["ps"])),
        g["d_s"], rtol=1e-3, atol=1e-5)


def test_jit_and_grad_safe(g):
    """Twins must be usable as device-side losses: jit + finite gradients."""
    xt, xp = jnp.asarray(g["xt"]), jnp.asarray(g["xp"])

    val = jax.jit(MJ.sam)(xt, xp)
    assert np.isfinite(float(val))
    grads = jax.grad(lambda p: MJ.sam(xt, p))(xp)
    assert np.all(np.isfinite(np.asarray(grads)))
    grads2 = jax.grad(lambda p: MJ.d_lambda(jnp.asarray(g["lms"]), p))(
        jnp.asarray(g["ps"]))
    assert np.all(np.isfinite(np.asarray(grads2)))


def test_sam_agrees_with_numpy_suite(g):
    """Same angle up to the reference's 3.1415926-vs-π constant (~3e-8
    relative) and NaN handling (none on generic random data)."""
    xt, xp = g["xt"], g["xp"]
    for b in range(xt.shape[0]):
        ours = float(MJ.sam(jnp.asarray(xt[b : b + 1]),
                            jnp.asarray(xp[b : b + 1])))
        ref = M.sam(np.transpose(xt[b], (1, 2, 0)),
                    np.transpose(xp[b], (1, 2, 0)))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_per_image_vectors(g):
    xt, xp = jnp.asarray(g["xt"]), jnp.asarray(g["xp"])
    per = MJ.sam_per_image(xt, xp)
    assert per.shape == (xt.shape[0],)
    np.testing.assert_allclose(float(jnp.mean(per)), float(MJ.sam(xt, xp)),
                               rtol=1e-6)
    s = MJ.ssim_per_image(jnp.asarray(g["ps"]), jnp.asarray(g["ps"]))
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-5)
