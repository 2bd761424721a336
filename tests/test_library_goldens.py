"""Golden parity for library ops vs the torch reference (weight transplant)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_dynamic_conv3d_golden():
    from tmdiff_tpu.ops.dynamic_conv import DynamicConv3d

    g = np.load(os.path.join(GOLDEN, "dynamic_conv.npz"))
    sd = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
    x = jnp.asarray(np.moveaxis(g["x"], 1, -1))  # (B, D, H, W, C)

    conv = DynamicConv3d(features=5, kernel_size=(3, 3, 3), num_kernels=4)
    params = conv.init(jax.random.key(0), x)["params"]
    params = {
        "attention": {
            # torch 1x1x1 convs (hidden, in, 1,1,1) → Dense (in, hidden)
            "fc1": {"kernel": sd["attention.fc1.weight"][:, :, 0, 0, 0].T},
            "fc2": {"kernel": sd["attention.fc2.weight"][:, :, 0, 0, 0].T},
        },
        # torch (K, out, in, kd, kh, kw) → (K, kd, kh, kw, in, out)
        "kernels": np.transpose(sd["weight"], (0, 3, 4, 5, 2, 1)),
        "bias": sd["bias"],
    }
    y = conv.apply({"params": params}, x, temperature=float(g["temperature"]))
    ref = np.moveaxis(g["y"], 1, -1)
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-4)


def test_gaussian_psf_golden():
    from tmdiff_tpu.ops.kernel_adaption import gaussian_kernel_from_q

    g = np.load(os.path.join(GOLDEN, "kernel_adaption.npz"))
    psf = gaussian_kernel_from_q(jnp.asarray(g["q"]), 5, 4)
    np.testing.assert_allclose(np.asarray(psf), g["psf"], atol=1e-6)


def test_gaussian_degradation_golden():
    from tmdiff_tpu.ops.kernel_adaption import GaussianDegradation

    g = np.load(os.path.join(GOLDEN, "kernel_adaption.npz"))
    z = jnp.asarray(np.moveaxis(g["z"], 1, -1))  # (B, H, W, C)
    m = GaussianDegradation(kernel_size=5, scale_factor=4)
    params = {"params": {"KernelParam": jnp.asarray(g["gk_param"])}}
    out = m.apply(params, z)
    ref = np.moveaxis(g["gk_out"], 1, -1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_free_psf_degradation_golden():
    from tmdiff_tpu.ops.kernel_adaption import FreePSFDegradation

    g = np.load(os.path.join(GOLDEN, "kernel_adaption.npz"))
    z = jnp.asarray(np.moveaxis(g["z"], 1, -1))
    m = FreePSFDegradation(scale_factor=4)
    params = {"params": {"KernelAdaption": jnp.asarray(g["ek_param"])}}
    out = m.apply(params, z)
    ref = np.moveaxis(g["ek_out"], 1, -1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
