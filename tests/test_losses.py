"""Image-op filters and loss library sanity."""
import jax
import jax.numpy as jnp
import numpy as np

from tmdiff_tpu.train import losses
from tmdiff_tpu.utils import image_ops as ops


def test_filters(rng):
    x = jnp.asarray(rng.random((2, 16, 16, 3)), jnp.float32)
    assert ops.box_blur(x).shape == x.shape
    assert ops.gaussian_blur(x).shape == x.shape
    np.testing.assert_allclose(float(ops.gaussian_kernel2d(5, 1.0).sum()), 1.0,
                               rtol=1e-6)
    # high + low pass reconstruct
    np.testing.assert_allclose(
        np.asarray(ops.get_hp(x) + ops.get_lp(x)), np.asarray(x), atol=1e-6
    )


def test_ssim_psnr_extremes(rng):
    x = jnp.asarray(rng.random((1, 32, 32, 2)), jnp.float32)
    assert float(ops.ssim(x, x)) > 0.9999
    assert float(ops.ssim(x, x + 0.2)) < float(ops.ssim(x, x))
    # uniform +0.1 offset → MSE 0.01 → PSNR 20 dB at unit range
    np.testing.assert_allclose(float(ops.psnr(x, x + 0.1)), 20.0, atol=0.2)


def test_loss_library_grads(rng):
    pred = jnp.asarray(rng.random((1, 16, 16, 4)), jnp.float32)
    target = jnp.asarray(rng.random((1, 16, 16, 4)), jnp.float32)
    pan = jnp.asarray(rng.random((1, 16, 16, 1)), jnp.float32)
    lr = jnp.asarray(rng.random((1, 4, 4, 4)), jnp.float32)

    def total(p):
        return (
            losses.l1(p, target)
            + losses.spectral_consistency(p, lr)
            + losses.gradient_matching(p, pan)
            + losses.gradient_matching(p, pan, "laplacian")
            + losses.highpass_matching(p, pan)
            + losses.ssim_loss(p, target)
            + ops.sam_loss(p, target)
        )

    g = jax.grad(total)(pred)
    assert bool(jnp.isfinite(g).all())


def test_composite_and_meter():
    comp = losses.CompositeLoss([
        ("l1", 1.0, losses.l1),
        ("l2", 0.5, losses.l2),
    ])
    pred = jnp.ones((1, 4, 4, 2))
    target = jnp.zeros((1, 4, 4, 2))
    total, logs = comp(pred=pred, target=target)
    np.testing.assert_allclose(float(total), 1.0 + 0.5)
    assert set(logs) == {"l1", "l2"}

    m = losses.AverageMeter()
    m.update(2.0, 2)
    m.update(4.0)
    np.testing.assert_allclose(m.avg, 8.0 / 3)
