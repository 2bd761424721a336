"""Library ops: flash attention vs einsum reference, dynamic conv mixing
identity, PSF degradations, PGCU, attention blocks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmdiff_tpu.ops.pallas.flash_attention import attention_reference, flash_attention


class TestFlashAttention:
    @pytest.mark.parametrize("shape", [(2, 4, 64, 32), (1, 2, 100, 40), (1, 1, 256, 64)])
    def test_matches_reference(self, rng, shape):
        b, h, s, d = shape
        q = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        k = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        v = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        out = flash_attention(q, k, v, block_q=64, block_k=64)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_cross_lengths(self, rng):
        q = jnp.asarray(rng.standard_normal((1, 2, 48, 32)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, 2, 130, 32)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, 2, 130, 32)), jnp.float32)
        out = flash_attention(q, k, v, block_q=64, block_k=64)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestPallasConv:
    @pytest.mark.parametrize("shape", [(2, 16, 12, 8, 16), (1, 32, 32, 16, 8)])
    def test_matches_xla(self, rng, shape):
        from jax import lax

        from tmdiff_tpu.ops.pallas.conv2d import conv3x3_nhwc

        b, h, w, c, co = shape
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, c, co)), jnp.float32)
        y = conv3x3_nhwc(x, k)
        ref = lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)

    def test_bandlanes_pallas_backend(self, rng, monkeypatch):
        """The full band-into-lanes lowering with the Pallas conv backend
        must match the XLA backend bit-for-bit semantics."""
        import tmdiff_tpu.ops.modconv as mc

        x = jnp.asarray(rng.standard_normal((2, 4, 16, 16, 8)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 8)), jnp.float32)
        ref = mc._conv3d_bandlanes(x, k)
        monkeypatch.setattr(mc, "BANDLANES_CONV", "pallas")
        out = mc._conv3d_bandlanes(x, k)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


class TestDynamicConv:
    def test_mixing_identity(self, rng):
        """Σ_k a_k conv(x, W_k) must equal conv with per-sample mixed weights."""
        from tmdiff_tpu.ops.dynamic_conv import DynamicConv

        x = jnp.asarray(rng.standard_normal((3, 10, 10, 6)), jnp.float32)
        conv = DynamicConv(features=5, kernel_size=(3, 3), num_kernels=4)
        params = conv.init(jax.random.key(0), x)
        out = conv.apply(params, x, temperature=2.0)
        assert out.shape == (3, 10, 10, 5)

        # naive: aggregate weights per sample, then single-sample convs
        from tmdiff_tpu.ops.dynamic_conv import _KernelGate

        gate = _KernelGate(4, 0.25).apply(
            {"params": params["params"]["attention"]}, x, 2.0
        )
        kernels = params["params"]["kernels"]
        bias = params["params"]["bias"]
        outs = []
        for b in range(3):
            wmix = jnp.einsum("k,khwio->hwio", gate[b], kernels)
            bmix = jnp.einsum("k,kf->f", gate[b], bias)
            o = jax.lax.conv_general_dilated(
                x[b : b + 1], wmix, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bmix
            outs.append(o)
        np.testing.assert_allclose(out, jnp.concatenate(outs), atol=1e-4)

    def test_3d(self, rng):
        from tmdiff_tpu.ops.dynamic_conv import DynamicConv3d

        x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 3)), jnp.float32)
        conv = DynamicConv3d(features=6, kernel_size=(3, 3, 3))
        params = conv.init(jax.random.key(0), x)
        assert conv.apply(params, x, temperature=34.0).shape == (2, 4, 8, 8, 6)

    def test_anneal(self):
        from tmdiff_tpu.ops.dynamic_conv import anneal_temperature

        t = 34.0
        for _ in range(20):
            t = anneal_temperature(t)
        assert t == 1.0


class TestKernelAdaption:
    def test_gaussian_psf_normalised(self):
        from tmdiff_tpu.ops.kernel_adaption import gaussian_kernel_from_q

        psf = gaussian_kernel_from_q(5.0 * jnp.eye(2), 5, 4)
        assert psf.shape == (5, 5)
        np.testing.assert_allclose(float(psf.sum()), 1.0, rtol=1e-6)
        # center-heavy
        assert float(psf[2, 2]) == float(psf.max())

    def test_degradations(self, rng):
        from tmdiff_tpu.ops.kernel_adaption import FreePSFDegradation, GaussianDegradation

        x = jnp.asarray(rng.standard_normal((2, 32, 32, 4)), jnp.float32)
        g = GaussianDegradation(kernel_size=5, scale_factor=4)
        pg = g.init(jax.random.key(0), x)
        assert g.apply(pg, x).shape == (2, 7, 7, 4)
        f = FreePSFDegradation(scale_factor=4)
        pf = f.init(jax.random.key(0), x)
        assert f.apply(pf, x).shape == (2, 8, 8, 4)

    def test_free_psf_is_mean_at_init_zeroish(self, rng):
        """Softmax PSF sums to one -> acts as weighted average (bounded)."""
        from tmdiff_tpu.ops.kernel_adaption import FreePSFDegradation

        x = jnp.ones((1, 16, 16, 2))
        f = FreePSFDegradation(scale_factor=4)
        p = f.init(jax.random.key(1), x)
        np.testing.assert_allclose(f.apply(p, x), 1.0, rtol=1e-5)


class TestPGCU:
    def test_shapes(self, rng):
        from tmdiff_tpu.ops.pgcu import PGCU

        pan = jnp.asarray(rng.standard_normal((2, 32, 32, 1)), jnp.float32)
        ms = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
        m = PGCU(channels=4, vec_len=128)
        params = m.init(jax.random.key(0), pan, ms)
        out = m.apply(params, pan, ms)
        assert out.shape == (2, 32, 32, 4)
        assert bool(jnp.isfinite(out).all())


class TestAttentionBlocks:
    def test_spatial_transformer(self, rng):
        from tmdiff_tpu.ops.attention import SpatialTransformer

        x = jnp.asarray(rng.standard_normal((1, 8, 8, 32)), jnp.float32)
        ctx = jnp.asarray(rng.standard_normal((1, 5, 96)), jnp.float32)
        m = SpatialTransformer(heads=4, dim_head=16, use_checkpoint=False)
        params = m.init(jax.random.key(0), x, ctx)
        out = m.apply(params, x, ctx)
        assert out.shape == x.shape
        # zero-init proj_out => identity at init
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

    def test_channel_attention(self, rng):
        from tmdiff_tpu.ops.attention import ChannelSelfAttention

        x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
        m = ChannelSelfAttention()
        params = m.init(jax.random.key(0), x)
        out = m.apply(params, x)
        assert out.shape == x.shape

    def test_spatial_self_attention(self, rng):
        from tmdiff_tpu.ops.attention import SpatialSelfAttention

        x = jnp.asarray(rng.standard_normal((1, 8, 8, 32)), jnp.float32)
        m = SpatialSelfAttention()
        params = m.init(jax.random.key(0), x)
        assert m.apply(params, x).shape == x.shape
