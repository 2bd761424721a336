"""Wavelet op tests: round-trip exactness, fast-vs-matrix equivalence, and
golden parity with the torch reference (fixtures from tools/make_goldens.py)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmdiff_tpu.ops import wavelet

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _nchw_to_hwc(x):
    # reference layout (N, C, H, W) -> ours (N, H, W, C)
    return np.moveaxis(x, 1, -1)


class TestGenericBanks:
    def test_daubechies_generation_matches_published(self):
        """Spectral-factorisation dbN must reproduce the published db2/db3
        coefficient tables (the constants vendored in ops/wavelet.py)."""
        np.testing.assert_allclose(
            wavelet._daubechies_dec_lo(2), wavelet._DB2_LO, atol=1e-10
        )
        np.testing.assert_allclose(
            wavelet._daubechies_dec_lo(3), wavelet._DB3_LO, atol=1e-10
        )

    @pytest.mark.parametrize("name", ["db4", "db6", "db8"])
    def test_generated_bank_orthogonal_and_reconstructs(self, name, rng):
        lo = wavelet.get_bank(name)["dec_lo"]
        assert np.isclose((lo * lo).sum(), 1.0)
        n = len(lo) // 2
        for k in range(1, n):
            assert abs(np.dot(lo, np.roll(lo, 2 * k))) < 1e-9
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 2)), jnp.float32)
        rec = wavelet._matrix_idwt2d(
            *wavelet._matrix_dwt2d(x, name), name, 32, 32
        )
        # interior reconstructs exactly; the reference's truncated banded
        # matrices lose a (filter//2 - 1)-wide border for length > 2 filters
        m = len(lo) // 2
        np.testing.assert_allclose(
            rec[:, m:-m, m:-m], x[:, m:-m, m:-m], atol=1e-4
        )

    def test_register_wavelet_roundtrip(self, rng):
        wavelet.register_wavelet("custom_db2", wavelet._DB2_LO)
        a = wavelet._matrix_dwt2d(
            jnp.asarray(rng.standard_normal((1, 16, 16, 1)), jnp.float32),
            "custom_db2",
        )
        b = wavelet._matrix_dwt2d(
            jnp.asarray(np.zeros((1, 16, 16, 1)), jnp.float32), "db2"
        )
        assert a[0].shape == b[0].shape

    def test_register_rejects_bad_banks(self):
        with pytest.raises(ValueError, match="even-length"):
            wavelet.register_wavelet("bad", [0.5, 0.5, 0.5])
        with pytest.raises(ValueError, match="sqrt"):
            wavelet.register_wavelet("bad", [0.5, 0.5, 0.5, 0.5])


class TestHaar2D:
    def test_round_trip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4, 16, 16, 3)), jnp.float32)
        rec = wavelet.idwt2d(*wavelet.dwt2d(x))
        np.testing.assert_allclose(rec, x, atol=1e-5)

    def test_three_level_round_trip(self, rng):
        x = jnp.asarray(rng.standard_normal((3, 24, 24, 3)), jnp.float32)
        stack = []
        cur = x
        for _ in range(3):
            ll, lh, hl, hh = wavelet.dwt2d(cur)
            stack.append((lh, hl, hh))
            cur = ll
        for lh, hl, hh in reversed(stack):
            cur = wavelet.idwt2d(cur, lh, hl, hh)
        np.testing.assert_allclose(cur, x, atol=1e-4)

    def test_fast_equals_matrix(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)), jnp.float32)
        fast = wavelet.dwt2d(x, impl="fast") if False else wavelet._haar_dwt2d(x)
        mat = wavelet._matrix_dwt2d(x, "haar")
        for f, m in zip(fast, mat):
            np.testing.assert_allclose(f, m, atol=1e-5)

    def test_golden_2d(self):
        g = np.load(os.path.join(GOLDEN, "dwt.npz"))
        for wav in ["haar", "db2"]:
            x = jnp.asarray(_nchw_to_hwc(g[f"{wav}_x"]))
            ll, lh, hl, hh = wavelet.dwt2d(x, wavelet=wav)
            for name, mine in [("ll", ll), ("lh", lh), ("hl", hl), ("hh", hh)]:
                ref = _nchw_to_hwc(g[f"{wav}_{name}"])
                np.testing.assert_allclose(mine, ref, atol=1e-4, err_msg=f"{wav} {name}")
            rec = wavelet.idwt2d(ll, lh, hl, hh, wavelet=wav)
            np.testing.assert_allclose(rec, _nchw_to_hwc(g[f"{wav}_rec"]), atol=1e-4)

    def test_tiny(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), jnp.float32)
        np.testing.assert_allclose(wavelet.dwt2d_ll(x), wavelet.dwt2d(x)[0])

    def test_linearity_gradient(self, rng):
        """The VJP of a linear map is its adjoint — autodiff must round-trip."""
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 1)), jnp.float32)

        def f(v):
            ll, lh, hl, hh = wavelet.dwt2d(v)
            return jnp.sum(ll**2 + lh**2 + hl**2 + hh**2)

        # Orthonormal transform => grad of sum-of-squares is 2x.
        np.testing.assert_allclose(jax.grad(f)(x), 2 * x, atol=1e-4)


class TestDWT1D3D:
    def test_golden_1d(self):
        g = np.load(os.path.join(GOLDEN, "dwt.npz"))
        # reference 1-D input (N, C, L) transforms the last axis; ours
        # transforms the second-to-last of (..., L, C).
        x = np.moveaxis(g["haar1d_x"], 1, -1)  # (N, L, C)
        lo, hi = wavelet.dwt1d(jnp.asarray(x))
        np.testing.assert_allclose(lo, np.moveaxis(g["haar1d_lo"], 1, -1), atol=1e-5)
        np.testing.assert_allclose(hi, np.moveaxis(g["haar1d_hi"], 1, -1), atol=1e-5)

    def test_1d_round_trip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 16, 3)), jnp.float32)
        lo, hi = wavelet.dwt1d(x)
        np.testing.assert_allclose(wavelet.idwt1d(lo, hi), x, atol=1e-5)

    def test_golden_3d(self):
        g = np.load(os.path.join(GOLDEN, "dwt.npz"))
        x = np.moveaxis(g["haar3d_x"], 1, -1)  # (N, D, H, W, C)
        bands = wavelet.dwt3d(jnp.asarray(x))
        for name in ["lll", "llh", "lhl", "lhh", "hll", "hlh", "hhl", "hhh"]:
            ref = np.moveaxis(g[f"haar3d_{name}"], 1, -1)
            np.testing.assert_allclose(bands[name], ref, atol=1e-5, err_msg=name)

    def test_3d_round_trip(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 2)), jnp.float32)
        rec = wavelet.idwt3d(wavelet.dwt3d(x))
        np.testing.assert_allclose(rec, x, atol=1e-5)


class TestOddSizes:
    def test_matrix_handles_odd(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 7, 9, 2)), jnp.float32)
        ll, lh, hl, hh = wavelet.dwt2d(x)  # auto-falls back to matrix path
        assert ll.shape == (1, 3, 4, 2)
        assert hh.shape == (1, 4, 5, 2)
