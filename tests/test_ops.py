"""Op-level golden tests: gamma embedding, modulated conv identity."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tmdiff_tpu.ops.embedding import gamma_embedding
from tmdiff_tpu.ops.modconv import (
    _bandlanes_wins,
    _conv3d_bandlanes,
    _conv3d_fold2d,
    conv3d,
    modulated_conv3d,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_gamma_embedding_golden():
    g = np.load(os.path.join(GOLDEN, "gamma_embedding.npz"))
    t = jnp.asarray(g["t"])
    np.testing.assert_allclose(gamma_embedding(t, 32), g["dim32"], atol=1e-5)
    np.testing.assert_allclose(gamma_embedding(t, 31), g["dim31"], atol=1e-5)


def test_modulated_conv_golden():
    """The activation-scaling identity must reproduce the reference's
    batch-grouped modulated conv exactly (SURVEY.md 'hard parts')."""
    g = np.load(os.path.join(GOLDEN, "modulated_conv.npz"))
    # torch layouts: x (B, Cin, D, H, W), w (Cout, Cin, kd, kh, kw), y likewise.
    x = jnp.asarray(np.moveaxis(g["x"], 1, -1))  # (B, D, H, W, Cin)
    w = jnp.asarray(np.transpose(g["w"], (2, 3, 4, 1, 0)))  # (kd,kh,kw,Cin,Cout)
    s = jnp.asarray(g["s"])
    y = modulated_conv3d(x, w, s)
    ref = np.moveaxis(g["y"], 1, -1)
    np.testing.assert_allclose(y, ref, atol=2e-4)


@pytest.mark.parametrize(
    "d,cin,cout,kd",
    [(8, 4, 6, 3), (4, 3, 5, 1), (8, 2, 3, 5), (3, 4, 4, 3), (1, 4, 4, 3)],
)
def test_bandlanes_matches_fold2d(rng, d, cin, cout, kd):
    """Band-into-lanes lowering (dense block-banded kernel over (B,H,W,D·C))
    must agree with the batch-folded lowering for every depth/tap combo."""
    x = jnp.asarray(rng.standard_normal((2, d, 6, 6, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kd, 3, 3, cin, cout)), jnp.float32)
    np.testing.assert_allclose(
        _conv3d_bandlanes(x, k), _conv3d_fold2d(x, k), atol=1e-4
    )


def test_bandlanes_heuristic():
    """auto picks bandlanes at every lane-starved (Cout < 128) multi-tap
    level — the measured-win rule from BASELINE.md's v5e A/B grid — and
    never where there's no lane gain (Cout ≥ 128) or no depth coupling."""
    assert _bandlanes_wins(d=8, kd=3, cout=32)
    assert _bandlanes_wins(d=4, kd=3, cout=32)
    assert _bandlanes_wins(d=4, kd=3, cout=64)
    assert not _bandlanes_wins(d=8, kd=3, cout=128)
    assert not _bandlanes_wins(d=8, kd=1, cout=32)
    assert not _bandlanes_wins(d=1, kd=3, cout=32)
    # r4: deep-band half-lane levels go native (isolated 5.09 vs 5.36 ms,
    # headline 31.5 vs 30.0 steps/s — BASELINE.md r4 auto-rule A/B)
    assert not _bandlanes_wins(d=8, kd=3, cout=64)
    assert not _bandlanes_wins(d=16, kd=3, cout=64)
    # r5: the native exclusion is resolution-gated — at H=256 (big config
    # level 0) the FULL-MODEL A/B favours bandlanes (10.35 vs 10.11
    # steps/s) even though the isolated conv favours native; h<=128 keeps
    # the r4 flagship routing, h unknown (0) stays r4-compatible
    assert not _bandlanes_wins(d=8, kd=3, cout=64, h=128)
    assert _bandlanes_wins(d=8, kd=3, cout=64, h=256)
    assert not _bandlanes_wins(d=8, kd=3, cout=64, h=0)


def test_modulated_equals_scaling(rng):
    """Direct check: conv(x*s, w) == per-sample-weight conv."""
    x = jnp.asarray(rng.standard_normal((3, 4, 8, 8, 6)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 6, 5)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((3, 6)), jnp.float32)
    fused = modulated_conv3d(x, w, s)
    # Naive per-sample loop with materialised modulated weights.
    outs = [
        conv3d(x[b : b + 1], w * s[b][None, None, None, :, None])
        for b in range(3)
    ]
    np.testing.assert_allclose(fused, jnp.concatenate(outs, 0), atol=1e-4)


class TestBandedPallasConv3d:
    """Fused band-banded Pallas kernel (ops/pallas/banded_conv3d.py) must be
    bit-compatible (to fp32 accumulation tolerance) with the reference
    lowering at every eligible shape, including tail tiles (d % tile_d != 0),
    and differentiable via its XLA-twin custom VJP."""

    @pytest.mark.parametrize("variant", ["v1", "v2"])
    @pytest.mark.parametrize(
        "d,cin,cout",
        [
            (8, 4, 32),   # flagship outer level geometry: tile_d=4, 2 tiles
            (6, 4, 32),   # tail tile: d_pad=8 > d
            (8, 3, 64),   # tile_d=2, 4 tiles
            (5, 2, 64),   # tile_d=2, tail
            (3, 4, 64),   # d barely above tile_d
        ],
    )
    def test_matches_reference(self, rng, d, cin, cout, variant):
        from tmdiff_tpu.ops.pallas import banded_conv3d as mod

        fn = mod.banded_conv3d if variant == "v1" else mod.banded_conv3d_v2
        assert mod.eligible(d, 3, 3, 3, 16, 8, cout)
        x = jnp.asarray(rng.standard_normal((2, d, 16, 8, cin)), jnp.float32)
        k = jnp.asarray(
            rng.standard_normal((3, 3, 3, cin, cout)) * 0.1, jnp.float32)
        np.testing.assert_allclose(
            fn(x, k), _conv3d_fold2d(x, k), atol=1e-4)

    def test_eligibility_gate(self):
        from tmdiff_tpu.ops.pallas.banded_conv3d import eligible

        assert eligible(8, 3, 3, 3, 256, 256, 32)
        assert eligible(8, 3, 3, 3, 128, 128, 64)
        assert not eligible(8, 3, 3, 3, 64, 64, 128)  # no lane starvation
        assert not eligible(4, 3, 3, 3, 256, 256, 32)  # tile_d == d
        assert not eligible(8, 1, 1, 1, 256, 256, 32)  # 1-tap
        assert not eligible(8, 3, 3, 3, 12, 256, 32)   # H % block_h
        assert not eligible(8, 3, 3, 3, 256, 256, 48)  # 128 % cout

    def test_conv3d_dispatch_and_fallback(self, rng, monkeypatch):
        """TMDIFF_CONV3D_IMPL=banded routes eligible shapes through the
        kernel and falls back to the auto rule elsewhere — model code never
        has to care."""
        from tmdiff_tpu.ops import modconv

        monkeypatch.setattr(modconv, "CONV3D_IMPL", "banded")
        x = jnp.asarray(rng.standard_normal((1, 8, 16, 8, 4)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, 4, 32)), jnp.float32)
        np.testing.assert_allclose(
            conv3d(x, k), _conv3d_fold2d(x, k), atol=1e-4)
        # ineligible (1-tap) shape must not crash: auto fallback
        k1 = jnp.asarray(rng.standard_normal((1, 1, 1, 4, 32)), jnp.float32)
        np.testing.assert_allclose(
            conv3d(x, k1), _conv3d_fold2d(x, k1), atol=1e-4)

    @pytest.mark.parametrize("variant", ["v1", "v2"])
    def test_grad_matches_xla(self, rng, variant):
        """custom_vjp backward (XLA twin) == autodiff through the reference
        lowering, for both x and kernel cotangents."""
        import jax

        from tmdiff_tpu.ops.pallas import banded_conv3d as mod

        fn = mod.banded_conv3d if variant == "v1" else mod.banded_conv3d_v2
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 2)), jnp.float32)
        k = jnp.asarray(
            rng.standard_normal((3, 3, 3, 2, 32)) * 0.1, jnp.float32)

        def loss_banded(x, k):
            return (fn(x, k) ** 2).sum()

        def loss_ref(x, k):
            return (_conv3d_fold2d(x, k) ** 2).sum()

        gx, gk = jax.grad(loss_banded, argnums=(0, 1))(x, k)
        rx, rk = jax.grad(loss_ref, argnums=(0, 1))(x, k)
        np.testing.assert_allclose(gx, rx, rtol=2e-4, atol=1e-3)
        np.testing.assert_allclose(gk, rk, rtol=2e-4, atol=1e-3)
