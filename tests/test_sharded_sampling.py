"""SPMD sampling: Pansharpener on a ("data", "space") mesh must produce the
single-device result (batch sharded over data, image height over space with
XLA-emitted conv halo exchange), and the serving engine must work unchanged
on a meshed sampler — the multi-chip serving cell."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmdiff_tpu.data.synthetic import make_arrays


@pytest.fixture(scope="module")
def model_and_params():
    from tmdiff_tpu.models import WavBEST

    model = WavBEST(channels=(4, 8, 8, 16))
    data = make_arrays(n=8, bands=4, size=16)
    x = jnp.asarray(data["gt"] - data["lms"])
    params = model.init(
        jax.random.key(0), x, jnp.arange(8),
        jnp.asarray(data["pan"]), jnp.asarray(data["lms"]), jnp.zeros(768),
    )
    batch = {"PAN": data["pan"], "MS": data["lms"]}
    return model, params, batch


@pytest.mark.parametrize("method,kwargs", [
    ("regression", {}),
    ("dpm++", {"steps": 4}),
])
def test_meshed_sampling_matches_single_device(model_and_params, method, kwargs):
    from tmdiff_tpu.parallel import make_mesh
    from tmdiff_tpu.pipeline import Pansharpener

    model, params, batch = model_and_params
    mesh = make_mesh(data=4, space=2)
    ref = Pansharpener(model, params, n_timestep=10)
    spmd = Pansharpener(model, params, n_timestep=10, mesh=mesh)
    out_ref = ref.sample(batch, sensor="WV3", method=method, seed=3, **kwargs)
    out_spmd = spmd.sample(batch, sensor="WV3", method=method, seed=3, **kwargs)
    # identical math; SPMD partial reductions (GroupNorm over sharded H) may
    # reassociate, so exact-to-tolerance rather than bitwise
    np.testing.assert_allclose(out_spmd, out_ref, atol=2e-5, rtol=1e-5)


def test_meshed_sampling_ragged_batch_falls_back(model_and_params):
    """Batch 3 doesn't divide the 4-wide data axis: sharding helper must fall
    back to replication and still return correct shapes."""
    from tmdiff_tpu.parallel import make_mesh
    from tmdiff_tpu.pipeline import Pansharpener

    model, params, batch = model_and_params
    small = {k: v[:3] for k, v in batch.items()}
    spmd = Pansharpener(model, params, n_timestep=10, mesh=make_mesh(data=4, space=2))
    out = spmd.sample(small, sensor="QB", method="regression", seed=0)
    assert out.shape == small["MS"].shape
    assert np.isfinite(out).all()


@pytest.mark.parametrize("h", [2, 4, 8])
def test_conv3d_cat_spmd_exact(h):
    """The concat-free decoder conv (kernel sliced per part INSIDE jit) hits
    a distinct partitioner corner: at window-overhang sizes the slice→conv
    pattern computes wrong values on a sharded mesh even with the native
    conv (pre-sliced kernels are exact). conv3d_cat must therefore be exact
    at every level size via its overhang fallback."""
    import tmdiff_tpu.ops.modconv as mc
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tmdiff_tpu.parallel import make_mesh

    mesh = make_mesh(data=4, space=2)
    rng = np.random.default_rng(0)
    parts = tuple(
        jnp.asarray(rng.standard_normal((8, 4, h, h, 8)).astype(np.float32))
        for _ in range(3)
    )
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 24, 8)).astype(np.float32) * 0.1)
    fn = jax.jit(lambda a, b, c, k: mc.conv3d_cat((a, b, c), k))
    ref = np.asarray(fn(*parts, k))
    spec = P("data", None, "space", None, None)
    sp = tuple(jax.device_put(p, NamedSharding(mesh, spec)) for p in parts)
    out = np.asarray(fn(*sp, jax.device_put(k, NamedSharding(mesh, P()))))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_conv3d_bandtiles_correct_and_spmd_exact():
    """The band-tiled lowering (auto's pick at Cout=64) must equal bandlanes
    numerically and stay exact on a sharded mesh (its in-jit activation
    pad/slice on the band axis is a new pattern the partitioner sees)."""
    import tmdiff_tpu.ops.modconv as mc
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tmdiff_tpu.parallel import make_mesh

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 4, 8, 8, 64)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 64, 64)).astype(np.float32) * 0.05)
    ref = np.asarray(jax.jit(mc._conv3d_bandlanes)(x, k))
    fn = jax.jit(lambda x, k: mc._conv3d_bandtiles(x, k, 2))
    np.testing.assert_allclose(np.asarray(fn(x, k)), ref, atol=1e-4)
    mesh = make_mesh(data=4, space=2)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, "space", None, None)))
    ks = jax.device_put(k, NamedSharding(mesh, P()))
    np.testing.assert_allclose(np.asarray(fn(xs, ks)), ref, atol=1e-4)


@pytest.mark.parametrize("d,cout,tile_d", [
    (8, 8, 16),   # Cout≤8 → tile_d=128//8=16 > d: must clamp, not crash
    (5, 64, 2),   # odd D with tile_d=2: short final tile
    (3, 96, 1),
])
def test_conv3d_bandtiles_irregular_shapes(d, cout, tile_d):
    """ADVICE r2: tile_d > d or d % tile_d != 0 crashed the slab reshape at
    trace time. The lowering must clamp and zero-pad the tail instead."""
    import tmdiff_tpu.ops.modconv as mc

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, d, 8, 8, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 16, cout)).astype(np.float32) * 0.05)
    ref = np.asarray(jax.jit(mc._conv3d_fold2d)(x, k))
    out = np.asarray(jax.jit(lambda x, k: mc._conv3d_bandtiles(x, k, tile_d))(x, k))
    np.testing.assert_allclose(out, ref, atol=1e-4)


@pytest.mark.parametrize("impl,h", [
    ("auto", 8), ("auto", 4), ("auto", 2),  # mixed rule must be exact everywhere
    ("lax", 2),                              # native: exact at the corner
    ("bandlanes", 4),                        # exact while the window fits
])
def test_conv3d_spmd_exact(impl, h, monkeypatch):
    """Regression net for the XLA SPMD partitioner corner that produced WRONG
    conv results (not just slow ones): reshape-based lowerings with a sharded
    spatial dim smaller than the conv window. The shipped `auto` rule must be
    exact at every level size; see ops/modconv.py lowering notes."""
    import tmdiff_tpu.ops.modconv as mc
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tmdiff_tpu.parallel import make_mesh

    monkeypatch.setattr(mc, "CONV3D_IMPL", impl)
    mesh = make_mesh(data=4, space=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 4, h, h, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 8)).astype(np.float32) * 0.1)
    fn = jax.jit(lambda x, k: mc.conv3d(x, k))
    ref = np.asarray(fn(x, k))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, "space", None, None)))
    ks = jax.device_put(k, NamedSharding(mesh, P()))
    np.testing.assert_allclose(np.asarray(fn(xs, ks)), ref, atol=1e-5)


def test_engine_on_meshed_sampler(model_and_params):
    from tmdiff_tpu.parallel import make_mesh
    from tmdiff_tpu.pipeline import Pansharpener
    from tmdiff_tpu.serve import InferenceEngine

    model, params, batch = model_and_params
    sharp = Pansharpener(model, params, n_timestep=10, mesh=make_mesh())
    engine = InferenceEngine(sharp, method="regression", max_batch=4,
                             max_delay_ms=200.0)
    try:
        rng = np.random.default_rng(0)
        futs = [
            engine.submit(rng.random((1, 16, 16), np.float32),
                          rng.random((4, 16, 16), np.float32), s)
            for s in ["QB", "WV3", "GF2", "WV2"]
        ]
        outs = [f.result(timeout=120) for f in futs]
        assert engine.stats["batches"] == 1
        for out in outs:
            assert out.shape == (4, 16, 16) and np.isfinite(out).all()
    finally:
        engine.shutdown()
