"""Cross-step deep-trunk block caching (`ddim_cached`, PAPERS.md Δ-DiT /
block-caching family).

Pins three contracts:
  * `denoise_deep` / `denoise_reuse` are an exact factoring of `denoise` —
    same-step reuse is bitwise the full forward (the cache skips recompute,
    never changes math);
  * the chunked block-cached scan is exactly `ddim_sample` when every step
    refreshes (refresh_every=1) and when the reuse path recomputes in full —
    i.e. all deviation comes from feature staleness, not sampler wiring;
  * the pipeline method `ddim_cached` runs end to end and validates its args.
The reference has no analogue (every NFE re-runs the whole network,
`diffusion_general.py:227-255`).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmdiff_tpu.data.synthetic import make_arrays
from tmdiff_tpu.diffusion import gaussian


@pytest.fixture(scope="module")
def batch():
    data = make_arrays(n=2, bands=4, size=16, seed=7)
    return {
        "pan": jnp.asarray(data["pan"]),
        "ms": jnp.asarray(data["lms"]),
        "x": jnp.asarray(data["gt"] - data["lms"]),
    }


def test_deep_split_is_exact_factoring(shared_sharp, batch):
    model, params = shared_sharp.model, shared_sharp.params
    emb = jnp.zeros(768)
    t = jnp.array([3, 7])
    cache = model.apply(
        params, batch["pan"], batch["ms"], emb,
        method=model.encode_condition)
    full = model.apply(params, batch["x"], t, cache, method=model.denoise)
    out, deep = model.apply(
        params, batch["x"], t, cache, method=model.denoise_deep)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(out))
    # same-step reuse: the cached trunk is exactly what the full pass would
    # recompute, so the output must match bitwise
    reused = model.apply(
        params, batch["x"], t, cache, deep, method=model.denoise_reuse)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(reused))
    x_h3, h_mid = deep
    assert x_h3.shape[1] == batch["x"].shape[1]  # band axis preserved


def test_blockcached_wiring_equals_ddim(shared_sharp, batch):
    """With a reuse_fn that ignores the cache and recomputes in full, the
    chunked sampler must reproduce plain ddim_sample exactly — pinning the
    grid/jump bookkeeping independent of staleness effects."""
    sharp = shared_sharp
    model, params = sharp.model, sharp.params
    emb = jnp.zeros(768)
    cache = model.apply(
        params, batch["pan"], batch["ms"], emb,
        method=model.encode_condition)
    denoise = lambda x, t, *_: model.apply(
        params, x, t, cache, method=model.denoise)
    full = lambda x, t: model.apply(
        params, x, t, cache, method=model.denoise_deep)
    reuse_recompute = lambda x, t, deep: denoise(x, t)
    rng = jax.random.key(11)
    shape = batch["ms"].shape
    ref = gaussian.ddim_sample(
        denoise, sharp.ns, rng, batch["pan"], batch["ms"], shape, steps=4)
    out = gaussian.ddim_sample_blockcached(
        full, reuse_recompute, sharp.ns, rng, batch["pan"], batch["ms"],
        shape, steps=4, refresh_every=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # refresh_every=1 degenerates to plain ddim even with the real reuse_fn
    reuse = lambda x, t, deep: model.apply(
        params, x, t, cache, deep, method=model.denoise_reuse)
    out1 = gaussian.ddim_sample_blockcached(
        full, reuse, sharp.ns, rng, batch["pan"], batch["ms"],
        shape, steps=4, refresh_every=1)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref), atol=1e-6)


def test_deep_split_level2_is_exact_factoring(shared_sharp, batch):
    """cache_level=2 (down3 + middle + up1 skipped; cache = the up1 output):
    full forward matches denoise bitwise, same-step reuse matches bitwise."""
    model, params = shared_sharp.model, shared_sharp.params
    emb = jnp.zeros(768)
    t = jnp.array([3, 7])
    cache = model.apply(
        params, batch["pan"], batch["ms"], emb,
        method=model.encode_condition)
    full = model.apply(params, batch["x"], t, cache, method=model.denoise)
    out, deep = model.apply(
        params, batch["x"], t, cache, cache_level=2,
        method=model.denoise_deep)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(out))
    assert isinstance(deep, jnp.ndarray)  # level 2 carries only h_up1
    reused = model.apply(
        params, batch["x"], t, cache, deep, cache_level=2,
        method=model.denoise_reuse)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(reused))
    with pytest.raises(ValueError, match="cache_level"):
        model.apply(params, batch["x"], t, cache, cache_level=3,
                    method=model.denoise_deep)


def test_pipeline_ddim_cached_level2(shared_sharp):
    data = make_arrays(n=2, bands=4, size=16, seed=3)
    kw = dict(sensor="QB", method="ddim_cached", steps=4, seed=5)
    out1 = shared_sharp.sample(
        {"PAN": data["pan"], "MS": data["lms"]},
        refresh_every=2, cache_level=1, **kw)
    out2 = shared_sharp.sample(
        {"PAN": data["pan"], "MS": data["lms"]},
        refresh_every=2, cache_level=2, **kw)
    assert out2.shape == data["lms"].shape
    assert np.isfinite(out2).all()
    # level 2 skips strictly more per reuse step, so it deviates from level 1
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 0


def test_pipeline_ddim_cached(shared_sharp):
    data = make_arrays(n=2, bands=4, size=16, seed=3)
    out = shared_sharp.sample(
        {"PAN": data["pan"], "MS": data["lms"]},
        sensor="QB", method="ddim_cached", steps=4, refresh_every=2)
    assert out.shape == data["lms"].shape
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_blockcached_validates_divisibility(shared_sharp):
    data = make_arrays(n=2, bands=4, size=16, seed=3)
    with pytest.raises(ValueError, match="divisible"):
        shared_sharp.sample(
            {"PAN": data["pan"], "MS": data["lms"]},
            sensor="QB", method="ddim_cached", steps=5, refresh_every=2)
