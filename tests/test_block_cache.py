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
        model.apply(params, batch["x"], t, cache, cache_level=4,
                    method=model.denoise_deep)


def test_deep_split_level3_is_exact_factoring(shared_sharp, batch):
    """cache_level=3 (down2 + down3 + middle + up1 + up2 skipped; cache =
    the up2 output): full forward matches denoise bitwise, same-step reuse
    matches bitwise."""
    model, params = shared_sharp.model, shared_sharp.params
    emb = jnp.zeros(768)
    t = jnp.array([3, 7])
    cache = model.apply(
        params, batch["pan"], batch["ms"], emb,
        method=model.encode_condition)
    full = model.apply(params, batch["x"], t, cache, method=model.denoise)
    out, deep = model.apply(
        params, batch["x"], t, cache, cache_level=3,
        method=model.denoise_deep)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(out))
    assert isinstance(deep, jnp.ndarray)  # level 3 carries only h_up2
    # up2 output lives at half resolution with the level-1 channel width
    assert deep.shape[-3:-1] == (batch["x"].shape[-2] // 2,
                                 batch["x"].shape[-1] // 2)
    reused = model.apply(
        params, batch["x"], t, cache, deep, cache_level=3,
        method=model.denoise_reuse)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(reused))


def test_forecast_wiring_equals_ddim_when_reuse_recomputes(
        shared_sharp, batch):
    """forecast=True changes only WHAT the reuse steps consume — with a
    reuse_fn that ignores the cache, it must still be exactly ddim_sample
    (the carried history/extrapolation must not perturb the trajectory)."""
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
        shape, steps=4, refresh_every=2, forecast=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_forecast_linear_extrapolation_math(shared_sharp):
    """Pin the forecast rule against a numpy simulation: with a fake model
    whose trunk is a known function of the refresh timestep and whose x0 is
    the trunk value, the sampler trajectory determines exactly which deep
    value every reuse step consumed — chunk 0 must reuse stale (slope 0),
    later chunks must consume deep_k + (i/r)·(deep_k − deep_{k−1})."""
    ns = shared_sharp.ns
    T = ns.num_timesteps
    steps, r = 8, 4
    shape = (1, 2, 4, 4)

    def full_fn(x, t):
        d = (t[0].astype(jnp.float32) / T) * jnp.ones((), jnp.float32)
        return d * 1e-3 * jnp.ones(shape, jnp.float32), d

    def reuse_fn(x, t, deep):
        return deep * 1e-3 * jnp.ones(shape, jnp.float32)

    x0_init = jnp.zeros(shape, jnp.float32)
    out = gaussian.ddim_sample_blockcached(
        full_fn, reuse_fn, ns, jax.random.key(0), None, None, shape,
        steps=steps, refresh_every=r, x_init=x0_init, forecast=True)

    # numpy simulation of the documented contract
    grid = np.round(np.linspace(T, 0, steps + 1)).astype(np.int64)
    acp = np.asarray(ns.sqrt_alphas_cumprod_prev, np.float64)

    def jump(x, x0, t, s):
        a_t, a_s = acp[t], acp[s]
        sig = lambda a: np.sqrt(max(1.0 - a * a, 0.0))
        ratio = sig(a_s) / max(sig(a_t), 1e-12)
        return a_s * np.clip(x0, -1.0, 1.0) + ratio * (x - a_t * x0)

    x = np.zeros(shape, np.float64)
    deep_prev, have_prev = 0.0, 0.0
    for k in range(steps // r):
        t0 = grid[k * r]
        deep = float(t0) / T
        x = jump(x, deep * 1e-3 * np.ones(shape), t0, grid[k * r + 1])
        slope = have_prev * (deep - deep_prev)
        for i in range(1, r):
            d_i = deep + (i / r) * slope
            x = jump(x, d_i * 1e-3 * np.ones(shape),
                     grid[k * r + i], grid[k * r + i + 1])
        deep_prev, have_prev = deep, 1.0
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-6)
    # sanity: the forecasted trajectory differs from the stale one
    stale = gaussian.ddim_sample_blockcached(
        full_fn, reuse_fn, ns, jax.random.key(0), None, None, shape,
        steps=steps, refresh_every=r, x_init=x0_init, forecast=False)
    assert np.abs(np.asarray(out) - np.asarray(stale)).max() > 0


def test_refresh_mask_generalizes_uniform_chunking(shared_sharp, batch):
    """Schedule-aware caching: a mask encoding the uniform r=2 pattern must
    reproduce refresh_every=2 (same math, cond-scan program instead of
    chunked scan); an all-True mask must reproduce plain ddim; invalid
    masks and forecast+mask raise."""
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
    reuse = lambda x, t, deep: model.apply(
        params, x, t, cache, deep, method=model.denoise_reuse)
    rng = jax.random.key(11)
    shape = batch["ms"].shape
    common = (full, reuse, sharp.ns, rng, batch["pan"], batch["ms"], shape)

    ref = gaussian.ddim_sample_blockcached(
        *common, steps=4, refresh_every=2)
    out = gaussian.ddim_sample_blockcached(
        *common, steps=4, refresh_mask=[True, False, True, False])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    plain = gaussian.ddim_sample(
        denoise, sharp.ns, rng, batch["pan"], batch["ms"], shape, steps=4)
    out_all = gaussian.ddim_sample_blockcached(
        *common, steps=4, refresh_mask=[True] * 4)
    np.testing.assert_allclose(np.asarray(out_all), np.asarray(plain),
                               atol=1e-6)

    with pytest.raises(ValueError, match="refresh_mask\\[0\\]"):
        gaussian.ddim_sample_blockcached(
            *common, steps=4, refresh_mask=[False, True, True, True])
    with pytest.raises(ValueError, match="length steps"):
        gaussian.ddim_sample_blockcached(
            *common, steps=4, refresh_mask=[True, False])
    with pytest.raises(ValueError, match="forecast"):
        gaussian.ddim_sample_blockcached(
            *common, steps=4, refresh_mask=[True] * 4, forecast=True)


def test_refresh_mask_is_runtime_data(shared_sharp, batch):
    """The mask may be a TRACED argument: jit once, feed any schedule of
    that length — no retrace (what makes on-device schedule search cheap,
    tools/schedule_search.py). Static shape errors still surface."""
    sharp = shared_sharp
    model, params = sharp.model, sharp.params
    emb = jnp.zeros(768)
    cache = model.apply(
        params, batch["pan"], batch["ms"], emb,
        method=model.encode_condition)
    full = lambda x, t: model.apply(
        params, x, t, cache, method=model.denoise_deep)
    reuse = lambda x, t, deep: model.apply(
        params, x, t, cache, deep, method=model.denoise_reuse)
    rng = jax.random.key(11)
    shape = batch["ms"].shape
    common = (full, reuse, sharp.ns, rng, batch["pan"], batch["ms"], shape)

    f = jax.jit(lambda m: gaussian.ddim_sample_blockcached(
        *common, steps=4, refresh_mask=m))
    ref = gaussian.ddim_sample_blockcached(
        *common, steps=4, refresh_mask=[True, False, True, False])
    out = f(jnp.array([True, False, True, False]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    ref2 = gaussian.ddim_sample_blockcached(
        *common, steps=4, refresh_mask=[True, True, False, True])
    out2 = f(jnp.array([True, True, False, True]))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=1e-6)
    if hasattr(f, "_cache_size"):
        assert f._cache_size() == 1  # two schedules, one compile
    with pytest.raises(ValueError, match="length steps"):
        f(jnp.array([True, False]))


def test_pipeline_ddim_cached_refresh_mask(shared_sharp):
    data = make_arrays(n=2, bands=4, size=16, seed=3)
    kw = dict(sensor="QB", method="ddim_cached", steps=4, seed=5,
              cache_level=3)
    uniform = shared_sharp.sample(
        {"PAN": data["pan"], "MS": data["lms"]}, refresh_every=2, **kw)
    masked = shared_sharp.sample(
        {"PAN": data["pan"], "MS": data["lms"]},
        refresh_mask=(True, False, True, False), **kw)
    # the mask encodes the same schedule -> same output through the
    # public surface
    np.testing.assert_allclose(np.asarray(masked), np.asarray(uniform),
                               atol=1e-6)
    # mask VALUES are runtime data: a different schedule of the same
    # length must reuse the already-compiled program (no new cache key)
    n_compiled = len(shared_sharp._compiled)
    irregular = shared_sharp.sample(
        {"PAN": data["pan"], "MS": data["lms"]},
        refresh_mask=[True, False, False, True], **kw)
    assert len(shared_sharp._compiled) == n_compiled
    assert np.isfinite(np.asarray(irregular)).all()
    assert np.abs(np.asarray(irregular) - np.asarray(uniform)).max() > 0
    # host-side eager validation through the public surface
    with pytest.raises(ValueError, match="refresh_mask\\[0\\]"):
        shared_sharp.sample(
            {"PAN": data["pan"], "MS": data["lms"]},
            refresh_mask=[False, True, True, True], **kw)
    with pytest.raises(ValueError, match="length steps"):
        shared_sharp.sample(
            {"PAN": data["pan"], "MS": data["lms"]},
            refresh_mask=[True, False], **kw)


def test_static_mask_specialization_matches_traced(shared_sharp, batch):
    """A concrete mask SPECIALIZES the program — runs of consecutive
    full/reuse steps become dedicated scans with no per-step branch (the
    deployment path; the traced-mask cond-scan pays a measured ~15%
    dispatch tax on TPU, BASELINE.md). Same schedule, same trajectory."""
    sharp = shared_sharp
    model, params = sharp.model, sharp.params
    emb = jnp.zeros(768)
    cache = model.apply(
        params, batch["pan"], batch["ms"], emb,
        method=model.encode_condition)
    full = lambda x, t: model.apply(
        params, x, t, cache, method=model.denoise_deep)
    reuse = lambda x, t, deep: model.apply(
        params, x, t, cache, deep, method=model.denoise_reuse)
    rng = jax.random.key(11)
    shape = batch["ms"].shape
    common = (full, reuse, sharp.ns, rng, batch["pan"], batch["ms"], shape)
    # irregular schedule: full-runs of length 1 and 2, reuse-runs of 1 and 2
    mask = [True, False, False, True, True, False]
    spec = gaussian.ddim_sample_blockcached(
        *common, steps=6, refresh_mask=mask)
    traced = jax.jit(lambda m: gaussian.ddim_sample_blockcached(
        *common, steps=6, refresh_mask=m))(jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(spec), np.asarray(traced),
                               atol=1e-6)


def test_pipeline_refresh_mask_static(shared_sharp):
    """refresh_mask_static=True bakes the schedule into the compile key:
    outputs match the traced-mask program, each distinct schedule is its
    own compile (the price of specialization — deployments serve ONE)."""
    data = make_arrays(n=2, bands=4, size=16, seed=3)
    b = {"PAN": data["pan"], "MS": data["lms"]}
    kw = dict(sensor="QB", method="ddim_cached", steps=4, seed=5,
              cache_level=3)
    mask = (True, False, False, True)
    traced = shared_sharp.sample(b, refresh_mask=mask, **kw)
    n0 = len(shared_sharp._compiled)
    static = shared_sharp.sample(
        b, refresh_mask=mask, refresh_mask_static=True, **kw)
    assert len(shared_sharp._compiled) == n0 + 1
    np.testing.assert_allclose(np.asarray(static), np.asarray(traced),
                               atol=1e-6)
    # same static schedule again -> cached program, no new compile
    again = shared_sharp.sample(
        b, refresh_mask=list(mask), refresh_mask_static=True, **kw)
    assert len(shared_sharp._compiled) == n0 + 1
    np.testing.assert_array_equal(np.asarray(again), np.asarray(static))
    # a different static schedule is a new specialization
    shared_sharp.sample(
        b, refresh_mask=(True, True, False, True),
        refresh_mask_static=True, **kw)
    assert len(shared_sharp._compiled) == n0 + 2


def test_pipeline_ddim_cached_level3_forecast(shared_sharp):
    data = make_arrays(n=2, bands=4, size=16, seed=3)
    kw = dict(sensor="QB", method="ddim_cached", steps=4, seed=5)
    out2 = shared_sharp.sample(
        {"PAN": data["pan"], "MS": data["lms"]},
        refresh_every=2, cache_level=3, **kw)
    assert out2.shape == data["lms"].shape
    assert np.isfinite(out2).all()
    outf = shared_sharp.sample(
        {"PAN": data["pan"], "MS": data["lms"]},
        refresh_every=2, cache_level=3, forecast=True, **kw)
    assert np.isfinite(outf).all()
    # forecast kicks in from the second chunk onward, so it must deviate
    assert np.abs(np.asarray(outf) - np.asarray(out2)).max() > 0


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
