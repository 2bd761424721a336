"""The split encode_condition/denoise path must equal the fused forward."""
import jax
import jax.numpy as jnp
import numpy as np

from tmdiff_tpu.models import WavBEST


def test_cached_condition_equals_fused(rng):
    model = WavBEST(channels=(4, 8, 8, 16))
    B, bands, H, W = 2, 4, 16, 16
    x = jnp.asarray(rng.standard_normal((B, bands, H, W)), jnp.float32)
    t = jnp.array([5, 9])
    pan = jnp.asarray(rng.standard_normal((B, 1, H, W)), jnp.float32)
    ms = jnp.asarray(rng.standard_normal((B, bands, H, W)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal(768), jnp.float32)
    params = model.init(jax.random.key(0), x, t, pan, ms, emb)

    fused = model.apply(params, x, t, pan, ms, emb)
    cache = model.apply(params, pan, ms, emb, method=model.encode_condition)
    split = model.apply(params, x, t, cache, method=model.denoise)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(split), atol=1e-6)

    # and for a different timestep the cache is reusable
    t2 = jnp.array([999, 1])
    fused2 = model.apply(params, x, t2, pan, ms, emb)
    split2 = model.apply(params, x, t2, cache, method=model.denoise)
    np.testing.assert_allclose(np.asarray(fused2), np.asarray(split2), atol=1e-6)
    assert not np.allclose(np.asarray(fused), np.asarray(fused2))
