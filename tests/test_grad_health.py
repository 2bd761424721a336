"""Gradient health at initialisation.

Regression guard for a subtle failure mode: zero-ish style projections kill
every modulated branch, the model outputs ~0, and AdamW's weight decay still
makes the loss drift down — training silently learns nothing. Styles now
init at 1 (see ModConv3d); these tests pin that gradients actually flow."""
import jax
import jax.numpy as jnp
import numpy as np

from tmdiff_tpu.models import WavBEST


def _setup(rng, emb):
    model = WavBEST(channels=(4, 8, 8, 16))
    x = jnp.asarray(rng.standard_normal((2, 4, 16, 16)), jnp.float32)
    t = jnp.array([5, 9])
    pan = jnp.asarray(rng.standard_normal((2, 1, 16, 16)), jnp.float32)
    ms = jnp.asarray(rng.standard_normal((2, 4, 16, 16)), jnp.float32)
    params = model.init(jax.random.key(0), x, t, pan, ms, emb)
    return model, params, (x, t, pan, ms, emb)


def _grad_stats(model, params, args):
    g = jax.grad(
        lambda p: jnp.mean(jnp.abs(model.apply(p, *args) - args[0]))
    )(params)
    flat = {
        "/".join(str(k.key) for k in path): float(jnp.abs(v).mean())
        for path, v in jax.tree_util.tree_flatten_with_path(g)[0]
    }
    return flat


def test_gradients_flow_at_init(rng):
    emb = jnp.asarray(rng.standard_normal(768), jnp.float32)
    model, params, args = _setup(rng, emb)
    flat = _grad_stats(model, params, args)
    dead = [k for k, v in flat.items() if v < 1e-12]
    # The x_t-encoder's unused-HF-skip params are the only legitimately
    # gradient-free leaves — and there are none (skips feed nothing), so
    # every parameter must receive signal.
    assert not dead, f"dead gradients at init: {dead[:10]} (+{len(dead)} total)"
    # modulated-branch gradients must carry real magnitude, not underflow
    assert flat["params/final/conv24/kernel"] > 1e-8


def test_gradients_flow_at_torch_init(rng):
    """The faithful reference init ('torch', init_styles.py) zeroes style
    biases but gives style KERNELS kaiming-normal weights, so styles are
    mean-0 random — nonzero a.s. — and every branch must still train."""
    from tmdiff_tpu.models.init_styles import apply_init_style

    emb = jnp.asarray(rng.standard_normal(768), jnp.float32)
    model, params, args = _setup(rng, emb)
    params = apply_init_style(params, "torch", jax.random.key(7))
    flat = _grad_stats(model, params, args)
    dead = [k for k, v in flat.items() if v < 1e-12]
    assert not dead, f"dead gradients at torch init: {dead[:10]}"


def test_output_nonzero_with_zero_prompt(rng):
    """Even a zero prompt embedding must not collapse the model output
    (styles init at 1, not 0)."""
    emb = jnp.zeros(768)
    model, params, args = _setup(rng, emb)
    out = model.apply(params, *args)
    assert float(jnp.abs(out).mean()) > 1e-4
