"""Progressive distillation (train/distill.py) + DDIM sampler algebra.

The reference has no distillation or deterministic-ancestral path; these pin
the math the feature rests on (jump/target identities are exact algebra, so
they get tight tolerances) and that a distill phase actually learns.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tmdiff_tpu.diffusion import gaussian
from tmdiff_tpu.diffusion.schedules import NoiseSchedule
from tmdiff_tpu.train.distill import DistillTrainer, progressive_target


@pytest.fixture(scope="module")
def ns():
    return NoiseSchedule.create("cosine", 100)


def test_ddim_jump_to_zero_returns_x0(ns, rng):
    """Jump to model time 0 (α=1, σ=0) must return the x0 prediction."""
    x_t = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), jnp.float32)
    t = jnp.array([100, 60])
    out = gaussian.ddim_jump(ns, x_t, x0, t, jnp.zeros_like(t))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-6)


def test_ddim_jump_composes_for_consistent_x0(ns, rng):
    """Two jumps t→t1→t2 with the SAME x0 equal one jump t→t2 — the algebra
    progressive distillation exploits (a perfect-teacher trajectory is
    one-jump expressible)."""
    x_t = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), jnp.float32)
    t = jnp.array([100, 80])
    t1, t2 = t - 25, t - 50
    two = gaussian.ddim_jump(ns, gaussian.ddim_jump(ns, x_t, x0, t, t1),
                             x0, t1, t2)
    one = gaussian.ddim_jump(ns, x_t, x0, t, t2)
    np.testing.assert_allclose(np.asarray(two), np.asarray(one), atol=1e-5)


def test_progressive_target_recovers_perfect_teacher_x0(ns, rng):
    """If the teacher predicts a consistent x0 at both half-jumps, the
    implied student target is that x0 exactly."""
    x0 = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), jnp.float32)
    t = jnp.array([100, 50])
    t1, t2 = t - 25, t - 50
    a = ns.sqrt_alphas_cumprod_prev[t][:, None, None, None]
    x_t = a * x0 + jnp.sqrt(1 - a * a) * noise
    x_t1 = gaussian.ddim_jump(ns, x_t, x0, t, t1)
    x_t2 = gaussian.ddim_jump(ns, x_t1, x0, t1, t2)
    tgt = progressive_target(ns, x_t, x_t2, t, t2)
    np.testing.assert_allclose(np.asarray(tgt), np.asarray(x0),
                               atol=1e-4, rtol=1e-4)
    # and with t2 = 0 (σ ratio degenerates to 0): target == x_t2 == x0
    x_to0 = gaussian.ddim_jump(ns, x_t1, x0, t1, jnp.zeros_like(t))
    tgt0 = progressive_target(ns, x_t, x_to0, t, jnp.zeros_like(t))
    np.testing.assert_allclose(np.asarray(tgt0), np.asarray(x0), atol=1e-4)


def test_ddim_sample_constant_model_returns_x0(ns):
    """A denoiser that always answers the same x0 makes every grid walk land
    on it (final jump hits model time 0), regardless of steps."""
    x0 = jnp.full((1, 4, 8, 8), 0.25, jnp.float32)
    denoise = lambda x, t, pan, ms: jnp.broadcast_to(x0, x.shape)
    for steps in (1, 4, 10):
        out = gaussian.ddim_sample(
            denoise, ns, jax.random.key(0), None, None, (1, 4, 8, 8),
            steps=steps)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-6)


def test_distill_trainer_validates_grid():
    with pytest.raises(ValueError, match="divisible"):
        DistillTrainer(model=None, schedule=NoiseSchedule.create("cosine", 100),
                       n_student_steps=8)


def test_distill_phase_learns(rng):
    """A few distillation steps must reduce the distill loss (tiny model,
    teacher = init params; one extra jitted-step compile for the suite)."""
    from tmdiff_tpu.data import BatchIterator, PanDataset
    from tmdiff_tpu.data.synthetic import make_arrays
    from tmdiff_tpu.models import WavBEST
    from tmdiff_tpu.models.clip_text import get_prompt_embedding

    ds = PanDataset(make_arrays(n=8, bands=4, size=16, seed=3))
    it = BatchIterator(ds, batch_size=8, seed=3)
    trainer = DistillTrainer(
        model=WavBEST(channels=(4, 8, 8, 16)),
        schedule=NoiseSchedule.create("cosine", 100),
        n_student_steps=5, lr=2e-3, warmup_steps=1, max_iter=100,
    )
    emb = np.asarray(get_prompt_embedding("QB"))
    state = trainer.init_state(next(it), emb)
    teacher = jax.tree.map(lambda x: x.copy(), state.params)
    losses = []
    for _ in range(12):
        state, m = trainer.train_step(state, next(it), emb, teacher)
        losses.append(float(m["l_pix"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
