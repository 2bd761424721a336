"""Trainer: loss decreases on synthetic data, EMA/schedule semantics,
checkpoint round-trip, and multi-device sharded training on the 8-CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tmdiff_tpu.data import BatchIterator, PanDataset
from tmdiff_tpu.data.synthetic import make_arrays
from tmdiff_tpu.diffusion.schedules import NoiseSchedule
from tmdiff_tpu.models import WavBEST
from tmdiff_tpu.models.clip_text import get_prompt_embedding
from tmdiff_tpu.parallel import make_mesh
from tmdiff_tpu.train.trainer import Trainer, hf_linear_schedule
from tmdiff_tpu.train import checkpoint as ckpt_lib
from tmdiff_tpu.train.ema import ema_update


TINY = dict(channels=(4, 8, 8, 16))


@pytest.fixture(scope="module")
def setup():
    ds = PanDataset(make_arrays(n=8, bands=4, size=16, seed=0))
    it = BatchIterator(ds, batch_size=8, seed=0)
    model = WavBEST(**TINY)
    trainer = Trainer(
        model=model,
        schedule=NoiseSchedule.create("cosine", 100),
        lr=2e-3, warmup_steps=2, max_iter=1000,
    )
    emb = np.asarray(get_prompt_embedding("QB"))

    # train_step DONATES its input state, so each test needs a fresh one —
    # sharing a state across tests would reuse deleted buffers.
    def make_state():
        return trainer.init_state(next(it), emb)

    return trainer, it, emb, make_state


def test_lr_schedule():
    fn = hf_linear_schedule(1e-3, 100, 1000)
    assert float(fn(0)) == 0.0
    assert float(fn(50)) == pytest.approx(5e-4)
    assert float(fn(100)) == pytest.approx(1e-3)
    assert float(fn(550)) == pytest.approx(5e-4)
    assert float(fn(1000)) == 0.0
    assert float(fn(2000)) == 0.0


def test_loss_decreases(setup):
    trainer, it, emb, make_state = setup
    state = make_state()
    losses = []
    for _ in range(16):
        state, metrics = trainer.train_step(state, next(it), emb)
        losses.append(float(metrics["l_pix"]))
    assert int(state.step) == 16
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses


def test_short_run_improves_val_loss(setup):
    """Learning regression (VERDICT r2 #2): a short train run must improve
    the diffusion loss on HELD-OUT data, not just the running train loss.
    The full convergence proof (beats the lms identity baseline on
    SAM/ERGAS through the real CLI + sampler) is tools/train_convergence.py,
    recorded in BASELINE.md; this is its ≤2-min canary."""
    trainer, it, emb, make_state = setup
    val = PanDataset(make_arrays(n=8, bands=4, size=16, seed=77))
    val_batch = val.batch(np.arange(4))  # eager eval dominates; 4 is enough

    from tmdiff_tpu.diffusion import gaussian

    def val_loss(params):
        def denoise(x, t, pan, ms):
            return trainer.model.apply(params, x, t, pan, ms, jnp.asarray(emb))

        # fixed rng: same timesteps/noise draws before and after training
        return float(gaussian.diffusion_loss(
            denoise, trainer.schedule, jax.random.key(42),
            jnp.asarray(val_batch["Res"]), jnp.asarray(val_batch["PAN"]),
            jnp.asarray(val_batch["MS"]), "l1",
        ))

    state = make_state()
    before = val_loss(state.params)
    for _ in range(30):
        state, _ = trainer.train_step(state, next(it), emb)
    after = val_loss(state.params)
    assert np.isfinite([before, after]).all()
    assert after < before, (before, after)


def test_ema_semantics(rng):
    p0 = {"w": jnp.asarray(rng.standard_normal(4), jnp.float32)}
    p1 = {"w": jnp.asarray(rng.standard_normal(4), jnp.float32)}
    # copy-through at/below start_iter
    out = ema_update(p0, p1, step=5, decay=0.999, start_iter=5)
    np.testing.assert_allclose(out["w"], p1["w"])
    # blend afterwards
    out = ema_update(p0, p1, step=6, decay=0.999, start_iter=5)
    np.testing.assert_allclose(
        out["w"], p0["w"] * 0.999 + p1["w"] * 0.001, rtol=1e-5
    )


def test_cfg_dropout_training(setup):
    """CFG condition dropout (`Trainer.p_uncond`): the reference ships this
    only as an orphaned zero-caller helper (`diffusion_general.py:385-397`);
    here it is wired into the loss. Semantics: p=1 must equal training on an
    explicitly zeroed MS; p=0 must be a no-op; per-sample masking must zero
    whole examples, not pixels. Eager _loss_fn — no extra jit compile."""
    from tmdiff_tpu.diffusion.gaussian import cfg_dropout_condition

    trainer, it, emb, make_state = setup
    params = make_state().params
    # 2-sample slice: the semantics (p=1 ≡ zeroed MS, p=0 ≡ no-op) are
    # per-example, and the eager _loss_fn evals dominate this test's time
    batch = {k: jnp.asarray(v[:2]) for k, v in next(it).items()}
    rng = jax.random.key(7)

    t1 = Trainer(model=trainer.model, schedule=trainer.schedule, p_uncond=1.0)
    zeroed = dict(batch, MS=jnp.zeros_like(batch["MS"]))
    np.testing.assert_allclose(
        float(t1._loss_fn(params, rng, batch, emb)),
        float(trainer._loss_fn(params, rng, zeroed, emb)), rtol=1e-6)

    t0 = Trainer(model=trainer.model, schedule=trainer.schedule, p_uncond=0.0)
    np.testing.assert_allclose(
        float(t0._loss_fn(params, rng, batch, emb)),
        float(trainer._loss_fn(params, rng, batch, emb)), rtol=1e-6)

    ms = jnp.asarray(np.random.default_rng(0).standard_normal((8, 4, 4, 4)),
                     jnp.float32)
    out = cfg_dropout_condition(rng, ms, 0.5, per_sample=True)
    per_ex = np.abs(np.asarray(out)).reshape(8, -1).max(axis=1)
    kept = per_ex > 0
    assert 0 < kept.sum() < 8  # mixed mask at this seed
    np.testing.assert_allclose(np.asarray(out)[kept], np.asarray(ms)[kept])
    # reference-parity per-batch mode: all-or-nothing
    outb = cfg_dropout_condition(rng, ms, 0.5)
    assert (np.asarray(outb) == 0).all() or np.allclose(
        np.asarray(outb), np.asarray(ms))


def test_checkpoint_roundtrip(setup, tmp_path):
    trainer, it, emb, make_state = setup
    state2, _ = trainer.train_step(make_state(), next(it), emb)
    path = ckpt_lib.save_checkpoint(str(tmp_path), state2)
    assert ckpt_lib.latest_step(str(tmp_path)) == int(state2.step)
    template = jax.tree.map(jnp.zeros_like, jax.device_get(state2))
    restored = ckpt_lib.restore_checkpoint(str(tmp_path), template)
    chex_close = lambda a, b: np.testing.assert_allclose(a, b, atol=1e-7)
    jax.tree.map(chex_close, jax.device_get(restored.params),
                 jax.device_get(state2.params))
    assert int(restored.step) == int(state2.step)


def test_sharded_training_matches_single_device(setup):
    """Meshed train_step must produce the single-device numbers — the
    regression net that would have caught the SPMD conv-lowering corner
    (see ops/modconv.py lowering notes): loss trajectories and final params
    must agree, not merely be finite. (Absorbs the former 8dev smoke test;
    the default-mesh reference run reuses the module fixture's trainer, so
    only the data×space trainer pays a compile — suite wall-time budget.)"""
    assert jax.device_count() == 8, "conftest must force 8 CPU devices"
    ref_trainer, _, _, _ = setup
    emb = np.asarray(get_prompt_embedding("WV3"))

    def run(trainer):
        ds = PanDataset(make_arrays(n=8, bands=4, size=16, seed=1))
        it = BatchIterator(ds, batch_size=8, seed=1)
        state = trainer.init_state(next(it), emb)
        losses = []
        for _ in range(2):
            state, m = trainer.train_step(state, next(it), emb)
            losses.append(float(m["l_pix"]))
        return losses, jax.device_get(state.params), state

    ref_losses, ref_params, _ = run(ref_trainer)
    # identical hyperparameters to the fixture trainer so trajectories match
    spmd_losses, spmd_params, spmd_state = run(Trainer(
        model=ref_trainer.model,
        schedule=ref_trainer.schedule,
        lr=2e-3, warmup_steps=2, max_iter=1000,
        mesh=make_mesh(data=4, space=2),
    ))
    # params stay replicated on the mesh (batch is what shards)
    p0 = jax.tree.leaves(spmd_state.params)[0]
    assert p0.sharding.is_fully_replicated
    np.testing.assert_allclose(spmd_losses, ref_losses, rtol=1e-5)
    # params: Adam's 1/(sqrt(v)+eps) amplifies fp32 all-reduce reassociation
    # noise on near-zero v (first steps) into up-to-±lr update sign flips at
    # the fixture's warmed-up lr=2e-3 (measured honest noise 1.9e-3 abs on
    # ~5% of elements; the conv-lowering bug this test guards against
    # produced ~0.7 — 140x the bound). The tight signal is the loss check.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=5e-3, rtol=2e-3),
        spmd_params, ref_params,
    )


def test_mixed_sensor_training_batch(setup):
    """Training accepts per-sample prompt embeddings (B, 768) — a
    mixed-sensor batch in one step, which the reference's one-sensor-per-step
    design cannot express. The per-sample conditioning must actually differ:
    a batch of [QB, WV3] rows must not equal an all-QB batch's loss."""
    trainer, it, emb_qb, make_state = setup
    emb_wv3 = np.asarray(get_prompt_embedding("WV3"))
    batch = next(it)

    mixed = np.stack([emb_qb, emb_wv3] * 4)  # (8, 768) alternating sensors
    uniform = np.stack([emb_qb] * 8)

    state = make_state()
    _, m_mixed = trainer.train_step(state, batch, mixed)
    state = make_state()
    _, m_uniform = trainer.train_step(state, batch, uniform)
    state = make_state()
    _, m_scalar = trainer.train_step(state, batch, emb_qb)

    assert np.isfinite(float(m_mixed["l_pix"]))
    # broadcasting a single row == explicit identical rows, bitwise
    assert float(m_uniform["l_pix"]) == float(m_scalar["l_pix"])
    # different per-sample conditioning changes the loss
    assert float(m_mixed["l_pix"]) != float(m_uniform["l_pix"])


def test_training_determinism(setup):
    """Same seed → bitwise-identical loss trajectory (jax.random threading;
    the reference's host-numpy RNG in the hot loop cannot guarantee this)."""
    trainer, it_, emb, make_state = setup
    from tmdiff_tpu.data import BatchIterator, PanDataset
    from tmdiff_tpu.data.synthetic import make_arrays

    def run():
        ds = PanDataset(make_arrays(n=8, bands=4, size=16, seed=0))
        it = BatchIterator(ds, batch_size=8, seed=0)
        state = trainer.init_state(next(it), emb)
        losses = []
        for _ in range(3):
            state, m = trainer.train_step(state, next(it), emb)
            losses.append(float(m["l_pix"]))
        return losses

    assert run() == run()


def test_checkpoint_retention(setup, tmp_path):
    trainer, it, emb, make_state = setup
    state = make_state()
    for _ in range(4):
        state, _ = trainer.train_step(state, next(it), emb)
        ckpt_lib.save_checkpoint(str(tmp_path), state, keep=2)
    kept = sorted(p.name for p in tmp_path.glob("I*"))
    assert len(kept) == 2
    assert kept[-1] == f"I{int(state.step)}"
