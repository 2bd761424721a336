"""ControlNet adapter invariants (models/controlnet.py).

Upstream `utils/cldm_unicontrol.py` cannot be imported (vendored `ldm`
package missing, `:16-30`), so there is no runnable golden; these tests pin
the architecture's defining invariants instead:

  * zero-init identity: at initialisation the controlled model equals the
    plain LegacyUNet bit for bit (zero convs are exact zeros) — THE
    ControlNet property that makes attaching it to a trained base safe;
  * the control path is live (perturbing a zero conv changes the output);
  * `init_control_from_base` copies the base encoder into the control
    branch (the ControlNet init recipe);
  * gradient split: base encoder gets exactly zero grads (the reference's
    `torch.no_grad()` over input/middle blocks, `cldm_unicontrol.py:72-79`);
    control branch and decoder get nonzero grads; `trainable_labels`
    freezes the decoder iff sd_locked.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmdiff_tpu.models.controlnet import (
    ALL_TASKS_NUM,
    TASKS_TO_ID,
    ControlledLegacyUNet,
    init_control_from_base,
    inject_base_params,
    task_feature,
    trainable_labels,
)
from tmdiff_tpu.models.legacy_unet import LegacyUNet

CH = (8, 12, 16, 20)
B, D, H, W = 2, 4, 16, 16


@pytest.fixture(scope="module")
def batch():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    return dict(
        x_t=jax.random.normal(ks[0], (B, D, H, W)),
        t=jnp.array([3.0, 7.0]),
        pan=jax.random.normal(ks[1], (B, D, H, W)),
        ms=jax.random.normal(ks[2], (B, D, H, W)),
        prompt_emb=jax.random.normal(ks[3], (768,)),
    )


@pytest.fixture(scope="module")
def hint():
    return jax.random.normal(jax.random.PRNGKey(9), (B, H, W, 3))


@pytest.fixture(scope="module")
def models(batch, hint):
    controlled = ControlledLegacyUNet(channels=CH, embed_dim=16, inter_dim=8)
    base = LegacyUNet(channels=CH, embed_dim=16, inter_dim=8)
    feat = task_feature("control_canny")
    cp = controlled.init(jax.random.PRNGKey(1), **batch, hint=hint,
                         task_id=TASKS_TO_ID["control_canny"], task_feat=feat)
    bp = base.init(jax.random.PRNGKey(2), **batch)
    # Frozen-base workflow: the controlled model adopts the base checkpoint.
    cp = {"params": inject_base_params(cp["params"], bp["params"])}
    return controlled, base, cp, bp, feat


def test_zero_init_identity(models, batch, hint):
    controlled, base, cp, bp, feat = models
    y_base = base.apply(bp, **batch)
    y_ctrl = controlled.apply(cp, **batch, hint=hint,
                              task_id=1, task_feat=feat)
    np.testing.assert_array_equal(np.asarray(y_ctrl), np.asarray(y_base))
    # And with no hint at all the control branch is bypassed entirely.
    y_nohint = controlled.apply(cp, **batch)
    np.testing.assert_array_equal(np.asarray(y_nohint), np.asarray(y_base))


def test_control_path_live(models, batch, hint):
    controlled, base, cp, bp, feat = models
    y0 = controlled.apply(cp, **batch, hint=hint, task_id=1, task_feat=feat)
    nudged = jax.tree.map(lambda x: x, cp)
    params = dict(nudged["params"])
    control = jax.tree.map(lambda x: x, params["control"])
    control["zero4"]["kernel"] = jnp.full_like(control["zero4"]["kernel"], 0.05)
    params["control"] = control
    y1 = controlled.apply({"params": params}, **batch, hint=hint,
                          task_id=1, task_feat=feat)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_only_mid_control(models, batch, hint):
    _, _, cp, _, feat = models
    # With nonzero skip-level zero convs, only_mid_control must ignore them.
    params = dict(cp["params"])
    control = jax.tree.map(lambda x: x, params["control"])
    control["zero0"]["kernel"] = jnp.full_like(control["zero0"]["kernel"], 0.05)
    params["control"] = control
    mid_only = ControlledLegacyUNet(channels=CH, embed_dim=16, inter_dim=8,
                                    only_mid_control=True)
    full = ControlledLegacyUNet(channels=CH, embed_dim=16, inter_dim=8)
    y_mid = mid_only.apply({"params": params}, **batch, hint=hint,
                           task_id=1, task_feat=feat)
    y_full = full.apply({"params": params}, **batch, hint=hint,
                        task_id=1, task_feat=feat)
    assert not np.allclose(np.asarray(y_mid), np.asarray(y_full))


def test_init_control_from_base(models):
    _, _, cp, _, _ = models
    params = init_control_from_base(cp["params"])
    for key in ("conv2", "down1", "down2", "down3", "middle1"):
        got = jax.tree.leaves(params["control"][key])
        want = jax.tree.leaves(params[key])
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # Zero convs stay exactly zero after the copy.
    assert float(jnp.abs(params["control"]["zero4"]["kernel"]).max()) == 0.0


def test_gradient_split(models, batch, hint):
    controlled, _, cp, _, feat = models

    def loss(params):
        y = controlled.apply({"params": params}, **batch, hint=hint,
                             task_id=1, task_feat=feat)
        return jnp.mean(y**2)

    grads = jax.grad(loss)(cp["params"])

    def max_abs(tree):
        return max(float(jnp.abs(g).max()) for g in jax.tree.leaves(tree))

    # Base encoder + middle: exactly zero (stop_gradient = torch.no_grad()).
    for key in ("conv1", "conv2", "down1", "down1_1", "middle1", "embed",
                "embed2"):
        assert max_abs(grads[key]) == 0.0, key
    # Control zero convs and the decoder do receive gradient.
    assert max_abs(grads["control"]["zero4"]) > 0.0
    assert max_abs(grads["up1"]) > 0.0
    # The task hypernet does NOT (the reference detaches the style at every
    # modulated conv call site, cldm_unicontrol.py:418-424).
    assert max_abs(grads["task_hypernet"]) == 0.0


def test_trainable_labels(models):
    _, _, cp, _, _ = models
    locked = trainable_labels(cp["params"], sd_locked=True)
    unlocked = trainable_labels(cp["params"], sd_locked=False)
    assert set(jax.tree.leaves(locked["control"])) == {"train"}
    assert set(jax.tree.leaves(locked["up1"])) == {"freeze"}
    assert set(jax.tree.leaves(unlocked["up1"])) == {"train"}
    assert set(jax.tree.leaves(unlocked["conv1"])) == {"freeze"}
    # Label tree is optax.multi_transform-shaped (same structure as params).
    assert (jax.tree.structure(locked) ==
            jax.tree.structure(jax.tree.map(lambda _: "x", cp["params"])))


def test_task_moe_checkpoint_is_task_independent(models, batch, hint):
    controlled, _, cp, _, feat = models
    # Same param tree serves every task id; different experts, different outs
    # once the hint path is live.
    params = init_control_from_base(cp["params"])
    params = dict(params)
    control = jax.tree.map(lambda x: x, params["control"])
    hint_params = jax.tree.map(lambda x: x, control["hint"])
    # Both hint-path zero convs must be live: zeroconv0 gates the per-task
    # stem (still zero after init_control_from_base, which would make every
    # expert's contribution identically zero), zeroconv1 gates the trunk.
    hint_params["zeroconv0"]["kernel"] = jnp.full_like(
        hint_params["zeroconv0"]["kernel"], 0.05)
    hint_params["zeroconv1"]["kernel"] = jnp.full_like(
        hint_params["zeroconv1"]["kernel"], 0.05)
    control["hint"] = hint_params
    control["zero0"]["kernel"] = jnp.full_like(control["zero0"]["kernel"], 0.05)
    params["control"] = control
    outs = [
        controlled.apply({"params": params}, **batch, hint=hint,
                         task_id=tid, task_feat=feat)
        for tid in (0, 1)
    ]
    assert not np.allclose(np.asarray(outs[0]), np.asarray(outs[1]))
    assert ALL_TASKS_NUM == 13 and TASKS_TO_ID["control_inpainting"] == 12


def test_hint_path_bootstraps(models, batch, hint):
    """The hint path must be able to LEAVE zero under training.

    It is gated by two chained zero convs; with zero trunk biases the trunk
    output at init would be exactly zero and both hint zero convs would
    receive identically-zero gradient forever (the torch reference escapes
    this via its nonzero default conv-bias init — reproduced by
    torch_conv_bias_init). Four optimiser steps are exactly enough for the
    gradient to cascade: step 1 wakes the tap zero convs, step 2 feeds
    `guided`, step 3 wakes zeroconv1, step 4 wakes zeroconv0."""
    import optax

    controlled, _, cp, _, feat = models
    params = init_control_from_base(cp["params"])
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    target = jax.random.normal(jax.random.PRNGKey(5), (B, D, H, W))

    @jax.jit
    def step(p, s):
        def loss(q):
            y = controlled.apply({"params": q}, **batch, hint=hint,
                                 task_id=1, task_feat=feat)
            return jnp.mean((y - target) ** 2)
        g = jax.grad(loss)(p)
        upd, s = tx.update(g, s, p)
        return optax.apply_updates(p, upd), s

    for _ in range(4):
        params, opt_state = step(params, opt_state)

    hint_tree = params["control"]["hint"]
    assert float(jnp.abs(hint_tree["zeroconv1"]["kernel"]).max()) > 0.0
    assert float(jnp.abs(hint_tree["zeroconv0"]["kernel"]).max()) > 0.0
    y_pos = controlled.apply({"params": params}, **batch, hint=hint,
                             task_id=1, task_feat=feat)
    y_neg = controlled.apply({"params": params}, **batch, hint=-hint,
                             task_id=1, task_feat=feat)
    assert float(jnp.abs(y_pos - y_neg).max()) > 0.0


def test_jit_and_shapes(models, batch, hint):
    controlled, _, cp, _, feat = models
    fwd = jax.jit(
        lambda p, b: controlled.apply(p, **b, hint=hint, task_id=1,
                                      task_feat=feat))
    y = fwd(cp, batch)
    assert y.shape == (B, D, H, W)
    assert y.dtype == jnp.float32


def test_sharded_finetune_matches_single_device(models, batch, hint):
    """ControlNet fine-tuning under the SPMD data mesh: 2 multi_transform
    steps on an 8-way data-parallel mesh must reproduce the single-device
    loss trajectory (the production fine-tune regime; space sharding is not
    claimed for the legacy VALID-stride convs, so the mesh is data-only)."""
    import optax

    from tmdiff_tpu.parallel import make_mesh
    from tmdiff_tpu.parallel.mesh import replicated, shard_batch

    assert jax.device_count() == 8, "conftest must force 8 CPU devices"
    controlled, _, cp, _, feat = models
    params = init_control_from_base(cp["params"])
    tx = optax.multi_transform(
        {"train": optax.adam(1e-2), "freeze": optax.set_to_zero()},
        trainable_labels(params, sd_locked=True))
    target = jax.random.normal(jax.random.PRNGKey(5), (8, D, H, W))

    def big(x):  # tile the fixture's B=2 batch up to 8 rows
        return jnp.concatenate([x] * 4) if x.ndim and x.shape[0] == B else x

    train_batch = {k: big(v) for k, v in batch.items()}
    train_hint = big(hint)

    @jax.jit
    def step(p, s, b, h):
        def loss(q):
            y = controlled.apply({"params": q}, **b, hint=h,
                                 task_id=1, task_feat=feat)
            return jnp.mean((y - target) ** 2)
        l, g = jax.value_and_grad(loss)(p)
        upd, s = tx.update(g, s, p)
        return optax.apply_updates(p, upd), s, l

    def run(p, b, h):
        s, losses = tx.init(p), []
        for _ in range(2):
            p, s, l = step(p, s, b, h)
            losses.append(float(l))
        return losses

    ref = run(params, train_batch, train_hint)
    mesh = make_mesh(data=8, space=1)
    per_sample = {k: v for k, v in train_batch.items() if k != "prompt_emb"}
    sharded = shard_batch(mesh, {**per_sample, "hint": train_hint})
    h_sh = sharded.pop("hint")
    sharded["prompt_emb"] = jax.device_put(train_batch["prompt_emb"],
                                           replicated(mesh))
    p_repl = jax.device_put(params, replicated(mesh))
    np.testing.assert_allclose(run(p_repl, sharded, h_sh), ref, rtol=1e-5)


def test_composes_with_sampler(models, batch, hint):
    """The controlled model is a drop-in DenoiseFn for the diffusion stack:
    one jitted 3-step ddim, and the hint steers the SAMPLE once the control
    path is live (zero convs perturbed off zero, as after training)."""
    from tmdiff_tpu.diffusion import gaussian
    from tmdiff_tpu.diffusion.schedules import NoiseSchedule

    controlled, _, cp, _, feat = models
    params = dict(cp["params"])
    control = jax.tree.map(lambda x: x, params["control"])
    for zc in ("zeroconv0", "zeroconv1"):
        control["hint"][zc]["kernel"] = jnp.full_like(
            control["hint"][zc]["kernel"], 0.05)
    control["zero4"]["kernel"] = jnp.full_like(control["zero4"]["kernel"], 0.05)
    params["control"] = control

    ns = NoiseSchedule.create("cosine", 12)
    prompt = batch["prompt_emb"]

    @jax.jit
    def sample(h):
        def denoise(x, t, pan, ms):
            return controlled.apply({"params": params}, x_t=x, t=t, pan=pan,
                                    ms=ms, prompt_emb=prompt, hint=h,
                                    task_id=1, task_feat=feat)
        return gaussian.ddim_sample(denoise, ns, jax.random.key(0),
                                    batch["pan"], batch["ms"],
                                    (B, D, H, W), steps=3)

    y_pos, y_neg = sample(hint), sample(-hint)
    assert y_pos.shape == (B, D, H, W)
    assert bool(jnp.isfinite(y_pos).all())
    assert not np.allclose(np.asarray(y_pos), np.asarray(y_neg))
