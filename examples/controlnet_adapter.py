"""ControlNet adapter: the frozen-base fine-tuning workflow, end to end.

Rebuild of the reference's UniControl lift (`utils/cldm_unicontrol.py` —
unimportable upstream; see models/controlnet.py). This example walks the
whole adapter lifecycle on small shapes:

  1. take a trained LegacyUNet checkpoint (random-init stands in here),
  2. adopt it into ControlledLegacyUNet (`inject_base_params`) and copy the
     encoder into the control branch (`init_control_from_base`),
  3. confirm the zero-init identity: controlled == base bit for bit,
  4. fine-tune ONLY the control branch (`trainable_labels` +
     optax.multi_transform; the base is frozen — sd_locked),
  5. sample with the trained adapter through the ordinary diffusion stack
     and watch the hint steer the output.

    python examples/controlnet_adapter.py                  # forced CPU
    TMDIFF_EXAMPLE_TPU=1 python examples/controlnet_adapter.py  # real chip
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# jax may already be imported by the interpreter's startup hook with the
# platform pinned to the real TPU (env vars are too late) — override via
# jax.config before the first op, exactly as tests/conftest.py does. The
# optimization-level flag is CPU-only (it crashes the TPU compiler).
if not os.environ.get("TMDIFF_EXAMPLE_TPU"):
    if "xla_backend_optimization_level" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_backend_optimization_level=0")
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax

from tmdiff_tpu.diffusion import gaussian
from tmdiff_tpu.diffusion.schedules import NoiseSchedule
from tmdiff_tpu.models.controlnet import (
    TASKS_TO_ID,
    ControlledLegacyUNet,
    init_control_from_base,
    inject_base_params,
    task_feature,
    trainable_labels,
)
from tmdiff_tpu.models.legacy_unet import LegacyUNet

CH = (8, 12, 16, 20)          # tiny; flagship would use (32, 64, 128, 256)
B, D, H, W = 2, 4, 16, 16
TASK = "control_canny"


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    batch = dict(
        x_t=jax.random.normal(ks[0], (B, D, H, W)),
        t=jnp.array([3.0, 7.0]),
        pan=jax.random.normal(ks[1], (B, D, H, W)),
        ms=jax.random.normal(ks[2], (B, D, H, W)),
        prompt_emb=jax.random.normal(ks[3], (768,)),
    )
    hint = jax.random.normal(ks[4], (B, H, W, 3))
    feat = task_feature(TASK)
    tid = TASKS_TO_ID[TASK]

    # 1-2. adopt a "trained" base checkpoint into the controlled model.
    base = LegacyUNet(channels=CH, embed_dim=16, inter_dim=8)
    bp = base.init(jax.random.PRNGKey(2), **batch)["params"]
    ctrl = ControlledLegacyUNet(channels=CH, embed_dim=16, inter_dim=8)
    params = ctrl.init(jax.random.PRNGKey(1), **batch, hint=hint,
                       task_id=tid, task_feat=feat)["params"]
    params = init_control_from_base(inject_base_params(params, bp))

    # 3. zero-init identity: attaching the adapter changes NOTHING yet.
    y_base = base.apply({"params": bp}, **batch)
    y_ctrl = ctrl.apply({"params": params}, **batch, hint=hint,
                        task_id=tid, task_feat=feat)
    np.testing.assert_array_equal(np.asarray(y_ctrl), np.asarray(y_base))
    print("zero-init identity: controlled == base bit for bit")

    # 4. fine-tune the control branch only (sd_locked: decoder frozen too).
    labels = trainable_labels(params, sd_locked=True)
    tx = optax.multi_transform(
        {"train": optax.adam(1e-2), "freeze": optax.set_to_zero()}, labels)
    opt_state = tx.init(params)
    target = jax.random.normal(ks[5], (B, D, H, W))

    @jax.jit
    def step(p, s, i):
        def loss(q):
            y = ctrl.apply({"params": q}, **batch, hint=hint, task_id=tid,
                           task_feat=feat, train=True,
                           rngs={"dropout": jax.random.fold_in(ks[6], i)})
            return jnp.mean((y - target) ** 2)
        l, g = jax.value_and_grad(loss)(p)
        upd, s = tx.update(g, s, p)
        return optax.apply_updates(p, upd), s, l

    for i in range(12):
        params, opt_state, l = step(params, opt_state, i)
        if i % 4 == 0 or i == 11:
            print(f"  step {i:2d}  loss {float(l):.4f}")

    # The base never moved — only the adapter did.
    for a, b in zip(jax.tree.leaves(params["conv1"]),
                    jax.tree.leaves(bp["conv1"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("base frozen; control branch trained")

    # 5. sample through the ordinary diffusion stack; the hint steers it.
    ns = NoiseSchedule.create("cosine", 12)

    @jax.jit
    def sample(h):
        def denoise(x, t, pan, ms):
            return ctrl.apply({"params": params}, x_t=x, t=t, pan=pan, ms=ms,
                              prompt_emb=batch["prompt_emb"], hint=h,
                              task_id=tid, task_feat=feat)
        return gaussian.ddim_sample(denoise, ns, jax.random.key(0),
                                    batch["pan"], batch["ms"],
                                    (B, D, H, W), steps=3)

    dy = float(jnp.abs(sample(hint) - sample(-hint)).max())
    print(f"hint steers the 3-step ddim sample: max|dy| = {dy:.3e}")
    assert dy > 0.0


if __name__ == "__main__":
    main()
