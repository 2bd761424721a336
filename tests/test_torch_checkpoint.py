"""Reference .pth checkpoint resume path: save a real torch state dict and
import it through train.checkpoint.import_reference_checkpoint."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_import_reference_pth(tmp_path):
    torch = pytest.importorskip("torch")
    from tmdiff_tpu.diffusion.schedules import NoiseSchedule
    from tmdiff_tpu.models import WavBEST
    from tmdiff_tpu.train import checkpoint as ckpt_lib
    from tmdiff_tpu.train.trainer import Trainer

    g = np.load(os.path.join(GOLDEN, "wavbest.npz"))
    sd = {
        # checkpoint keys carry the GeneralDiffusion prefix
        "denoise_fn." + k[3:]: torch.from_numpy(g[k])
        for k in g.files if k.startswith("sd.")
    }
    pth = tmp_path / "I4200_gen.pth"
    torch.save(sd, str(pth))

    model = WavBEST(channels=(8, 16, 32, 64))
    trainer = Trainer(model=model, schedule=NoiseSchedule.create("cosine", 10))
    batch = {
        "Res": g["x"], "PAN": g["pan"], "MS": g["ms"],
    }
    state = trainer.init_state(batch, g["prompt"])
    # The golden transplants a random-init torch model driven by our own
    # exported embedding — structural parity, no CLIP-fidelity claim, so the
    # placeholder-table guard is explicitly waived here (and verified to fire
    # without the waiver).
    if not os.path.exists(
        os.path.join(os.path.dirname(ckpt_lib.__file__), "..",
                     "models", "prompt_embeddings.npz")
    ):
        with pytest.raises(RuntimeError, match="real CLIP"):
            ckpt_lib.import_reference_checkpoint(str(pth), state)
    os.environ["TMDIFF_ALLOW_FAKE_CLIP"] = "1"
    try:
        state = ckpt_lib.import_reference_checkpoint(str(pth), state)
    finally:
        del os.environ["TMDIFF_ALLOW_FAKE_CLIP"]
    assert int(state.step) == 4200

    y = model.apply(
        state.params, jnp.asarray(g["x"]), jnp.asarray(g["t"]),
        jnp.asarray(g["pan"]), jnp.asarray(g["ms"]), jnp.asarray(g["prompt"]),
    )
    np.testing.assert_allclose(np.asarray(y), g["y"], atol=5e-4)


def test_export_roundtrip(tmp_path):
    """export_state_dict is the exact inverse of import_state_dict: our
    trained flax params, written as an I{step}_gen.pth, re-import to
    bit-identical leaves — weight-level interchangeability both ways."""
    torch = pytest.importorskip("torch")
    from tmdiff_tpu.models import WavBEST
    from tmdiff_tpu.utils import torch_import as ti

    model = WavBEST(channels=(4, 8, 8, 16))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 4, 16, 16)), jnp.float32)
    params = model.init(
        jax.random.key(1), x, jnp.array([3]),
        jnp.ones((1, 1, 16, 16)), x, jnp.zeros(768))

    pth = str(tmp_path / "I77_gen.pth")
    ti.save_torch_checkpoint(params, pth)
    sd = ti.load_torch_state_dict(pth)
    back = ti.import_state_dict(sd, params)

    leaves = jax.tree_util.tree_leaves(params)
    leaves2 = jax.tree_util.tree_leaves(back)
    assert len(leaves) == len(leaves2)
    for a, b in zip(leaves, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_loads_into_reference_layout(tmp_path):
    """Every exported tensor matches the reference golden state_dict's key
    set and per-key shapes (the golden carries a real torch WavBEST save)."""
    pytest.importorskip("torch")
    from tmdiff_tpu.models import WavBEST
    from tmdiff_tpu.utils import torch_import as ti

    g = np.load(os.path.join(GOLDEN, "wavbest.npz"))
    ref = {"denoise_fn." + k[3:]: g[k] for k in g.files if k.startswith("sd.")}

    model = WavBEST(channels=(8, 16, 32, 64))
    x = jnp.asarray(g["x"])
    params = model.init(
        jax.random.key(0), x, jnp.asarray(g["t"]), jnp.asarray(g["pan"]),
        jnp.asarray(g["ms"]), jnp.asarray(g["prompt"]))
    out = ti.export_state_dict(params)

    # exported keys ⊆ reference keys (dead reference leaves are absent);
    # shapes must match exactly on the intersection
    extra = sorted(set(out) - set(ref))
    assert not extra, f"exported keys unknown to the reference: {extra[:5]}"
    for k in out:
        assert out[k].shape == ref[k].shape, (
            k, out[k].shape, ref[k].shape)
