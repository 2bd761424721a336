"""END-TO-END sampler goldens: the transplanted tiny WavBEST driven through
`Pansharpener.sample` must reproduce the reference compositions —
`GeneralDiffusion.sample_by_dpmsolver` (x_start → noise wrapper, 30-step
singlestep order-3 logSNR, dynamic thresholding, denoise-to-zero,
`/root/reference/GeneralModel/diffusion_general.py:227-255`) and the legacy
ancestral `p_sample_loop` with its noise-inversion `p_mean_variance`
(`:210-225, 154-171`) — bit-for-bit on the recorded noise trajectory
(fixture from tools/make_goldens.py::golden_pipeline)."""
import os

import jax
import numpy as np
import pytest

from tmdiff_tpu.models import WavBEST
from tmdiff_tpu.pipeline import Pansharpener
from tmdiff_tpu.utils.torch_import import import_state_dict

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def fixture():
    import jax.numpy as jnp

    g = np.load(os.path.join(GOLDEN, "pipeline.npz"))
    sd = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
    model = WavBEST(channels=(8, 16, 32, 64))
    params = model.init(
        jax.random.key(0),
        jnp.asarray(g["res"]), jnp.array([1]), jnp.asarray(g["pan"]),
        jnp.asarray(g["ms"]), jnp.asarray(g["prompt"]),
    )
    params = import_state_dict(sd, params, prefix="")
    return g, model, params


def _sharpener(g, model, params, n_timestep):
    sharp = Pansharpener(
        model, params, schedule_name="cosine", n_timestep=n_timestep
    )
    # Pin the QB row to the exact embedding the reference model was driven
    # with (independent of whether the shipped table is real CLIP).
    row = sharp.prompt_index["QB"]
    sharp.prompt_table = sharp.prompt_table.at[row].set(g["prompt"])
    return sharp


def test_dpmsolver_end_to_end(fixture):
    """model × cached-cond-encoder × x_start wrapper × singlestep order-3
    solver × res2img, against the reference trajectory from the same x_T."""
    g, model, params = fixture
    sharp = _sharpener(g, model, params, n_timestep=1000)
    out = sharp.sample(
        {"PAN": g["pan"], "MS": g["ms"]}, sensor="QB", method="dpm++",
        x_init=g["x_T"],
    )
    ref = np.clip(g["y_dpm"], 0.0, 1.0)
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_ancestral_legacy_end_to_end(fixture):
    """Full-T legacy ancestral loop (noise-inversion wart) replaying the
    reference's recorded per-step noise."""
    g, model, params = fixture
    T = int(g["T_anc"])
    sharp = _sharpener(g, model, params, n_timestep=T)
    out = sharp.sample(
        {"PAN": g["pan"], "MS": g["ms"]}, sensor="QB", method="ancestral",
        legacy_noise_inversion=True,
        x_init=g["x_T"], step_noise=g["step_noise"],
    )
    ref = np.clip(g["y_anc"][None], 0.0, 1.0)  # reference drops batch dim
    np.testing.assert_allclose(out, ref, atol=2e-3)
