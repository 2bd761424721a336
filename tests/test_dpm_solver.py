"""DPM-Solver parity with the torch reference on analytic toy models,
covering singlestep/multistep, orders 1-3, ++/vanilla, CFG, thresholding."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tmdiff_tpu.diffusion.dpm_solver import (
    DPMSolver,
    NoiseScheduleVP,
    WrappedModel,
    dynamic_thresholding,
)
from tmdiff_tpu.diffusion.schedules import make_beta_schedule

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def env():
    g = np.load(os.path.join(GOLDEN, "dpm_solver.npz"))
    ns = NoiseScheduleVP("discrete", betas=g["betas"])
    x_T = jnp.asarray(g["x_T"])
    cond = jnp.asarray(g["cond"])

    def toy(x, t, *extra):
        t4 = t.reshape(-1, 1, 1, 1).astype(jnp.float32)
        out = jnp.tanh(x) * 0.7 + jnp.sin(x * 2.0) * (t4 / 1000.0)
        if extra:
            out = out + 0.1 * extra[0]
        return out

    def toy_linear(x, t, *extra):
        t4 = t.reshape(-1, 1, 1, 1).astype(jnp.float32)
        return 0.3 * x + 0.05 * (t4 / 1000.0) * x

    return g, ns, x_T, cond, toy, toy_linear


CASES = [
    ("ss3_xstart", "x_start", "dpmsolver++", "dynamic_thresholding", None,
     dict(steps=30, order=3, skip_type="logSNR", method="singlestep",
          denoise_to_zero=True)),
    ("ms3_noise", "noise", "dpmsolver++", "dynamic_thresholding", None,
     dict(steps=50, order=3, skip_type="logSNR", method="multistep",
          denoise_to_zero=True)),
    ("ms2_short", "x_start", "dpmsolver++", "dynamic_thresholding", None,
     dict(steps=8, order=2, skip_type="time_uniform", method="multistep")),
    ("ssfix2_eps", "noise", "dpmsolver", None, None,
     dict(steps=10, order=2, skip_type="time_uniform", method="singlestep_fixed")),
    ("ms2_cfg", "noise", "dpmsolver++", "dynamic_thresholding", 3.0,
     dict(steps=50, order=2, skip_type="logSNR", method="multistep")),
]


@pytest.mark.parametrize("name,mtype,algo,correct,guidance,kwargs",
                         CASES, ids=[c[0] for c in CASES])
def test_parity(env, name, mtype, algo, correct, guidance, kwargs):
    g, ns, x_T, cond, toy, toy_linear = env
    net = toy_linear if name == "ssfix2_eps" else toy
    if guidance is not None:
        wrapped = WrappedModel(
            net, model_type=mtype, guidance_type="classifier-free",
            guidance_scale=guidance, condition=cond,
            unconditional_condition=jnp.zeros_like(cond),
        )
    else:
        wrapped = WrappedModel(net, model_type=mtype)
    solver = DPMSolver(wrapped, ns, algorithm_type=algo, correcting_x0_fn=correct)
    x = solver.sample(x_T, **kwargs)
    # rtol-dominated: the unthresholded vanilla-dpmsolver toy trajectory
    # diverges to ~1e4 magnitudes (identically in torch), amplifying fp32
    # accumulation differences.
    np.testing.assert_allclose(
        np.asarray(x), g[name], rtol=2e-3, atol=5e-4, err_msg=name
    )


def test_dynamic_thresholding_basic(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 4)) * 3, jnp.float32)
    y = dynamic_thresholding(x)
    assert float(jnp.max(jnp.abs(y))) <= 1.0 + 1e-6


def test_schedule_roundtrip():
    betas = make_beta_schedule("cosine", 1000)
    ns = NoiseScheduleVP("discrete", betas=betas)
    t = np.linspace(1e-3, 1.0, 57)
    lam = ns.marginal_lambda(t)
    np.testing.assert_allclose(ns.inverse_lambda(lam), t, atol=1e-6)
