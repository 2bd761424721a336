"""Beta-schedule parity with the reference + internal identities."""
import os

import numpy as np

from tmdiff_tpu.diffusion.schedules import NoiseSchedule, make_beta_schedule

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_golden_betas():
    g = np.load(os.path.join(GOLDEN, "schedules.npz"))
    for schedule in ["linear", "cosine"]:
        for T in [100, 1000]:
            np.testing.assert_allclose(
                make_beta_schedule(schedule, T), g[f"{schedule}_{T}"], rtol=1e-12
            )


def test_tables():
    ns = NoiseSchedule.create("cosine", 1000)
    assert ns.betas.shape == (1000,)
    assert ns.sqrt_alphas_cumprod_prev.shape == (1001,)
    np.testing.assert_allclose(ns.sqrt_alphas_cumprod_prev[0], 1.0)
    # index t gives sqrt(abar_t)
    np.testing.assert_allclose(
        ns.sqrt_alphas_cumprod_prev[1:], ns.sqrt_alphas_cumprod, rtol=1e-6
    )
    # posterior identity (tables are stored fp32 after fp64 construction, so
    # recomputing from the fp32 tables only agrees to ~1e-3 relative)
    np.testing.assert_allclose(
        np.asarray(ns.posterior_variance),
        np.asarray(ns.betas)
        * (1 - np.asarray(ns.alphas_cumprod_prev))
        / (1 - np.asarray(ns.alphas_cumprod)),
        rtol=2e-3,
    )


def test_linear_endpoints():
    betas = make_beta_schedule("linear", 1000)
    np.testing.assert_allclose(betas[0], 1e-6)
    np.testing.assert_allclose(betas[-1], 1e-2)
