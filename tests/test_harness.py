"""Validation harness: RR sets report reference metrics (SSIM/SAM …), FR
(no-ground-truth) sets route to the no-reference D_λ/D_s/QNR suite instead of
fake-RR against the lms upsample (reference `core/metrics.py:287-335`;
the reference entry itself never wires FR — a known gap we close)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmdiff_tpu.data.h5 import PanDataset
from tmdiff_tpu.data.synthetic import make_arrays, write_h5
from tmdiff_tpu.eval.harness import validate
from tmdiff_tpu.models import WavBEST
from tmdiff_tpu.pipeline import Pansharpener


@pytest.fixture(scope="module")
def sharp(shared_sharp):
    # session-scope shared instance (conftest) — one compile cache for the
    # whole suite
    return shared_sharp


def test_validate_rr(sharp, tmp_path):
    ds = PanDataset(make_arrays(n=2, bands=4, size=16))
    assert ds.has_reference
    scores = validate(sharp, ds, "QB", result_dir=str(tmp_path),
                      method="regression", batch_size=2)
    assert "ssim_QB" in scores and "sam_QB" in scores
    assert "qnr_QB" not in scores
    assert os.path.exists(tmp_path / "output_mulExm_0.mat")


def test_validate_fr_routes_to_no_reference(sharp, tmp_path):
    path = write_h5(str(tmp_path / "fr_wv3.h5"), n=1, bands=4, size=16,
                    full_resolution=True)
    ds = PanDataset(path)
    assert not ds.has_reference
    scores = validate(sharp, ds, "WV3", result_dir=str(tmp_path),
                      method="regression", batch_size=1)
    # no-reference suite present, RR metrics absent
    for k in ("d_lambda_WV3", "d_s_WV3", "qnr_WV3", "fcc_WV3"):
        assert k in scores and np.isfinite(scores[k]), scores
    assert "ssim_WV3" not in scores and "sam_WV3" not in scores
    # QNR consistency per image: (1-D_λ)·(1-D_s)
    np.testing.assert_allclose(
        scores["qnr_WV3"],
        (1 - scores["d_lambda_WV3"]) * (1 - scores["d_s_WV3"]),
        rtol=1e-6,
    )
