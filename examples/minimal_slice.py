"""Minimum end-to-end slice (SURVEY.md §7 / BASELINE.json config 1).

One synthetic WV-3-like 64×64 MS+PAN patch → WavBEST forward with the frozen
WV3 prompt constant → 20-step DPM-Solver++ multistep order-2 scan →
residual + MS → SAM/ERGAS/SSIM against ground truth.

    python examples/minimal_slice.py          # runs on whatever jax sees
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tmdiff_tpu.data.synthetic import make_arrays
from tmdiff_tpu.eval.metrics import evaluate_rr
from tmdiff_tpu.models import WavBEST
from tmdiff_tpu.pipeline import Pansharpener


def main():
    data = make_arrays(n=1, bands=8, size=64, seed=0)
    model = WavBEST(channels=(32, 64, 128, 256))
    res = jnp.asarray(data["gt"] - data["lms"])
    params = model.init(
        jax.random.key(0), res, jnp.array([1]),
        jnp.asarray(data["pan"]), jnp.asarray(data["lms"]), jnp.zeros(768),
    )
    sharp = Pansharpener(model, params)
    batch = {"PAN": data["pan"], "MS": data["lms"]}
    pred = sharp.sample(batch, sensor="WV3", method="dpm++_noise", steps=20)
    gt_hwc = np.transpose(data["gt"][0], (1, 2, 0))
    pred_hwc = np.transpose(pred[0], (1, 2, 0))
    scores = evaluate_rr(gt_hwc, pred_hwc)
    print({k: round(v, 4) for k, v in scores.items()})
    # An untrained model should roughly reproduce the upsampled MS:
    print("pred range:", pred.min(), pred.max())


if __name__ == "__main__":
    main()
