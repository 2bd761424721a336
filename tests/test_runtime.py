"""Native host-ops: build, parity with numpy, prefetcher behavior."""
import numpy as np
import pytest

from tmdiff_tpu.runtime import (
    Prefetcher,
    counts_to_float,
    gather_residual,
    gather_scale,
    get_lib,
)


def test_native_builds():
    # g++ is baked into the image; the native path should be live.
    assert get_lib() is not None, "host_ops.so failed to build"


def test_gather_scale_matches_numpy(rng):
    src = rng.standard_normal((20, 4, 8, 8)).astype(np.float32)
    idx = np.array([3, 0, 19, 7], np.int64)
    out = gather_scale(src, idx, scale=2047.0)
    np.testing.assert_allclose(out, src[idx] / 2047.0, rtol=1e-6)


def test_gather_residual_matches_numpy(rng):
    hr = rng.standard_normal((10, 4, 8, 8)).astype(np.float32)
    lms = rng.standard_normal((10, 4, 8, 8)).astype(np.float32)
    idx = np.array([9, 2, 2], np.int64)
    np.testing.assert_allclose(
        gather_residual(hr, lms, idx), hr[idx] - lms[idx], rtol=1e-6
    )


def test_counts_to_float(rng):
    counts = rng.integers(0, 2047, (4, 2, 8, 8)).astype(np.uint16)
    out = counts_to_float(counts, 2047.0)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, counts.astype(np.float32) / 2047.0,
                               rtol=1e-6)


class TestPrefetcher:
    def test_order_preserved(self):
        pf = Prefetcher(iter(range(10)), depth=3)
        assert list(pf) == list(range(10))

    def test_error_propagates(self):
        def gen():
            yield 1
            raise RuntimeError("worker boom")

        pf = Prefetcher(gen())
        assert next(pf) == 1
        with pytest.raises(RuntimeError, match="worker boom"):
            next(pf)


def test_prefetcher_wraps_mixer():
    """Prefetcher composes with the sensor-mixing pipeline."""
    from tmdiff_tpu.data import BatchIterator, PanDataset, SensorMixer
    from tmdiff_tpu.data.synthetic import make_arrays

    mixer = SensorMixer({
        "QB": BatchIterator(PanDataset(make_arrays(4, size=16, seed=1)), 2),
        "WV3": BatchIterator(PanDataset(make_arrays(4, size=16, seed=2)), 2),
    }, seed=0)
    pf = Prefetcher(mixer, depth=2)
    seen = set()
    for _ in range(8):
        batch, sensor = next(pf)
        assert batch["Res"].shape == (2, 4, 16, 16)
        seen.add(sensor)
    pf.close()
    assert seen <= {"QB", "WV3"} and seen
