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


class TestDeviceFeeder:
    """The CLI train-loop feeder (runtime/prefetch.py::DeviceFeeder): host
    assembly off-thread + one-ahead staging must preserve the exact batch
    sequence (bit-reproducible training) and respect the serial mode."""

    def test_order_and_one_ahead(self):
        from tmdiff_tpu.runtime.prefetch import DeviceFeeder

        staged = []
        feeder = DeviceFeeder(iter(range(10)), lambda x: (staged.append(x), x)[1],
                              depth=2)
        out = [next(feeder) for _ in range(5)]
        assert out == list(range(5))
        # one item staged ahead of what was consumed
        assert staged[: len(out) + 1] == list(range(len(out) + 1))
        feeder.close()

    def test_serial_mode_stages_lazily(self):
        from tmdiff_tpu.runtime.prefetch import DeviceFeeder

        staged = []
        feeder = DeviceFeeder(iter(range(10)), lambda x: (staged.append(x), x)[1],
                              depth=0, ahead=False)
        assert next(feeder) == 0
        assert staged == [0]  # nothing pre-staged: the old serial loop
        feeder.close()

    def test_mixer_sequence_identical_to_unwrapped(self):
        """Same seeds => the feeder consumes exactly the sequence the bare
        mixer would produce (prefetch cannot change training data order)."""
        from tmdiff_tpu.data import BatchIterator, PanDataset, SensorMixer
        from tmdiff_tpu.data.synthetic import make_arrays
        from tmdiff_tpu.runtime.prefetch import DeviceFeeder

        def build():
            return SensorMixer({
                "QB": BatchIterator(PanDataset(make_arrays(6, size=8, seed=1)), 2),
                "WV3": BatchIterator(PanDataset(make_arrays(6, size=8, seed=2)), 2),
            }, seed=0)

        bare = build()
        ref = [next(bare) for _ in range(10)]
        feeder = DeviceFeeder(build(), lambda item: item, depth=2)
        got = [next(feeder) for _ in range(10)]
        feeder.close()
        for (b0, s0), (b1, s1) in zip(ref, got):
            assert s0 == s1
            np.testing.assert_array_equal(b0["Res"], b1["Res"])


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
