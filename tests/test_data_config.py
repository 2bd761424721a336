"""Data pipeline, config parsing, and metric sanity tests."""
import json
import os

import numpy as np
import pytest

from tmdiff_tpu.config import parse_config
from tmdiff_tpu.data import BatchIterator, PanDataset, SensorMixer
from tmdiff_tpu.data.h5 import merge_patches_4x4, split_patches_4x4, infer_img_scale
from tmdiff_tpu.data.synthetic import make_arrays, write_h5
from tmdiff_tpu.eval import metrics as M


class TestData:
    def test_lazy_dataset_matches_in_ram(self, tmp_path):
        """LazyPanDataset must produce byte-identical batches to PanDataset
        (incl. duplicate/unsorted index handling, which h5py can't gather
        directly), and duck-type into BatchIterator."""
        from tmdiff_tpu.data import BatchIterator, LazyPanDataset
        from tmdiff_tpu.data.synthetic import write_h5

        path = write_h5(str(tmp_path / "train_wv3.h5"), n=6, bands=4, size=16,
                        seed=3, img_scale=2047.0)
        ram = PanDataset(path)
        lazy = LazyPanDataset(path)
        assert len(lazy) == len(ram) and lazy.bands == ram.bands
        assert lazy.has_reference == ram.has_reference
        idx = np.array([4, 1, 1, 5])  # unsorted + duplicate
        a, b = ram.batch(idx), lazy.batch(idx)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
        it = BatchIterator(lazy, batch_size=2, seed=0)
        batch = next(it)
        assert batch["Res"].shape == (2, 4, 16, 16)
        # FR file (no gt): has_reference False, gt falls back to lms
        import h5py

        fr = str(tmp_path / "fr.h5")
        with h5py.File(path, "r") as src, h5py.File(fr, "w") as dst:
            for k in ("ms", "lms", "pan"):
                dst.create_dataset(k, data=src[k])
        lazy_fr = LazyPanDataset(fr)
        assert not lazy_fr.has_reference
        np.testing.assert_array_equal(
            lazy_fr.batch(np.array([0]))["HR"],
            lazy_fr.batch(np.array([0]))["MS"],
        )
        lazy.close(); lazy_fr.close()

    def test_dataset_semantics(self):
        ds = PanDataset(make_arrays(n=6, bands=4, size=16))
        assert len(ds) == 6
        s = ds[0]
        np.testing.assert_allclose(s["Res"], s["HR"] - s["MS"], atol=1e-7)
        assert s["PAN"].shape == (1, 16, 16)
        assert s["LR"].shape == (4, 4, 4)

    def test_h5_roundtrip_scaling(self, tmp_path):
        path = write_h5(str(tmp_path / "train_gf2_x.h5"), n=4, size=16,
                        img_scale=1023.0)
        assert infer_img_scale(path) == 1023.0
        ds = PanDataset(path)
        assert float(ds.gt.max()) <= 1.0 + 1e-5
        assert ds.bands == 4

    def test_batch_iterator_epochs(self):
        ds = PanDataset(make_arrays(n=10, size=16))
        it = BatchIterator(ds, batch_size=4, seed=0)
        assert len(it) == 2
        seen = [next(it)["HR"].shape[0] for _ in range(5)]
        assert seen == [4] * 5

    def test_sensor_mixer_distribution(self):
        sets = {
            "QB": BatchIterator(PanDataset(make_arrays(8, size=16, seed=1)), 2),
            "GF2": BatchIterator(PanDataset(make_arrays(8, size=16, seed=2)), 2),
            "WV3": BatchIterator(PanDataset(make_arrays(8, size=16, seed=3)), 2),
        }
        mixer = SensorMixer(sets, seed=0)
        np.testing.assert_allclose(mixer.probs, [0.25, 0.25, 0.5], atol=1e-9)
        draws = [next(mixer)[1] for _ in range(400)]
        frac_wv3 = draws.count("WV3") / len(draws)
        assert 0.4 < frac_wv3 < 0.6

    def test_patch_merge_roundtrip(self, rng):
        imgs = rng.standard_normal((16, 3, 8, 8)).astype(np.float32)
        merged = merge_patches_4x4(imgs)
        assert merged.shape == (3, 32, 32)
        np.testing.assert_array_equal(split_patches_4x4(merged), imgs)


class TestConfig:
    def test_parse(self, tmp_path):
        cfg = {
            "name": "t", "phase": "train",
            "path": {"log": "logs", "checkpoint": "ckpt", "resume": "/abs/resume"},
            "train": {"max_iter": 10},
        }
        p = tmp_path / "c.json"
        p.write_text(
            "{\n// a comment\n"
            + json.dumps(cfg)[1:]
        )
        opt = parse_config(str(p), phase="train",
                           experiments_root=str(tmp_path / "exp"))
        assert opt["path"]["resume"] == "/abs/resume"  # untouched
        assert opt["path"]["log"].startswith(str(tmp_path / "exp"))
        assert os.path.isdir(opt["path"]["log"])
        assert opt["missing_key"] is None
        assert opt["train"]["nope"] is None

    def test_debug_overrides(self, tmp_path):
        cfg = {
            "name": "t", "path": {"log": "logs"},
            "datasets": {"train_qb": {"batch_size": 64, "dataroot": "x"}},
            "model": {"beta_schedule": {"train": {"schedule": "cosine",
                                                   "n_timestep": 1000}}},
            "train": {"val_freq": 5000},
        }
        p = tmp_path / "c.json"
        p.write_text(json.dumps(cfg))
        opt = parse_config(str(p), debug=True,
                           experiments_root=str(tmp_path / "exp"))
        assert opt["train"]["val_freq"] == 2
        assert opt["datasets"]["train_qb"]["batch_size"] == 2
        assert opt["model"]["beta_schedule"]["train"]["n_timestep"] == 10

    def test_debug_keeps_distill_chain_valid(self, tmp_path):
        """Debug shrinks T to 10; the distill phases must be rewritten to a
        chain satisfying T % 2N == 0 or `-p distill -debug` crashes."""
        cfg = {
            "name": "t", "path": {"log": "logs"},
            "model": {"beta_schedule": {"train": {"schedule": "cosine",
                                                   "n_timestep": 1000}}},
            "train": {"distill": {"phases": [10, 5],
                                  "steps_per_phase": 600}},
        }
        p = tmp_path / "c.json"
        p.write_text(json.dumps(cfg))
        opt = parse_config(str(p), debug=True,
                           experiments_root=str(tmp_path / "exp"))
        T = opt["model"]["beta_schedule"]["train"]["n_timestep"]
        for n in opt["train"]["distill"]["phases"]:
            assert T % (2 * n) == 0, (T, n)

    def test_presets_parse(self, tmp_path):
        import tmdiff_tpu.config as cfg_pkg

        presets = os.path.join(os.path.dirname(cfg_pkg.__file__), "presets")
        for name in os.listdir(presets):
            opt = parse_config(os.path.join(presets, name), make_dirs=False,
                               experiments_root=str(tmp_path / name))
            assert opt["model"]["unet"]["channel_multiplier"]


class TestMetrics:
    def test_perfect_prediction(self):
        img = np.random.default_rng(0).random((32, 32, 4)).astype(np.float64)
        assert M.ssim(img, img, 1.0) == pytest.approx(1.0, abs=1e-9)
        assert M.sam(img, img) == pytest.approx(0.0, abs=1e-3)
        assert M.q4(img, img) == pytest.approx(1.0, abs=1e-9)
        assert M.rmse(img, img) == 0.0
        assert M.scc(img, img) == pytest.approx(1.0, abs=1e-9)

    def test_degradation_monotonic(self):
        rng = np.random.default_rng(1)
        gt = rng.random((32, 32, 4))
        small = gt + 0.01 * rng.standard_normal(gt.shape)
        large = gt + 0.2 * rng.standard_normal(gt.shape)
        assert M.ssim(gt, small, 1.0) > M.ssim(gt, large, 1.0)
        assert M.sam(gt, small) < M.sam(gt, large)
        assert M.ergas(gt, small) < M.ergas(gt, large)

    def test_full_suites_run(self):
        rng = np.random.default_rng(2)
        gt = rng.random((32, 32, 4))
        pred = gt + 0.05 * rng.standard_normal(gt.shape)
        rr = M.evaluate_rr(gt, pred)
        assert set(rr) >= {"ssim", "sam", "ergas", "psnr", "q4"}
        # FR metrics take the *low-resolution* MS (H/4) and full-res PAN:
        # d_s compares Q(l_ms_i, pyrDown²(pan)) (`D_s_numpy:311-333`).
        lms = rng.random((8, 8, 4))
        pan = rng.random((32, 32))
        fr = M.evaluate_fr(lms, pan, pred)
        assert set(fr) >= {"d_lambda", "d_s", "qnr"}
        assert 0 <= fr["qnr"] <= 1.5
