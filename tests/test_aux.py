"""Aux subsystems: wavelet dataset variant, profiling, export, DIP utils,
Pansharpener samplers."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmdiff_tpu.data.pan_wavelet import WaveletPanDataset, _haar_level1
from tmdiff_tpu.data.synthetic import make_arrays


class TestWaveletDataset:
    def test_wav_channels(self):
        ds = WaveletPanDataset(make_arrays(n=4, bands=4, size=16), img_scale=1.0)
        s = ds[0]
        # wav = [lms_LL(4)] + [pan_H, pan_D, pan_V] (1 each) at half res
        assert s["wav"].shape == (7, 8, 8)
        assert s["HR"].min() >= -1.0 - 1e-6 and s["HR"].max() <= 1.0 + 1e-6
        b = ds.batch(np.arange(2))
        assert b["wav"].shape == (2, 7, 8, 8)

    def test_haar_level1_round(self, rng):
        x = rng.standard_normal((2, 1, 8, 8)).astype(np.float32)
        ll, (ch, cv, cd) = _haar_level1(x)
        # orthonormal: energy preserved
        e_in = np.sum(x**2)
        e_out = sum(np.sum(z**2) for z in (ll, ch, cv, cd))
        np.testing.assert_allclose(e_in, e_out, rtol=1e-5)

    def test_highpass_and_norm01(self):
        ds = WaveletPanDataset(
            make_arrays(n=2, bands=4, size=16), img_scale=1.0,
            norm_range=False, highpass=True, wavelets=False,
        )
        s = ds[0]
        assert "wav" not in s
        assert abs(float(s["PAN"].mean())) < 0.2  # high-passed ≈ zero-mean

    def test_augment(self):
        ds = WaveletPanDataset(
            make_arrays(n=2, bands=4, size=16), img_scale=1.0,
            aug_prob=1.0, wavelets=False, seed=0,
        )
        s = ds[0]  # runs flip + channel-erase paths
        assert s["HR"].shape == (4, 16, 16)


class TestProfiling:
    def test_throughput(self):
        from tmdiff_tpu.utils.profiling import Throughput

        tp = Throughput()
        for _ in range(5):
            tp.step(n_images=8)
        stats = tp.per_chip()
        assert stats["steps_per_sec"] > 0
        assert stats["images_per_sec"] > stats["steps_per_sec"]

    def test_cost_analysis_and_params(self):
        from tmdiff_tpu.utils.profiling import cost_analysis, param_count

        costs = cost_analysis(lambda a, b: a @ b,
                              jnp.ones((64, 64)), jnp.ones((64, 64)))
        assert costs["flops"] >= 2 * 64**3 * 0.9
        assert param_count({"a": np.ones((3, 4)), "b": np.ones(5)}) == 17


class TestExport:
    def test_png_export(self, tmp_path):
        from tmdiff_tpu.data.synthetic import write_h5
        from tmdiff_tpu.utils.export import export_h5_to_png

        h5 = write_h5(str(tmp_path / "x.h5"), n=3, bands=4, size=16)
        n = export_h5_to_png(h5, str(tmp_path / "png"), max_images=2,
                             questions="describe")
        assert n == 2
        assert (tmp_path / "png" / "img_0.png").exists()
        assert (tmp_path / "png" / "question.jsonl").exists()


class TestDIP:
    def test_noise_and_tv(self):
        from tmdiff_tpu.utils.dip import get_noise, optimize, tv_loss

        z = get_noise(jax.random.key(0), (1, 8, 8, 3))
        assert z.shape == (1, 8, 8, 3)
        grid = get_noise(jax.random.key(0), (1, 8, 8, 3), method="meshgrid")
        assert grid.shape == (1, 8, 8, 2)
        assert float(tv_loss(jnp.ones((1, 8, 8, 1)))) == 0.0

        params, loss = optimize(
            lambda p: jnp.sum((p - 3.0) ** 2), jnp.zeros(4),
            num_iter=200, lr=0.1,
        )
        np.testing.assert_allclose(params, 3.0, atol=1e-2)


class TestPansharpener:
    @pytest.fixture(scope="class")
    def sharp(self, shared_sharp):
        # session-scope shared instance (conftest): same model/params/shapes
        # this class used to build privately — sampler compiles are shared
        # with test_serve/test_harness (suite wall-time budget)
        data = make_arrays(n=2, bands=4, size=16)
        batch = {"PAN": data["pan"], "MS": data["lms"]}
        return shared_sharp, batch

    @pytest.mark.parametrize("method,kwargs", [
        ("regression", {}),
        ("ancestral", {}),
        ("ancestral", {"legacy_noise_inversion": True}),
        ("dpm++", {"steps": 6}),
        ("dpm++_cfg", {"steps": 4}),
        ("ddim", {"steps": 4}),
    ])
    def test_samplers(self, sharp, method, kwargs):
        sharpener, batch = sharp
        out = sharpener.sample(batch, sensor="QB", method=method, **kwargs)
        assert out.shape == batch["MS"].shape
        assert np.isfinite(out).all()
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_cfg_guidance_is_traced_not_a_compile_key(self, sharp):
        """One compiled CFG sampler serves every guidance value (a sweep or
        per-request serving guidance costs ONE compile); different scales
        still produce different images, same scale reproduces bitwise."""
        sharpener, batch = sharp
        a = sharpener.sample(batch, sensor="QB", method="dpm++_cfg",
                             steps=4, guidance=1.5, seed=5)
        n = len(sharpener._compiled)
        b = sharpener.sample(batch, sensor="QB", method="dpm++_cfg",
                             steps=4, guidance=2.5, seed=5)
        a2 = sharpener.sample(batch, sensor="QB", method="dpm++_cfg",
                              steps=4, guidance=1.5, seed=5)
        assert len(sharpener._compiled) == n, "guidance recompiled the sampler"
        assert not np.allclose(a, b), "guidance scale had no effect"
        np.testing.assert_array_equal(a, a2)

    def test_sample_tiled(self, sharp):
        """Scenes larger than the compiled tile: overlapping crops through
        the normal sampler, feather-blended; a scene that fits one tile
        reproduces sample() bitwise; an uneven grid (9 crops, tile_batch 4)
        exercises the padded final chunk."""
        sharpener, batch = sharp
        big = make_arrays(n=2, bands=4, size=32)
        big_batch = {"PAN": big["pan"], "MS": big["lms"]}
        out = sharpener.sample_tiled(
            big_batch, sensor="QB", tile=16, overlap=8, tile_batch=4,
            method="regression", seed=3)
        assert out.shape == big_batch["MS"].shape
        assert np.isfinite(out).all()
        assert out.min() >= 0.0 and out.max() <= 1.0
        # fits-one-tile case → exactly the plain sampler
        small = sharpener.sample_tiled(batch, sensor="QB", tile=16,
                                       method="regression", seed=3)
        direct = sharpener.sample(batch, sensor="QB", method="regression",
                                  seed=3)
        np.testing.assert_array_equal(small, direct)
        # one-long-dimension case (16x32): edge-pad path
        half = {"PAN": big["pan"][:, :, :16, :], "MS": big["lms"][:, :, :16, :]}
        out2 = sharpener.sample_tiled(half, sensor="QB", tile=16, overlap=8,
                                      tile_batch=4, method="regression")
        assert out2.shape == half["MS"].shape and np.isfinite(out2).all()

    def test_per_sample_guidance_vector(self, sharp):
        """A (B,) guidance vector applies each row's scale independently:
        row i of a mixed-scale batch equals row i of the same batch run at
        that row's scalar scale (same seed → same x_T). This is what lets
        the serving engine co-batch requests at different guidance scales."""
        sharpener, batch = sharp
        mixed = sharpener.sample(batch, sensor="QB", method="dpm++_cfg",
                                 steps=4, guidance=np.array([1.5, 2.5]),
                                 seed=5)
        s15 = sharpener.sample(batch, sensor="QB", method="dpm++_cfg",
                               steps=4, guidance=1.5, seed=5)
        s25 = sharpener.sample(batch, sensor="QB", method="dpm++_cfg",
                               steps=4, guidance=2.5, seed=5)
        np.testing.assert_allclose(mixed[0], s15[0], atol=1e-6)
        np.testing.assert_allclose(mixed[1], s25[1], atol=1e-6)

    def test_sample_tiled_per_sample_guidance(self, sharp):
        """sample_tiled replicates a (B,) guidance vector per crop so the
        stacked len(chunk)·B device batch sees each scene row's scale
        (previously shape-errored at B>1); a wrong-length vector raises."""
        sharpener, _ = sharp
        big = make_arrays(n=2, bands=4, size=32)
        big_batch = {"PAN": big["pan"], "MS": big["lms"]}
        out = sharpener.sample_tiled(
            big_batch, sensor="QB", tile=16, overlap=8, tile_batch=4,
            method="dpm++_cfg", steps=4,
            guidance=np.array([1.5, 2.5]), seed=3)
        assert out.shape == big_batch["MS"].shape
        assert np.isfinite(out).all()
        with pytest.raises(ValueError, match="guidance"):
            sharpener.sample_tiled(
                big_batch, sensor="QB", tile=16, overlap=8, tile_batch=4,
                method="dpm++_cfg", steps=4,
                guidance=np.array([1.5, 2.5, 3.5]), seed=3)


def test_ancestral_continuous_frames():
    """Reference `continous=True` mode: intermediate frames returned."""
    from tmdiff_tpu.models import WavBEST
    from tmdiff_tpu.pipeline import Pansharpener

    data = make_arrays(n=1, bands=4, size=16)
    model = WavBEST(channels=(4, 8, 8, 16))
    x = jnp.asarray(data["gt"] - data["lms"])
    params = model.init(
        jax.random.key(0), x, jnp.array([1]), jnp.asarray(data["pan"]),
        jnp.asarray(data["lms"]), jnp.zeros(768),
    )
    sharp = Pansharpener(model, params, n_timestep=10)
    batch = {"PAN": data["pan"], "MS": data["lms"]}
    final, frames = sharp.sample(batch, method="ancestral", num_frames=5)
    assert final.shape == batch["MS"].shape
    assert frames.shape[0] == 5 and frames.shape[1:] == batch["MS"].shape
    assert np.isfinite(frames).all()
