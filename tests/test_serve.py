"""Serving subsystem: batching engine semantics + HTTP round-trip.

The reference has no serving layer (its val loop is the closest thing,
`general_sharpening_joint_random_batch_finetune.py:126-152`); these tests pin
the engine's contracts: coalescing concurrent requests into one padded device
batch, per-request result extraction, non-co-batchable traffic survival,
error propagation, and the stdlib HTTP front-end."""
import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tmdiff_tpu.data.synthetic import make_arrays


@pytest.fixture(scope="module")
def sharp(shared_sharp):
    # session-scope shared instance (conftest) — one compile cache for the
    # whole suite
    return shared_sharp


def _image(seed, bands=4, size=16):
    rng = np.random.default_rng(seed)
    return (rng.random((1, size, size), np.float32),
            rng.random((bands, size, size), np.float32))


def test_engine_batches_concurrent_requests(sharp):
    from tmdiff_tpu.serve import InferenceEngine

    engine = InferenceEngine(sharp, method="regression", max_batch=4,
                             max_delay_ms=200.0)
    try:
        pans, mss = zip(*[_image(i) for i in range(4)])
        futs = [engine.submit(p, m, "QB") for p, m in zip(pans, mss)]
        outs = [f.result(timeout=120) for f in futs]
        for ms, out in zip(mss, outs):
            assert out.shape == ms.shape
            assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1
        # all four must have ridden one device batch
        assert engine.stats["batches"] == 1
        assert engine.stats["batch_size_hist"] == {4: 1}
        assert engine.stats["padded_slots"] == 0
        # engine result for slot i == direct sampler output for the same
        # stacked batch and seed (padding/extraction adds nothing)
        direct = sharp.sample(
            {"PAN": np.stack(pans), "MS": np.stack(mss)},
            sensor="QB", method="regression", seed=0,
        )
        np.testing.assert_allclose(np.stack(outs), direct, atol=1e-6)
    finally:
        engine.shutdown()


def test_engine_serves_distilled_ddim(sharp):
    """A distilled few-NFE deployment is just an engine config:
    method='ddim', steps=N — no engine changes (BASELINE.md measures 18.5
    img/s/chip for 1-NFE ddim at flagship shapes)."""
    from tmdiff_tpu.serve import InferenceEngine

    engine = InferenceEngine(sharp, method="ddim", steps=2, max_batch=2,
                             max_delay_ms=50.0)
    try:
        pan, ms = _image(0)
        out = engine.submit(pan, ms, "QB").result(timeout=120)
        assert out.shape == ms.shape
        assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1
    finally:
        engine.shutdown()


def test_engine_serves_ddim_cached_with_sampler_kw(sharp):
    """sampler_kw forwards method-specific knobs (ddim_cached's
    refresh_every / cache_level / forecast) verbatim into
    Pansharpener.sample — the engine result must match the direct call."""
    from tmdiff_tpu.serve import InferenceEngine

    kw = {"refresh_every": 2, "cache_level": 3, "forecast": True}
    engine = InferenceEngine(sharp, method="ddim_cached", steps=4,
                             max_batch=1, max_delay_ms=50.0, sampler_kw=kw)
    try:
        pan, ms = _image(0)
        out = engine.submit(pan, ms, "QB").result(timeout=120)
        assert out.shape == ms.shape
        direct = sharp.sample(
            {"PAN": pan[None], "MS": ms[None]}, sensor="QB",
            method="ddim_cached", steps=4, seed=0, **kw)
        np.testing.assert_allclose(out, direct[0], atol=1e-6)
    finally:
        engine.shutdown()


def test_engine_cobatches_mixed_guidance(sharp):
    """Requests at different CFG scales ride ONE batch and ONE compiled
    program (per-sample guidance vector); each row matches the direct
    sampler run with the same vector and seed."""
    from tmdiff_tpu.serve import InferenceEngine

    engine = InferenceEngine(sharp, method="dpm++_cfg", steps=4, max_batch=2,
                             max_delay_ms=200.0)
    try:
        (p0, m0), (p1, m1) = _image(0), _image(1)
        f0 = engine.submit(p0, m0, "QB", guidance=1.5)
        f1 = engine.submit(p1, m1, "QB", guidance=2.5)
        out = [f.result(timeout=120) for f in (f0, f1)]
        assert engine.stats["batches"] == 1  # mixed scales co-batched
        direct = sharp.sample(
            {"PAN": np.stack([p0, p1]), "MS": np.stack([m0, m1])},
            sensor="QB", method="dpm++_cfg", steps=4, seed=0,
            guidance=np.array([1.5, 2.5], np.float32),
        )
        np.testing.assert_allclose(out[0], direct[0], atol=1e-6)
        np.testing.assert_allclose(out[1], direct[1], atol=1e-6)
    finally:
        engine.shutdown()


def test_engine_pads_to_bucket_and_mixes_groups(sharp):
    from tmdiff_tpu.serve import InferenceEngine

    engine = InferenceEngine(sharp, method="regression", max_batch=4,
                             max_delay_ms=150.0)
    try:
        # 3 co-batchable QB requests + 1 different-shape request interleaved
        p16, m16 = _image(0)
        p8, m8 = _image(1, size=8)
        futs = [
            engine.submit(p16, m16, "QB"),
            engine.submit(p8, m8, "QB"),  # different shape → separate batch
            engine.submit(p16, m16, "QB"),
            engine.submit(p16, m16, "QB"),
        ]
        outs = [f.result(timeout=120) for f in futs]
        assert outs[0].shape == m16.shape and outs[1].shape == m8.shape
        assert engine.stats["requests"] == 4
        assert engine.stats["batches"] == 2
        # the 3-request group padded up to the 4-bucket
        assert engine.stats["padded_slots"] == 1
        for out in outs:
            assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1
    finally:
        engine.shutdown()


def test_mixed_sensor_batch_conditions_per_sample(sharp):
    """`sensor` may be a list: per-sample prompt embeddings flow through the
    whole sampler (the reference can only condition a batch on one sensor).
    With a fixed x_init the dpm++ path is deterministic, so slot 0 must be
    bit-identical across calls while slot 1 must differ when its sensor
    changes."""
    pan, ms = _image(11)
    batch = {"PAN": np.stack([pan, pan]), "MS": np.stack([ms, ms])}
    x_init = np.random.default_rng(5).standard_normal(
        batch["MS"].shape).astype(np.float32)
    same = sharp.sample(batch, sensor=["QB", "QB"], method="dpm++",
                        steps=4, x_init=x_init)
    mixed = sharp.sample(batch, sensor=["QB", "WV3"], method="dpm++",
                         steps=4, x_init=x_init)
    np.testing.assert_array_equal(same[0], mixed[0])
    assert not np.array_equal(same[1], mixed[1])


def test_engine_coalesces_mixed_sensors(sharp):
    from tmdiff_tpu.serve import InferenceEngine

    engine = InferenceEngine(sharp, method="regression", max_batch=4,
                             max_delay_ms=200.0)
    try:
        futs = [engine.submit(*_image(i), sensor)
                for i, sensor in enumerate(["QB", "WV3", "GF2", "WV2"])]
        outs = [f.result(timeout=120) for f in futs]
        assert engine.stats["batches"] == 1  # four sensors, ONE device batch
        for out in outs:
            assert np.isfinite(out).all()
    finally:
        engine.shutdown()


def test_engine_error_propagates_without_killing_worker(sharp):
    from tmdiff_tpu.serve import InferenceEngine

    engine = InferenceEngine(sharp, method="regression", max_batch=2,
                             max_delay_ms=5.0)
    try:
        with pytest.raises(ValueError, match="one image per request"):
            engine.submit(np.zeros((2, 1, 16, 16)), np.zeros((4, 16, 16)))
        # pan/ms spatial mismatch is rejected at submit() — it must never
        # reach _execute where np.stack would fail the whole co-batched group
        with pytest.raises(ValueError, match="spatial dims"):
            engine.submit(np.zeros((1, 16, 16)), np.zeros((3, 15, 15)))
        # shape that passes validation but breaks inside the sampler
        # (15 not divisible by 8) → future gets the error
        bad = engine.submit(np.zeros((1, 15, 15)), np.zeros((3, 15, 15)))
        with pytest.raises(Exception):
            bad.result(timeout=120)
        # worker is still alive and serves the next request
        p, m = _image(3)
        out = engine.submit(p, m, "QB").result(timeout=120)
        assert out.shape == m.shape
    finally:
        engine.shutdown()


def test_engine_backpressure():
    """Bounded queue: submits beyond max_queue raise EngineOverloaded (the
    HTTP layer maps it to 503) while in-flight work completes normally."""
    import threading

    from tmdiff_tpu.serve import InferenceEngine
    from tmdiff_tpu.serve.engine import EngineOverloaded

    class SlowSharp:  # duck-typed sampler with a controllable stall
        def __init__(self):
            self.release = threading.Event()

        def sample(self, batch, sensor, method, steps, seed):
            self.release.wait(30)
            return np.zeros_like(batch["MS"])

    slow = SlowSharp()
    engine = InferenceEngine(slow, method="regression", max_batch=1,
                             max_delay_ms=1.0, max_queue=2)
    try:
        pan, ms = _image(0)
        first = engine.submit(pan, ms)  # worker picks this up and stalls
        import time

        time.sleep(0.3)  # let the worker dequeue it
        backlog = [engine.submit(pan, ms) for _ in range(2)]
        with pytest.raises(EngineOverloaded):
            engine.submit(pan, ms)
        assert engine.stats["rejected"] == 1
        slow.release.set()
        assert first.result(timeout=60).shape == ms.shape
        for f in backlog:
            f.result(timeout=60)
    finally:
        slow.release.set()
        engine.shutdown()


def test_http_server_round_trip(sharp):
    from tmdiff_tpu.serve import InferenceEngine, make_server, \
        serve_forever_in_thread

    engine = InferenceEngine(sharp, method="regression", max_batch=2,
                             max_delay_ms=5.0)
    server = make_server(engine, "127.0.0.1", 0)
    serve_forever_in_thread(server)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.load(r) == {"ok": True}

        pan, ms = _image(7)
        buf = io.BytesIO()
        np.savez(buf, pan=pan, ms=ms, sensor="QB")
        req = urllib.request.Request(
            f"{base}/v1/pansharpen", data=buf.getvalue(), method="POST",
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            out = np.load(io.BytesIO(r.read()))["sr"]
        assert out.shape == ms.shape
        assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1

        with urllib.request.urlopen(f"{base}/v1/stats", timeout=30) as r:
            stats = json.load(r)
        assert stats["requests"] == 1 and stats["batches"] == 1

        # malformed body → 400, not a dead server
        req = urllib.request.Request(
            f"{base}/v1/pansharpen", data=b"not-an-npz", method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400

        # guidance on a non-CFG deployment → 400 (loud, not silently
        # ignored — the client must know its scale sweep did nothing)
        buf = io.BytesIO()
        np.savez(buf, pan=pan, ms=ms, sensor="QB",
                 guidance=np.float32(2.0))
        req = urllib.request.Request(
            f"{base}/v1/pansharpen", data=buf.getvalue(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
        assert "dpm++_cfg" in json.loads(ei.value.read())["error"]
    finally:
        server.shutdown()
        engine.shutdown()


def test_serve_preset_supplies_deployment_defaults(tmp_path, monkeypatch):
    """config/presets/serve_lowlatency.json is the documented low-latency
    4-band path: its "serve" block becomes the CLI's defaults (sampler=ddim
    steps=1 bf16 ema), while explicit flags still win."""
    import argparse
    import os

    from tmdiff_tpu.config import parse_config
    from tmdiff_tpu.serve.__main__ import apply_serve_defaults

    preset = os.path.join(
        os.path.dirname(__file__), "..", "tmdiff_tpu", "config", "presets",
        "serve_lowlatency.json")
    monkeypatch.chdir(tmp_path)  # parse_config creates the experiments tree
    opt = parse_config(preset, phase="val")
    assert int(opt["serve_bands"]) == 4

    p = argparse.ArgumentParser()
    p.add_argument("--sampler", default="dpm++")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--use-ema", action="store_true")
    p.add_argument("--max-delay-ms", type=float, default=15.0)
    p.add_argument("--warmup", default=None)

    args = p.parse_args([])
    apply_serve_defaults(args, opt, p, [])
    assert (args.sampler, args.steps) == ("ddim", 1)
    assert args.bf16 and args.use_ema
    assert args.max_delay_ms == 5.0 and args.warmup == "4,256,256"

    # explicit flags beat the preset
    argv = ["--sampler", "dpm++", "--steps", "20"]
    args = p.parse_args(argv)
    apply_serve_defaults(args, opt, p, argv)
    assert (args.sampler, args.steps) == ("dpm++", 20)
    assert args.bf16  # untouched flags still come from the preset


def test_serve_quality_preset_supplies_cached_sampler(tmp_path, monkeypatch):
    """config/presets/serve_quality.json deploys the measured quality-free
    block-caching operating point (ddim_cached, 20 steps, level 3, r=2,
    forecast off — BASELINE.md 'Level-3 caching + trunk forecasting')."""
    import argparse
    import os

    from tmdiff_tpu.config import parse_config
    from tmdiff_tpu.serve.__main__ import apply_serve_defaults

    preset = os.path.join(
        os.path.dirname(__file__), "..", "tmdiff_tpu", "config", "presets",
        "serve_quality.json")
    monkeypatch.chdir(tmp_path)
    opt = parse_config(preset, phase="val")
    assert int(opt["serve_bands"]) == 8

    p = argparse.ArgumentParser()
    p.add_argument("--sampler", default="dpm++")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--refresh-every", type=int, default=4)
    p.add_argument("--cache-level", type=int, default=2)
    p.add_argument("--forecast", action=argparse.BooleanOptionalAction,
                   default=False)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--use-ema", action="store_true")
    p.add_argument("--warmup", default=None)

    args = p.parse_args([])
    apply_serve_defaults(args, opt, p, [])
    assert (args.sampler, args.steps) == ("ddim_cached", 20)
    assert (args.refresh_every, args.cache_level) == (2, 3)
    assert args.forecast is False
    assert args.bf16 and args.use_ema and args.warmup == "8,256,256"


def test_serve_preset_overlay_hardening():
    """The overlay honours argparse prefix abbreviations as explicit flags,
    lets --no- boolean forms beat a preset that enables them, and validates
    preset values through the action's type/choices like CLI tokens."""
    import argparse

    from tmdiff_tpu.serve.__main__ import apply_serve_defaults

    def mkparser():
        p = argparse.ArgumentParser()
        p.add_argument("--sampler", default="dpm++",
                       choices=["dpm++", "ddim", "dpm++_cfg"])
        p.add_argument("--steps", type=int, default=None)
        p.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                       default=False)
        p.add_argument("--use-ema", action=argparse.BooleanOptionalAction,
                       default=False)
        return p

    opt = {"serve": {"sampler": "ddim", "steps": 1, "bf16": True,
                     "use_ema": True}}

    # --step abbreviates --steps: must count as explicit, not be overwritten
    p = mkparser()
    argv = ["--step", "20"]
    args = p.parse_args(argv)
    apply_serve_defaults(args, opt, p, argv)
    assert args.steps == 20 and args.sampler == "ddim"

    # --no-bf16 turns a preset-enabled boolean back off
    p = mkparser()
    argv = ["--no-bf16"]
    args = p.parse_args(argv)
    apply_serve_defaults(args, opt, p, argv)
    assert args.bf16 is False and args.use_ema is True

    # preset values are validated (type) and coerced like CLI tokens
    p = mkparser()
    args = p.parse_args([])
    apply_serve_defaults(args, {"serve": {"steps": "20"}}, p, [])
    assert args.steps == 20 and isinstance(args.steps, int)
    p = mkparser()
    args = p.parse_args([])
    with pytest.raises(SystemExit):
        apply_serve_defaults(args, {"serve": {"steps": "twenty"}}, p, [])
    # ...and against choices
    p = mkparser()
    args = p.parse_args([])
    with pytest.raises(SystemExit):
        apply_serve_defaults(args, {"serve": {"sampler": "dimm"}}, p, [])
    # a bool where a float/int is expected is rejected, not silently kept
    p = mkparser()
    args = p.parse_args([])
    with pytest.raises(SystemExit):
        apply_serve_defaults(args, {"serve": {"steps": True}}, p, [])


def test_build_sampler_kw_refresh_mask():
    """--refresh-mask parses a 0/1 (or comma'd) string into the tuple the
    engine forwards; malformed masks, length/leading-1 violations, the
    forecast conflict, and caching knobs on non-caching samplers all error
    at startup — before any model/checkpoint load."""
    import argparse

    from tmdiff_tpu.serve.__main__ import build_sampler_kw

    p = argparse.ArgumentParser()

    def ns(**over):
        base = dict(sampler="ddim_cached", steps=4, refresh_every=4,
                    cache_level=3, forecast=False, refresh_mask=None)
        base.update(over)
        return argparse.Namespace(**base)

    kw = build_sampler_kw(ns(refresh_mask="1001"), p, [])
    assert kw["refresh_mask"] == (True, False, False, True)
    # a deployment serves ONE schedule -> it is baked into the program
    assert kw["refresh_mask_static"] is True
    # comma-separated form from schedule_search JSON output
    kw = build_sampler_kw(ns(refresh_mask="1,0,0,1"), p, [])
    assert kw["refresh_mask"] == (True, False, False, True)
    # no mask -> plain uniform knobs, no refresh_mask key
    kw = build_sampler_kw(ns(), p, [])
    assert "refresh_mask" not in kw and kw["refresh_every"] == 4

    for bad in ("10x1", "", "10"):  # junk chars / empty / wrong length
        with pytest.raises(SystemExit):
            build_sampler_kw(ns(refresh_mask=bad), p, [])
    with pytest.raises(SystemExit):  # leading 0
        build_sampler_kw(ns(refresh_mask="0110"), p, [])
    with pytest.raises(SystemExit):  # forecast conflict
        build_sampler_kw(ns(refresh_mask="1001", forecast=True), p, [])
    with pytest.raises(SystemExit):  # caching knob on a non-caching sampler
        build_sampler_kw(ns(sampler="dpm++"), p, ["--refresh-mask=1001"])
    # non-caching sampler without caching flags is fine
    assert build_sampler_kw(ns(sampler="dpm++"), p, []) is None


def test_engine_serves_searched_refresh_mask(sharp):
    """An engine deployed with a searched refresh schedule (sampler_kw
    refresh_mask) matches the direct Pansharpener call with the same mask."""
    from tmdiff_tpu.serve import InferenceEngine

    kw = {"cache_level": 3, "refresh_mask": (True, False, False, True),
          "refresh_mask_static": True}  # the deployed (specialized) path
    engine = InferenceEngine(sharp, method="ddim_cached", steps=4,
                             max_batch=1, max_delay_ms=50.0, sampler_kw=kw)
    try:
        pan, ms = _image(0)
        out = engine.submit(pan, ms, "QB").result(timeout=120)
        direct = sharp.sample(
            {"PAN": pan[None], "MS": ms[None]}, sensor="QB",
            method="ddim_cached", steps=4, seed=0, **kw)
        np.testing.assert_allclose(out, direct[0], atol=1e-6)
    finally:
        engine.shutdown()
