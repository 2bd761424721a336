"""Serve a trained checkpoint:

  python -m tmdiff_tpu.serve -c config.json --ckpt <orbax dir | I*_gen.pth> \
      [--port 8000] [--sampler dpm++] [--steps 30] [--max-batch 8] \
      [--warmup 8,256,256]

Builds the model from the config (`model.unet.channel_multiplier`,
`model.beta_schedule.val`), loads weights (orbax native or reference torch
`.pth` via the importer), precompiles the serving programs, then blocks.
"""
from __future__ import annotations

import argparse
import os

# The deployed default CFG scale. tools/cfg_finetune_eval.py validates this
# exact value against the measured usable-guidance set — read it from here
# so the eval can never drift from what the server actually deploys.
SERVE_GUIDANCE_DEFAULT = 3.0


def apply_serve_defaults(args, opt, parser, argv) -> None:
    """Overlay the config's "serve" block onto argparse defaults: a preset
    (e.g. config/presets/serve_lowlatency.json) IS the deployment recipe —
    sampler/steps/bf16/warmup ride the config, while any flag the operator
    passes explicitly on the command line still wins (detected by option
    string in argv, so even an explicit flag set to its default sticks).
    Preset values go through the same type/choices validation CLI tokens get."""
    given = {a.split("=", 1)[0] for a in (argv or []) if a.startswith("-")}
    explicit = set()
    for action in parser._actions:
        # argparse accepts unambiguous prefixes of long options
        # (--step parses as --steps), so match by prefix, not equality
        if any(g == s or (g.startswith("--") and len(g) > 2
                          and s.startswith(g))
               for s in action.option_strings for g in given):
            explicit.add(action.dest)
    by_dest = {a.dest: a for a in parser._actions}
    for key, val in (opt.get("serve") or {}).items():
        dest = str(key).replace("-", "_")
        if not hasattr(args, dest):
            continue
        if dest in explicit:
            continue
        action = by_dest.get(dest)
        if action is not None and action.type is not None and val is not None:
            if isinstance(val, bool):
                parser.error(f"config serve.{key}: expected "
                             f"{getattr(action.type, '__name__', action.type)},"
                             f" got a bool")
            try:
                val = action.type(val)
            except (TypeError, ValueError) as e:
                parser.error(f"config serve.{key}: {e}")
        if (action is not None and action.choices is not None
                and val not in action.choices):
            parser.error(f"config serve.{key}: invalid choice {val!r} "
                         f"(choose from {list(action.choices)})")
        setattr(args, dest, val)


def build_sampler_kw(args, parser, argv):
    """Method-specific sampler knobs → the engine's `sampler_kw` dict.

    ddim_cached takes refresh_every / cache_level / forecast, plus an
    optional --refresh-mask 0/1 string (a searched schedule from
    tools/schedule_search.py). A deployment serves ONE schedule, so the
    mask is baked into the compiled program (refresh_mask_static=True:
    runs of full/reuse scans, no per-step branch — the traced-mask search
    program pays a measured ~15% dispatch tax, BASELINE.md "Searched
    refresh schedules"). Any caching knob on a non-caching sampler is an
    error, not a silent no-op — same contract as per-request guidance on
    non-CFG engines."""
    if args.sampler == "ddim_cached":
        kw = {"refresh_every": args.refresh_every,
              "cache_level": args.cache_level,
              "forecast": args.forecast}
        if args.refresh_mask is not None:
            digits = args.refresh_mask.replace(",", "")
            if not digits or set(digits) - {"0", "1"}:
                parser.error(f"--refresh-mask must be a 0/1 string, got "
                             f"{args.refresh_mask!r}")
            mask = tuple(c == "1" for c in digits)
            n_steps = args.steps or 20
            if len(mask) != n_steps or not mask[0]:
                parser.error(
                    f"--refresh-mask needs length {n_steps} (= steps) with "
                    f"a leading 1, got {len(mask)} chars")
            if args.forecast:
                parser.error("--refresh-mask and --forecast are mutually "
                             "exclusive")
            kw["refresh_mask"] = mask
            kw["refresh_mask_static"] = True
        return kw
    if any(a.startswith(("--refresh-every", "--cache-level", "--forecast",
                         "--no-forecast", "--refresh-mask"))
           for a in (argv or [])):
        parser.error(
            f"--refresh-every/--cache-level/--forecast/--refresh-mask "
            f"only apply to --sampler ddim_cached (got {args.sampler!r})")
    return None


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--sampler", default="dpm++",
                   choices=["dpm++", "dpm++_noise", "ancestral", "regression",
                            "ddim", "ddim_cached", "dpm++_cfg"])
    p.add_argument("--steps", type=int, default=None,
                   help="sampler step count (e.g. a distilled few-NFE ddim "
                        "deployment: --sampler ddim --steps 1)")
    p.add_argument("--refresh-every", type=int, default=4,
                   help="ddim_cached only: refresh the deep trunk every r-th "
                        "NFE (must divide --steps)")
    p.add_argument("--cache-level", type=int, default=2,
                   help="ddim_cached only: trunk depth to cache (1-3; see "
                        "BASELINE.md 'Cross-step block caching')")
    p.add_argument("--forecast", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="ddim_cached only: linearly extrapolate the cached "
                        "trunk instead of reusing it stale")
    p.add_argument("--refresh-mask", default=None,
                   help="ddim_cached only: explicit per-step refresh "
                        "schedule as a 0/1 string of length --steps (first "
                        "char must be 1), e.g. a searched schedule from "
                        "tools/schedule_search.py; overrides --refresh-every")
    p.add_argument("--guidance", type=float, default=SERVE_GUIDANCE_DEFAULT,
                   help="default CFG scale for --sampler dpm++_cfg; requests "
                        "may override per-call via the 'guidance' field")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-delay-ms", type=float, default=15.0)
    p.add_argument("--max-queue", type=int, default=64,
                   help="pending-request bound; excess requests get 503")
    p.add_argument("--use-ema", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="serve EMA weights instead of online weights "
                        "(--no-use-ema overrides a preset that enables it)")
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="run the denoiser in bfloat16 (+~27%% throughput on "
                        "v5e, BASELINE.md sampling study); --no-bf16 "
                        "overrides a preset that enables it")
    p.add_argument("--warmup", default=None,
                   help="bands,H,W to precompile before binding the port")
    p.add_argument("--mesh-space", type=int, default=1,
                   help="shard image height over this many devices; the rest "
                        "go to the 'data' axis (default: all devices on data)")
    args = p.parse_args(argv)
    import sys as _sys

    _argv = argv if argv is not None else _sys.argv[1:]

    import numpy as np

    from tmdiff_tpu.config import parse_config
    from tmdiff_tpu.diffusion.schedules import NoiseSchedule
    from tmdiff_tpu.models import WavBEST
    from tmdiff_tpu.pipeline import Pansharpener
    from tmdiff_tpu.serve import InferenceEngine, make_server
    from tmdiff_tpu.train import checkpoint as ckpt_lib
    from tmdiff_tpu.train.trainer import Trainer

    import jax.numpy as jnp

    opt = parse_config(args.config, phase="val")
    apply_serve_defaults(args, opt, p, _argv)
    # validate the sampler recipe BEFORE the expensive model/checkpoint load
    sampler_kw = build_sampler_kw(args, p, _argv)
    sched_opt = opt["model"]["beta_schedule"]["val"]
    channels = tuple(opt["model"]["unet"]["channel_multiplier"] or (32, 64, 128, 256))
    model = WavBEST(channels=channels,
                    dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    trainer = Trainer(
        model=model,
        schedule=NoiseSchedule.create(sched_opt["schedule"], sched_opt["n_timestep"]),
        lr=1e-4,
    )
    # a minimal batch just to shape the state template for restore
    bands = int(opt.get("serve_bands") or 8)
    tmpl = {
        "PAN": np.zeros((1, 1, 64, 64), np.float32),
        "MS": np.zeros((1, bands, 64, 64), np.float32),
        "Res": np.zeros((1, bands, 64, 64), np.float32),
    }
    import jax

    mesh = None
    if jax.device_count() > 1:
        from tmdiff_tpu.parallel import make_mesh

        mesh = make_mesh(space=args.mesh_space)
        print(f"serving over SPMD mesh {dict(mesh.shape)}", flush=True)
    sharp = Pansharpener(
        model, params=None,
        schedule_name=sched_opt["schedule"], n_timestep=sched_opt["n_timestep"],
        mesh=mesh,
    )
    state = trainer.init_state(tmpl, np.asarray(sharp.prompt_embedding("QB")))
    if args.ckpt.endswith(".pth") or os.path.exists(args.ckpt + "_gen.pth"):
        path = args.ckpt if args.ckpt.endswith(".pth") else args.ckpt + "_gen.pth"
        state = ckpt_lib.import_reference_checkpoint(path, state)
    else:
        state = ckpt_lib.restore_checkpoint(args.ckpt, state)
    sharp.params = state.ema_params if args.use_ema else state.params

    engine = InferenceEngine(
        sharp, method=args.sampler, steps=args.steps, guidance=args.guidance,
        max_batch=args.max_batch, max_delay_ms=args.max_delay_ms,
        max_queue=args.max_queue, sampler_kw=sampler_kw,
    )
    if args.warmup:
        shape = tuple(int(x) for x in args.warmup.split(","))
        print(f"warming up {shape} x buckets {engine.buckets} ...", flush=True)
        engine.warmup([shape])
    server = make_server(engine, args.host, args.port)
    print(f"serving on {args.host}:{args.port} "
          f"(sampler={args.sampler}, max_batch={args.max_batch})", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
