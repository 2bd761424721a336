"""Minimal client for the serving endpoint (`python -m tmdiff_tpu.serve`).

Round-trips one PAN+MS pair as compressed npz over HTTP and saves the
sharpened result. Works against any host running the server; see
tests/test_serve.py for an in-process end-to-end version.

Usage:
  python examples/serve_client.py --url http://HOST:8000 \
      --h5 test_wv3_data_RR.h5 --index 0 --sensor WV3 --out sr.npz
"""
from __future__ import annotations

import argparse
import io
import json
import urllib.request

import numpy as np


def pansharpen(url: str, pan: np.ndarray, ms: np.ndarray,
               sensor: str = "QB", guidance: float = None,
               timeout: float = 600.0) -> np.ndarray:
    """POST one image; returns the (bands, H, W) sharpened image in [0,1].
    `guidance` (dpm++_cfg servers only) sets the per-request CFG scale —
    mixed scales co-batch server-side."""
    buf = io.BytesIO()
    fields = dict(pan=np.asarray(pan, np.float32),
                  ms=np.asarray(ms, np.float32), sensor=sensor)
    if guidance is not None:
        fields["guidance"] = np.float32(guidance)
    np.savez_compressed(buf, **fields)
    req = urllib.request.Request(
        f"{url.rstrip('/')}/v1/pansharpen", data=buf.getvalue(),
        method="POST", headers={"Content-Type": "application/octet-stream"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return np.load(io.BytesIO(r.read()))["sr"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://127.0.0.1:8000")
    p.add_argument("--h5", required=True, help="PanCollection file (needs lms+pan)")
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--sensor", default="QB")
    p.add_argument("--guidance", type=float, default=None,
                   help="per-request CFG scale (dpm++_cfg servers)")
    p.add_argument("--out", default="sr.npz")
    args = p.parse_args()

    from tmdiff_tpu.data import PanDataset

    ds = PanDataset(args.h5)
    batch = ds.batch(np.array([args.index]))
    sr = pansharpen(args.url, batch["PAN"][0], batch["MS"][0], args.sensor,
                    guidance=args.guidance)
    np.savez_compressed(args.out, sr=sr)
    with urllib.request.urlopen(f"{args.url.rstrip('/')}/v1/stats") as r:
        print("server stats:", json.load(r))
    print(f"wrote {args.out}: shape {sr.shape}, range "
          f"[{sr.min():.3f}, {sr.max():.3f}]")


if __name__ == "__main__":
    main()
