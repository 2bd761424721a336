"""r4-final refresh of the remaining README scoreboard rows the deep-band
C64 native auto-rule should move (the 20-step sampler was refreshed
separately — benchmarks/sampling.py, 1.64 img/s): the reference-default
30-step singlestep order-3 sampler, the big [64,128,256,512] config
forward, and the fused train step. Reuses r3_refresh's harnesses verbatim
so numbers are directly comparable to the r3 rows.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from r3_refresh import P, fwd_bench, sampling_bench
from tpu_suite import bench_train_step

if __name__ == "__main__":
    P(f"r4_refresh start {time.strftime('%F %T')} devices={jax.devices()}")
    sampling_bench("dpm++ 30-step singlestep o3 +denoise_to_zero b4 256p (r4)",
                   30, 3, "singlestep", True, batch=4)
    fwd_bench("fwd big[64,128,256,512] 8b 256p b4 (r4)",
              (64, 128, 256, 512), 8, 256, 4)
    bench_train_step()
    P("r4_refresh done")
