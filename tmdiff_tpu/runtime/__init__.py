from tmdiff_tpu.runtime.native import (  # noqa: F401
    counts_to_float,
    gather_residual,
    gather_scale,
    get_lib,
)
from tmdiff_tpu.runtime.prefetch import Prefetcher  # noqa: F401
