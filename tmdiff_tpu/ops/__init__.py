from tmdiff_tpu.ops import wavelet  # noqa: F401
