from tmdiff_tpu.models.wavbest import WavBEST  # noqa: F401
