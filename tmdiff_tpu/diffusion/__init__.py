from tmdiff_tpu.diffusion import schedules  # noqa: F401
