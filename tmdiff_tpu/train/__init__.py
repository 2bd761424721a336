from tmdiff_tpu.train.trainer import TrainState, Trainer  # noqa: F401
