from tmdiff_tpu.data.h5 import LazyPanDataset, PanDataset, load_pancollection  # noqa: F401
from tmdiff_tpu.data.pipeline import BatchIterator, SensorMixer  # noqa: F401
