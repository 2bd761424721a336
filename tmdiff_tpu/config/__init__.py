from tmdiff_tpu.config.config import NoneDict, dict2str, parse_config  # noqa: F401
