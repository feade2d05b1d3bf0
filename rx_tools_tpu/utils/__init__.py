from rx_tools_tpu.utils import units, logging, wav  # noqa: F401
