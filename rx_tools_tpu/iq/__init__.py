from rx_tools_tpu.iq import formats, sources  # noqa: F401
