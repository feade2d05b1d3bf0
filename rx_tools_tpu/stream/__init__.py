from rx_tools_tpu.stream.pipeline import StreamRunner, RunnerStats
from rx_tools_tpu.stream.chunked import ChunkedFmRunner
from rx_tools_tpu.stream.scan import scan_fm_blocks, stack_blocks
from rx_tools_tpu.stream.checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "StreamRunner", "RunnerStats", "ChunkedFmRunner",
    "scan_fm_blocks", "stack_blocks",
    "save_checkpoint", "load_checkpoint",
]
