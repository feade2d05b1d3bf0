"""The block-streaming runtime: source -> device -> sink.

The reference's concurrency layer is a 4-pthread pipeline with
rwlock-protected single-buffer handoffs (``src/rtl_fm.c:866-958,1468-1472``)
where a slow demod thread silently loses data (SURVEY.md §3.1 "backpressure
caveat").  The TPU-native redesign keeps the *shape* — capture, compute and
output overlap in time — but gets the overlap from JAX's async dispatch
instead of threads:

- the host loop reads block ``k+1`` from the source and enqueues its
  ``device_put`` while the device still computes block ``k`` (dispatch
  returns immediately; arrays are futures);
- the sink drains block ``k-1``'s result, so host I/O for one block hides
  under device compute of the next;
- hand-off loss is impossible by construction: blocks are values, not a
  shared buffer.

Failure semantics mirror the reference: a source overflow (negative count,
``ERR_OVERFLOW``) prints ``"O"`` to stderr and continues
(``src/rtl_sdr.c:333-337``); EOF (count 0) ends the run; squelch-triggered
frequency hopping is a host-side control decision between blocks
(``rtl_fm.c:928-932`` kept out of the graph per SURVEY.md §7).
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass
from typing import Callable

import jax
import numpy as np

from rx_tools_tpu.iq.sources import Source
from rx_tools_tpu.utils.logging import log


@dataclass
class RunnerStats:
    blocks: int = 0
    samples_in: int = 0
    samples_out: int = 0
    overflows: int = 0
    squelch_hops: int = 0
    wall_s: float = 0.0

    def realtime_multiple(self, rate: float) -> float:
        if self.wall_s <= 0:
            return float("inf")
        return (self.samples_in / rate) / self.wall_s


class StreamRunner:
    """Drive a jitted ``(state, block) -> (state, out, n_valid, level)`` step
    over a block source.

    Parameters
    ----------
    step:        the compiled chain step (config already bound).
    state:       initial carried-state pytree.
    source:      block source; ``read_stream(n)`` -> (count, int16 buf).
    block_size:  complex samples per block.
    sink:        called with (np.ndarray out_block, level) per block on the
                 host; receives only the valid prefix.
    on_squelch:  optional hook called when ``conseq_squelch`` consecutive
                 squelched blocks accumulate (the scanning/hop control path,
                 rtl_fm.c:928-932); return True to retune (resets counter).
    """

    def __init__(self, step: Callable, state, source: Source, block_size: int,
                 sink: Callable[[np.ndarray, float], None],
                 on_squelch: Callable[[], bool] | None = None,
                 conseq_squelch: int = 10,
                 exit_on_squelch: bool = False,
                 squelch_zero: bool = False,
                 checkpoint_path: str | None = None,
                 checkpoint_every: int = 0):
        self.step = step
        self.state = state
        self.source = source
        self.block_size = int(block_size)
        self.sink = sink
        self.on_squelch = on_squelch
        self.conseq_squelch = conseq_squelch
        self.squelch_level = 0.0       # set by the app when -l is given
        self.exit_on_squelch = exit_on_squelch   # -t negative (rtl_fm.c:925-927)
        self.squelch_zero = squelch_zero         # -E zero (rtl_fm.c:929-937)
        self._hits = conseq_squelch + 1  # start muted (rtl_fm.c:1089-1091)
        self.stats = RunnerStats()
        self._stop = False
        self.checkpoint_path = checkpoint_path
        self.checkpoint_every = int(checkpoint_every) or 1
        self._last_ckpt_blocks = 0

    def stop(self) -> None:
        """Signal-handler safe stop request (the ``do_exit`` analog)."""
        self._stop = True

    def warmup(self) -> None:
        """Compile the step and exercise one D2H round trip (the first
        transfer over a tunneled device pays a large one-time cost)."""
        buf = np.zeros(2 * self.block_size, np.int16)
        _, out, n_valid, level = self.step(self.state, buf)
        jax.device_get((out[:1], n_valid, level))

    def restore(self, path: str) -> dict:
        """Load a ChunkedFmRunner/StreamRunner checkpoint (same format)."""
        from rx_tools_tpu.stream.checkpoint import load_checkpoint
        state, meta = load_checkpoint(path, self.state)
        self.state = state
        self._hits = int(meta.get("hits", self._hits))
        self._last_ckpt_blocks = 0
        self.stats.blocks = int(meta.get("blocks", 0))
        self.stats.samples_in = int(meta.get("samples_in", 0))
        self.stats.samples_out = int(meta.get("samples_out", 0))
        return meta

    def _maybe_checkpoint(self, state, blocks: int, samples_in: int) -> None:
        if self.checkpoint_path is None:
            return
        if blocks - self._last_ckpt_blocks < self.checkpoint_every:
            return
        from rx_tools_tpu.stream.checkpoint import save_checkpoint
        save_checkpoint(self.checkpoint_path, jax.device_get(state),
                        meta={"blocks": blocks, "samples_in": samples_in,
                              "samples_out": self.stats.samples_out,
                              "hits": self._hits,
                              "block_size": self.block_size})
        self._last_ckpt_blocks = blocks

    def run(self, max_blocks: int | None = None) -> RunnerStats:
        t0 = time.perf_counter()
        pending = None          # (device result future, level future)
        n_read, buf = self._read_block()
        while not self._stop:
            if n_read < 0:
                # soft error: tolerate, mark, continue (rtl_sdr.c:333-337)
                sys.stderr.write("O")
                sys.stderr.flush()
                self.stats.overflows += 1
                n_read, buf = self._read_block()
                continue
            if n_read == 0:
                break
            # dispatch compute for this block (async; returns futures)
            self.state, out, n_valid, level = self.step(self.state, buf)
            self.stats.blocks += 1
            self.stats.samples_in += n_read
            snap = (self.state, self.stats.blocks, self.stats.samples_in)
            done = max_blocks is not None and self.stats.blocks >= max_blocks
            # while the device crunches, fetch the NEXT block from the
            # source — but only if we will process it (a prefetched block
            # must never be consumed and dropped: resume would skip signal)
            next_read = None if done else self._read_block()
            # drain the previous result (already materialised by now)
            if pending is not None:
                self._drain(*pending[0])
                self._maybe_checkpoint(*pending[1])
            pending = ((out, n_valid, level), snap)
            if done:
                break
            n_read, buf = next_read
        if pending is not None:
            self._drain(*pending[0])
            self._maybe_checkpoint(*pending[1])
        self.stats.wall_s = time.perf_counter() - t0
        return self.stats

    # ------------------------------------------------------------------
    def _read_block(self):
        n, buf = self.source.read_stream(self.block_size)
        if 0 < n < self.block_size:
            # short tail read: zero-pad to the static block shape
            pad = np.zeros(2 * self.block_size, np.int16)
            pad[: 2 * n] = buf[: 2 * n]
            buf = pad
        return n, buf

    def _drain(self, out, n_valid, level):
        # one device_get for the whole tuple: over a remote/tunneled device
        # every separate pull is a round trip (SURVEY.md §5 "host<->TPU feed")
        out_np, n_valid, lvl = jax.device_get((out, n_valid, level))
        out_np = out_np[: int(n_valid)]
        lvl = float(lvl)
        # host-side hop control (demod_thread_fn squelch logic,
        # rtl_fm.c:923-937); dispositions match ChunkedFmRunner._drain
        if self.squelch_level > 0:
            if lvl < self.squelch_level:
                self._hits += 1
            else:
                self._hits = 0
            if self._hits > self.conseq_squelch:
                if self.exit_on_squelch:
                    # -t negative: terminate_on_squelch (rtl_fm.c:925-927)
                    self.stop()
                    return
                if self.squelch_zero:
                    # -E zero: emit the (already zeroed) audio
                    self.stats.samples_out += out_np.shape[0]
                    self.sink(out_np, lvl)
                    return
                if self.on_squelch is not None:
                    # scanning: hop and skip output; hits stay high so the
                    # next quiet block hops again (rtl_fm.c:928-932)
                    if self.on_squelch():
                        self.stats.squelch_hops += 1
                    return
                return  # single freq: skip output while squelched
        self.stats.samples_out += out_np.shape[0]
        self.sink(out_np, lvl)
