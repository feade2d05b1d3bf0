"""Chunked streaming: amortize dispatch/transfer round trips over K blocks.

Per-block host<->device round trips dominate wall time when the device is
remote or the chain is cheap (the measured per-RPC latency over a tunneled
TPU is orders of magnitude above the ~0.25 ms compute per block).  The
chunked runner reads ``chunk`` blocks from the source, runs them in ONE
``lax.scan`` dispatch (``stream.scan``), and drains audio + valid counts +
levels in ONE ``device_get`` — so overheads amortize 1/chunk while squelch
and level-metering still observe every block (levels come back per block).

Latency cost: ``chunk`` blocks of buffering (e.g. 8 x ~6 ms = ~48 ms for
the wbfm chain) — the knob to turn for live piping vs offline throughput.
The reference's analogous knob is ``lcm_post``-scaled buffer length
(``rtl_fm.c:1387``).
"""

from __future__ import annotations

import sys
import time
from typing import Callable

import jax
import numpy as np

from rx_tools_tpu.iq.sources import Source
from rx_tools_tpu.models import fmchain
from rx_tools_tpu.stream.pipeline import RunnerStats
from rx_tools_tpu.stream.scan import scan_fm_blocks

# RX_ENGINE=flat routes eligible chunks through the scan-free flat engine
# (models/fmchunk.py) — measurably faster than the per-block engine on
# TPU (bench.py reports both; round-4 official: flat 9.5 G vs scan
# 5.8 G).  Opt-in: the engines agree to ~1e-4 but not bit-for-bit, so
# the default CLI output class stays the per-block one (read once at
# import — trace-time env reads bake into jit caches).
_FLAT_ENGINE = __import__("os").environ.get("RX_ENGINE", "") == "flat"


class ChunkedFmRunner:
    """Drive the FM chain over a source in chunks of ``chunk`` blocks."""

    def __init__(self, cfg: fmchain.FmConfig, source: Source,
                 sink: Callable[[np.ndarray, float], None],
                 chunk: int = 8, block_size: int | None = None,
                 on_squelch: Callable[[], bool] | None = None,
                 exit_on_squelch: bool = False,
                 checkpoint_path: str | None = None,
                 checkpoint_every: int = 0):
        self.cfg = cfg
        self.source = source
        self.sink = sink
        self.chunk = int(chunk)
        self.block_size = int(block_size or fmchain.block_samples(cfg))
        self.on_squelch = on_squelch
        self.exit_on_squelch = exit_on_squelch
        self.squelch_level = float(cfg.squelch_level)
        self.conseq_squelch = cfg.conseq_squelch
        self._hits = cfg.conseq_squelch + 1   # start muted (rtl_fm.c:1089-1091)
        self.state = fmchain.init_state(cfg)
        self.stats = RunnerStats()
        self._stop = False
        # periodic state snapshots (SURVEY.md §5 checkpoint/resume): every
        # `checkpoint_every` blocks (0 = every drained chunk) save the carried
        # pytree + counters needed to continue bit-identically
        self.checkpoint_path = checkpoint_path
        self.checkpoint_every = int(checkpoint_every)
        self._last_ckpt_blocks = 0
        # flat engine: one parallel program per chunk (no per-block
        # squelch gating, so only squelch-off configs; -L level prints
        # then tick once per chunk instead of once per block)
        from rx_tools_tpu.models import fmchunk
        self._flat = (_FLAT_ENGINE and fmchunk.supports(cfg)
                      and cfg.squelch_level == 0)

    def stop(self) -> None:
        self._stop = True

    def restore(self, path: str) -> dict:
        """Load a checkpoint written by a previous run.

        Restores the carried DSP state and the squelch counter; returns the
        meta dict so the caller can reposition the source
        (``meta["samples_in"]`` complex samples consumed) and the output
        (``meta["samples_out"]`` int16 samples emitted).
        """
        from rx_tools_tpu.stream.checkpoint import load_checkpoint
        state, meta = load_checkpoint(path, self.state)
        self.state = state
        self._hits = int(meta.get("hits", self._hits))
        self._last_ckpt_blocks = 0
        # counters continue cumulatively so a later checkpoint (or a second
        # resume) stays coherent with the overall stream position
        self.stats.blocks = int(meta.get("blocks", 0))
        self.stats.samples_in = int(meta.get("samples_in", 0))
        self.stats.samples_out = int(meta.get("samples_out", 0))
        return meta

    def _maybe_checkpoint(self, state, blocks: int, samples_in: int) -> None:
        """Called after a drain: `state` is the carried state at the point
        where exactly `samples_in` source samples were consumed and
        `self.stats.samples_out` audio samples were emitted — the coherent
        triple a resume needs."""
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

    def warmup(self) -> None:
        """Compile the chain and exercise one D2H round trip.

        On a tunneled/remote device the first device->host transfer pays a
        large one-time path-setup cost (measured ~50 s over the axon relay);
        doing it at startup keeps the steady-state stream glitch-free.
        """
        blocks = np.zeros((self.chunk, 2 * self.block_size), np.int16)
        if self._flat:
            from rx_tools_tpu.models import fmchunk
            st, audio, n_valid, levels = fmchunk.fm_chunk_step(
                self.cfg, self.state, blocks)
            jax.device_get((audio[:1], n_valid, levels))
            return
        st, audio, n_valid, levels = scan_fm_blocks(self.cfg, self.state, blocks)
        jax.device_get((audio[0, :1], n_valid, levels))

    def run(self, max_blocks: int | None = None) -> RunnerStats:
        if self._flat:
            return self._run_flat(max_blocks)
        t0 = time.perf_counter()
        pending = None          # ((audio, n_valid, levels), ckpt snapshot)
        while not self._stop:
            blocks, n_read = self._read_chunk(max_blocks)
            if blocks is None:
                break
            self.state, audio, n_valid, levels = scan_fm_blocks(
                self.cfg, self.state, blocks)
            self.stats.blocks += blocks.shape[0]
            self.stats.samples_in += n_read
            snap = (self.state, self.stats.blocks, self.stats.samples_in)
            if pending is not None:
                self._drain(*pending[0])
                self._maybe_checkpoint(*pending[1])
            pending = ((audio, n_valid, levels), snap)
            if max_blocks is not None and self.stats.blocks >= max_blocks:
                break
        if pending is not None:
            self._drain(*pending[0])
            self._maybe_checkpoint(*pending[1])
        self.stats.wall_s = time.perf_counter() - t0
        return self.stats

    def _run_flat(self, max_blocks: int | None = None) -> RunnerStats:
        """RX_ENGINE=flat: whole-chunk parallel programs.  Full chunks go
        through ``fm_chunk_step`` (flat audio + per-chunk emit); partial
        tail chunks fall back to the per-block engine — the carried state
        pytree is engine-interoperable (golden-tested identical)."""
        from rx_tools_tpu.models import fmchunk
        t0 = time.perf_counter()
        pending = None
        while not self._stop:
            blocks, n_read = self._read_chunk(max_blocks)
            if blocks is None:
                break
            flat = blocks.shape[0] == self.chunk
            if flat:
                self.state, audio, n_valid, levels = fmchunk.fm_chunk_step(
                    self.cfg, self.state, blocks)
            else:
                self.state, audio, n_valid, levels = scan_fm_blocks(
                    self.cfg, self.state, blocks)
            self.stats.blocks += blocks.shape[0]
            self.stats.samples_in += n_read
            snap = (self.state, self.stats.blocks, self.stats.samples_in)
            if pending is not None:
                self._drain_any(*pending[0])
                self._maybe_checkpoint(*pending[1])
            pending = ((flat, audio, n_valid, levels), snap)
            if max_blocks is not None and self.stats.blocks >= max_blocks:
                break
        if pending is not None:
            self._drain_any(*pending[0])
            self._maybe_checkpoint(*pending[1])
        self.stats.wall_s = time.perf_counter() - t0
        return self.stats

    def _drain_any(self, flat, audio, n_valid, levels):
        if not flat:
            self._drain(audio, n_valid, levels)
            return
        audio, n_valid, levels = jax.device_get((audio, n_valid, levels))
        a = audio[: int(n_valid)]
        self.stats.samples_out += a.shape[0]
        self.sink(a, float(levels[-1]))

    # ------------------------------------------------------------------
    def _read_chunk(self, max_blocks):
        want = self.chunk
        if max_blocks is not None:
            want = min(want, max_blocks - self.stats.blocks)
        if want <= 0:
            return None, 0
        out = np.zeros((want, 2 * self.block_size), np.int16)
        total = 0
        k = 0
        while k < want:
            n, buf = self.source.read_stream(self.block_size)
            if n < 0:
                sys.stderr.write("O")
                sys.stderr.flush()
                self.stats.overflows += 1
                continue
            if n == 0:
                break
            if n < self.block_size:
                # partial tail read (EOF): drop it rather than zero-pad —
                # padding would demodulate the pad into garbage audio
                # (< one block of signal lost, and only at end-of-file)
                break
            out[k, : 2 * n] = buf[: 2 * n]
            total += n
            k += 1
        if k == 0:
            return None, 0
        return out[:k], total

    def _drain(self, audio, n_valid, levels):
        audio, n_valid, levels = jax.device_get((audio, n_valid, levels))
        for i in range(audio.shape[0]):
            a = audio[i, : int(n_valid[i])]
            lvl = float(levels[i])
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
                    if self.cfg.squelch_zero:
                        # -E zero: emit the (already zeroed) audio instead of
                        # hopping/skipping (rtl_fm.c:929-937)
                        self.stats.samples_out += a.shape[0]
                        self.sink(a, lvl)
                        continue
                    if self.on_squelch is not None:
                        # scanning: hop and skip output; hits stay high so
                        # the next quiet block hops again (rtl_fm.c:928-932;
                        # the controller never resets demod squelch_hits)
                        if self.on_squelch():
                            self.stats.squelch_hops += 1
                        # blocks after the retune point are stale: drop the
                        # rest of the chunk (the BUFFER_DUMP-mute analog)
                        return
                    # single freq, no -E zero: skip output while squelched
                    # (the reference signals a no-op hop and skips,
                    # rtl_fm.c:929-933)
                    continue
            self.stats.samples_out += a.shape[0]
            self.sink(a, lvl)
