"""The spectral "model": rx_power's per-hop FFT integration as jitted steps.

The reference's ``scanner`` (``src/rtl_power.c:670-772``) serially walks the
hop table, and within each hop serially walks FFT segments.  TPU re-design
(SURVEY.md §2.6):

- within a hop, all segments batch into one ``(n_segments, bin_len)`` FFT
  (:func:`power_hop_step`);
- across hops, :func:`sweep_step` vmaps the hop step over a stacked
  ``(H, ...)`` axis — the axis the parallel layer shards over devices.

Accumulators are float32 in reference units (see ops.spectrum); the CSV layer
applies csv_dbm's quirks at output time.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rx_tools_tpu import ops
from rx_tools_tpu.ops import spectrum as sp


@dataclass(frozen=True)
class PowerConfig:
    bin_e: int                    # log2 bins (0 => total-power path)
    downsample: int = 1
    downsample_passes: int = 0    # -F path (recursive fifth-order)
    boxcar: bool = True
    comp_fir_size: int = 0
    window: str = "rectangle"
    peak_hold: bool = False
    buf_len: int = 16384          # interleaved elements per hop read

    @property
    def bin_len(self) -> int:
        return 1 << self.bin_e


class SweepAccum(NamedTuple):
    avg: jnp.ndarray              # (H, bin_len) power accumulators
    samples: jnp.ndarray          # (H,) int32


def new_sweep_accum(n_hops: int, cfg: PowerConfig) -> SweepAccum:
    return SweepAccum(jnp.zeros((n_hops, cfg.bin_len), jnp.float32),
                      jnp.zeros((n_hops,), jnp.int32))


def _decimate(cfg: PowerConfig, x):
    """Hop-local decimation (rtl_power.c:721-743) in float."""
    if cfg.boxcar and cfg.downsample > 1:
        n = x.shape[0] // cfg.downsample
        x = x[: n * cfg.downsample].reshape(n, cfg.downsample, 2).sum(axis=1)
    elif cfg.downsample_passes:
        # reference variant is stateless per block ("ease in",
        # rtl_power.c:594-597); zero-history start differs only in the first
        # 5 samples per pass — SNR-equivalent.
        hist = ops.FifthOrderState.init(cfg.downsample_passes)
        _, x = ops.fifth_order_cascade(hist, x, cfg.downsample_passes)
        if cfg.comp_fir_size == 9:
            _, x = ops.droop_fir(ops.DroopState.init(), x,
                                 cfg.downsample_passes)
    return x


def _hop_body(cfg: PowerConfig, win, avg, samples, block):
    x = block.astype(jnp.float32).reshape(-1, 2) * jnp.float32(1.0 / 256.0)
    x = _decimate(cfg, x)
    if cfg.bin_e == 0:
        p = sp.total_power(x)
        if cfg.peak_hold:
            avg = jnp.maximum(avg, p[None])
        else:
            avg = avg + p[None]
        return avg, samples + 1
    x = sp.remove_dc(x)
    segs = x.shape[0] // cfg.bin_len
    x = x[: segs * cfg.bin_len].reshape(segs, cfg.bin_len, 2)
    return sp.segmented_power_spectrum(x, win, avg, samples, cfg.downsample,
                                       cfg.peak_hold)


@partial(jax.jit, static_argnums=0)
def power_hop_step(cfg: PowerConfig, avg, samples, block):
    """One hop, one read: ``block`` (buf_len,) int16 -> updated (avg, samples).

    Input is raw CS16 in the ±32767 range; scaled to the ±128 8-bit contract
    (see ops.spectrum docstring) before windowing.
    """
    win = jnp.asarray(ops.window(cfg.window, max(cfg.bin_len, 1)))
    return _hop_body(cfg, win, avg, samples, block)


@partial(jax.jit, static_argnums=0)
def sweep_step(cfg: PowerConfig, acc: SweepAccum, blocks) -> SweepAccum:
    """All hops at once: ``blocks`` (H, buf_len) int16.

    The reference's serial hop loop becomes a batched (and shardable) axis.
    """
    win = jnp.asarray(ops.window(cfg.window, max(cfg.bin_len, 1)))
    avg, samples = jax.vmap(lambda a, s, b: _hop_body(cfg, win, a, s, b))(
        acc.avg, acc.samples, blocks)
    return SweepAccum(avg, samples)


def int_sweep_powers(cfg: PowerConfig, blocks):
    """``--int-fft`` batched hop processing: ``blocks`` (H, buf_len) int16
    -> per-segment powers (H, segs, bin_len) int32, every stage bit-exact
    to the C scanner (ops/intfft.py; rtl_power.c:714-770).  The caller
    accumulates into int64 host-side (exact; see intfft docstring).

    Only the boxcar decimation path is supported (the reference's default;
    ``-F 9`` keeps the float plane)."""
    from functools import partial as _partial
    from rx_tools_tpu.ops import intfft
    if not cfg.boxcar and cfg.downsample_passes:
        raise ValueError("--int-fft supports the boxcar decimation path "
                         "only (drop -F)")
    if cfg.downsample > 1 and cfg.buf_len % (2 * cfg.downsample):
        raise ValueError("--int-fft: buf_len not divisible by 2*downsample "
                         "(partial-group boxcar tail unsupported)")
    eff = cfg.buf_len // cfg.downsample
    if eff * 32768 >= 2**31:
        raise ValueError("--int-fft: hop too long for exact int32 sums")
    win = np.asarray(ops.window_coefs_int(cfg.window, cfg.bin_len), np.int32)
    fn = _partial(intfft.int_hop_segments, bin_e=cfg.bin_e,
                  ds=cfg.downsample)
    return jax.vmap(fn, in_axes=(0, None))(blocks, jnp.asarray(win))


def csv_row_values(avg: np.ndarray, samples: int, cfg: PowerConfig,
                   freq: float, rate: float, crop: float):
    """Apply csv_dbm's output math (rtl_power.c:774-817) to one hop's
    accumulator.  Returns (freq_low, freq_high, hz_step, samples, dbm list)
    including the trailing duplicate-bin quirk."""
    ln = cfg.bin_len
    a = np.asarray(avg, dtype=np.float64).copy()
    ds = cfg.downsample
    if cfg.bin_e > 0:
        a[0] = a[1]
        a = np.concatenate([a[ln // 2:], a[: ln // 2]])
    bin_count = int(ln * (1.0 - crop))
    bw2 = int((rate * bin_count) / (ln * 2 * ds))
    hz_step = rate / float(ln * ds)
    i1 = int(ln * crop * 0.5)
    i2 = (ln - 1) - int(ln * crop * 0.5)
    with np.errstate(divide="ignore"):
        dbms = list(10.0 * np.log10(a[i1: i2 + 1] / rate / max(samples, 1)))
        tail = a[i2] / (rate * max(samples, 1))
        if cfg.bin_e == 0:
            tail = a[0] / (rate * max(samples, 1))
        dbms.append(float(10.0 * np.log10(tail)) if tail > 0 else float("-inf"))
    return int(freq) - bw2, int(freq) + bw2, hz_step, samples, dbms
