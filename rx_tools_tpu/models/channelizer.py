"""Multi-channel demodulation: many stations from one wideband capture.

The reference demodulates exactly one channel per process, per dongle; its
own source notes the ambition for more ("multiple of these, eventually",
``src/rtl_fm.c:189-193``).  Two engines, arbitrary station offsets:

- ``channelize_step`` (channel-major, float NCO): mixes a ``(C, N)``
  per-channel rotation, decimates, runs the batched planar demod tail.
- ``channelize_step_tmaj`` (round-5 default): the per-channel mix FOLDS
  into the decimation window — ``e^{-jw(mD+j)} = e^{-jwmD} e^{-jwj}``
  makes mix+decimate ONE ``(M, 2D) @ (2D, 2C)`` MXU dot against a static
  window matrix plus an M-rate phasor whose phase numerators are exact
  int32 arithmetic mod fs (no drift, ever); the time-major tail is the
  PFB's (batched MXU deemph, periodic-mask resampler).  Measured 11.6x
  the channel-major engine at C=64 (docs/PERF.md round-5c).

This is a capability the reference cannot express; there is no
file:line to cite for the core, only for the per-channel tail semantics
(``full_demod``, ``src/rtl_fm.c:759-824``).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rx_tools_tpu import ops
from rx_tools_tpu.ops.resample import (
    ResampleState, resample_rational, resample_rational_batch)


@dataclass(frozen=True)
class ChannelizerConfig:
    """Static config: one wideband input, C identical-mode channels."""
    capture_rate: int                 # wideband fs
    offsets: tuple                    # per-channel offset from capture center (Hz)
    downsample: int                   # capture -> channel rate decimation
    mode: str = "fm"
    custom_atan: int = 1
    deemph_a: int = 0
    rate_out2: int = -1               # audio resample target per channel
    output_scale: int = 1

    @property
    def channel_rate(self) -> int:
        return self.capture_rate // self.downsample

    @property
    def n_channels(self) -> int:
        return len(self.offsets)


class ChannelizerState(NamedTuple):
    nco_phase: jnp.ndarray            # (C,) carried mix phase (radians)
    prev_iq: jnp.ndarray              # (C, 2) discriminator seam
    deemph_avg: jnp.ndarray           # (C,)
    resamp: ResampleState             # leaves shaped (C,)
    sample_index: jnp.ndarray         # () int32 absolute block counter


def init_state(cfg: ChannelizerConfig) -> ChannelizerState:
    c = cfg.n_channels
    return ChannelizerState(
        nco_phase=jnp.zeros(c, jnp.float32),
        prev_iq=jnp.zeros((c, 2), jnp.float32),
        deemph_avg=jnp.zeros(c, jnp.float32),
        resamp=ResampleState(jnp.zeros(c, jnp.float32),
                             jnp.zeros(c, jnp.int32)),
        sample_index=jnp.zeros((), jnp.int32),
    )


def block_samples(cfg: ChannelizerConfig, target: int = 65536) -> int:
    step = 4 * cfg.downsample
    return max(1, -(-target // step)) * step


def demod_tail(cfg, prev, davg, racc, rphase, zc):
    """Per-channel demod tail (``full_demod``'s post-decimation half,
    ``src/rtl_fm.c:808-823``): discriminate/detect -> deemph -> resample.

    ``cfg`` duck-types ``mode / custom_atan / output_scale / deemph_a /
    channel_rate / rate_out2`` so both the mixer channelizer and the PFB
    channelizer (models/pfb.py) share it.  Designed to be ``vmap``-ed over
    the channel axis.
    """
    if cfg.mode == "raw":
        audio = zc.reshape(-1)
        return prev, davg, racc, rphase, audio, jnp.int32(audio.shape[0])
    if cfg.mode == "fm":
        prev, audio = ops.fm_discriminate(prev, zc, cfg.custom_atan)
    elif cfg.mode == "am":
        audio = ops.am_demod(zc, cfg.output_scale)
    elif cfg.mode == "usb":
        audio = ops.usb_demod(zc, cfg.output_scale)
    elif cfg.mode == "lsb":
        audio = ops.lsb_demod(zc, cfg.output_scale)
    else:
        raise ValueError(cfg.mode)
    if cfg.deemph_a:
        davg, audio = ops.deemph_filter(davg, audio, cfg.deemph_a)
    if cfg.rate_out2 > 0:
        rst, audio, nv = resample_rational(
            ResampleState(racc, rphase), audio,
            cfg.channel_rate, cfg.rate_out2)
        racc, rphase = rst.acc, rst.phase
    else:
        nv = jnp.int32(audio.shape[0])
    return prev, davg, racc, rphase, audio, nv


def demod_tail_batch(cfg, prev, davg, racc, rphase, z):
    """Batched :func:`demod_tail` over the channel axis: ``z`` (C, M, 2).

    Compatibility wrapper around the planar implementation (one pair of
    trailing-axis slices at channel rate, then planar throughout —
    docs/PERF.md round-3 construct rules).
    """
    if cfg.mode == "raw":
        c_ch = z.shape[0]
        audio = z.reshape(c_ch, -1)
        return (prev, davg, racc, rphase, audio,
                jnp.full((c_ch,), audio.shape[1], jnp.int32))
    return demod_tail_batch_planar(cfg, prev, davg, racc, rphase,
                                   z[..., 0], z[..., 1])


def demod_tail_batch_planar(cfg, prev, davg, racc, rphase, zi, zq):
    """Planar batched demod tail: ``zi``/``zq`` (C, M).

    Identical semantics to vmapping :func:`demod_tail` (tested), but
    every stage is one batched op AND channel-planar: the discriminator
    seam is a concatenate (not C scatters), the deemph scan runs along
    axis -1, the resampler computes its (data-independent,
    channel-identical) emission indices once and gathers along them
    (ops.resample_rational_batch), and nothing slices a 2-wide trailing
    axis at rate.  Returns
    ``(prev, davg, racc, rphase, audio (C, cap), n_valid (C,))``.
    """
    c_ch = zi.shape[0]
    if cfg.mode == "fm":
        prev, audio = ops.fm_discriminate_batch_planar(prev, zi, zq,
                                                       cfg.custom_atan)
    elif cfg.mode == "am":
        audio = jnp.sqrt(zi * zi + zq * zq) * jnp.float32(cfg.output_scale)
    elif cfg.mode == "usb":
        audio = (zi + zq) * jnp.float32(cfg.output_scale)
    elif cfg.mode == "lsb":
        audio = (zi - zq) * jnp.float32(cfg.output_scale)
    elif cfg.mode == "raw":
        audio = jnp.stack([zi, zq], axis=-1).reshape(c_ch, -1)
        return (prev, davg, racc, rphase, audio,
                jnp.full((c_ch,), audio.shape[1], jnp.int32))
    else:
        raise ValueError(cfg.mode)
    if cfg.deemph_a:
        davg, audio = ops.deemph_filter(davg, audio, cfg.deemph_a, axis=-1)
    if cfg.rate_out2 > 0:
        rst, audio, nv = resample_rational_batch(
            ResampleState(racc, rphase), audio,
            cfg.channel_rate, cfg.rate_out2)
        racc, rphase = rst.acc, rst.phase
        n_valid = jnp.full((c_ch,), nv, jnp.int32)
    else:
        n_valid = jnp.full((c_ch,), audio.shape[1], jnp.int32)
    return prev, davg, racc, rphase, audio, n_valid


# ---------------------------------------------------------------------------
# Round-5 TIME-MAJOR mixer: integer NCO + sqrt(N) angle decomposition
# ---------------------------------------------------------------------------

class ChannelizerStateTM(NamedTuple):
    """Carried state of :func:`channelize_step_tmaj`: the NCO phase is an
    EXACT integer cycle fraction (numerator of phase/2pi in units of
    1/capture_rate), so arbitrarily long runs never accumulate float
    phase drift (the float NCO wraps mod 2pi each block instead)."""
    nco_num: jnp.ndarray           # (C,) int32: phase numerator mod fs
    prev_iq: jnp.ndarray           # (C, 2) discriminator seam
    deemph_avg: jnp.ndarray        # (C,)
    resamp: ResampleState          # (C,) acc / phase


def init_state_tmaj(cfg: ChannelizerConfig) -> ChannelizerStateTM:
    c = cfg.n_channels
    return ChannelizerStateTM(
        nco_num=jnp.zeros(c, jnp.int32),
        prev_iq=jnp.zeros((c, 2), jnp.float32),
        deemph_avg=jnp.zeros(c, jnp.float32),
        resamp=ResampleState(jnp.zeros(c, jnp.float32),
                             jnp.zeros(c, jnp.int32)))


def tmaj_supported(cfg: ChannelizerConfig, block_size: int) -> bool:
    """Integer-Hz offsets (the NCO phase arithmetic is exact integer mod
    fs), non-raw mode, and a 128-aligned channel-rate block (the
    time-major tail's batched scans)."""
    return (all(float(o).is_integer() for o in cfg.offsets)
            and cfg.mode in ("fm", "am", "usb", "lsb")
            and (block_size // cfg.downsample) % 128 == 0)


@functools.lru_cache(maxsize=16)
def _mix_decim_matrix(offsets: tuple, d: int, fs: int) -> np.ndarray:
    """(2D, 2C) real matrix: one MXU dot mixes AND boxcar-decimates every
    channel.  Folding ``e^{-j w_c (mD+j)} = e^{-j w_c mD} e^{-j w_c j}``
    into the decimation window makes the inner sum a fixed per-channel
    D-tap complex FIR over interleaved frames:

        inner[m, c] = sum_j (xi + j*xq)[mD+j] * e^{-j w_c j}

    Column c is Re(inner), column C+c is Im; row 2j weights xi, 2j+1
    weights xq.  The capture-rate (N, C) mixed intermediate — and C*N
    transcendentals — never exist (the per-block remainder is one M-rate
    phasor multiply).  Built in float64 on the host."""
    c = len(offsets)
    m = np.zeros((2 * d, 2 * c), np.float32)
    for ci, off in enumerate(offsets):
        w = 2.0 * np.pi * (float(off) / fs) * np.arange(d)
        m[0::2, ci] = np.cos(w)
        m[1::2, ci] = np.sin(w)
        m[0::2, c + ci] = -np.sin(w)
        m[1::2, c + ci] = np.cos(w)
    return m


def _nco_phasor_rows(offs: np.ndarray, fs: int, d: int, num0, m: int):
    """cos/sin of ``-2pi*((off_c*D*m + num0_c) mod fs)/fs`` for the M
    decimated rows, shape (M, C).  Phase numerators are EXACT int32
    arithmetic via an m = u*U + v split (bounds fs*(U + M/U) < 2^31),
    so long runs never drift — tighter than the float NCO."""
    c = offs.shape[0]
    u_sz = 1 << max(1, (m - 1).bit_length() // 2)         # ~sqrt(M), pow2
    u_n = -(-m // u_sz)
    off_d = (offs.astype(np.int64) * d) % fs              # (C,)
    off_du = jnp.asarray((off_d * u_sz) % fs, jnp.int32)
    off_d = jnp.asarray(off_d, jnp.int32)
    u = jnp.arange(u_n, dtype=jnp.int32)[:, None, None]   # (U, 1, 1)
    v = jnp.arange(u_sz, dtype=jnp.int32)[None, :, None]  # (1, V, 1)
    num = ((off_du[None, None, :] * u) % fs
           + (off_d[None, None, :] * v) % fs
           + num0[None, None, :]) % fs                    # (U, V, C)
    th = (num.reshape(-1, c)[:m].astype(jnp.float32)
          * jnp.float32(-2.0 * math.pi / fs))
    return jnp.cos(th), jnp.sin(th)                       # (M, C) each


@partial(jax.jit, static_argnums=0)
def channelize_step_tmaj(cfg: ChannelizerConfig, state: ChannelizerStateTM,
                         block):
    """Time-major mixer channelizer step: ``block`` (2N,) int16 ->
    ``(state, audio (cap, C), n_valid ())`` — the arbitrary-offset twin
    of ``pfb.pfb_step_tmaj`` (same output contract; hosts transpose as a
    free view).  The per-channel tail (``full_demod``'s post-decimation
    half, src/rtl_fm.c:808-823) reuses the PFB's time-major machinery:
    batched triangular-MXU deemph and the periodic-mask (or csum)
    resampler.  Gate on :func:`tmaj_supported`.
    """
    from rx_tools_tpu.models import pfb as _pfb

    c = cfg.n_channels
    d = cfg.downsample
    fs = int(cfg.capture_rate)
    n = block.shape[0] // 2
    m = n // d
    u_sz = 1 << max(1, (m - 1).bit_length() // 2)
    if fs * (u_sz + m // u_sz + 2) >= 2 ** 31:
        raise ValueError("block too large for the int32 NCO decomposition")

    # --- mix + boxcar-decimate ALL channels: one MXU dot ----------------
    frames = (block.astype(jnp.float32).reshape(m, 2 * d)
              * jnp.float32(128.0 / 32767.0))             # interleaved rows
    bmat = jnp.asarray(_mix_decim_matrix(tuple(cfg.offsets), d, fs))
    inner = jax.lax.dot_general(frames, bmat, (((1,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST)
    ire, iim = inner[:, :c], inner[:, c:]                 # (M, C)

    offs = np.asarray([int(o) for o in cfg.offsets], np.int64)
    ca, sa = _nco_phasor_rows(offs, fs, d, state.nco_num, m)
    zi = ca * ire - sa * iim                              # (M, C)
    zq = sa * ire + ca * iim
    nco_num = (state.nco_num
               + jnp.asarray((offs * n) % fs, jnp.int32)) % fs

    # --- demod (time-major; seam = previous decimated row) --------------
    prev_row_i = state.prev_iq[:, 0][None, :]
    prev_row_q = state.prev_iq[:, 1][None, :]
    br = jnp.concatenate([prev_row_i, zi[:-1]], axis=0)
    bj = jnp.concatenate([prev_row_q, zq[:-1]], axis=0)
    if cfg.mode == "fm":
        cr = zi * br + zq * bj
        cj = zq * br - zi * bj
        if cfg.custom_atan == ops.DISC_STD:
            dd = ops.polar_discriminant(cr, cj)
        else:
            if cfg.custom_atan == ops.DISC_FAST:
                dd = ops.polar_disc_fast(cr, cj)
            elif cfg.custom_atan == ops.DISC_LUT:
                ai = jnp.round(zi).astype(jnp.int32)
                ji = jnp.round(zq).astype(jnp.int32)
                bi = jnp.round(br).astype(jnp.int32)
                qi = jnp.round(bj).astype(jnp.int32)
                dd = ops.polar_disc_lut(ai * bi + ji * qi,
                                        ji * bi - ai * qi)
            else:
                dd = ops.esbensen_disc(zi, zq, br, bj)
            trow = jax.lax.broadcasted_iota(jnp.int32, dd.shape, 0)
            dd = jnp.where(trow == 0,
                           ops.polar_discriminant(cr[0:1], cj[0:1]), dd)
    elif cfg.mode == "am":
        dd = jnp.sqrt(zi * zi + zq * zq) * jnp.float32(cfg.output_scale)
    elif cfg.mode == "usb":
        dd = (zi + zq) * jnp.float32(cfg.output_scale)
    elif cfg.mode == "lsb":
        dd = (zi - zq) * jnp.float32(cfg.output_scale)
    else:
        raise ValueError(cfg.mode)
    prev_iq = jnp.stack([zi[m - 1], zq[m - 1]], axis=-1)  # (C, 2)

    davg = state.deemph_avg
    if cfg.deemph_a:
        inv_a = 1.0 / cfg.deemph_a
        davg, dd = _pfb._iir_tmaj(davg, dd * jnp.float32(inv_a),
                                  1.0 - inv_a)

    racc, rphase = state.resamp.acc, state.resamp.phase
    if cfg.rate_out2 > 0:
        import math as _m
        _g = _m.gcd(int(cfg.channel_rate), int(cfg.rate_out2))
        _fr = cfg.channel_rate // _g
        _e = _fr // (cfg.rate_out2 // _g) + 2
        rs_fn = (_pfb._resample_tmaj_periodic
                 if _fr + _e <= 512 and _e <= _fr
                 else _pfb._resample_tmaj)
        st_r, audio, nv = rs_fn(ResampleState(racc, rphase), dd,
                                cfg.channel_rate, cfg.rate_out2)
        racc, rphase = st_r.acc, st_r.phase
    else:
        audio, nv = dd, jnp.int32(m)

    return (ChannelizerStateTM(nco_num=nco_num, prev_iq=prev_iq,
                               deemph_avg=davg,
                               resamp=ResampleState(racc, rphase)),
            audio, nv)


@partial(jax.jit, static_argnums=0)
def channelize_step(cfg: ChannelizerConfig, state: ChannelizerState, block):
    """One wideband block -> C audio channels.

    ``block``: (2N,) int16 at capture_rate.  Returns
    ``(state, audio (C, cap), n_valid (C,))``.
    """
    x = block.astype(jnp.float32).reshape(-1, 2) * jnp.float32(128.0 / 32767.0)
    n = x.shape[0]
    fs = jnp.float32(cfg.capture_rate)

    # --- mix all channels at once: z * exp(-j(2*pi*off/fs * n + phase)) ---
    offs = jnp.asarray(np.array(cfg.offsets, np.float32))          # (C,)
    t = jnp.arange(n, dtype=jnp.float32)[None, :]                  # (1, N)
    theta = (-2.0 * jnp.float32(math.pi) * (offs / fs)[:, None] * t
             - state.nco_phase[:, None])                           # (C, N)
    cs, sn = jnp.cos(theta), jnp.sin(theta)
    i, q = x[:, 0][None, :], x[:, 1][None, :]
    mi = i * cs - q * sn
    mq = i * sn + q * cs

    # carried NCO phase advance (mod 2pi, stable for long runs)
    dphi = (2.0 * jnp.float32(math.pi) * (offs / fs)
            * jnp.float32(n)) % jnp.float32(2.0 * math.pi)
    nco_phase = (state.nco_phase + dphi) % jnp.float32(2.0 * math.pi)

    # --- per-channel decimate (boxcar), planar -------------------------
    m = n // cfg.downsample
    zi = mi.reshape(cfg.n_channels, m, cfg.downsample).sum(axis=2)
    zq = mq.reshape(cfg.n_channels, m, cfg.downsample).sum(axis=2)

    # --- batched demod tail (planar) -------------------------------------
    prev, davg, racc, rphase, audio, n_valid = demod_tail_batch_planar(
        cfg, state.prev_iq, state.deemph_avg, state.resamp.acc,
        state.resamp.phase, zi, zq)

    new_state = ChannelizerState(
        nco_phase=nco_phase, prev_iq=prev, deemph_avg=davg,
        resamp=ResampleState(racc, rphase),
        sample_index=state.sample_index + 1)
    return new_state, audio, n_valid


@partial(jax.jit, static_argnums=0)
def channelize_scan_blocks_tmaj(cfg: ChannelizerConfig,
                                state: ChannelizerStateTM, blocks):
    """``B`` chained :func:`channelize_step_tmaj` calls in one program
    (chunked-dispatch amortization; see ``pfb.pfb_scan_blocks_tmaj``)."""
    audio, nv = [], []
    for i in range(blocks.shape[0]):
        state, a, v = channelize_step_tmaj(cfg, state, blocks[i])
        audio.append(a)
        nv.append(v)
    return state, jnp.stack(audio), jnp.stack(nv)
