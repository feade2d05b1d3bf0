"""Multi-channel demodulation: many stations from one wideband capture.

The reference demodulates exactly one channel per process, per dongle; its
own source notes the ambition for more ("multiple of these, eventually",
``src/rtl_fm.c:189-193``).  On TPU the whole problem is one ``vmap``: a
single wideband capture block is mixed down at ``C`` channel offsets at
once (a ``(C, N)`` complex rotation — pure VPU), decimated per channel,
and the demod tail (discriminator, de-emphasis, resampler) runs vectorized
over the channel axis.  ``C`` FM receivers cost barely more than one,
because the capture-rate work is shared and the per-channel work happens
at 1/D the rate.

State: per-channel NCO phase plus a vmapped stack of the per-channel tail
state — exactly :class:`fmchain.FmState` semantics, batched.

This is a capability the reference cannot express; there is no
file:line to cite for the core, only for the per-channel tail semantics
(``full_demod``, ``src/rtl_fm.c:759-824``).
"""

from __future__ import annotations

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
