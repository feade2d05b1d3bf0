"""The demodulation chain "model": rx_fm's full_demod as one jitted step.

Where the reference drives a mutable ``struct demod_state`` through a chain
of in-place C filters per buffer (``full_demod``, ``src/rtl_fm.c:759-824``)
plus capture-side preprocessing in the read callback (rescale, raw DC block,
fs/4 rotate — ``rtlsdr_callback``, ``rtl_fm.c:828-863``), the TPU model is a
single pure function

    ``fm_chain_step(cfg, state, block) -> (state, audio, n_valid, level)``

traced once per (config, block-shape) and compiled by XLA into a handful of
fused VPU loops; every reference state field lives in the :class:`FmState`
pytree, which is also exactly the halo the parallel layer exchanges between
time shards (SURVEY.md §2.6).

Numerics: float32 in the reference's ±128 8-bit range (capture rescale
``rtl_fm.c:846`` done in float), so squelch levels, output_scale and
discriminator magnitudes all match reference scales within SNR.
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
from rx_tools_tpu.ops.polyfir import PolyFirState, design_lowpass, fir_decimate
from rx_tools_tpu.ops.resample import (
    ResampleState, SincResampleState, resample_rational, resample_sinc)

MODES = ("fm", "am", "usb", "lsb", "raw")

#: reference buffer-geometry constants (rtl_fm.c:79-88)
DEFAULT_BUF_LENGTH = 16384
MAXIMUM_OVERSAMPLE = 16
MAXIMUM_BUF_LENGTH = MAXIMUM_OVERSAMPLE * DEFAULT_BUF_LENGTH
LCM_POST = [1, 1, 1, 3, 1, 5, 3, 7, 1, 9, 5, 11, 3, 13, 7, 15, 1]
FREQUENCIES_LIMIT = 1000


@dataclass(frozen=True)
class FmConfig:
    """Static chain configuration (hashable; jit-static)."""
    mode: str = "fm"
    rate_in: int = 24000           # demod input rate (post-capture-decim)
    rate_out: int = 24000
    rate_out2: int = -1            # audio resample target; <=0 disables
    downsample: int = 42           # capture decimation factor
    downsample_passes: int = 0     # 0 => boxcar; else fifth-order cascade
    comp_fir_size: int = 0         # 9 => droop compensation FIR
    custom_atan: int = 0           # DISC_* mode
    fir_quality: int = 0           # >9: windowed-sinc taps (ops.polyfir)
    resample_quality: int = 0      # >0: polyphase sinc resampler taps
    post_downsample: int = 1
    deemph_a: int = 0              # 0 disables
    dc_block_audio: bool = False
    dc_block_raw: bool = False
    squelch_level: float = 0.0
    squelch_zero: bool = False     # -E zero: emit zeros instead of hopping
    conseq_squelch: int = 10
    offset_tuning: bool = False
    output_scale: int = 1

    def audio_rate(self) -> int:
        """Final PCM rate: the resample target, else ``rate_out``.

        Convention (matching the reference's variable roles after its
        ``rate_in *= post_downsample``, rtl_fm.c:1371): ``rate_in`` is the
        demod-stage input rate, ``rate_out == rate_in / post_downsample``
        is the audio rate after ``low_pass_simple``, and ``rate_out2`` the
        optional resample target.
        """
        return self.rate_out2 if self.rate_out2 > 0 else self.rate_out


class FmState(NamedTuple):
    """Carried DSP state — the functional twin of demod_state's mutable
    fields (rtl_fm.c:124-159).  Shapes are config-dependent but static."""
    dc_iq: jnp.ndarray            # (2,) raw DC block averages
    boxcar: ops.BoxcarState
    fifth: ops.FifthOrderState    # (passes, 5, 2)
    droop: ops.DroopState         # (9, 2)
    prev_iq: jnp.ndarray          # (2,) discriminator seam sample
    deemph_avg: jnp.ndarray       # ()
    dc_avg: jnp.ndarray           # ()
    resamp: ResampleState
    squelch_hits: jnp.ndarray     # () int32
    polyfir: PolyFirState         # (taps-1, 2); dummy (1,2) when unused
    sincresamp: SincResampleState # (taps,) tail; dummy when unused


def init_state(cfg: FmConfig) -> FmState:
    return FmState(
        dc_iq=jnp.zeros(2, jnp.float32),
        boxcar=ops.BoxcarState.init(),
        fifth=ops.FifthOrderState.init(max(cfg.downsample_passes, 1)),
        droop=ops.DroopState.init(),
        prev_iq=jnp.zeros(2, jnp.float32),
        deemph_avg=jnp.zeros((), jnp.float32),
        dc_avg=jnp.zeros((), jnp.float32),
        resamp=ResampleState.init(),
        # reference starts "muted": squelch_hits = 11 > conseq 10
        # (rtl_fm.c:1089-1091)
        squelch_hits=jnp.array(cfg.conseq_squelch + 1, jnp.int32),
        polyfir=PolyFirState.init(max(cfg.fir_quality, 2)),
        sincresamp=SincResampleState.init(max(cfg.resample_quality, 2)),
    )


def block_samples(cfg: FmConfig, target: int | None = None) -> int:
    """Pick a capture block size (complex samples) aligned to the whole
    chain: divisible by 4 (rotate), the decimation factor, and the
    post-downsample step so every stage is a static reshape.

    Mirrors ACTUAL_BUF_LENGTH = lcm_post[post] * 16384 (rtl_fm.c:1387) in
    spirit, then rounds up to chain alignment.
    """
    base = (target if target is not None
            else LCM_POST[cfg.post_downsample] * DEFAULT_BUF_LENGTH // 2)
    step = 4 * cfg.downsample * cfg.post_downsample
    return max(1, -(-base // step)) * step


def plan_capture(cfg: FmConfig, freq: float, edge: int = 0):
    """``optimal_settings`` analog (rtl_fm.c:960-997).

    Returns a new config with capture decimation resolved, plus
    (capture_freq, capture_rate).
    """
    downsample = (1_000_000 // cfg.rate_in) + 1
    passes = 0
    if cfg.downsample_passes:
        passes = int(math.log2(downsample)) + 1
        downsample = 1 << passes
    capture_rate = downsample * cfg.rate_in
    capture_freq = freq
    if not cfg.offset_tuning:
        capture_freq = freq + capture_rate / 4
    capture_freq += edge * cfg.rate_in / 2
    scale = (1 << 15) // (128 * downsample)
    scale = max(scale, 1)
    if cfg.mode == "fm":
        scale = 1
    import dataclasses
    cfg2 = dataclasses.replace(cfg, downsample=downsample,
                               downsample_passes=passes, output_scale=scale)
    return cfg2, capture_freq, capture_rate


def fm_chain_step_impl(cfg: FmConfig, state: FmState, block):
    """One block through the whole chain.

    ``block``: (2N,) int16 interleaved CS16, N divisible per
    :func:`block_samples`.  Returns ``(state, audio, n_valid, level)`` where
    ``audio`` is float32 of static capacity (int16-range values) and
    ``n_valid`` the valid prefix length; ``level`` is the squelch RMS for
    ``-L`` printing / hop control.
    """
    from rx_tools_tpu.ops import fused_frontend

    fifth, droop, polyfir = state.fifth, state.droop, state.polyfir
    boxcar = state.boxcar
    dc_iq = state.dc_iq
    k_out = block.shape[0] // 2 // cfg.downsample
    if cfg.mode == "fm" and fused_frontend.fused_eligible(cfg, k_out):
        # round-4 one-kernel front: capture + fast-atan discriminator +
        # level partials fused in VMEM (ops/fused_frontend.py); the seam
        # quirk (std atan2 at sample 0, rtl_fm.c:588-590) is restored
        # outside the kernel — semantics identical to the unfused path
        prev_iq, audio, levels = fused_frontend.fused_capture_fm_demod(
            state.prev_iq, block, cfg.downsample, k_out,
            rotate=not cfg.offset_tuning)
        return _fm_post(cfg, state, audio, levels[0], prev_iq, dc_iq,
                        fifth, droop, boxcar, polyfir,
                        state.squelch_hits)
    if (not cfg.dc_block_raw and not cfg.downsample_passes
            and cfg.fir_quality <= 9):
        # the default boxcar chain head — rescale (rtl_fm.c:845-848),
        # fs/4 derotate (rtl_fm.c:309-327), decimate (rtl_fm.c:351-371) —
        # runs as two masked full-VPU-width reduces with PLANAR output
        # (ops/pallas_frontend.py; docs/PERF.md round-3 campaign)
        zi, zq = ops.capture_frontend_planar(block, cfg.downsample,
                                             rotate=not cfg.offset_tuning)
    else:
        x = (block.astype(jnp.float32).reshape(-1, 2)
             * jnp.float32(128.0 / 32767.0))
        if cfg.dc_block_raw:
            dc_iq, x = ops.dc_block_raw(dc_iq, x)
        if not cfg.offset_tuning:
            x = ops.rotate_fs4(x)

        # --- capture decimation (full_demod head, rtl_fm.c:763-779) ---
        if cfg.downsample_passes:
            fifth, x = ops.fifth_order_cascade(fifth, x,
                                               cfg.downsample_passes)
            if cfg.comp_fir_size == 9:
                droop, x = ops.droop_fir(droop, x, cfg.downsample_passes)
        elif cfg.fir_quality > 9:
            # beyond-reference: windowed-sinc polyphase anti-alias decimator
            taps = jnp.asarray(design_lowpass(cfg.fir_quality,
                                              1.0 / cfg.downsample))
            polyfir, x = fir_decimate(polyfir, x, taps, cfg.downsample)
        else:
            # aligned static boxcar: block_samples guarantees divisibility
            n = x.shape[0] // cfg.downsample
            x = x.reshape(n, cfg.downsample, 2).sum(axis=1)
        zi, zq = x[:, 0], x[:, 1]

    # --- squelch (rtl_fm.c:781-790) ---
    level = ops.rms_level_planar(zi, zq)
    squelched = jnp.logical_and(cfg.squelch_level > 0, level < cfg.squelch_level)
    squelch_hits = jnp.where(
        cfg.squelch_level > 0,
        jnp.where(squelched, state.squelch_hits + 1, 0),
        state.squelch_hits)
    zi = jnp.where(squelched, jnp.zeros_like(zi), zi)
    zq = jnp.where(squelched, jnp.zeros_like(zq), zq)

    # --- demodulate (planar) ---
    prev_iq = state.prev_iq
    if cfg.mode == "fm":
        prev_iq, audio = ops.fm_discriminate_planar(prev_iq, zi, zq,
                                                    cfg.custom_atan)
    elif cfg.mode == "am":
        audio = jnp.sqrt(zi * zi + zq * zq) * jnp.float32(cfg.output_scale)
    elif cfg.mode == "usb":
        audio = (zi + zq) * jnp.float32(cfg.output_scale)
    elif cfg.mode == "lsb":
        audio = (zi - zq) * jnp.float32(cfg.output_scale)
    elif cfg.mode == "raw":
        audio = jnp.stack([zi, zq], axis=-1).reshape(-1)
        return (state._replace(dc_iq=dc_iq, fifth=fifth, droop=droop,
                               boxcar=boxcar, squelch_hits=squelch_hits,
                               polyfir=polyfir),
                audio, jnp.int32(audio.shape[0]), level)
    else:
        raise ValueError(cfg.mode)

    return _fm_post(cfg, state, audio, level, prev_iq, dc_iq, fifth, droop,
                    boxcar, polyfir, squelch_hits)


def _fm_post(cfg, state, audio, level, prev_iq, dc_iq, fifth, droop,
             boxcar, polyfir, squelch_hits):
    """Audio post-processing + state assembly (rtl_fm.c:814-823), shared
    by the fused and unfused front paths."""
    if cfg.post_downsample > 1:
        audio = ops.low_pass_simple(audio, cfg.post_downsample)
    deemph_avg = state.deemph_avg
    if cfg.deemph_a:
        deemph_avg, audio = ops.deemph_filter(deemph_avg, audio, cfg.deemph_a)
    dc_avg = state.dc_avg
    if cfg.dc_block_audio:
        dc_avg, audio = ops.dc_block_audio(dc_avg, audio)
    resamp = state.resamp
    sincresamp = state.sincresamp
    if cfg.rate_out2 > 0:
        if cfg.resample_quality > 0:
            sincresamp, audio, n_valid = resample_sinc(
                sincresamp, audio, cfg.rate_out, cfg.rate_out2,
                taps=cfg.resample_quality)
        else:
            resamp, audio, n_valid = resample_rational(
                resamp, audio, cfg.rate_out, cfg.rate_out2)
    else:
        n_valid = jnp.int32(audio.shape[0])

    new_state = FmState(dc_iq=dc_iq, boxcar=boxcar, fifth=fifth, droop=droop,
                        prev_iq=prev_iq, deemph_avg=deemph_avg, dc_avg=dc_avg,
                        resamp=resamp, squelch_hits=squelch_hits,
                        polyfir=polyfir, sincresamp=sincresamp)
    return new_state, audio, n_valid, level


fm_chain_step = partial(jax.jit, static_argnums=0)(fm_chain_step_impl)


def audio_to_int16(audio: np.ndarray) -> np.ndarray:
    """Host-side emit: float audio -> int16 PCM (C truncation)."""
    return np.trunc(np.clip(audio, -32768, 32767)).astype(np.int16)


def wbfm_preset(rate_out2: int = 32000) -> FmConfig:
    """The ``-M wbfm`` macro preset (rtl_fm.c:1331-1341): 170k in, fast
    atan, deemphasis on, resample to 32k, squelch off."""
    return FmConfig(mode="fm", rate_in=170000, rate_out=170000,
                    rate_out2=rate_out2, custom_atan=ops.DISC_FAST,
                    deemph_a=ops.deemph_alpha(170000, 75), squelch_level=0.0)
