"""``--int-audio``: bit-exact integer FM/AM/SSB chain (models layer).

Mirrors the oracle's ``full_demod`` (``tests/oracles/c_ref.py``,
``rtl_fm.c:759-824``) on device for the boxcar-decimation path, traced
under ``jax.enable_x64``.  The per-buffer std-atan2 seam
(``fm_demod``, rtl_fm.c:588-590) is the one stage computed on the HOST
(float64 atan2, matching the C's double math exactly); the device step
emits the seam's integer inputs and a placeholder, and
:func:`patch_seam` rewrites sample 0.

Covers: fm (-A fast/lut/ale), am, usb, lsb; post-downsample; deemph;
audio DC block; the rational resampler.  Unsupported (kept on the float
plane): -A std (every sample is double-transcendental), the fifth-order
-F path, squelch (its RMS uses double sqrt per block mid-chain), raw DC.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from rx_tools_tpu.ops import intaudio
from rx_tools_tpu.ops.rotate import rotate_fs4


class IntFmState(NamedTuple):
    pre_r: jnp.ndarray        # () carried discriminator pair
    pre_j: jnp.ndarray
    deemph_avg: jnp.ndarray   # () integer deemph state
    dc_avg: jnp.ndarray       # () audio DC EMA
    now_lpr: jnp.ndarray      # () resampler window accumulator
    lpr_phase: jnp.ndarray    # () resampler phase (reduced units)


def init_state() -> IntFmState:
    z = jnp.zeros((), jnp.int64)
    return IntFmState(z, z, z, z, z, z)


def supports(cfg) -> bool:
    """Configs the integer tier covers bit-exactly."""
    return (cfg.mode in ("fm", "am", "usb", "lsb")
            and not cfg.downsample_passes and cfg.fir_quality <= 9
            and cfg.resample_quality == 0
            and not cfg.dc_block_raw and cfg.squelch_level == 0
            and (cfg.mode != "fm" or cfg.custom_atan in (1, 2, 3)))


@partial(jax.jit, static_argnums=0)
def _step_impl(cfg, state: IntFmState, block_i16):
    lp = intaudio.rescale_int(block_i16)
    if not cfg.offset_tuning:
        lp = rotate_fs4(lp.reshape(-1, 2)).reshape(-1)
    z = intaudio.boxcar_int(lp.reshape(-1, 2), cfg.downsample)
    zi, zq = z[:, 0], z[:, 1]
    seam = jnp.zeros(4, jnp.int64)
    if cfg.mode == "fm":
        pre = jnp.stack([state.pre_r, state.pre_j])
        pre, result, seam = intaudio.fm_demod_int(pre, zi, zq,
                                                  cfg.custom_atan)
        pre_r, pre_j = pre[0], pre[1]
    else:
        pre_r, pre_j = state.pre_r, state.pre_j
        if cfg.mode == "am":
            result = intaudio.am_demod_int(zi, zq, cfg.output_scale)
        elif cfg.mode == "usb":
            result = intaudio._i16(
                intaudio._i16(zi + zq) * cfg.output_scale)
        else:
            result = intaudio._i16(
                intaudio._i16(zi - zq) * cfg.output_scale)
    return (state._replace(pre_r=pre_r, pre_j=pre_j), result, seam)


@partial(jax.jit, static_argnums=0)
def _post_impl(cfg, state: IntFmState, result):
    if cfg.post_downsample > 1:
        result = intaudio.low_pass_simple_int(result, cfg.post_downsample)
    deemph_avg = state.deemph_avg
    if cfg.deemph_a:
        deemph_avg, result = intaudio.deemph_int(deemph_avg, result,
                                                 cfg.deemph_a)
    dc_avg = state.dc_avg
    if cfg.dc_block_audio:
        dc_avg, result = intaudio.dc_block_audio_int(dc_avg, result)
    now, phase = state.now_lpr, state.lpr_phase
    if cfg.rate_out2 > 0:
        now, phase, result, n_valid = intaudio.low_pass_real_int(
            now, phase, result, cfg.rate_out, cfg.rate_out2)
    else:
        n_valid = jnp.int64(result.shape[0])
    return (state._replace(deemph_avg=deemph_avg, dc_avg=dc_avg,
                           now_lpr=now, lpr_phase=phase),
            result, n_valid)


def patch_seam(cfg, result: np.ndarray, seam: np.ndarray) -> np.ndarray:
    """Host float64 std-atan2 for the per-buffer seam sample
    (``polar_discriminant``, rtl_fm.c:476-483) — exact vs the C's double
    math, which device f32 cannot guarantee at truncation boundaries."""
    if cfg.mode != "fm":
        return result
    ai, aj, br, bj = (int(v) for v in seam)
    cr = ai * br + aj * bj
    cj = aj * br - ai * bj
    angle = math.atan2(float(cj), float(cr))
    v = int(math.trunc(angle / 3.14159 * (1 << 14)))
    v = ((v & 0xFFFF) ^ 0x8000) - 0x8000
    result = np.asarray(result).copy()
    result[0] = v
    return result


def int_chain_block(cfg, state: IntFmState, block_i16):
    """One block through the bit-exact integer chain (host driver):
    device demod -> host seam patch -> device audio post.  Returns
    ``(state, audio int16 np.ndarray)``."""
    with jax.enable_x64(True):
        # init_state() may have been built outside the x64 context (where
        # int64 silently truncates to int32): normalize the carry dtypes
        state = jax.tree.map(lambda a: jnp.asarray(a, jnp.int64), state)
        st, result, seam = _step_impl(cfg, state, jnp.asarray(block_i16))
        result = jnp.asarray(
            patch_seam(cfg, np.asarray(result), np.asarray(seam)))
        st, audio, n_valid = _post_impl(cfg, st, result)
    audio = np.asarray(audio)[: int(n_valid)]
    return st, audio.astype(np.int16)
