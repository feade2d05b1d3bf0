"""``--int-audio``: the bit-exact integer WBFM audio tier.

Completes the bit-exact trio started by ``-A lut`` (discriminator) and
``--int-fft`` (spectrum): every integer quirk of the reference's audio
chain runs on device and the PCM matches the C model bit-for-bit —

- capture rescale with the float-then-truncate cast
  (``rtlsdr_callback``, ``rtl_fm.c:845-848``),
- integer boxcar decimate with int16 wraps (``low_pass``,
  ``rtl_fm.c:351-371``),
- the integer discriminators: ``fast_atan2``'s truncating divisions
  evaluated at full precision (``rtl_fm.c:485-506``), the LUT tier
  (already bit-exact), ``esbensen`` (``rtl_fm.c:566-582``),
- ``low_pass_simple``'s plain int16-wrapped group sums
  (``rtl_fm.c:373-387``),
- ``deemph_filter``'s rounding-toward-average integer IIR — a genuinely
  sequential nonlinear recurrence (integer division truncation gives it
  multiple fixpoints, so no exact parallel form exists); it runs as a
  ``lax.scan`` — this is a fidelity tier, correctness over speed
  (``rtl_fm.c:667-682``),
- ``dc_block_audio_filter``'s truncating block-mean EMA
  (``rtl_fm.c:684-697``),
- ``low_pass_real``'s accumulate-and-dump with the truncated divisor
  (``rtl_fm.c:389-409``).

Everything is traced under ``jax.enable_x64`` so the C's
intermediate widths (int accumulation, double sqrt/atan2) are available;
the per-buffer std-atan2 seam sample (``fm_demod``, rtl_fm.c:588-590)
is patched on the HOST in float64 (device f32 atan2 could truncate one
LSB differently near integer boundaries).

Semantics oracle: ``tests/oracles/c_ref.py`` (golden tests assert
bit-for-bit equality).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _i16(v):
    """Wrap to int16 two's complement, keeping the operand dtype."""
    w = jnp.bitwise_and(v, 0xFFFF)
    return jnp.bitwise_xor(w, 0x8000) - 0x8000


def _cdiv(a, b):
    """C integer division (truncate toward zero), either sign."""
    return jnp.sign(a) * jnp.sign(b) * (jnp.abs(a) // jnp.abs(b))


def rescale_int(block_i16):
    """CS16 -> the reference's 8-bit-range ints: float32 multiply chain
    then C truncation (``buf[i] * 1.0f/32767.0f * 128.0f + 0.4f`` cast to
    int16, rtl_fm.c:846) — reproduced operation-for-operation."""
    c1 = np.float32(1.0) / np.float32(32767.0)
    y = (block_i16.astype(jnp.float32) * c1) * np.float32(128.0) \
        + np.float32(0.4)
    return jnp.trunc(y).astype(jnp.int64)


def boxcar_int(lp, downsample: int):
    """Integer boxcar decimate (aligned blocks; the CLI's block sizes are
    multiples of the decimation factor) with the int16 wrap on emit."""
    z = lp.reshape(-1, downsample, 2).sum(axis=1)
    return _i16(z)


def fast_atan2_int(y, x):
    """The integer octant atan2, truncating divisions at full precision
    (the oracle evaluates the C expression in unbounded ints)."""
    pi4 = jnp.int64(1 << 12)
    pi34 = jnp.int64(3 * (1 << 12))
    yabs = jnp.abs(y)
    pos = pi4 - _cdiv(pi4 * (x - yabs), jnp.maximum(x + yabs, 1))
    neg = pi34 - _cdiv(pi4 * (x + yabs), jnp.maximum(yabs - x, 1))
    ang = jnp.where(x >= 0, pos, neg)
    ang = jnp.where((x == 0) & (y == 0), 0, ang)
    return jnp.where(y < 0, -ang, ang)


def esbensen_int(ar, aj, br, bj):
    """rtl_fm.c:566-582 in exact integers."""
    dr = (br - ar) * 2
    dj = (bj - aj) * 2
    cj = bj * dr - br * dj
    return _cdiv(jnp.int64(2608) * cj, ar * ar + aj * aj + 1)


def lut_disc_int(cr, cj):
    """The LUT discriminator on int64 products (bit-exact tier of
    ops/discriminators.py, evaluated here in the x64 context)."""
    from rx_tools_tpu.ops.discriminators import (_atan_lut_host,
                                                 _ATAN_LUT_COEF,
                                                 _ATAN_LUT_SIZE)
    lut = jnp.asarray(_atan_lut_host()).astype(jnp.int64)
    x = _cdiv(cj * (1 << _ATAN_LUT_COEF), jnp.where(cr == 0, 1, cr))
    x_abs = jnp.abs(x)
    l = lut[jnp.clip(x_abs, 0, _ATAN_LUT_SIZE - 1)]
    pos = jnp.where(cj > 0, l, l - (1 << 14))
    neg = jnp.where(cj > 0, (1 << 14) - l, -l)
    r = jnp.where(x > 0, pos, neg)
    r = jnp.where(x_abs >= _ATAN_LUT_SIZE,
                  jnp.where(cj > 0, 1 << 13, -(1 << 13)), r)
    r = jnp.where((cj == 0) & (cr > 0), 0, r)
    r = jnp.where((cj == 0) & (cr < 0), 1 << 14, r)
    r = jnp.where((cr == 0) & (cj > 0), 1 << 13, r)
    r = jnp.where((cr == 0) & (cj < 0), -(1 << 13), r)
    r = jnp.where((cr == 0) & (cj == 0), 0, r)
    return r


def fm_demod_int(pre, zi, zq, custom_atan: int):
    """Integer FM discriminator over a block: ``pre`` (2,) carried pair.

    Sample 0 (the std-atan2 seam) is emitted as a PLACEHOLDER zero —
    the caller patches it on the host in float64 (the only stage whose C
    arithmetic is double-precision transcendental).  Returns
    ``(new_pre, d, seam_inputs (4,))``.
    """
    ar, aj = zi, zq
    br = jnp.concatenate([pre[0][None], zi[:-1]])
    bj = jnp.concatenate([pre[1][None], zq[:-1]])
    cr = ar * br + aj * bj
    cj = aj * br - ar * bj
    if custom_atan == 1:
        d = fast_atan2_int(cj, cr)
    elif custom_atan == 2:
        d = lut_disc_int(cr, cj)
    elif custom_atan == 3:
        d = esbensen_int(ar, aj, br, bj)
    else:
        raise ValueError("int tier: -A std demodulates every sample in "
                         "double precision; use fast/lut/ale")
    d = _i16(d).at[0].set(0)
    seam = jnp.stack([zi[0], zq[0], pre[0], pre[1]])
    return jnp.stack([zi[-1], zq[-1]]), d, seam


def am_demod_int(zi, zq, output_scale: int):
    """Envelope with the C's double sqrt truncation (rtl_fm.c:617-632):
    exact under x64 (float64 sqrt of an exact int)."""
    pcm = zi * zi + zq * zq
    s = jnp.trunc(jnp.sqrt(pcm.astype(jnp.float64))).astype(jnp.int64)
    return _i16(_i16(s) * output_scale)


def low_pass_simple_int(x, step: int):
    """Int16-wrapped group sums (rtl_fm.c:373-387; the off-by-one tail
    write is dropped like the float path)."""
    n = (x.shape[0] // step) * step
    return _i16(x[:n].reshape(-1, step).sum(axis=1))


def deemph_int(avg, x, deemph_a: int):
    """The rounding-toward-average integer IIR (rtl_fm.c:667-682) as a
    sequential scan — bit-exact; no parallel form exists (truncating
    integer division gives every value within ±a/2 of the input a
    fixpoint, so trajectories need not merge)."""
    a = jnp.int64(deemph_a)
    half = jnp.int64(deemph_a // 2)

    def step(carry, v):
        d = v - carry
        inc = jnp.where(d > 0, _cdiv(d + half, a), _cdiv(d - half, a))
        carry = carry + inc
        return carry, _i16(carry)

    return jax.lax.scan(step, avg, x)


def dc_block_audio_int(dc_avg, x, block_const: int = 9):
    """Truncating block-mean EMA (rtl_fm.c:684-697)."""
    avg = _cdiv(jnp.sum(x), x.shape[0])
    avg = _cdiv(avg + dc_avg * block_const, block_const + 1)
    return avg, _i16(x - avg)


def low_pass_real_int(now_lpr, prev_lpr_index, x, fast: int, slow: int):
    """Integer accumulate-and-dump resampler (rtl_fm.c:389-409).

    Positions follow the same carried-phase grid as the float engine
    (data-independent); window sums are exact int64 cumsum differences
    and each emission is the C's truncated division by ``fast // slow``.
    Returns ``(now_lpr, prev_lpr_index, y, n_valid)`` with the float
    path's static capacity convention.
    """
    import math as _m
    divisor = fast // slow
    g = _m.gcd(int(fast), int(slow))
    fr, sr = int(fast) // g, int(slow) // g
    n = x.shape[0]
    cap = n * sr // fr + 2
    j = jnp.arange(1, n + 1, dtype=jnp.int64)
    c = prev_lpr_index + j * sr
    total = c[-1] // fr
    csum = jnp.cumsum(x)
    k = jnp.arange(cap, dtype=jnp.int64)
    m = (k + 1) * fr
    pos = (m - prev_lpr_index + sr - 1) // sr - 1
    valid = k < total
    posc = jnp.clip(pos, 0, n - 1)
    ends = csum[posc]
    starts = jnp.concatenate([jnp.zeros(1, x.dtype), ends[:-1]])
    w = (ends - starts) + jnp.where(k == 0, now_lpr, 0)
    y = jnp.where(valid, _i16(_cdiv(w, divisor)), 0)
    tot = csum[-1] + now_lpr
    consumed = jnp.where(total > 0, csum[jnp.clip(
        (total * fr - prev_lpr_index + sr - 1) // sr - 1, 0, n - 1)]
        + now_lpr, 0)
    new_now = tot - consumed
    new_phase = (prev_lpr_index + n * sr) % fr
    return new_now, new_phase, y, total
