"""Bit-faithful integer spectral path: the reference's ``fix_fft`` on device.

rx_power's default device path computes the spectrum in float with a
calibrated gain (``ops/spectrum.py``) — CSV dBm values match the C binary
to its own truncation-noise floor.  This module is the opt-in fidelity
tier above that (``rx_power --int-fft``): every integer quirk of the C
hot loop is reproduced in int32 arithmetic on the device, so the CSV is
**bit-identical** to the reference binary's:

- ``fix_fft`` (rtl_power.c:264-320): in-place radix-2 DIT int16 FFT,
  unconditional ``>>1`` per stage, ``FIX_MPY`` Q14 rounding with the
  round-half bit, int16 wraparound on every store;
- the window multiply (rtl_power.c:747-758): ``(int16_t)(sample * coef)``
  with the x256 integer coefficients — wrapping, not saturating;
- ``remove_dc`` (rtl_power.c:609-624): component sum divided (C-truncating)
  by the INTERLEAVED length — the half-DC quirk;
- the boxcar accumulate (rtl_power.c:723-733): int16 wrap per addition
  (== one wrap of the int32 group sum, since wrap is mod-2^16);
- ``|X|^2`` per segment in int32 (max 2*32767^2 < 2^31), accumulated
  exactly into int64 by the host — the device never needs x64.

Values travel as int32 arrays holding int16-range numbers; ``i16w`` wraps
after every C store that could overflow.  Python loops over the m stages
trace a static butterfly network; all butterflies of a stage run as one
vectorized (segments x n) step.

Golden-tested bit-exact against the oracle (tests/oracles/c_ref.py
``scanner_segment``) in tests/test_intfft.py.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def i16w(x):
    """Wrap int32 values to the int16 range (C int16_t store)."""
    return ((x + 0x8000) & 0xFFFF) - 0x8000


def _fix_mpy(a, b):
    """``FIX_MPY`` (rtl_power.c:256-262): Q14 multiply, round-half bit."""
    c = (a * b) >> 14
    rnd = c & 1
    return i16w((c >> 1) + rnd)


def sine_table_np(log2_n_wave: int) -> np.ndarray:
    """int16 3/4-wave sine LUT (``sine_table``, rtl_power.c:240-254)."""
    n_wave = 1 << log2_n_wave
    return np.array([int(round(32767 * math.sin(i * 2.0 * math.pi / n_wave)))
                     for i in range(n_wave * 3 // 4)], np.int32)


def _bitrev_perm(m: int) -> np.ndarray:
    """The bit-reverse reorder of fix_fft's swap loop (rtl_power.c:276-291)."""
    n = 1 << m
    perm = np.arange(n)
    for i in range(n):
        r = int(f"{i:0{m}b}"[::-1], 2) if m else 0
        perm[i] = r
    return perm


def fix_fft_batch(re, im, m: int, log2_n_wave: int | None = None):
    """Batched bit-exact ``fix_fft``: ``re``/``im`` (..., n) int32 in the
    int16 range -> transformed (..., n), scaled by 1/n like the C."""
    if log2_n_wave is None:
        log2_n_wave = m
    n = 1 << m
    n_wave = 1 << log2_n_wave
    assert n <= n_wave, "fft size exceeds sine table"
    sw = sine_table_np(log2_n_wave)
    perm = jnp.asarray(_bitrev_perm(m))
    re = jnp.take(re, perm, axis=-1)
    im = jnp.take(im, perm, axis=-1)
    lead = re.shape[:-1]
    ell, k = 1, log2_n_wave - 1
    while ell < n:
        istep = ell << 1
        mm = np.arange(ell)
        wr = jnp.asarray((sw[(mm << k) + n_wave // 4] >> 1)
                         .astype(np.int32))                    # (ell,)
        wi = jnp.asarray((i16w(-sw[mm << k]) >> 1).astype(np.int32))
        g = n // istep
        # (..., g, 2, ell): [..., 0, :] = the `i` points, [..., 1, :] = `j2`
        r4 = re.reshape(*lead, g, 2, ell)
        i4 = im.reshape(*lead, g, 2, ell)
        r_i, r_j = r4[..., 0, :], r4[..., 1, :]
        i_i, i_j = i4[..., 0, :], i4[..., 1, :]
        tr = i16w(_fix_mpy(wr, r_j) - _fix_mpy(wi, i_j))
        ti = i16w(_fix_mpy(wr, i_j) + _fix_mpy(wi, r_j))
        qr = r_i >> 1                      # operands already int16-range
        qi = i_i >> 1
        re = jnp.stack([i16w(qr + tr), i16w(qr - tr)], axis=-2) \
                .reshape(*lead, n)
        im = jnp.stack([i16w(qi + ti), i16w(qi - ti)], axis=-2) \
                .reshape(*lead, n)
        k -= 1
        ell = istep
    return re, im


def boxcar_decim_int(x, ds: int):
    """scanner's wrapping boxcar accumulate (rtl_power.c:723-733).

    ``x``: (..., 2*L) interleaved int32; returns (..., 2*L/ds).  The C
    wraps int16 on every addition; mod-2^16 arithmetic is associative, so
    one wrap of the int32 group sum is identical.
    """
    if ds <= 1:
        return x
    lead = x.shape[:-1]
    pairs = x.reshape(*lead, -1, ds, 2)
    return i16w(pairs.sum(axis=-2)).reshape(*lead, -1)


def remove_dc_int(x):
    """``remove_dc`` on one interleaved block (rtl_power.c:609-624): the
    component sum is divided — C truncation — by the INTERLEAVED length
    (the half-DC quirk), then subtracted from that component only.
    Applied to I then Q exactly like the C call pair (rtl_power.c:744-745).

    Valid while ``len * 32768 < 2**31`` (guarded by the caller) so the
    int32 component sum cannot overflow.
    """
    lead = x.shape[:-1]
    ln = x.shape[-1]
    pairs = x.reshape(*lead, -1, 2)

    def one(comp, full_len):
        s = comp.sum(axis=-1, keepdims=True)
        ave = i16w(jnp.sign(s) * (jnp.abs(s) // full_len))   # C truncation
        return jnp.where(ave == 0, comp, i16w(comp - ave))

    i = one(pairs[..., 0], ln)
    # the C's second call sees (data+1, len-1): sum over the same Q
    # samples, but divided by len-1
    q = one(pairs[..., 1], ln - 1)
    return jnp.stack([i, q], axis=-1).reshape(*lead, ln)


@partial(jax.jit, static_argnames=("bin_e", "ds", "peak_hold"))
def int_hop_segments(block, win_int, bin_e: int, ds: int,
                     peak_hold: bool = False):
    """One hop's reads -> per-segment ``|X|^2`` (segs, bin_len) int32,
    every stage bit-faithful (scanner, rtl_power.c:714-770, boxcar path).

    ``block``: (buf_len,) int16/int32 interleaved CS16.  The host
    accumulates the returned powers into int64 (exact; the per-segment
    power 2*32767^2 fits int32, sums may not).  ``win_int`` is the x256
    integer coefficient table (rtl_power.c:1034-1037).
    """
    bin_len = 1 << bin_e
    x = jnp.asarray(block, jnp.int32)
    eff = x.shape[-1] // ds
    assert eff * 32768 < 2**31, "interleaved length overflows int32 sums"
    x = boxcar_decim_int(x, ds)[..., :eff]
    x = remove_dc_int(x)
    segs = eff // (2 * bin_len)
    x = x[..., : segs * 2 * bin_len].reshape(segs, bin_len, 2)
    w = jnp.asarray(win_int, jnp.int32)[None, :, None]
    x = i16w(x * w)                       # (int16_t)(sample * coef): wraps
    re, im = fix_fft_batch(x[..., 0], x[..., 1], bin_e)
    return re * re + im * im              # < 2^31: exact in int32


def rms_power_int(block) -> int:
    """Giant-bin total power (``rms_power``, rtl_power.c:403-429), host
    side, exact: int64 sums, the C's float DC correction with round()."""
    b = np.asarray(block, np.int64)
    t = int(b.sum())
    p = int((b * b).sum())
    dc = float(t) / b.size
    err = t * 2 * dc - dc * dc * b.size
    return p - int(round(err))
