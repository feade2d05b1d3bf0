"""The opt-in integer spectral path is bit-exact vs the C model.

ops/intfft.py reproduces every integer quirk of rx_power's hot loop
(fix_fft Q14 rounding + per-stage >>1 + int16 wraps, the wrapping window
multiply, the half-DC remove_dc, the wrapping boxcar) — asserted EQUAL,
not SNR-bounded, against oracles.c_ref.scanner_segment
(rtl_power.c:714-770).
"""

import numpy as np
import pytest

from rx_tools_tpu.ops import intfft, windows
from oracles import c_ref


def _buf(n, amp, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(-amp, amp, n).astype(np.int32)


@pytest.mark.parametrize("m", [2, 4, 6, 8])
def test_fix_fft_batch_bit_exact(m):
    n = 1 << m
    buf = _buf(2 * n * 3, 32000, seed=m)          # 3 segments, full range
    segs = buf.reshape(3, n, 2)
    re, im = intfft.fix_fft_batch(segs[..., 0], segs[..., 1], m)
    re, im = np.asarray(re), np.asarray(im)
    for s in range(3):
        ref = c_ref.fix_fft(list(segs[s].reshape(-1)), m)
        np.testing.assert_array_equal(re[s], np.array(ref[0::2]))
        np.testing.assert_array_equal(im[s], np.array(ref[1::2]))


@pytest.mark.parametrize("bin_e,ds,window,peak", [
    (4, 1, "rectangle", False),
    (6, 1, "hamming", False),
    (8, 1, "blackman", False),
    (5, 4, "rectangle", False),
    (5, 2, "hann-poisson", True),
])
def test_int_hop_segments_bit_exact_vs_scanner(bin_e, ds, window, peak):
    bin_len = 1 << bin_e
    buf_len = max(2 * bin_len * ds * 4, 2 * bin_len * ds)   # >= 4 segments
    buf = _buf(buf_len, 3000, seed=bin_e * 10 + ds)
    win_fn = windows.WINDOWS[window]
    wc = c_ref.window_coefs_int(win_fn, bin_len)
    # oracle
    avg_ref, samples_ref = c_ref.scanner_segment(
        list(buf), bin_e, wc, ds=ds, boxcar=True, peak_hold=peak)
    # device path: per-segment powers -> host int64 accumulate
    p = np.asarray(intfft.int_hop_segments(buf, np.array(wc, np.int32),
                                           bin_e, ds), np.int64)
    if peak:
        avg = p.max(axis=0)
    else:
        avg = p.sum(axis=0)
    np.testing.assert_array_equal(avg, np.array(avg_ref, np.int64))
    assert p.shape[0] * ds == samples_ref


def test_rms_power_int_exact():
    buf = _buf(16384, 32000, seed=3)
    avg0, samples = c_ref.rms_power(list(buf))
    assert intfft.rms_power_int(buf) == avg0
    assert samples == 1


def test_window_multiply_wraps_like_c():
    """Full-scale samples x 256-coef windows overflow int16 — the C wraps
    (int16_t cast); the int path must too, not saturate."""
    bin_e, bin_len = 4, 16
    buf = np.full(2 * bin_len, 32000, np.int32)
    wc = c_ref.window_coefs_int(windows.WINDOWS["rectangle"], bin_len)
    avg_ref, _ = c_ref.scanner_segment(list(buf), bin_e, wc, ds=1)
    p = np.asarray(intfft.int_hop_segments(buf, np.array(wc, np.int32),
                                           bin_e, 1), np.int64).sum(axis=0)
    np.testing.assert_array_equal(p, np.array(avg_ref, np.int64))
