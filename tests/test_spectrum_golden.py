"""rx_power compute path vs the bit-faithful C oracles: the float batched
FFT must match fix_fft's integrated spectrum within the oracle's own int16
truncation noise, and the sweep planner must reproduce frequency_range's
hop/bin arithmetic exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from rx_tools_tpu import ops
from rx_tools_tpu.models import powerscan
from rx_tools_tpu.models.power_plan import plan_sweep, MAXIMUM_RATE, MINIMUM_RATE
from oracles import c_ref
from util import snr_db


def _tone_iq(n, fs, f0, amp=60.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    z = amp * np.exp(2j * np.pi * f0 * t) + rng.normal(0, 1.0, n)
    iq = np.empty(2 * n, np.int16)
    iq[0::2] = np.round(np.real(z)).astype(np.int16)
    iq[1::2] = np.round(np.imag(z)).astype(np.int16)
    return iq


@pytest.mark.parametrize("window", ["rectangle", "hamming", "blackman-harris"])
def test_power_spectrum_matches_fix_fft(window):
    bin_e, segs = 6, 8
    bin_len = 1 << bin_e
    n = bin_len * segs
    iq = _tone_iq(n, 1.0, 10.5 / bin_len)   # tone between bins + noise

    # oracle: int windows, fix_fft, |X|^2 accumulate
    wc = c_ref.window_coefs_int(
        lambda i, ln: float(ops.window(window, ln, np.float64)[int(i)]), bin_len)
    avg_ref, samples_ref = c_ref.scanner_segment(iq, bin_e, wc, ds=1)

    # float path (input arrives as +-128-range floats: iq already there)
    x = jnp.asarray(iq, jnp.float32).reshape(-1, 2)
    x = x.reshape(segs, bin_len, 2)
    win = jnp.asarray(ops.window(window, bin_len))
    avg, samples = __import__("rx_tools_tpu.ops.spectrum", fromlist=["x"]) \
        .segmented_power_spectrum(x, win, jnp.zeros(bin_len, jnp.float32),
                                  jnp.int32(0), 1)
    avg = np.asarray(avg, np.float64)
    ref = np.array(avg_ref, np.float64)
    assert int(samples) == samples_ref
    # compare in dB domain over bins with meaningful power
    mask = ref > ref.max() * 1e-6
    s = snr_db(ref[mask], avg[mask])
    assert s > 20, (window, s)
    # the peak bin must agree exactly
    assert np.argmax(ref) == np.argmax(avg)


def test_csv_dbm_quirks_match_oracle():
    rng = np.random.default_rng(1)
    bin_e = 5
    avg = rng.integers(1, 10**9, 1 << bin_e).astype(np.float64)
    ref = c_ref.csv_dbm(list(avg.astype(int)), bin_e, rate=1_000_000,
                        samples=32, crop=0.25, freq=100_000_000, downsample=1)
    cfg = powerscan.PowerConfig(bin_e=bin_e, downsample=1)
    got = powerscan.csv_row_values(avg, 32, cfg, 100_000_000, 1_000_000, 0.25)
    assert got[0] == ref[0] and got[1] == ref[1]          # freq bounds
    assert abs(got[2] - ref[2]) < 1e-9                    # hz_step
    np.testing.assert_allclose(got[4], ref[4], rtol=1e-9) # dbm incl. dup bin
    assert len(got[4]) == len(ref[4])


# ---------------------------------------------------------------------------
# planner golden: hand-derived from frequency_range (rtl_power.c:431-543)
# ---------------------------------------------------------------------------

def test_plan_fm_band():
    """-f 88M:108M:125k: 8 hops of 2.5 MHz, 32 bins each (78.1 kHz bins)."""
    tunes = plan_sweep(88e6, 108e6, 125e3)
    assert len(tunes) == 8
    t = tunes[0]
    assert t.rate == 2_500_000
    assert t.bin_e == 5 and t.bin_len == 32
    assert t.downsample == 1
    # hop centers: lower + i*bw + bw/2
    assert t.freq == 88_000_000 + 1_250_000
    assert tunes[-1].freq == 88_000_000 + 7 * 2_500_000 + 1_250_000


def test_plan_narrow_span_downsamples():
    """Span below MINIMUM_RATE: one oversampled hop with decimation."""
    tunes = plan_sweep(100e6, 100.1e6, 1e3)   # 100 kHz span
    assert len(tunes) == 1
    t = tunes[0]
    assert t.downsample == MAXIMUM_RATE // 100_000
    assert t.rate == 100_000 * t.downsample
    bin_size = t.rate / (t.bin_len * t.downsample)
    assert bin_size <= 1e3


def test_plan_giant_bins():
    """max_size >= 1 MHz: total-power path, bin_e=0, crop forced off."""
    tunes = plan_sweep(100e6, 1e9, 1e6, crop=0.3)
    t = tunes[0]
    assert t.bin_e == 0
    assert t.crop == 0.0
    assert len(tunes) == (1_000_000_000 - 100_000_000) // 1_000_000


def test_plan_wide_survey():
    """-f 100M:1G:1M giant-bin example from the usage text."""
    tunes = plan_sweep(100e6, 1e9, 12_500)
    # 900 MHz span: ceil to hops of <= 2.8M usable
    assert len(tunes) >= 900_000_000 // MAXIMUM_RATE
    assert all(t.rate <= MAXIMUM_RATE for t in tunes)
    assert all(t.rate >= MINIMUM_RATE for t in tunes)
