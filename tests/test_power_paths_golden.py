"""Golden tests for the rx_power paths not covered by test_spectrum_golden:
the recursive fifth-order decimation (-F) hop, peak hold (-P), and the
giant-bin total-power path (bin_e == 0) — each vs the bit-faithful oracle
(src/rtl_power.c:582-607,626-654 / :763-768 / :403-429)."""

import numpy as np
import jax.numpy as jnp

from rx_tools_tpu import ops
from rx_tools_tpu.models import powerscan
from oracles import c_ref
from util import snr_db


def _tone_iq(n, f0, amp=60.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    z = amp * np.exp(2j * np.pi * f0 * t) + rng.normal(0, 1.0, n)
    iq = np.empty(2 * n, np.int16)
    iq[0::2] = np.round(np.real(z)).astype(np.int16)
    iq[1::2] = np.round(np.imag(z)).astype(np.int16)
    return iq


def _run_hop(cfg, iq8):
    """power_hop_step on a ±128-range block (scaled up to raw CS16)."""
    block = (iq8.astype(np.int32) * 256).astype(np.int16)
    avg, samples = powerscan.power_hop_step(
        cfg, jnp.zeros(cfg.bin_len, jnp.float32), jnp.int32(0),
        jnp.asarray(block))
    return np.asarray(avg, np.float64), int(samples)


def test_recursive_decimation_hop_matches_oracle():
    """-F 9 path: fifth_order x passes + droop FIR before the FFT
    (rtl_power.c:734-743), float chain vs int oracle."""
    bin_e, ds_p, segs = 6, 2, 4
    bin_len, ds = 1 << bin_e, 1 << 2
    n = bin_len * ds * segs
    # the fifth-order cascade has gain 2 per pass; amp*4*256 must stay below
    # int16 for the oracle's window multiply (the reference's own wrap
    # hazard, see ops/spectrum.py docstring) => amp <= ~30
    iq = _tone_iq(n, 5.3 / (bin_len * ds), amp=25.0)   # in-band after decim

    wc = c_ref.window_coefs_int(lambda i, ln: 1.0, bin_len)
    ref, samples_ref = c_ref.scanner_segment(
        iq, bin_e, wc, ds=ds, ds_p=ds_p, boxcar=False, comp_fir_size=9)

    cfg = powerscan.PowerConfig(bin_e=bin_e, downsample=ds,
                                downsample_passes=ds_p, boxcar=False,
                                comp_fir_size=9, buf_len=2 * n)
    avg, samples = _run_hop(cfg, iq)
    ref = np.array(ref, np.float64)
    assert samples == samples_ref
    assert np.argmax(ref) == np.argmax(avg)
    mask = ref > ref.max() * 1e-6
    # floor: the oracle's own >>4-per-pass int16 truncation (measured 28.3 dB
    # on this geometry); assert with ~2x margin below the measurement
    s = snr_db(ref[mask], avg[mask])
    assert s > 13, s


def test_peak_hold_matches_oracle():
    """-P: per-bin max instead of accumulate (rtl_power.c:763-768)."""
    bin_e, segs = 5, 6
    bin_len = 1 << bin_e
    n = bin_len * segs
    iq = _tone_iq(n, 4.0 / bin_len, seed=3)

    wc = c_ref.window_coefs_int(lambda i, ln: 1.0, bin_len)
    ref, _ = c_ref.scanner_segment(iq, bin_e, wc, ds=1, peak_hold=True)

    cfg = powerscan.PowerConfig(bin_e=bin_e, peak_hold=True, buf_len=2 * n)
    avg, _ = _run_hop(cfg, iq)
    ref = np.array(ref, np.float64)
    assert np.argmax(ref) == np.argmax(avg)
    mask = ref > ref.max() * 1e-6
    s = snr_db(ref[mask], avg[mask])
    assert s > 20, s


def test_giant_bin_total_power_matches_rms_power():
    """bin_e == 0 (bins >= 1 MHz): pooled sum-of-squares with DC correction
    (rms_power, rtl_power.c:403-429)."""
    rng = np.random.default_rng(7)
    n = 4096
    iq = np.clip(rng.normal(12.0, 40.0, 2 * n), -127, 127).astype(np.int16)  # deliberate DC

    avg0, samples_ref = c_ref.rms_power(list(iq))

    cfg = powerscan.PowerConfig(bin_e=0, buf_len=2 * n)
    avg, samples = _run_hop(cfg, iq)
    assert samples == samples_ref == 1
    rel = abs(avg[0] - avg0) / abs(avg0)
    assert rel < 1e-5, (avg[0], avg0)


def test_giant_bin_peak_hold():
    """bin_e == 0 with -P takes the max across reads (rtl_power.c:421-426)."""
    rng = np.random.default_rng(9)
    n = 1024
    cfg = powerscan.PowerConfig(bin_e=0, peak_hold=True, buf_len=2 * n)
    avg = jnp.zeros(1, jnp.float32)
    samples = jnp.int32(0)
    powers = []
    for amp in (10.0, 80.0, 30.0):
        iq8 = np.clip(rng.normal(0, amp, 2 * n), -127, 127).astype(np.int16)
        block = (iq8.astype(np.int32) * 256).astype(np.int16)
        avg, samples = powerscan.power_hop_step(cfg, avg, samples,
                                                jnp.asarray(block))
        p0, _ = c_ref.rms_power(list(iq8))
        powers.append(p0)
    assert int(samples) == 3
    rel = abs(float(avg[0]) - max(powers)) / max(powers)
    assert rel < 1e-5
