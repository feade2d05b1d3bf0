"""Differential fuzz of the rx_power surface (round-3 verdict #8).

Four seeded axes over the reference's getopt space
(``rtl_power.c:848-932``) — >= 100 sampled configs total, CI-budgeted:

1. planner invariants: ~60 random ``lo:hi:max_bin`` x crop x -F ranges
   through ``plan_sweep`` (the integer-faithful ``frequency_range`` port,
   rtl_power.c:431-543), asserting every structural guarantee the C
   makes (rate bounds, bin_e ceiling, giant-bin path shape, power-of-2
   downsampling under -F, span coverage);
2. scanner + CSV vs the bit-faithful oracle: random bin_e x window x
   boxcar-ds x -P x crop hops, float engine vs ``c_ref.scanner_segment``
   + ``c_ref.csv_dbm`` at the established int-truncation SNR floor, with
   exact peak-bin / samples / CSV-geometry agreement;
3. fidelity tiers: the same random hops through the ``--int-fft`` device
   plane — bit-exact vs the oracle — and cross-checked against the float
   tier at the documented tolerance;
4. -t hop sharding: random sweeps, sharded == unsharded accumulators.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rx_tools_tpu import ops
from rx_tools_tpu.models import powerscan
from rx_tools_tpu.models.power_plan import (plan_sweep, MAXIMUM_RATE,
                                            MINIMUM_RATE)
from rx_tools_tpu.ops.windows import WINDOWS
from oracles import c_ref
from util import snr_db

N_PLAN = 60
N_SCAN = 24
N_TIER = 12
N_SHARD = 8


def test_fuzz_plan_invariants():
    """Random ranges: every plan satisfies the C's structural contract."""
    rng = np.random.default_rng(41)
    tried = 0
    while tried < N_PLAN:
        lo = int(rng.integers(1, 2000)) * 1_000_000
        span = int(rng.choice([1, 2, 5, 8, 20, 100, 400, 1500])) * 1_000_000
        span = max(span, 100_000)
        max_bin = float(rng.choice([1, 10, 100, 1_000, 10_000, 125_000,
                                    1_000_000, 2_000_000]))
        crop = float(rng.choice([0.0, 0.2, 0.5]))
        boxcar = bool(rng.integers(0, 2))
        # the planner refuses bins that would need > 2^21 FFT points
        if (span <= MAXIMUM_RATE and max_bin < span / (1 << 21)):
            tried += 1
            continue
        try:
            tunes = plan_sweep(lo, lo + span, max_bin, crop, boxcar=boxcar)
        except ValueError:
            # the C would allocate > MAX_TUNES or an over-large FFT; a
            # loud refusal is the framework's documented behavior
            tried += 1
            continue
        tried += 1
        assert 1 <= len(tunes) <= 10_000
        for t in tunes:
            assert t.rate <= MAXIMUM_RATE
            assert 0 <= t.bin_e <= 21
            assert t.buf_len > 0 and t.buf_len % 2 == 0
            if t.bin_e == 0:
                # giant-bin path: one pooled bin, no crop
                # (rtl_power.c:493-499)
                assert t.crop == 0.0
                assert t.downsample == 1
            else:
                # bin width respects -f's max_bin — except when the C's
                # 2^21-point FFT ceiling binds (rtl_power.c:485-491)
                assert (t.rate / (t.bin_len * t.downsample)
                        <= max_bin * (1 + 1e-9)) or t.bin_e == 21
            if not boxcar and t.downsample > 1:
                # -F: power-of-2 decimation via fifth-order passes
                assert t.downsample == 1 << t.downsample_passes
        if len(tunes) > 1:
            # hops tile the span: uniform per-hop bandwidth, ordered
            # centers (rtl_power.c:456-472)
            bw = span / len(tunes)
            assert bw >= MINIMUM_RATE - 1 or len(tunes) == 1
            centers = [t.freq for t in tunes]
            assert centers == sorted(centers)
            expect0 = lo + bw / 2.0
            assert abs(centers[0] - expect0) <= bw


def _tone_block(rng, n, bin_len, amp):
    f0 = float(rng.uniform(0.5, bin_len / 2 - 1)) / bin_len
    t = np.arange(n)
    z = amp * np.exp(2j * np.pi * f0 * t) + rng.normal(0, 1.0, (n,))
    iq = np.empty(2 * n, np.int16)
    iq[0::2] = np.round(np.real(z)).astype(np.int16)
    iq[1::2] = np.round(np.imag(z)).astype(np.int16)
    return iq


def _rand_hop(rng):
    bin_e = int(rng.integers(4, 10))
    ds = int(rng.choice([1, 1, 2, 4]))
    segs = int(rng.integers(2, 5))
    window = str(rng.choice(list(WINDOWS)))
    peak = bool(rng.integers(0, 2))
    crop = float(rng.choice([0.0, 0.0, 0.2, 0.3]))
    # boxcar sums ds samples then the oracle multiplies by a x256 window
    # in int16: amp*ds*256 must stay below 32767 (the reference's own
    # wrap hazard)
    amp = 24.0 / ds
    n = (1 << bin_e) * ds * segs
    iq = _tone_block(rng, n, 1 << bin_e, amp)
    return bin_e, ds, segs, window, peak, crop, iq


def test_fuzz_scanner_csv_vs_oracle():
    rng = np.random.default_rng(42)
    for trial in range(N_SCAN):
        bin_e, ds, segs, window, peak, crop, iq = _rand_hop(rng)
        ctx = f"trial {trial}: bin_e={bin_e} ds={ds} segs={segs} " \
              f"w={window} P={peak} crop={crop}"
        wc = c_ref.window_coefs_int(
            lambda i, ln: float(ops.window(window, ln,
                                           np.float64)[int(i)]),
            1 << bin_e)
        ref, samples_ref = c_ref.scanner_segment(
            iq, bin_e, wc, ds=ds, boxcar=True, peak_hold=peak)

        cfg = powerscan.PowerConfig(bin_e=bin_e, downsample=ds,
                                    window=window, peak_hold=peak,
                                    buf_len=2 * iq.size // 2)
        block = (iq.astype(np.int32) * 256).astype(np.int16)
        avg, samples = powerscan.power_hop_step(
            cfg, jnp.zeros(cfg.bin_len, jnp.float32), jnp.int32(0),
            jnp.asarray(block))
        avg = np.asarray(avg, np.float64)
        ref_a = np.array(ref, np.float64)
        assert int(samples) == samples_ref, ctx
        assert np.argmax(ref_a) == np.argmax(avg), ctx
        mask = ref_a > ref_a.max() * 1e-6
        s = snr_db(ref_a[mask], avg[mask])
        assert s > 13, (ctx, s)

        # CSV geometry must agree EXACTLY with the oracle's csv_dbm on
        # the same accumulators (fftshift/DC-nuke/crop/dup-bin quirks)
        freq, rate = 100_000_000, (1 << bin_e) * ds * 1000
        lo_r, hi_r, step_r, s_r, dbms_r = c_ref.csv_dbm(
            [int(round(v)) for v in ref_a], bin_e, rate, samples_ref,
            crop, freq, ds)
        lo_g, hi_g, step_g, s_g, dbms_g = powerscan.csv_row_values(
            np.round(ref_a), int(samples), cfg, freq, rate, crop)
        assert (lo_g, hi_g) == (lo_r, hi_r), ctx
        assert abs(step_g - step_r) < 1e-9, ctx
        assert s_g == s_r and len(dbms_g) == len(dbms_r), ctx
        for a, b in zip(dbms_g, dbms_r):
            if np.isfinite(b):
                assert abs(a - b) < 1e-6, ctx


def test_fuzz_int_tier_bit_exact_and_cross_tier():
    """--int-fft device plane: bit-exact vs the oracle on random hops,
    and within the documented SNR floor of the float tier."""
    rng = np.random.default_rng(43)
    for trial in range(N_TIER):
        bin_e, ds, segs, window, peak, crop, iq = _rand_hop(rng)
        ctx = f"trial {trial}: bin_e={bin_e} ds={ds} segs={segs} w={window}"
        wc = c_ref.window_coefs_int(
            lambda i, ln: float(ops.window(window, ln,
                                           np.float64)[int(i)]),
            1 << bin_e)
        ref, _ = c_ref.scanner_segment(iq, bin_e, wc, ds=ds, boxcar=True)

        cfg = powerscan.PowerConfig(bin_e=bin_e, downsample=ds,
                                    window=window, buf_len=iq.size)
        p = np.asarray(powerscan.int_sweep_powers(
            cfg, iq[None, :]), np.int64)          # (1, segs, bin_len)
        got = p.sum(axis=1)[0]
        assert np.array_equal(got, np.array(ref, np.int64)), ctx

        # cross-tier: float plane on the same hop, rescaled input
        block = (iq.astype(np.int32) * 256).astype(np.int16)
        favg, _ = powerscan.power_hop_step(
            cfg, jnp.zeros(cfg.bin_len, jnp.float32), jnp.int32(0),
            jnp.asarray(block))
        favg = np.asarray(favg, np.float64)
        ref_a = np.array(ref, np.float64)
        mask = ref_a > ref_a.max() * 1e-6
        assert snr_db(ref_a[mask], favg[mask]) > 13, ctx


def test_fuzz_hop_sharding_matches_unsharded():
    from rx_tools_tpu.parallel import make_mesh, hop_sharded_sweep
    rng = np.random.default_rng(44)
    for trial in range(N_SHARD):
        bin_e = int(rng.integers(4, 8))
        h = int(rng.choice([4, 8, 16]))
        ndev = int(rng.choice([d for d in (2, 4, 8) if h % d == 0]))
        segs = int(rng.integers(1, 4))
        n = (1 << bin_e) * segs
        blocks = rng.integers(-3000, 3000, (h, 2 * n)).astype(np.int16)
        cfg = powerscan.PowerConfig(bin_e=bin_e, downsample=1,
                                    buf_len=2 * n)
        mesh = make_mesh(ndev, axis="h")
        acc = powerscan.new_sweep_accum(h, cfg)
        sh = hop_sharded_sweep(cfg, acc, blocks, mesh)
        un = powerscan.sweep_step(cfg, powerscan.new_sweep_accum(h, cfg),
                                  jnp.asarray(blocks))
        np.testing.assert_allclose(np.asarray(sh.avg), np.asarray(un.avg),
                                   rtol=1e-6, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(np.asarray(sh.samples),
                                      np.asarray(un.samples))
