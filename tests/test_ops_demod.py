"""Golden tests: discriminators, detectors, scalar filters, resampler."""

import numpy as np
import jax.numpy as jnp

from rx_tools_tpu import ops
from rx_tools_tpu.ops.resample import ResampleState, resample_rational, resample_divisible
from oracles import c_ref
from util import snr_db, make_tone_cs16


def _iq(n, lo=-120, hi=120, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, size=2 * n).astype(np.int64)


def test_fm_discriminate_std_vs_oracle():
    blk = _iq(512, seed=7)
    ref, _ = c_ref.fm_demod(blk, 10, -5, custom_atan=0)
    prev = jnp.asarray([10.0, -5.0], jnp.float32)
    x = jnp.asarray(blk, jnp.float32).reshape(-1, 2)
    _, d = ops.fm_discriminate(prev, x, ops.DISC_STD)
    # oracle truncates to int; float path keeps fractions -> compare SNR
    assert snr_db(np.array(ref, np.float64), np.asarray(d)) > 40


def test_fm_discriminate_fast_vs_oracle():
    blk = _iq(512, seed=8)
    ref, _ = c_ref.fm_demod(blk, 0, 0, custom_atan=1)
    prev = jnp.zeros(2, jnp.float32)
    x = jnp.asarray(blk, jnp.float32).reshape(-1, 2)
    _, d = ops.fm_discriminate(prev, x, ops.DISC_FAST)
    assert snr_db(np.array(ref, np.float64), np.asarray(d)) > 35


def test_fm_discriminate_lut_bit_exact_vs_oracle():
    """DISC_LUT reproduces the reference's quantized LUT output bit-for-bit
    on integer inputs (rtl_fm.c:528-564), seam sample excluded (the seam
    uses std atan2 in both, but the oracle truncates it to int)."""
    blk = _iq(2048, seed=11)
    ref, _ = c_ref.fm_demod(blk, 10, -5, custom_atan=2)
    prev = jnp.asarray([10.0, -5.0], jnp.float32)
    x = jnp.asarray(blk, jnp.float32).reshape(-1, 2)
    _, d = ops.fm_discriminate(prev, x, ops.DISC_LUT)
    got = np.asarray(d)
    np.testing.assert_array_equal(got[1:], np.array(ref[1:], np.float64))
    assert abs(got[0] - ref[0]) < 1.0       # std seam: float vs int-trunc


def test_fm_discriminate_lut_bit_exact_at_full_lp_range():
    """LUT exactness holds at the reference's FULL lp range, not just the
    8-bit domain (advisor finding, round 2): a strong FM signal at
    amplitude ~8000 makes ``cr ~ |s|^2 ~ 2**27`` — beyond float32's 2**24
    integer-exact range, where f32 products can flip the truncating
    division by one LUT step — while the small per-sample phase steps keep
    ``|cj| <= 2**21``, the domain the reference itself assumes ("absolute
    maximum... 2097152", rtl_fm.c:548).  The dispatcher must therefore
    compute the products in int32."""
    rng = np.random.default_rng(12)
    n = 4096
    dphi = rng.uniform(-0.015, 0.015, n).cumsum()
    s = np.round(8000 * np.exp(1j * dphi)).astype(np.int64)
    blk = np.empty(2 * n, np.int64)
    blk[0::2], blk[1::2] = s.real.astype(np.int64), s.imag.astype(np.int64)
    # sanity: this scene is in the regime the test is about
    cr = blk[0::2][1:] * blk[0::2][:-1] + blk[1::2][1:] * blk[1::2][:-1]
    cj = blk[1::2][1:] * blk[0::2][:-1] - blk[0::2][1:] * blk[1::2][:-1]
    assert cr.max() > (1 << 24) and np.abs(cj).max() < (1 << 21)
    ref, _ = c_ref.fm_demod(blk, int(s[0].real), int(s[0].imag),
                            custom_atan=2)
    prev = jnp.asarray([float(s[0].real), float(s[0].imag)], jnp.float32)
    x = jnp.asarray(blk, jnp.float32).reshape(-1, 2)
    _, d = ops.fm_discriminate(prev, x, ops.DISC_LUT)
    got = np.asarray(d)
    np.testing.assert_array_equal(got[1:], np.array(ref[1:], np.float64))


def test_planar_discriminators_match_interleaved():
    """The planar discriminator twins (round-3 layout campaign) are exact
    reformulations: same outputs as the (K, 2) / (C, M, 2) paths for
    every mode, including the std-atan seam handling."""
    rng = np.random.default_rng(21)
    k = 257
    z = rng.normal(0, 800, (k, 2)).astype(np.float32)
    prev = jnp.asarray([13.0, -7.0], jnp.float32)
    for mode in (ops.DISC_STD, ops.DISC_FAST, ops.DISC_LUT, ops.DISC_ALE):
        p1, d1 = ops.fm_discriminate(prev, jnp.asarray(z), mode)
        p2, d2 = ops.fm_discriminate_planar(prev, jnp.asarray(z[:, 0]),
                                            jnp.asarray(z[:, 1]), mode)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        # seam_stride variant too
        p1, d1 = ops.fm_discriminate(prev, jnp.asarray(z), mode,
                                     seam_stride=64)
        p2, d2 = ops.fm_discriminate_planar(prev, jnp.asarray(z[:, 0]),
                                            jnp.asarray(z[:, 1]), mode,
                                            seam_stride=64)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    # batched twin
    zb = rng.normal(0, 800, (5, 129, 2)).astype(np.float32)
    prevb = jnp.asarray(rng.normal(0, 10, (5, 2)), jnp.float32)
    for mode in (ops.DISC_STD, ops.DISC_FAST, ops.DISC_LUT, ops.DISC_ALE):
        p1, d1 = ops.fm_discriminate_batch(prevb, jnp.asarray(zb), mode)
        p2, d2 = ops.fm_discriminate_batch_planar(
            prevb, jnp.asarray(zb[..., 0]), jnp.asarray(zb[..., 1]), mode)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_polar_disc_lut_quirks():
    """The LUT path's corner cases, each matched to the C control flow."""
    def both(ar, aj, br, bj):
        o = c_ref.polar_disc_lut(ar, aj, br, bj)
        cr = np.float32(ar * br + aj * bj)
        cj = np.float32(aj * br - ar * bj)
        g = float(np.asarray(ops.polar_disc_lut(jnp.float32(cr),
                                                jnp.float32(cj))))
        assert g == o, (ar, aj, br, bj, g, o)
        return o
    # x==0 quirk: tiny same-sign angle returns pi (1<<14), not ~0
    assert both(1000, 1, 1, 0) == 1 << 14        # c=(1000,1): rtl_fm.c:560
    assert both(1000, -1, 1, 0) == 0             # c=(1000,-1): -lut[0] == 0
    # special-case ladder (rtl_fm.c:535-546)
    assert both(0, 0, 0, 0) == 0
    assert both(0, 5, 1, 0) == 1 << 13           # cr==0, cj>0
    assert both(0, -5, 1, 0) == -(1 << 13)       # cr==0, cj<0
    assert both(7, 0, 1, 0) == 0                 # cj==0, cr>0
    assert both(-7, 0, 1, 0) == 1 << 14          # cj==0, cr<0
    # saturation: |x| >= table size -> +/-(1<<13)
    assert both(1, 600, 1, 0) == 1 << 13
    assert both(1, -600, 1, 0) == -(1 << 13)
    # all four quadrants away from the corners
    for a, b in [((30, 40), (5, 1)), ((-30, 40), (5, 1)),
                 ((-30, -40), (5, 1)), ((30, -40), (5, 1))]:
        both(a[0], a[1], b[0], b[1])


def test_fm_discriminate_esbensen_vs_oracle():
    # esbensen approximates w only for small per-sample phase steps; use a
    # clean slow tone rather than white noise
    cs = make_tone_cs16(512, fs=1_000_000, tone_hz=20_000, amp=0.8,
                        noise=0.0005, eight_bit=True)
    blk = cs.astype(np.int64)
    ref, _ = c_ref.fm_demod(blk, 0, 0, custom_atan=3)
    x = jnp.asarray(blk, jnp.float32).reshape(-1, 2)
    _, d = ops.fm_discriminate(jnp.zeros(2, jnp.float32), x, ops.DISC_ALE)
    assert snr_db(np.array(ref, np.float64), np.asarray(d)) > 25


def test_discriminate_state_carry():
    blk = _iq(128, seed=9).astype(np.float32)
    x = jnp.asarray(blk).reshape(-1, 2)
    p0 = jnp.asarray([3.0, 4.0], jnp.float32)
    _, d_full = ops.fm_discriminate(p0, x, ops.DISC_STD)
    p, d1 = ops.fm_discriminate(p0, x[:40], ops.DISC_STD)
    _, d2 = ops.fm_discriminate(p, x[40:], ops.DISC_STD)
    np.testing.assert_allclose(
        np.asarray(d_full), np.concatenate([np.asarray(d1), np.asarray(d2)]),
        rtol=1e-5, atol=1e-2)


def test_am_usb_lsb_vs_oracle():
    blk = _iq(256, seed=10)
    scale = 21  # output_scale for downsample=12: (1<<15)//(128*12)
    x = jnp.asarray(blk, jnp.float32).reshape(-1, 2)
    for mode, op, oracle in [
        ("am", ops.am_demod, c_ref.am_demod),
        ("usb", ops.usb_demod, c_ref.usb_demod),
        ("lsb", ops.lsb_demod, c_ref.lsb_demod),
    ]:
        ref = np.array(oracle(blk, scale), np.float64)
        got = np.asarray(op(x, scale))
        assert snr_db(ref, got) > 35, (mode, snr_db(ref, got))


def test_deemph_vs_oracle():
    rng = np.random.default_rng(11)
    audio = rng.integers(-8000, 8000, size=2048)
    a = ops.deemph_alpha(32000, 75)
    ref, _ = c_ref.deemph_filter(audio, a, avg=0)
    avg, got = ops.deemph_filter(jnp.zeros((), jnp.float32),
                                 jnp.asarray(audio, jnp.float32), a)
    assert snr_db(np.array(ref, np.float64), np.asarray(got)) > 35


def test_deemph_alpha_values():
    # rtl_fm.c:1412 for wbfm: rate_out 170000, us 75us
    assert ops.deemph_alpha(170000, 75) == 13
    assert ops.deemph_alpha(32000, 75) == 3
    assert ops.deemph_alpha(170000, 50) == 9


def test_deemph_state_carry():
    x = jnp.asarray(np.random.default_rng(2).normal(0, 100, 512), jnp.float32)
    a = 13
    avg, y_full = ops.deemph_filter(jnp.zeros((), jnp.float32), x, a)
    avg2, y1 = ops.deemph_filter(jnp.zeros((), jnp.float32), x[:200], a)
    _, y2 = ops.deemph_filter(avg2, x[200:], a)
    np.testing.assert_allclose(
        np.asarray(y_full), np.concatenate([np.asarray(y1), np.asarray(y2)]),
        rtol=1e-4, atol=1e-2)


def test_dc_blocks_vs_oracle():
    blk = _iq(256, lo=-100, hi=140, seed=12)
    ref, ri, rq = c_ref.dc_block_raw(blk, 0, 0)
    dc, got = ops.dc_block_raw(jnp.zeros(2, jnp.float32),
                               jnp.asarray(blk, jnp.float32).reshape(-1, 2))
    assert snr_db(np.array(ref, np.float64), np.asarray(got).reshape(-1)) > 30
    assert abs(float(dc[0]) - ri) <= 1.0 and abs(float(dc[1]) - rq) <= 1.0

    audio = _iq(128, lo=-3000, hi=5000, seed=13)[:128]
    refa, ra = c_ref.dc_block_audio(audio, 0)
    dca, gota = ops.dc_block_audio(jnp.zeros((), jnp.float32),
                                   jnp.asarray(audio, jnp.float32))
    assert snr_db(np.array(refa, np.float64), np.asarray(gota)) > 30
    assert abs(float(dca) - ra) <= 1.0


def test_rms_vs_oracle():
    blk = _iq(512, seed=14)
    ref = c_ref.rms(blk, 1)
    got = float(ops.rms_level(jnp.asarray(blk, jnp.float32).reshape(-1, 2)))
    assert abs(got - ref) <= max(2.0, 0.01 * ref)


def test_resample_rational_positions_and_values():
    """170k -> 32k: alternating 5/6-sample windows, divisor 5 (rtl_fm quirk)."""
    fast, slow = 170000, 32000
    rng = np.random.default_rng(15)
    audio = rng.integers(-10000, 10000, size=1024)
    ref, _ = c_ref.low_pass_real(audio, fast, slow)
    st = ResampleState.init()
    st, y, nv = resample_rational(st, jnp.asarray(audio, jnp.float32), fast, slow)
    got = np.asarray(y)[: int(nv)]
    assert len(got) == len(ref)
    assert snr_db(np.array(ref, np.float64), got) > 35


def test_resample_rational_carry():
    fast, slow = 170000, 32000
    rng = np.random.default_rng(16)
    audio = rng.integers(-10000, 10000, size=600)
    ref, _ = c_ref.low_pass_real(audio, fast, slow)
    st = ResampleState.init()
    outs = []
    for a, b in [(0, 101), (101, 333), (333, 600)]:
        st, y, nv = resample_rational(st, jnp.asarray(audio[a:b], jnp.float32),
                                      fast, slow)
        outs.append(np.asarray(y)[: int(nv)])
    got = np.concatenate(outs)
    assert len(got) == len(ref)
    assert snr_db(np.array(ref, np.float64), got) > 35


def test_resample_divisible():
    x = jnp.arange(20.0)
    y = resample_divisible(x, 160000, 32000)
    np.testing.assert_allclose(np.asarray(y), np.arange(20).reshape(4, 5).mean(1))


def test_deemph_blocks_bitwise_equals_sequential():
    """Round-5: ops.filters.deemph_blocks == M sequential deemph_filter
    calls BIT-for-bit on the MXU scan path (forced on CPU via the test
    hook) — the scan engine's batched tail depends on this identity."""
    from rx_tools_tpu.ops import filters as fl
    import jax.numpy as jnp
    rng = np.random.default_rng(23)
    old = fl._MXU_FORCE
    fl._MXU_FORCE = True
    try:
        for m, k, a in ((5, 1536, 7), (3, 1280, 46), (4, 1000, 7)):
            x = rng.normal(0, 9000, (m, k)).astype(np.float32)
            avg0 = jnp.float32(rng.normal() * 50)
            avg_s = avg0
            ys = []
            for i in range(m):
                avg_s, y = fl.deemph_filter(avg_s, jnp.asarray(x[i]), a)
                ys.append(np.asarray(y))
            avg_b, yb = fl.deemph_blocks(avg0, jnp.asarray(x), a)
            np.testing.assert_array_equal(np.stack(ys), np.asarray(yb),
                                          err_msg=f"m={m} k={k} a={a}")
            np.testing.assert_array_equal(np.asarray(avg_s),
                                          np.asarray(avg_b))
    finally:
        fl._MXU_FORCE = old
