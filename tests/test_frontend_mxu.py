"""MXU frontend / filterbank formulations match the reference formulations.

The matmul variants (ops/frontend_mxu.py, models/pfb.py::filterbank_mxu)
re-express the fused capture head and the PFB back half as MXU matrix
products (docs/PERF.md round-3 campaign).  At Precision.HIGHEST they must
reproduce the elementwise/conv formulations up to f32 sum reassociation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rx_tools_tpu.ops import frontend_mxu, pallas_frontend


def _blk(rng, n_iq):
    return rng.integers(-32000, 32000, 2 * n_iq).astype(np.int16)


@pytest.mark.parametrize("d", [14, 4, 8, 5, 7])
@pytest.mark.parametrize("rotate", [True, False])
def test_mm_matches_planar(d, rotate):
    rng = np.random.default_rng(d + rotate)
    n = d * 32 * 9                    # K = 288 = 32*9
    blk = _blk(rng, n)
    zi0, zq0 = pallas_frontend.capture_frontend_planar(blk, d, rotate)
    zi1, zq1 = frontend_mxu.capture_frontend_mm(blk, d, rotate)
    tol = dict(rtol=2e-5, atol=5e-3)
    np.testing.assert_allclose(zi1, zi0, **tol)
    np.testing.assert_allclose(zq1, zq0, **tol)


@pytest.mark.parametrize("variant", ["t2", "conv"])
def test_thin_variants_match_planar(variant):
    rng = np.random.default_rng(3)
    d = 14
    n = d * 100
    blk = _blk(rng, n)
    zi0, zq0 = pallas_frontend.capture_frontend_planar(blk, d, True)
    fn = {"t2": frontend_mxu.capture_frontend_t2,
          "conv": frontend_mxu.capture_frontend_conv}[variant]
    zi1, zq1 = fn(blk, d, True)
    tol = dict(rtol=2e-5, atol=5e-3)
    assert zi1.shape == zq1.shape == zi0.shape
    np.testing.assert_allclose(zi1, zi0, **tol)
    np.testing.assert_allclose(zq1, zq0, **tol)


def test_mm_fallback_odd_k():
    # K with no usable phase-block divisor falls back to the masked path
    rng = np.random.default_rng(5)
    d = 14
    n = d * 33                        # K = 33 (odd)
    blk = _blk(rng, n)
    zi0, zq0 = pallas_frontend.capture_frontend_planar(blk, d, True)
    zi1, zq1 = frontend_mxu.capture_frontend_mm(blk, d, True)
    np.testing.assert_array_equal(np.asarray(zi1), np.asarray(zi0))
    np.testing.assert_array_equal(np.asarray(zq1), np.asarray(zq0))


@pytest.mark.parametrize("k", [18432, 18728])
def test_mm_bench_geometry_exactness_class(k):
    # per-block K at the two bench geometries: 18432 = 2^11*9 (the current
    # 258048-sample block, P=32) and the old 18728 = 8*2341 (P=8); error
    # stays in the reassociation class (~1e-4 at 8-bit scale) that every
    # golden chain tolerance already absorbs
    rng = np.random.default_rng(7)
    d = 14
    n = d * k
    blk = _blk(rng, n)
    assert frontend_mxu._pick_p(k, d, True) == (32 if k == 18432 else 8)
    zi0, zq0 = pallas_frontend.capture_frontend_planar(blk, d, True)
    zi1, zq1 = frontend_mxu.capture_frontend_mm(blk, d, True)
    assert np.max(np.abs(np.asarray(zi1) - np.asarray(zi0))) < 5e-3
    assert np.max(np.abs(np.asarray(zq1) - np.asarray(zq0))) < 5e-3


@pytest.mark.parametrize("k,p", [(32 * 128, 32),   # rows % tile_rows == 0
                                 (32 * 200, 32),   # ragged: 200 % 128 != 0
                                 (8 * 5, 8)])      # tiny single ragged tile
def test_mm_pallas_interpret_matches_planar(k, p):
    """The fused-convert Pallas kernel (round-3 production frontend; now
    the RX_FE=pallas alternative after round-4's XLA-dot inversion)
    exercised via the interpreter so CPU CI covers the kernel: fused
    scale, grid masking, ragged last tile (advisor finding, round 3)."""
    rng = np.random.default_rng(17)
    d = 14
    blk = _blk(rng, d * k)
    zi0, zq0 = pallas_frontend.capture_frontend_planar(blk, d, True)
    zi1, zq1 = frontend_mxu.capture_frontend_mm_pallas(
        blk, d, True, p=p, interpret=True)
    assert zi1.shape == zi0.shape and zq1.shape == zq0.shape
    tol = dict(rtol=2e-5, atol=5e-3)
    np.testing.assert_allclose(zi1, zi0, **tol)
    np.testing.assert_allclose(zq1, zq0, **tol)


def test_pfb_filterbank_mxu_matches_conv():
    from rx_tools_tpu.models import pfb
    cfg = pfb.PfbConfig(capture_rate=2_400_000, n_channels=16,
                        taps_per_branch=8)
    rng = np.random.default_rng(11)
    st = pfb.init_state(cfg)
    tail = jnp.asarray(
        rng.integers(-100, 100, st.tail.shape).astype(np.float32))
    blk = _blk(rng, cfg.n_channels * 64)
    t0, zi0, zq0 = pfb.filterbank(cfg, tail, blk)
    t1, zi1, zq1 = pfb.filterbank_mxu(cfg, tail, blk)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0),
                               rtol=1e-6, atol=1e-6)
    scale = float(np.max(np.abs(np.asarray(zi0)))) + 1.0
    np.testing.assert_allclose(np.asarray(zi1), np.asarray(zi0),
                               rtol=1e-4, atol=1e-4 * scale)
    np.testing.assert_allclose(np.asarray(zq1), np.asarray(zq0),
                               rtol=1e-4, atol=1e-4 * scale)


def test_pfb_filterbank_mxu_chains_blocks():
    # carried tail across consecutive blocks: mxu == conv on block 2 too
    from rx_tools_tpu.models import pfb
    cfg = pfb.PfbConfig(capture_rate=2_400_000, n_channels=8,
                        taps_per_branch=4)
    rng = np.random.default_rng(13)
    st = pfb.init_state(cfg)
    b1, b2 = _blk(rng, 8 * 32), _blk(rng, 8 * 32)
    ta, ia, qa = pfb.filterbank(cfg, st.tail, b1)
    tb, ib, qb = pfb.filterbank(cfg, ta, b2)
    tc, ic, qc = pfb.filterbank_mxu(cfg, st.tail, b1)
    td, id_, qd = pfb.filterbank_mxu(cfg, tc, b2)
    scale = float(np.max(np.abs(np.asarray(ib)))) + 1.0
    np.testing.assert_allclose(np.asarray(id_), np.asarray(ib),
                               rtol=1e-4, atol=1e-4 * scale)
    np.testing.assert_allclose(np.asarray(qd), np.asarray(qb),
                               rtol=1e-4, atol=1e-4 * scale)


def test_mm_i8_split_integer_exact():
    """The (rejected-for-speed) int8-split dot is kept as an
    integer-exactness reference: its int32 accumulation must reproduce
    the exact integer mask sums at full int16 range."""
    rng = np.random.default_rng(23)
    d = 14
    blk = rng.integers(-32768, 32767, 2 * d * 32 * 24).astype(np.int16)
    zi0, zq0 = pallas_frontend.capture_frontend_planar(blk, d, True)
    zi1, zq1 = frontend_mxu.capture_frontend_mm_i8(blk, d, True)
    tol = dict(rtol=2e-5, atol=5e-3)
    np.testing.assert_allclose(zi1, zi0, **tol)
    np.testing.assert_allclose(zq1, zq0, **tol)
    # integer exactness: un-scaling recovers exact integers
    scale = 128.0 / 32767.0
    v = np.asarray(zi1, np.float64) / scale
    np.testing.assert_allclose(v, np.round(v), atol=1e-6)


def test_mm_pallas2_two_output_matches_planar():
    """The two-output kernel variant (rejected in-chain, kept as an A/B
    reference) stays correct, via the interpreter."""
    rng = np.random.default_rng(29)
    d = 14
    blk = rng.integers(-32000, 32000, 2 * d * 32 * 130).astype(np.int16)
    zi0, zq0 = pallas_frontend.capture_frontend_planar(blk, d, True)
    zi1, zq1 = frontend_mxu.capture_frontend_mm_pallas2(
        blk, d, True, interpret=True)
    tol = dict(rtol=2e-5, atol=5e-3)
    np.testing.assert_allclose(zi1, zi0, **tol)
    np.testing.assert_allclose(zq1, zq0, **tol)


def test_mm_i16_integer_exact():
    """Round-5 probe: the raw-int16 dot with int32 accumulation must be
    integer-exact against the mask sums at full int16 range (no converted
    f32 intermediate exists on this path)."""
    rng = np.random.default_rng(29)
    d = 14
    blk = rng.integers(-32768, 32767, 2 * d * 32 * 24).astype(np.int16)
    zi0, zq0 = pallas_frontend.capture_frontend_planar(blk, d, True)
    zi1, zq1 = frontend_mxu.capture_frontend_mm_i16(blk, d, True)
    tol = dict(rtol=2e-5, atol=5e-3)
    np.testing.assert_allclose(zi1, zi0, **tol)
    np.testing.assert_allclose(zq1, zq0, **tol)
    scale = 128.0 / 32767.0
    v = np.asarray(zi1, np.float64) / scale
    np.testing.assert_allclose(v, np.round(v), atol=1e-6)


def test_mm_bf16_probe_shape_and_class():
    """The bf16 traffic probe is approximate by design (8 mantissa bits);
    it must still land within bf16-class error of the exact frontend."""
    rng = np.random.default_rng(31)
    d = 14
    blk = rng.integers(-2000, 2000, 2 * d * 32 * 24).astype(np.int16)
    zi0, zq0 = pallas_frontend.capture_frontend_planar(blk, d, True)
    zi1, zq1 = frontend_mxu.capture_frontend_mm_bf16(blk, d, True)
    assert zi1.shape == zi0.shape and zi1.dtype == jnp.float32
    err = np.abs(np.asarray(zi1) - np.asarray(zi0))
    ref = np.abs(np.asarray(zi0)) + 1.0
    assert np.max(err / ref) < 0.05        # bf16 class, not garbage


def test_mm_i16_two_dot_matches_single():
    """The two-dot i16 twin must equal the single-dot form exactly
    (identical integer sums, same scale)."""
    rng = np.random.default_rng(37)
    d = 14
    blk = rng.integers(-32768, 32767, 2 * d * 32 * 24).astype(np.int16)
    zi0, zq0 = frontend_mxu.capture_frontend_mm_i16(blk, d, True)
    zi1, zq1 = frontend_mxu.capture_frontend_mm_i16_2(blk, d, True)
    np.testing.assert_array_equal(np.asarray(zi0), np.asarray(zi1))
    np.testing.assert_array_equal(np.asarray(zq0), np.asarray(zq1))
