"""The one-kernel fused front (ops/fused_frontend.py) matches the unfused
composition bit-compatibly, via the Pallas interpreter so CPU CI covers
the production TPU path (same policy as test_frontend_mxu's interpret
coverage of the capture kernel)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rx_tools_tpu import ops
from rx_tools_tpu.ops import fused_frontend, pallas_frontend


def _ref(prev, blk, d, kpb):
    """The unfused production composition: planar frontend + planar
    fast-atan discriminator with block seams + rms levels."""
    m = blk.size // (2 * d) // kpb
    zi, zq = pallas_frontend.capture_frontend_planar(blk, d, True)
    prev2, dsig = ops.fm_discriminate_planar(prev, zi, zq, 1,
                                             seam_stride=kpb)
    zib = zi.reshape(m, kpb)
    zqb = zq.reshape(m, kpb)
    t = zib.sum(1) + zqb.sum(1)
    p = (zib * zib).sum(1) + (zqb * zqb).sum(1)
    nn = 2 * kpb
    dc = t / nn
    err = t * 2 * dc - dc * dc * nn
    lv = jnp.sqrt(jnp.maximum(p - err, 0) / nn)
    return prev2, dsig, lv


@pytest.mark.parametrize("kpb,m", [(4096, 3),     # 1 tile/block (T=128)
                                   (9216, 2)])    # 3 tiles/block (T=96)
def test_fused_matches_unfused(kpb, m):
    rng = np.random.default_rng(3)
    d = 14
    blk = rng.integers(-16000, 16000, m * kpb * 2 * d).astype(np.int16)
    prev = jnp.asarray(np.float32([3.0, -2.0]))
    prev_ref, d_ref, lv_ref = _ref(prev, blk, d, kpb)
    prev_got, d_got, lv_got = fused_frontend.fused_capture_fm_demod(
        prev, jnp.asarray(blk), d, kpb, interpret=True)
    # discriminator values live in pi == 1<<14 units; the kernel's matmul
    # reassociation sits far below any golden tolerance
    np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_ref),
                               atol=5e-2)
    np.testing.assert_allclose(np.asarray(lv_got), np.asarray(lv_ref),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(prev_got), np.asarray(prev_ref),
                               atol=1e-3)


def test_fused_chains_like_unfused():
    """Carried prev_iq across consecutive chunk calls: the second chunk's
    first seam uses the first chunk's last pair."""
    rng = np.random.default_rng(9)
    d = 14
    kpb = 4096
    b1 = rng.integers(-8000, 8000, 2 * kpb * 2 * d).astype(np.int16)
    b2 = rng.integers(-8000, 8000, 2 * kpb * 2 * d).astype(np.int16)
    prev = jnp.zeros(2, jnp.float32)
    pr_a, da, _ = _ref(prev, b1, d, kpb)
    pr_b, db, _ = _ref(pr_a, b2, d, kpb)
    pg_a, ga, _ = fused_frontend.fused_capture_fm_demod(
        prev, jnp.asarray(b1), d, kpb, interpret=True)
    pg_b, gb, _ = fused_frontend.fused_capture_fm_demod(
        pg_a, jnp.asarray(b2), d, kpb, interpret=True)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(db), atol=5e-2)
    np.testing.assert_allclose(np.asarray(pg_b), np.asarray(pr_b),
                               atol=1e-3)


def test_tile_rows_picker():
    assert fused_frontend.pick_tile_rows(18432) == 192   # bench block
    assert fused_frontend.pick_tile_rows(4096) == 128
    assert fused_frontend.pick_tile_rows(4608) == 0      # 144 rows: no *32
    assert fused_frontend.pick_tile_rows(100) == 0       # not % 32


def test_eligibility_gates():
    from rx_tools_tpu.models import fmchain
    base = dict(mode="fm", rate_in=171428, rate_out=171428, rate_out2=32000,
                downsample=14, custom_atan=1, deemph_a=13,
                squelch_level=0.0)
    ok = fmchain.FmConfig(**base)
    # CPU backend: never eligible (the gate includes the backend check)
    assert not fused_frontend.fused_eligible(ok, 18432)
    # the remaining gates, independent of backend
    for bad in (dict(custom_atan=0), dict(mode="am"),
                dict(squelch_level=1.0), dict(dc_block_raw=True),
                dict(downsample_passes=2)):
        cfg = fmchain.FmConfig(**{**base, **bad})
        assert not fused_frontend.fused_eligible(cfg, 18432)
