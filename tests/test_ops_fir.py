"""Golden tests: decimators vs the C-faithful oracles."""

import numpy as np
import jax.numpy as jnp

from rx_tools_tpu import ops
from oracles import c_ref
from util import snr_db


def _iq_blocks(n, blocks=3, lo=-120, hi=120, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(lo, hi, size=2 * n).astype(np.int16) for _ in range(blocks)]


def test_rotate_fs4_int_exact():
    for blk in _iq_blocks(64, lo=-32768, hi=32767, seed=3):
        ref = np.array(c_ref.rotate16_90(blk), dtype=np.int16)
        got = ops.rotate_fs4_int16(jnp.asarray(blk).reshape(-1, 2)).reshape(-1)
        np.testing.assert_array_equal(np.asarray(got), ref)


def test_rotate_float_matches_int():
    blk = _iq_blocks(64)[0]
    ref = np.array(c_ref.rotate16_90(blk), dtype=np.float32)
    got = ops.rotate_fs4(jnp.asarray(blk, jnp.float32).reshape(-1, 2)).reshape(-1)
    np.testing.assert_allclose(np.asarray(got), ref)


def test_boxcar_aligned_matches_low_pass():
    d = 6
    n = 6 * 32
    blk = _iq_blocks(n)[0]
    ref, _ = c_ref.low_pass(blk, d)
    x = jnp.asarray(blk, jnp.float32).reshape(-1, 2)
    got = x.reshape(-1, d, 2).sum(axis=1).reshape(-1)
    np.testing.assert_allclose(np.asarray(got), np.array(ref, np.float32))


def test_boxcar_carry_unaligned():
    """Carried-state boxcar over odd split points == one-shot reference."""
    d = 7
    blk = _iq_blocks(7 * 16)[0]
    ref, _ = c_ref.low_pass(blk, d)
    st = ops.BoxcarState.init()
    outs = []
    # split at deliberately unaligned boundaries
    cuts = [0, 26, 100, len(blk) // 2, len(blk)]
    for a, b in zip(cuts[:-1], cuts[1:]):
        x = jnp.asarray(blk[a:b], jnp.float32).reshape(-1, 2)
        st, y, nv = ops.boxcar_decimate(st, x, d)
        outs.append(np.asarray(y)[: int(nv)])
    got = np.concatenate(outs).reshape(-1)
    np.testing.assert_allclose(got, np.array(ref, np.float32))


def test_fifth_order_snr():
    """Float halfband cascade vs int oracle: only >>4 truncation noise.

    Noise floor is the oracle's own floor-truncation: each pass floors after
    >>4 (bias ~0.5, var 1/12); over 3 passes the accumulated DC bias (~1.5,
    power ~2.25) dominates, giving 10*log10(120^2/3 / 2.5) ~ 32.8 dB for
    +-120-amplitude input.  30 dB asserts we are at that floor.
    """
    passes = 3
    n = 512  # complex samples, divisible by 2**passes
    blk = _iq_blocks(n)[0]
    # oracle: per-pass stateful on interleaved data
    lp = [int(v) for v in blk]
    hists_i = [[0] * 6 for _ in range(passes)]
    hists_q = [[0] * 6 for _ in range(passes)]
    for p in range(passes):
        ln = len(lp) >> p
        out, hists_i[p] = c_ref.fifth_order_fm(lp[:ln], hists_i[p])
        lp[:ln] = out
        oddview = lp[1:ln]
        outq, hists_q[p] = c_ref.fifth_order_fm(oddview, hists_q[p])
        lp[1:ln] = outq
    ref = np.array(lp[: len(lp) >> passes], dtype=np.float64)

    st = ops.FifthOrderState.init(passes)
    x = jnp.asarray(blk, jnp.float32).reshape(-1, 2)
    _, y = ops.fifth_order_cascade(st, x, passes)
    got = np.asarray(y).reshape(-1)
    assert snr_db(ref, got) > 30, snr_db(ref, got)


def test_fifth_order_state_carry():
    """Two carried blocks == one concatenated block (exact, float)."""
    passes = 2
    blk = _iq_blocks(256)[0].astype(np.float32)
    x = jnp.asarray(blk).reshape(-1, 2)
    st = ops.FifthOrderState.init(passes)
    _, y_full = ops.fifth_order_cascade(st, x, passes)
    st2 = ops.FifthOrderState.init(passes)
    st2, y1 = ops.fifth_order_cascade(st2, x[:128], passes)
    _, y2 = ops.fifth_order_cascade(st2, x[128:], passes)
    np.testing.assert_allclose(
        np.asarray(y_full), np.concatenate([np.asarray(y1), np.asarray(y2)]),
        atol=1e-3)


def test_droop_fir_snr():
    passes = 2
    blk = _iq_blocks(256, seed=5)[0]
    fir = c_ref.CIC_9_TABLES[passes]
    ref_i, _ = c_ref.generic_fir_fm(list(blk), fir, [0] * 9)
    ref = np.array(ref_i, np.float64)[0::2]
    st = ops.DroopState.init()
    x = jnp.asarray(blk, jnp.float32).reshape(-1, 2)
    _, y = ops.droop_fir(st, x, passes)
    got = np.asarray(y)[:, 0]
    assert snr_db(ref, got) > 35, snr_db(ref, got)


def test_droop_fir_state_carry():
    blk = _iq_blocks(128, seed=6)[0].astype(np.float32)
    x = jnp.asarray(blk).reshape(-1, 2)
    st = ops.DroopState.init()
    _, y_full = ops.droop_fir(st, x, 1)
    st2 = ops.DroopState.init()
    st2, y1 = ops.droop_fir(st2, x[:50], 1)
    _, y2 = ops.droop_fir(st2, x[50:], 1)
    np.testing.assert_allclose(
        np.asarray(y_full), np.concatenate([np.asarray(y1), np.asarray(y2)]),
        atol=1e-3)


def test_low_pass_simple():
    blk = np.arange(-50, 46, dtype=np.int16)  # 96 samples
    ref = np.array(c_ref.low_pass_simple(blk, 4), np.float32)
    got = np.asarray(ops.low_pass_simple(jnp.asarray(blk, jnp.float32), 4))
    np.testing.assert_allclose(got, ref)
