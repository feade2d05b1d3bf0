"""The gather-free TPU resampler (_resample_rows) matches the reference
cumsum+gather formulation: same emission grid, same carried state, values
within f32 reassociation (it sums windows from row-local prefixes instead
of differencing a stream-scale global cumsum — numerically tighter)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from rx_tools_tpu.ops import resample


@pytest.mark.parametrize("fast,slow,n", [
    (171428, 32000, 128 * 36),    # the wbfm 2.4M/14 -> 32k ratio
    (170000, 32000, 128 * 24),    # the wbfm preset ratio
    (48000, 8000, 1280),          # exact divisor
    (24000, 18000, 2560),         # ratio < 2 (every window 1-2 samples)
    (171428, 32000, 128 * 173),   # long chunk, phase wraps several times
])
def test_rows_matches_reference_chained(fast, slow, n):
    g = math.gcd(fast, slow)
    fr, sr = fast // g, slow // g
    assert fr // sr + 1 <= 16, "dispatch gate would exclude this ratio"
    rng = np.random.default_rng(5)
    sa = sb = resample.ResampleState.init()
    for i in range(3):                     # chained: nonzero phase + acc
        x = jnp.asarray(rng.normal(0, 1000, n).astype(np.float32))
        sa, ya, nva = resample.resample_rational(sa, x, fast, slow)
        sb, yb, nvb = resample._resample_rows(sb, x, fr, sr)
        assert int(nva) == int(nvb)
        assert ya.shape == yb.shape
        np.testing.assert_allclose(np.asarray(yb), np.asarray(ya),
                                   atol=2e-2, err_msg=f"chunk {i}")
        assert int(sa.phase) == int(sb.phase)
        # the carried acc differences stream-scale cumsum values in the
        # reference path, so its own f32 rounding is ~|acc|*1e-5 ulps
        assert (abs(float(sa.acc) - float(sb.acc))
                < 2e-2 + 1e-4 * abs(float(sa.acc)))


def test_rows_nonzero_initial_phase():
    # a mid-stream seed, as the time-sharded path produces
    st = resample.ResampleState(jnp.float32(123.0), jnp.int32(17321))
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 500, 128 * 20).astype(np.float32))
    g = math.gcd(171428, 32000)
    s1, y1, n1 = resample.resample_rational(st, x, 171428, 32000)
    s2, y2, n2 = resample._resample_rows(st, x, 171428 // g, 32000 // g)
    assert int(n1) == int(n2)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=2e-2)
    assert int(s1.phase) == int(s2.phase)
    assert abs(float(s1.acc) - float(s2.acc)) < 2e-2


def test_cumsum_mxu_matches_jnp():
    """The triangular-MXU blocked cumsum (kept as a measured alternative;
    not used in the production resampler) stays correct."""
    rng = np.random.default_rng(31)
    for n in (4096, 4097, 300000):
        x = jnp.asarray(rng.normal(0, 100, n).astype(np.float32))
        got = np.asarray(resample._cumsum_mxu(x))
        want = np.asarray(jnp.cumsum(x))
        scale = np.abs(want).max() + 1
        np.testing.assert_allclose(got, want, atol=2e-6 * scale)


def test_rows_blocks_bitwise_equals_sequential():
    """Round-5: resample_rows_blocks == M sequential _resample_rows calls
    BIT-for-bit (outputs, valid counts, carried acc/phase) — the scan
    engine's batched tail depends on this identity."""
    from rx_tools_tpu.ops import resample as rs
    import jax.numpy as jnp
    rng = np.random.default_rng(17)
    for fast, slow, n, m in ((42857, 8000, 1536, 5), (85, 16, 1280, 7),
                             (75, 64, 2048, 3), (3, 1, 896, 4),
                             (32000, 32000, 1280, 4),    # ratio 1 edge
                             (32001, 32000, 1280, 4),    # near-1 edge
                             (131, 128, 1280, 4)):
        x = rng.normal(0, 9000, (m, n)).astype(np.float32)
        st = rs.ResampleState(jnp.float32(rng.normal() * 100),
                              jnp.int32(rng.integers(0, 5)))
        import math
        g = math.gcd(fast, slow)
        st_seq = st
        ys, nvs = [], []
        for i in range(m):
            st_seq, y, nv = rs._resample_rows(st_seq, jnp.asarray(x[i]),
                                              fast // g, slow // g)
            ys.append(np.asarray(y))
            nvs.append(int(nv))
        st_b, yb, nvb = rs.resample_rows_blocks(st, jnp.asarray(x),
                                                fast, slow)
        np.testing.assert_array_equal(np.stack(ys), np.asarray(yb),
                                      err_msg=f"{fast}/{slow}")
        np.testing.assert_array_equal(np.array(nvs), np.asarray(nvb))
        np.testing.assert_array_equal(np.asarray(st_seq.acc),
                                      np.asarray(st_b.acc))
        assert int(st_seq.phase) == int(st_b.phase)
