"""Batched demod-tail ops == their vmapped single-channel counterparts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rx_tools_tpu import ops
from rx_tools_tpu.ops.resample import (
    ResampleState, resample_rational, resample_rational_batch)


@pytest.mark.parametrize("mode", [ops.DISC_STD, ops.DISC_FAST, ops.DISC_ALE])
def test_fm_discriminate_batch_matches_vmap(mode):
    rng = np.random.default_rng(0)
    c, m = 5, 257
    z = jnp.asarray(rng.normal(0, 50, (c, m, 2)).astype(np.float32))
    prev = jnp.asarray(rng.normal(0, 50, (c, 2)).astype(np.float32))
    pv, dv = jax.vmap(lambda p, x: ops.fm_discriminate(p, x, mode))(prev, z)
    pb, db = ops.fm_discriminate_batch(prev, z, mode)
    np.testing.assert_array_equal(np.asarray(pv), np.asarray(pb))
    np.testing.assert_allclose(np.asarray(dv), np.asarray(db), rtol=1e-6)


def test_deemph_batch_matches_vmap():
    rng = np.random.default_rng(1)
    c, m = 4, 300
    x = jnp.asarray(rng.normal(0, 1000, (c, m)).astype(np.float32))
    avg = jnp.asarray(rng.normal(0, 10, (c,)).astype(np.float32))
    av, yv = jax.vmap(lambda a, xx: ops.deemph_filter(a, xx, 7))(avg, x)
    ab, yb = ops.deemph_filter(avg, x, 7, axis=-1)
    np.testing.assert_allclose(np.asarray(yv), np.asarray(yb), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(av), np.asarray(ab), rtol=1e-6)


def test_resample_batch_matches_vmap_over_blocks():
    """Equal-phase channels (the channelizer invariant), streamed over
    three consecutive blocks: batch == per-channel, including carries."""
    rng = np.random.default_rng(2)
    c, n, fast, slow = 3, 1700, 170000, 32000
    st_v = ResampleState(jnp.zeros(c), jnp.zeros(c, jnp.int32))
    st_b = ResampleState(jnp.zeros(c), jnp.zeros(c, jnp.int32))
    for blk in range(3):
        x = jnp.asarray(rng.normal(0, 1000, (c, n)).astype(np.float32))
        stv, yv, nvv = jax.vmap(
            lambda s_acc, s_ph, xx: resample_rational(
                ResampleState(s_acc, s_ph), xx, fast, slow))(
            st_v.acc, st_v.phase, x)
        st_v = ResampleState(stv.acc, stv.phase)
        st_b, yb, nvb = resample_rational_batch(st_b, x, fast, slow)
        assert int(nvb) == int(nvv[0]) and np.all(np.asarray(nvv) == int(nvb))
        np.testing.assert_allclose(np.asarray(yv), np.asarray(yb),
                                   rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(np.asarray(st_v.acc), np.asarray(st_b.acc),
                                   rtol=1e-5, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(st_v.phase),
                                      np.asarray(st_b.phase))


def test_cm_periodic_matches_general_batch():
    """Round-5c: the periodic-mask channel-major resampler == the
    cumsum/gather batch form while streaming (same grid/valid counts/
    carried state; window sums reassociate within f32 noise)."""
    from rx_tools_tpu.ops import resample as rs
    import jax.numpy as jnp
    rng = np.random.default_rng(51)
    for fast, slow in ((37500, 32000), (150000, 32000), (48000, 32000)):
        c = 8
        st_a = rs.ResampleState(jnp.zeros((c,), jnp.float32),
                                jnp.zeros((c,), jnp.int32))
        st_b = st_a
        for blk in range(3):
            x = jnp.asarray(rng.normal(0, 5000, (c, 1024))
                            .astype(np.float32))
            st_a, ya, nva = rs._resample_cm_periodic(st_a, x, fast, slow)
            st_b, yb, nvb = rs.resample_rational_batch(st_b, x, fast, slow)
            assert int(nva) == int(nvb), (fast, slow, blk)
            np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                       rtol=1e-4, atol=0.5,
                                       err_msg=f"{fast}/{slow} blk {blk}")
            np.testing.assert_allclose(np.asarray(st_a.acc),
                                       np.asarray(st_b.acc),
                                       rtol=1e-4, atol=0.5)
            assert int(st_a.phase[0]) == int(st_b.phase[0])
