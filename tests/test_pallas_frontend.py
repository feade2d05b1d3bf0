"""Pallas capture frontend vs the jnp composition (interpret mode on CPU;
the same comparison runs on real TPU in docs/PERF.md)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rx_tools_tpu.ops.pallas_frontend import (
    capture_frontend_pallas, capture_frontend_jnp)


@pytest.mark.parametrize("d,rot", [(14, True), (42, False), (8, True)])
def test_pallas_matches_jnp(d, rot):
    rng = np.random.default_rng(0)
    block = rng.integers(-32768, 32767, 2 * d * 64).astype(np.int16)
    a = np.asarray(capture_frontend_pallas(block, d, rot, interpret=True))
    b = np.asarray(capture_frontend_jnp(jnp.asarray(block), d, rot))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-3)


def test_pallas_matches_rotate_oracle():
    """Rotation sign pattern vs the C rotate16_90 oracle (D=1, no decim)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from oracles import c_ref
    rng = np.random.default_rng(1)
    block = rng.integers(-2000, 2000, 2 * 64).astype(np.int16)
    ref = np.array(c_ref.rotate16_90(block), np.float64).reshape(-1, 2)
    got = np.asarray(capture_frontend_pallas(block, 1, True, interpret=True))
    scale = 128.0 / 32767.0
    np.testing.assert_allclose(got, ref * scale, rtol=1e-5, atol=1e-4)
