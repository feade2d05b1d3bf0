"""fs/4 frequency translation ("rotate by 90°").

rx_fm captures ``freq + capture_rate/4`` to keep the signal away from the
tuner's DC spike (``src/rtl_fm.c:980-984``) and undoes the offset digitally
by multiplying sample ``n`` by ``(-i)^n`` — the period-4 pattern
``1, -i?…`` — implemented in the reference as pure sign/swap on interleaved
int16 (``rotate16_90``, ``src/rtl_fm.c:309-327``):

  sample 0: ( I,  Q)     sample 1: (-Q,  I)
  sample 2: (-I, -Q)     sample 3: ( Q, -I)

i.e. multiplication by ``+i`` per step.  Here the same pattern is applied to
``(N, 2)`` blocks; N must be a multiple of 4 (the streaming layer guarantees
block alignment).  No multiplies — XLA fuses the negate/interleave into
neighbouring ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def _rotate(x):
    v = x.reshape(-1, 4, 2)
    i, q = v[..., 0], v[..., 1]
    out_i = jnp.stack([i[:, 0], -q[:, 1], -i[:, 2], q[:, 3]], axis=1)
    out_q = jnp.stack([q[:, 0], i[:, 1], -q[:, 2], -i[:, 3]], axis=1)
    return jnp.stack([out_i, out_q], axis=-1).reshape(x.shape)


def rotate_fs4_int16(x):
    """Bit-exact int16 variant (negation wraps like C int16 store)."""
    assert x.shape[-2] % 4 == 0, "rotate_fs4 needs N % 4 == 0"
    return _rotate(x.astype(jnp.int16)).astype(jnp.int16)


def rotate_fs4(x):
    """float32 variant for the fast path."""
    assert x.shape[-2] % 4 == 0, "rotate_fs4 needs N % 4 == 0"
    return _rotate(x)
