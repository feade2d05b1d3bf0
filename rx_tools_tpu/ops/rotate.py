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

import jax
import jax.numpy as jnp


def _rotate(x):
    """Rotate (N, 2) by i**n in full-VPU-width constructs.

    HOW this is written matters 1000x on TPU (measured, round 3 —
    docs/PERF.md micro-bisection): the obvious column-slice + stack over
    an (N/4, 4, 2) view lowers to a SCALAR loop at 0.6 GB/s, because
    minor-dim slicing/stacking of tiny trailing axes de-vectorizes the
    fused loop.  Flat iota-keyed where-selects and a single ``lax.rev``
    pair swap run at ~1 TB/s and produce bit-identical output:

      m = n mod 4:  0 -> ( I,  Q)   1 -> (-Q,  I)
                    2 -> (-I, -Q)   3 -> ( Q, -I)

    even m: +/-x elementwise; odd m: +/-(pair-swapped x), where the swap
    is one ``lax.rev`` over the 2-wide pair axis.
    """
    shape = x.shape
    x2 = x.reshape(-1, 2)
    sw = jax.lax.rev(x2, dimensions=(1,))
    xf, sf = x2.reshape(-1), sw.reshape(-1)
    p = jnp.arange(xf.shape[0], dtype=jnp.int32)
    m = (p >> 1) & 3                    # sample index mod 4
    c = p & 1                           # component: 0 = I, 1 = Q
    even = jnp.where(m == 0, xf, -xf)
    odd = jnp.where((m == 1) == (c == 1), sf, -sf)
    return jnp.where((m & 1) == 0, even, odd).reshape(shape)


def rotate_fs4_int16(x):
    """Bit-exact int16 variant (negation wraps like C int16 store)."""
    assert x.shape[-2] % 4 == 0, "rotate_fs4 needs N % 4 == 0"
    return _rotate(x.astype(jnp.int16)).astype(jnp.int16)


def rotate_fs4(x):
    """float32 variant for the fast path."""
    assert x.shape[-2] % 4 == 0, "rotate_fs4 needs N % 4 == 0"
    return _rotate(x)
