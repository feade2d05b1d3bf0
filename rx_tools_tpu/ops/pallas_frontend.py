"""Fused capture frontend as a Pallas TPU kernel.

The capture-rate hot path of the FM chain (SURVEY.md §3.1 hot loops) is

    int16 interleaved I/Q  ->  8-bit-range rescale  (rtl_fm.c:845-848)
                           ->  fs/4 derotation      (rtl_fm.c:309-327)
                           ->  boxcar decimate by D (rtl_fm.c:351-371)

Everything downstream runs at 1/D the rate and is cheap.  This kernel fuses
the three capture-rate stages into one VMEM-resident pass so the only HBM
traffic is the raw int16 block in (4 B/complex sample) and the tiny
decimated block out.

STATUS — measured on the real chip and NOT the production default: XLA
already fuses the identical jnp composition into the downstream chain with
no materialised intermediate, and beats this kernel by ~15x end-to-end
(see ``capture_frontend`` below and docs/PERF.md).  The kernel is kept as
an opt-in (``RX_PALLAS=1``) A/B reference and a worked Pallas example.

Layout trick: one complex int16 sample (I, Q interleaved, little-endian) is
exactly one int32 lane, so the input is bitcast to int32 shaped ``(N/D, D)``
(a free metadata reshape) and deinterleaving becomes shift arithmetic on
the VPU:

    I = (v << 16) >> 16        (sign-extended low half)
    Q =  v >> 16               (arithmetic high half)

The fs/4 pattern ``i**n`` has period 4 over the flat sample index
``n = row*D + lane`` and is computed from two broadcasted iotas — no
gathers, no lane shuffles.  Decimation is a lane-axis reduction.

Falls back to the identical jnp composition off-TPU (and the golden test
pins the two together bit-for-bit in f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SCALE = np.float32(128.0 / 32767.0)


def _kernel(x_ref, out_ref, *, downsample: int, tile_rows: int,
            rotate: bool, scale: float):
    v = x_ref[:]                                     # (T, D) int32
    i = jnp.left_shift(v, 16) >> 16                  # sign-extended low int16
    q = v >> 16                                      # arithmetic high int16
    fi = i.astype(jnp.float32) * scale
    fq = q.astype(jnp.float32) * scale
    if rotate:
        # global flat index n = (pid*T + r)*D + l; pattern = n mod 4
        t, d = fi.shape
        r = jax.lax.broadcasted_iota(jnp.int32, (t, d), 0)
        l = jax.lax.broadcasted_iota(jnp.int32, (t, d), 1)
        n = (pl.program_id(0) * tile_rows + r) * downsample + l
        m = jnp.bitwise_and(n, 3)
        # multiply sample by i^n: (I+jQ) * i^m
        #   m=0: ( I,  Q)   m=1: (-Q,  I)   m=2: (-I, -Q)   m=3: ( Q, -I)
        ri = jnp.where(m == 0, fi, jnp.where(m == 1, -fq,
                       jnp.where(m == 2, -fi, fq)))
        rq = jnp.where(m == 0, fq, jnp.where(m == 1, fi,
                       jnp.where(m == 2, -fq, -fi)))
        fi, fq = ri, rq
    out_ref[:, 0] = jnp.sum(fi, axis=1)
    out_ref[:, 1] = jnp.sum(fq, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("downsample", "rotate", "interpret"))
def capture_frontend_pallas(block_i16, downsample: int, rotate: bool = True,
                            interpret: bool = False):
    """``(2N,) int16 -> (N/D, 2) float32`` decimated 8-bit-range I/Q."""
    n = block_i16.shape[0] // 2
    d = int(downsample)
    rows = n // d
    x = jax.lax.bitcast_convert_type(
        block_i16.reshape(rows, d, 2), jnp.int32).reshape(rows, d)
    # pick a tile height: largest divisor of rows <= 2048, multiple of 8
    tile = rows
    for cand in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if rows % cand == 0:
            tile = cand
            break
    grid = rows // tile
    kern = functools.partial(_kernel, downsample=d, tile_rows=tile,
                             rotate=rotate, scale=float(_SCALE))
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((tile, d), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, 2), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 2), jnp.float32),
        interpret=interpret,
    )(x)


def capture_frontend_jnp(block_i16, downsample: int, rotate: bool = True):
    """Reference jnp composition (the pre-fusion path), same contract."""
    from rx_tools_tpu.ops.rotate import rotate_fs4
    x = block_i16.astype(jnp.float32).reshape(-1, 2) * _SCALE
    if rotate:
        x = rotate_fs4(x)
    n = x.shape[0] // downsample
    return x.reshape(n, downsample, 2).sum(axis=1)


def capture_frontend(block_i16, downsample: int, rotate: bool = True):
    """Production frontend dispatch: XLA-fused jnp by default.

    This IS the production frontend: ``fm_chain_step`` / ``fm_chunk_step``
    call it for every boxcar-decimation chain (the default rx_fm path).

    Measured finding (round 2, real v5e chip, WBFM geometry D=14,
    262k-sample blocks; see docs/PERF.md "Pallas frontend"): dispatching
    the hand-written Pallas kernel here cost the FULL chain ~15x
    (flat engine 0.90 G samp/s vs 13.7 G with ``RX_NO_PALLAS=1``).  Two
    reasons, both structural:

    1. a ``pallas_call`` is a fusion barrier — the (N/D, 2) f32
       intermediate round-trips through HBM, where XLA otherwise fuses
       rescale+rotate+decimate INTO the downstream fifth-order/discriminator
       loops and never materialises it;
    2. the natural ``(rows, D)`` layout puts D=14 on the 128-wide lane
       axis (11% VPU utilisation), and for rows with no large power-of-2
       divisor (262192/14 = 18728 = 8 x 2341, 2341 prime) the grid
       degenerates to thousands of 448-byte tiles.

    XLA's own fusion already saturates this HBM-bound op, so the kernel is
    opt-in (``RX_PALLAS=1``) for A/B measurement rather than the default.
    ``RX_NO_PALLAS=1`` still forces jnp (kept so existing A/B scripts work).
    """
    import os
    n = block_i16.shape[0] // 2
    rows = n // int(downsample)
    if (jax.default_backend() == "tpu" and rows % 8 == 0
            and os.environ.get("RX_PALLAS") == "1"
            and not os.environ.get("RX_NO_PALLAS")):
        return capture_frontend_pallas(block_i16, downsample, rotate)
    return capture_frontend_jnp(block_i16, downsample, rotate)
