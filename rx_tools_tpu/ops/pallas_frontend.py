"""Fused capture frontend as a Pallas TPU kernel.

The capture-rate hot path of the FM chain (SURVEY.md §3.1 hot loops) is

    int16 interleaved I/Q  ->  8-bit-range rescale  (rtl_fm.c:845-848)
                           ->  fs/4 derotation      (rtl_fm.c:309-327)
                           ->  boxcar decimate by D (rtl_fm.c:351-371)

Everything downstream runs at 1/D the rate and is cheap.  This kernel fuses
the three capture-rate stages into one VMEM-resident pass so the only HBM
traffic is the raw int16 block in (4 B/complex sample) and the tiny
decimated block out.

STATUS (round 3b) — this module hosts the production frontend DISPATCH
(:func:`capture_frontend_planar`) plus two historical formulations:

- the ORIGINAL interleaved Pallas kernel below
  (:func:`capture_frontend_pallas`) remains a documented negative result
  (its pre-kernel int32 bitcast lowers scalar; opt-in via ``RX_PALLAS=1``);
- the PRODUCTION TPU path is the round-3b Pallas fused-convert MXU
  matmul (``frontend_mxu.capture_frontend_mm_pallas``), which
  :func:`capture_frontend_planar` dispatches to — it won the fair
  (perturbation-free) chain A/B 15.75 vs 10.3 GB/s over the masked
  reduce (docs/PERF.md);
- the masked-reduce formulation below is the pure-XLA fallback
  (CPU, odd block lengths, ``RX_FE=masked``).

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

# Frontend choice, resolved ONCE at import: the dispatch below runs at
# trace time, so its outcome is baked into jit compilation caches —
# reading the env per-trace would make a later toggle silently
# ineffective for already-traced programs while appearing to work for
# new ones (advisor finding, round 3).  RX_FE=masked forces the pure-XLA
# masked-reduce path, RX_FE=pallas the fused-convert kernel, RX_FE=mm the
# round-4 f32 block-banded dot (in-chain 53.8 GB/s vs 39.4 Pallas vs 18.9
# masked, tools/chipsuite18.py — the pallas_call streaming pipeline
# itself caps at ~34 GB/s on this backend while XLA reads the same chunks
# at 130-155).  The DEFAULT since round 5 is the raw-int16 dot
# (``frontend_mxu.capture_frontend_mm_i16``): the f32 dot's converted
# input materialization costs ~8 B of HBM per 2 B input, while the int16
# dot reads the raw stream with int32 accumulation — in-chain 42.1 vs
# 36.3 GB/s same-session (tools/chipsuite23.py), and the result is
# INTEGER-EXACT (the same mask sums the C computes) instead of
# f32-reassociated.  The bf16-intermediate probe (61.6 GB/s, 8 mantissa
# bits, golden-breaking) confirms the traffic amplification is the cost;
# mm_i16 takes the exact fraction of that win.
_FE_CHOICE = __import__("os").environ.get("RX_FE", "mm_i16")
_FE_FORCE_MASKED = _FE_CHOICE == "masked"


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


@functools.lru_cache(maxsize=32)
def _fs4_decim_masks(d: int, rotate: bool):
    """(2D,) Re/Im masks in {+1, 0, -1} fusing rescale+rotate+decimate.

    Derivation (docs/PERF.md round-3 campaign): the rotated-then-decimated
    output is ``z[k] = i^(Dk) * sum_j x[Dk+j] * i^j``; over the FLAT
    interleaved stream each element lands in exactly one of Re(z)/Im(z)
    with sign +/-1, so the whole capture-rate computation becomes two
    masked trailing-axis reduces — the construct class that runs at full
    VPU width on TPU, where every pair-indexing formulation (column
    slices, lax.rev, bitcast deinterleave, 2-wide trailing dims) lowers
    to a scalar loop 60x slower (measured, tools/chipsuite3-5.py).
    """
    a = np.zeros(2 * d, np.float32)     # -> Re(z)
    b = np.zeros(2 * d, np.float32)     # -> Im(z)
    for j in range(d):
        m = (j & 3) if rotate else 0
        if m == 0:
            a[2 * j] = 1.0; b[2 * j + 1] = 1.0
        elif m == 1:                    # x * i: (I, Q) -> (-Q, I)
            b[2 * j] = 1.0; a[2 * j + 1] = -1.0
        elif m == 2:
            a[2 * j] = -1.0; b[2 * j + 1] = -1.0
        else:
            b[2 * j] = -1.0; a[2 * j + 1] = 1.0
    return a, b


def capture_frontend_planar(block_i16, downsample: int, rotate: bool = True):
    """``(2N,) int16 -> ((N/D,), (N/D,)) float32`` planar I/Q.

    THE production frontend dispatch (both chain engines call this).  On
    TPU, when the output length admits a phase-block size >= 8, dispatches
    to the raw-int16 block-banded dot
    (``frontend_mxu.capture_frontend_mm_i16``, round-5 default): the dot
    consumes the int16 stream directly with int32 accumulation — no
    converted f32 intermediate exists, and the sums are INTEGER-EXACT.
    In-chain 42.1 GB/s vs 36.3 for the round-4 f32 dot, same session
    (tools/chipsuite23.py); the f32 dot's converted-input materialization
    (~8 B HBM per 2 B input) was the measured cost, confirmed by the
    bf16-intermediate probe at 61.6.  ``RX_FE=mm`` restores the f32 dot;
    ``RX_FE=masked`` / ``RX_FE=pallas`` force the older paths (round-4
    A/B, tools/chipsuite18.py: mm 53.8 / pallas 39.4 / masked 18.9 — the
    pallas_call streaming pipeline itself caps at ~34 GB/s on this
    backend).  The env is read once at module import and the backend
    check runs at trace time, i.e. the choice targets the process's
    default backend and is baked into the jit cache.

    Masked-sum fallback (see :func:`_fs4_decim_masks`): ~39 GB/s on the
    chip vs 0.6 GB/s for the previous rotate-then-reshape composition —
    the round-3a campaign's 60x fix.  Planar output feeds the planar
    demod tail without ever slicing a 2-wide axis at rate.  Both paths'
    f32 sums are reassociated vs the sequential reference order
    (|err| ~1e-4 at 8-bit scale, inside every golden tolerance).
    """
    d = int(downsample)
    if jax.default_backend() == "tpu" and not _FE_FORCE_MASKED:
        from rx_tools_tpu.ops import frontend_mxu
        k = block_i16.shape[0] // (2 * d)
        p = frontend_mxu._pick_p(k, d, bool(rotate))
        if p >= 8:
            if _FE_CHOICE == "pallas":
                return frontend_mxu.capture_frontend_mm_pallas(
                    block_i16, d, bool(rotate), p=p)
            if _FE_CHOICE == "mm_i16":     # round-5 A/B: raw-int16 dot
                return frontend_mxu.capture_frontend_mm_i16(
                    block_i16, d, bool(rotate), p=p)
            if _FE_CHOICE == "mm_bf16":    # round-5 traffic probe only
                return frontend_mxu.capture_frontend_mm_bf16(
                    block_i16, d, bool(rotate), p=p)
            return frontend_mxu.capture_frontend_mm(
                block_i16, d, bool(rotate), p=p)
    y = block_i16.astype(jnp.float32) * _SCALE            # flat (2N,)
    g = y.reshape(-1, 2 * d)                              # (K, 2D)
    a, b = _fs4_decim_masks(d, bool(rotate))
    zi = (g * jnp.asarray(a)[None, :]).sum(axis=1)
    zq = (g * jnp.asarray(b)[None, :]).sum(axis=1)
    if rotate and d % 4:
        # the group phase i^(Dk): elementwise K-scale selects
        k = jnp.arange(zi.shape[0], dtype=jnp.int32)
        p = (k * (d & 3)) & 3
        zi, zq = (jnp.where(p == 0, zi, jnp.where(p == 1, -zq,
                            jnp.where(p == 2, -zi, zq))),
                  jnp.where(p == 0, zq, jnp.where(p == 1, zi,
                            jnp.where(p == 2, -zq, -zi))))
    return zi, zq


def capture_frontend_jnp(block_i16, downsample: int, rotate: bool = True):
    """``(2N,) int16 -> (N/D, 2) float32`` paired variant (same math)."""
    zi, zq = capture_frontend_planar(block_i16, downsample, rotate)
    return jnp.stack([zi, zq], axis=-1)


def capture_frontend(block_i16, downsample: int, rotate: bool = True):
    """Production frontend dispatch: the masked-sum jnp path by default.

    This IS the production frontend: ``fm_chain_step`` / ``fm_chunk_step``
    call it for every boxcar-decimation chain (the default rx_fm path).

    Honest round-3 measurements (pool-as-argument methodology — the
    round-2 numbers in this docstring's history were poisoned by
    compile-time constant folding, docs/PERF.md "Retraction #2"), same
    4 MB geometry, real chip:

    =====================  ==========
    masked-sum jnp (this)   ~39 GB/s
    Pallas kernel           1.17 GB/s (its pre-kernel int32 bitcast
                            lowers scalar; the kernel body is fine)
    old rotate+reshape jnp  0.63 GB/s
    =====================  ==========

    The kernel stays opt-in (``RX_PALLAS=1``) as an A/B reference;
    ``RX_NO_PALLAS=1`` still forces jnp (kept so existing scripts work).
    """
    import os
    n = block_i16.shape[0] // 2
    rows = n // int(downsample)
    if (jax.default_backend() == "tpu" and rows % 8 == 0
            and os.environ.get("RX_PALLAS") == "1"
            and not os.environ.get("RX_NO_PALLAS")):
        return capture_frontend_pallas(block_i16, downsample, rotate)
    return capture_frontend_jnp(block_i16, downsample, rotate)
