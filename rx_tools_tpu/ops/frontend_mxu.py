"""MXU formulations of the fused capture frontend.

The masked-reduce frontend (``ops/pallas_frontend.py``, round 3) lifted
the capture head from 0.6 to ~39 GB/s, but its reduction runs over a
2D-wide trailing axis (2D = 28 for the WBFM chain): only 28 of the
128 VPU lanes carry data, and the measured rate sits far below the
~790 GB/s delivered-bandwidth ceiling (tools/roofline.py).  This module
re-expresses the same computation — CS16 rescale (``rtl_fm.c:845-848``),
fs/4 derotation (``rtl_fm.c:309-327``), boxcar decimate by D
(``rtl_fm.c:351-371``) — as matrix products so the reduction runs on the
MXU (the systolic array), the unit with by far the most arithmetic
headroom on a TPU:

``capture_frontend_mm`` (the block-banded matmul)::

    out[r, :] = g[r, :] @ M           g = y.reshape(K/P, P*2D)

where ``M`` (P*2D, 2P) holds P shifted copies of the {+1, 0, -1}
fs/4+decimate masks with the group phase ``i**(D*k)`` folded into each
column (P % 4 == 0 makes the phase pattern tile, so no post-select at
all).  For the WBFM geometry the contraction length lands on an exact
multiple of 128 (P=32, D=14 -> 896 = 7*128): no contraction padding.
Output columns [0:P) are the P in-row Re samples, [P:2P) the Im — wide
column blocks, never a 2-wide slice.

``capture_frontend_t2`` (the thin matmul)::

    out = M2 @ g.T        M2 (2, 2D), g (K, 2D)  ->  out (2, K)

keeps the output planar by construction (row 0 = Re stream, row 1 = Im)
at the cost of contraction padding 2D -> 128; the group phase is applied
as the usual elementwise K-select.

Precision: the mask entries are exactly representable and the rescaled
inputs carry 15 mantissa bits, so ``Precision.HIGHEST`` reproduces the
f32 elementwise formulation up to sum reassociation (same class of
~1e-4-at-8-bit-scale error as the masked reduce).  DEFAULT (bf16 inputs,
8 mantissa bits) is NOT acceptable here and is never used.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rx_tools_tpu.ops.pallas_frontend import _SCALE, _fs4_decim_masks

_HI = jax.lax.Precision.HIGHEST


def _group_phase_select(zi, zq, d: int):
    """Apply the per-output-sample group phase ``i**(D*k)`` elementwise."""
    k = jnp.arange(zi.shape[0], dtype=jnp.int32)
    p = (k * (d & 3)) & 3
    return (jnp.where(p == 0, zi, jnp.where(p == 1, -zq,
                      jnp.where(p == 2, -zi, zq))),
            jnp.where(p == 0, zq, jnp.where(p == 1, zi,
                      jnp.where(p == 2, -zq, -zi))))


@functools.lru_cache(maxsize=32)
def _fs4_decim_matrix(d: int, p: int, rotate: bool) -> np.ndarray:
    """(P*2D, 2P) block-banded mask matrix, group phase folded per column.

    Column j in [0, P) is Re(z[r*P+j]), column P+j is Im; rows
    [j*2D, (j+1)*2D) carry the fs/4+decimate masks for phase j rotated by
    ``i**(D*j mod 4)`` (valid because P % 4 == 0 tiles the phase pattern:
    D*(r*P+j) === D*j (mod 4)).
    """
    assert p % 4 == 0 or not rotate or d % 4 == 0
    a, b = _fs4_decim_masks(d, rotate)            # (2D,) each, {+1,0,-1}
    m = np.zeros((p * 2 * d, 2 * p), np.float32)
    for j in range(p):
        ph = (d * j) & 3 if rotate else 0
        # z[k] = i**ph * (a.x_j + i b.x_j)
        if ph == 0:
            re, im = a, b
        elif ph == 1:
            re, im = -b, a
        elif ph == 2:
            re, im = -a, -b
        else:
            re, im = b, -a
        rows = slice(j * 2 * d, (j + 1) * 2 * d)
        m[rows, j] = re
        m[rows, p + j] = im
    return m


def _pick_p(k: int, d: int, rotate: bool) -> int:
    """Largest supported phase-block size dividing the output length."""
    need4 = rotate and (d & 3) != 0
    for cand in (32, 16, 8, 4):
        if k % cand == 0:
            return cand
    if not need4 and k % 2 == 0:
        return 2
    return 1


def capture_frontend_mm(block_i16, downsample: int, rotate: bool = True,
                        p: int | None = None, precision=_HI):
    """``(2N,) int16 -> ((K,), (K,)) float32`` planar, via one MXU matmul.

    Semantics identical to ``capture_frontend_planar`` up to f32 sum
    reassociation.  ``p`` is the phase-block size (output samples per
    matmul row); None picks the largest of {32, 16, 8, 4} dividing K.
    """
    d = int(downsample)
    k = block_i16.shape[0] // (2 * d)
    if p is None:
        p = _pick_p(k, d, rotate)
    if p == 1:                                   # no usable block size
        from rx_tools_tpu.ops.pallas_frontend import capture_frontend_planar
        return capture_frontend_planar(block_i16, downsample, rotate)
    y = block_i16.astype(jnp.float32) * _SCALE
    g = y.reshape(k // p, p * 2 * d)
    m = jnp.asarray(_fs4_decim_matrix(d, p, bool(rotate)))
    out = jax.lax.dot_general(g, m, (((1,), (0,)), ((), ())),
                              precision=precision)       # (K/P, 2P)
    zi = out[:, :p].reshape(-1)
    zq = out[:, p:].reshape(-1)
    return zi, zq


def capture_frontend_mm_i8(block_i16, downsample: int, rotate: bool = True,
                           p: int | None = None):
    """``(2N,) int16 -> ((K,), (K,)) float32`` planar, via TWO int8 MXU
    dots (round-4 probe).

    The f32 dot pays a converted-f32 materialization (10 B of HBM per
    2 B input).  Splitting each int16 into (hi, lo-128) int8 planes and
    dotting both against the {+1, 0, -1} mask matrix in the MXU's native
    int8 mode halves that intermediate traffic and accumulates EXACTLY in
    int32 (x = 256*hi + (lo-128) + 128; the +128 correction is the
    precomputed column sum of the mask matrix) — integer-exact like the
    C's own int sums, then one scale to the 8-bit float range.

    MEASURED AND REJECTED (round-4, /tmp recipe recorded in docs/PERF.md):
    fe 17.9 vs 34.9 GB/s for the f32 dot, chain 23.4 vs 42.2 — the int8
    plane materializations land in the same ~36 GB/s narrow-store class
    as int16 stores on this backend, eating the traffic win.  Kept as a
    documented negative result and integer-exactness reference.
    """
    d = int(downsample)
    k = block_i16.shape[0] // (2 * d)
    if p is None:
        p = _pick_p(k, d, rotate)
    if p == 1:
        from rx_tools_tpu.ops.pallas_frontend import capture_frontend_planar
        return capture_frontend_planar(block_i16, downsample, rotate)
    x = block_i16.reshape(k // p, p * 2 * d)
    hi = (x >> 8).astype(jnp.int8)
    lo = (jnp.bitwise_and(x, 255) - 128).astype(jnp.int8)
    m = _fs4_decim_matrix(d, p, bool(rotate))
    m8 = jnp.asarray(m.astype(np.int8))
    csum = jnp.asarray(128 * m.sum(axis=0).astype(np.int32))     # (2P,)
    dims = (((1,), (0,)), ((), ()))
    zhi = jax.lax.dot_general(hi, m8, dims,
                              preferred_element_type=jnp.int32)
    zlo = jax.lax.dot_general(lo, m8, dims,
                              preferred_element_type=jnp.int32)
    out = (zhi * 256 + zlo + csum[None, :]).astype(jnp.float32) * _SCALE
    return out[:, :p].reshape(-1), out[:, p:].reshape(-1)


def capture_frontend_mm_i16(block_i16, downsample: int, rotate: bool = True,
                            p: int | None = None):
    """``(2N,) int16 -> ((K,), (K,)) float32`` planar, via ONE integer dot.

    Round-5 probe of the frontend's measured ~5x traffic amplification
    (docs/PERF.md round-4: int16 in, f32 materialize write+read, planar
    out — the converted f32 stream costs 8 B of HBM per 2 B input because
    XLA's dot lowering won't absorb the elementwise convert).  This
    variant feeds the dot the RAW int16 stream against an int16 mask
    matrix with int32 accumulation — no converted intermediate exists at
    all, and the result is INTEGER-EXACT (sums of <= 2D masked int16
    terms; the one f32 scale runs on the 1/D-sized output).  Whether the
    backend lowers an int16xint16->int32 dot onto the MXU efficiently is
    exactly what the in-chain A/B measures.
    """
    d = int(downsample)
    k = block_i16.shape[0] // (2 * d)
    if p is None:
        p = _pick_p(k, d, rotate)
    if p == 1:
        from rx_tools_tpu.ops.pallas_frontend import capture_frontend_planar
        return capture_frontend_planar(block_i16, downsample, rotate)
    g = block_i16.reshape(k // p, p * 2 * d)
    m = jnp.asarray(_fs4_decim_matrix(d, p, bool(rotate)).astype(np.int16))
    out = jax.lax.dot_general(g, m, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    outf = out.astype(jnp.float32) * _SCALE
    return outf[:, :p].reshape(-1), outf[:, p:].reshape(-1)


def capture_frontend_mm_i16_2(block_i16, downsample: int,
                              rotate: bool = True, p: int | None = None):
    """Two-dot twin of :func:`capture_frontend_mm_i16`: separate Re and
    Im mask matrices, so each dot's (rows, P) output reshapes row-major
    to the planar stream with NO column-block slice (the single-dot form
    pays two (rows, P)-of-(rows, 2P) slice relayouts).  Costs a second
    read of the raw int16 operand (2 B/sample) — the A/B decides
    (tools/chipsuite26.py)."""
    d = int(downsample)
    k = block_i16.shape[0] // (2 * d)
    if p is None:
        p = _pick_p(k, d, rotate)
    if p == 1:
        from rx_tools_tpu.ops.pallas_frontend import capture_frontend_planar
        return capture_frontend_planar(block_i16, downsample, rotate)
    g = block_i16.reshape(k // p, p * 2 * d)
    m = _fs4_decim_matrix(d, p, bool(rotate)).astype(np.int16)
    mi, mq = jnp.asarray(m[:, :p]), jnp.asarray(m[:, p:])
    dims = (((1,), (0,)), ((), ()))
    zi = jax.lax.dot_general(g, mi, dims,
                             preferred_element_type=jnp.int32)
    zq = jax.lax.dot_general(g, mq, dims,
                             preferred_element_type=jnp.int32)
    return (zi.astype(jnp.float32).reshape(-1) * _SCALE,
            zq.astype(jnp.float32).reshape(-1) * _SCALE)


def capture_frontend_mm_bf16(block_i16, downsample: int, rotate: bool = True,
                             p: int | None = None):
    """``(2N,) int16 -> ((K,), (K,)) float32`` planar, bf16-intermediate dot.

    Round-5 traffic probe ONLY — bf16 keeps 8 mantissa bits, so the
    rescaled 15-bit inputs are truncated and golden parity is broken;
    this exists to measure whether halving the converted intermediate
    (2 B bf16 vs 4 B f32) moves the in-chain rate, separating "the dot's
    input materialization is the cost" from "the dot itself is".  Never
    dispatched by production code.
    """
    d = int(downsample)
    k = block_i16.shape[0] // (2 * d)
    if p is None:
        p = _pick_p(k, d, rotate)
    if p == 1:
        from rx_tools_tpu.ops.pallas_frontend import capture_frontend_planar
        return capture_frontend_planar(block_i16, downsample, rotate)
    y = (block_i16.astype(jnp.bfloat16)
         * jnp.bfloat16(float(_SCALE)))
    g = y.reshape(k // p, p * 2 * d)
    m = jnp.asarray(_fs4_decim_matrix(d, p, bool(rotate))
                    .astype(np.float32)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(g, m, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out[:, :p].reshape(-1), out[:, p:].reshape(-1)


def _mm_kernel(x_ref, m_ref, o_ref, *, scale: float):
    # Mosaic only lowers Precision.HIGHEST (f32) dots; HIGH raises
    v = x_ref[:].astype(jnp.float32) * scale          # int16 tile -> f32 VMEM
    o_ref[:] = jnp.dot(v, m_ref[:], precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)


def capture_frontend_mm_pallas(block_i16, downsample: int,
                               rotate: bool = True, p: int = 32,
                               tile_rows: int = 128, precision=_HI,
                               interpret: bool = False):
    """The block-banded matmul with the int16->f32 convert fused in VMEM.

    The plain ``capture_frontend_mm`` makes XLA materialize the converted
    f32 stream in HBM before the dot reads it back (dots don't absorb
    elementwise producers): ~10 B of HBM traffic per 2 B input sample.
    This Pallas kernel stages an int16 ``(T, P*2D)`` tile into VMEM,
    converts + rescales on the VPU, and feeds the MXU directly — HBM
    traffic is the raw int16 in plus the 1/D-sized decimated out.  This
    is the pattern class where a hand kernel CAN win (docs/PERF.md: the
    round-2 kernel lost because XLA had already fused everything; here
    the fusion barrier sits in XLA's own dot lowering).

    Requires ``K % p == 0``; the row grid handles ragged ``K/p % tile_rows``
    via Pallas bounds masking.  Semantics == ``capture_frontend_mm``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = int(downsample)
    k = block_i16.shape[0] // (2 * d)
    assert k % p == 0, (k, p)
    rows = k // p
    x = block_i16.reshape(rows, p * 2 * d)
    m = jnp.asarray(_fs4_decim_matrix(d, p, bool(rotate)))
    t = min(tile_rows, rows)
    grid = (rows + t - 1) // t
    del precision                     # kernel always uses HIGHEST (Mosaic)
    kern = functools.partial(_mm_kernel, scale=float(_SCALE))
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((t, p * 2 * d), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((p * 2 * d, 2 * p), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((t, 2 * p), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 2 * p), jnp.float32),
        interpret=interpret,
    )(x, m)
    return out[:, :p].reshape(-1), out[:, p:].reshape(-1)


def _mm_kernel2(x_ref, mi_ref, mq_ref, oi_ref, oq_ref, *, scale: float):
    v = x_ref[:].astype(jnp.float32) * scale
    oi_ref[:] = jnp.dot(v, mi_ref[:], precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
    oq_ref[:] = jnp.dot(v, mq_ref[:], precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)


def capture_frontend_mm_pallas2(block_i16, downsample: int,
                                rotate: bool = True, p: int = 32,
                                tile_rows: int = 256,
                                interpret: bool = False):
    """Two-output twin of :func:`capture_frontend_mm_pallas`: the kernel
    writes the Re and Im planes as SEPARATE (rows, P) arrays, so the
    planar streams are plain row-major reshapes of whole outputs instead
    of ``out[:, :P]`` column-block slices (a relayout copy each).
    Semantics identical; round-4 A/B candidate (tools/chipsuite15.py).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = int(downsample)
    k = block_i16.shape[0] // (2 * d)
    assert k % p == 0, (k, p)
    rows = k // p
    x = block_i16.reshape(rows, p * 2 * d)
    m = np.asarray(_fs4_decim_matrix(d, p, bool(rotate)))
    mi, mq = jnp.asarray(m[:, :p]), jnp.asarray(m[:, p:])
    t = min(tile_rows, rows)
    grid = (rows + t - 1) // t
    kern = functools.partial(_mm_kernel2, scale=float(_SCALE))
    oi, oq = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((t, p * 2 * d), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((p * 2 * d, p), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((p * 2 * d, p), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((t, p), lambda g: (g, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((t, p), lambda g: (g, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((rows, p), jnp.float32),
                   jax.ShapeDtypeStruct((rows, p), jnp.float32)],
        interpret=interpret,
    )(x, mi, mq)
    return oi.reshape(-1), oq.reshape(-1)


def capture_frontend_t2(block_i16, downsample: int, rotate: bool = True,
                        precision=_HI):
    """``(2N,) int16 -> ((K,), (K,)) float32`` planar, thin-matmul variant.

    ``(2, 2D) @ (K, 2D)^T -> (2, K)``: output rows ARE the planar streams
    (K on the lane axis), group phase applied as the elementwise select.
    """
    d = int(downsample)
    k = block_i16.shape[0] // (2 * d)
    y = block_i16.astype(jnp.float32) * _SCALE
    g = y.reshape(k, 2 * d)
    a, b = _fs4_decim_masks(d, bool(rotate))
    m2 = jnp.asarray(np.stack([a, b]))                    # (2, 2D)
    out = jax.lax.dot_general(m2, g, (((1,), (1,)), ((), ())),
                              precision=precision)        # (2, K)
    zi, zq = out[0], out[1]
    if rotate and d % 4:
        zi, zq = _group_phase_select(zi, zq, d)
    return zi, zq


def capture_frontend_conv(block_i16, downsample: int, rotate: bool = True,
                          precision=_HI):
    """``(2N,) int16 -> ((K,), (K,)) float32`` planar, strided-conv variant.

    One ``conv_general_dilated`` with window = stride = 2D over the flat
    interleaved stream, 2 output features (Re mask, Im mask).
    """
    d = int(downsample)
    y = (block_i16.astype(jnp.float32) * _SCALE)[None, None, :]  # (1, 1, 2N)
    a, b = _fs4_decim_masks(d, bool(rotate))
    rhs = jnp.asarray(np.stack([a, b])[:, None, :])       # (2, 1, 2D)
    out = jax.lax.conv_general_dilated(
        y, rhs, window_strides=(2 * d,), padding="VALID",
        precision=precision)[0]                           # (2, K)
    zi, zq = out[0], out[1]
    if rotate and d % 4:
        zi, zq = _group_phase_select(zi, zq, d)
    return zi, zq
