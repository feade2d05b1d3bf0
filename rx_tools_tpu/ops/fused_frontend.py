"""One-kernel capture+demod front: rescale -> fs/4 -> decimate -> fast-atan
FM discriminator -> squelch-level partials, fused in VMEM.

Round-4 finding (tools/chipsuite13/15.py): with the deemphasis scan moved
to the MXU the chain's remaining front cost is NOT arithmetic — the
Pallas frontend standalone reads ~250 GB/s but frontend+levels in-chain
measured ~60 GB/s — it is the *op boundaries*: every K-rate stage
(planar split, shifted prev, discriminator, levels reduces) re-reads and
re-writes the 1.8 MB planar intermediates through HBM, and each op costs
dispatch overhead on this backend.  This kernel keeps the decimated
stream in VMEM from the matmul through the discriminator:

    int16 (T, P*2D) tile -> convert+rescale (VPU)
                         -> block-banded fs/4+decimate matmul (MXU)
                         -> previous-sample shift via lane/sublane rolls
                         -> fast_atan2 discriminator   (rtl_fm.c:485-513)
                         -> per-tile level partials     (rtl_fm.c:739-757)

HBM traffic: the raw int16 in, the (K,) discriminator stream out, plus
(grid, 4) seam pairs and (grid, 2) level partials — nothing else.

The per-buffer seam quirk (sample 0 of every read buffer uses the std
atan2 regardless of -A mode, ``fm_demod`` rtl_fm.c:588-590) is applied
OUTSIDE the kernel: Mosaic has no ``arctan2`` lowering (measured,
tools/chipsuite14.py), so the kernel emits each tile's first/last complex
pair and :func:`fused_capture_fm_demod` rewrites the M seam samples with
the exact ``polar_discriminant`` — bit-identical to the unfused chain.

Geometry: requires K %% (tile_rows*P) == 0 and block seams aligned to
tile starts; the dispatch in ``models/fmchunk.py`` falls back to the
unfused path otherwise (and for every non-(fm, fast-atan, no-squelch)
config).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rx_tools_tpu.ops.frontend_mxu import _fs4_decim_matrix
from rx_tools_tpu.ops.pallas_frontend import _SCALE
from rx_tools_tpu.ops.discriminators import polar_discriminant

_P = 32
_PI4 = np.float32(1 << 12)
_PI34 = np.float32(3 * (1 << 12))

# OPT-IN (RX_FUSED=1, read once at import): the round-4 chain A/B put
# the fused front BEHIND the unfused multi-op front (33.3 vs 40.2 GB/s,
# tools/chipsuite16.py) — on this backend every Pallas frontend variant
# measures in the same ~26-40 GB/s band as the whole chain, i.e. the
# kernel class, not the op count, is the limit (see chipsuite17's
# scheme-control experiment).  The kernel stays as a measured A/B
# reference and a fusion template.
_ON = __import__("os").environ.get("RX_FUSED", "") == "1"


def fused_eligible(cfg, k_per_block: int) -> bool:
    """True when the one-kernel front covers this config AND the user
    opted in (RX_FUSED=1): TPU backend, boxcar decimation, FM with the
    fast-atan discriminator, squelch off, no raw DC block, and a
    tile-alignable geometry."""
    return (_ON and jax.default_backend() == "tpu"
            and cfg.mode == "fm" and cfg.custom_atan == 1
            and cfg.squelch_level == 0 and not cfg.dc_block_raw
            and not cfg.downsample_passes and cfg.fir_quality <= 9
            and pick_tile_rows(k_per_block) > 0)


def _fused_kernel(x_ref, mi_ref, mq_ref, d_ref, fl_ref, lv_ref, carry, *,
                  scale: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        carry[0, 0] = 0.0
        carry[0, 1] = 0.0

    # x_ref: (T4, 4*P*2D) int16 — four consecutive phase-groups per row,
    # so (T4, 128) row-major IS the flat sample order.  Each 32-lane
    # quarter of the planar outputs gets its own (T4, 2D*P) @ (2D*P, P)
    # dot (same total MACs as the plain P=32 frontend kernel; Mosaic has
    # no (T,32)->(T/4,128) shape cast — measured, and the first cut's
    # (T, 32) epilogue wasted 3/4 of every VPU op: tools/chipsuite16.py)
    v = x_ref[:].astype(jnp.float32) * scale            # (T4, 4*P*2D)
    t4 = v.shape[0]
    w = v.shape[1] // 4                                 # P*2D
    hi = jax.lax.Precision.HIGHEST
    zi = jnp.concatenate(
        [jnp.dot(v[:, i * w:(i + 1) * w], mi_ref[:], precision=hi,
                 preferred_element_type=jnp.float32) for i in range(4)],
        axis=1)                                         # (T4, 128)
    zq = jnp.concatenate(
        [jnp.dot(v[:, i * w:(i + 1) * w], mq_ref[:], precision=hi,
                 preferred_element_type=jnp.float32) for i in range(4)],
        axis=1)

    # previous sample in row-major sample order: lane j-1 of the same
    # row; lane 0 takes lane 127 of the row above; (0, 0) takes the
    # cross-tile carry (TPU grid iterations run sequentially, so the
    # scratch carries the last pair of the previous tile)
    zi_l = pltpu.roll(zi, shift=1, axis=1)              # lane0 <- lane 127
    zq_l = pltpu.roll(zq, shift=1, axis=1)
    zi_u = pltpu.roll(zi_l, shift=1, axis=0)            # row r <- row r-1
    zq_u = pltpu.roll(zq_l, shift=1, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, (t4, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (t4, 128), 1)
    pi = jnp.where(lane == 0, zi_u, zi_l)
    pq = jnp.where(lane == 0, zq_u, zq_l)
    first = (lane == 0) & (row == 0)
    pi = jnp.where(first, carry[0, 0], pi)
    pq = jnp.where(first, carry[0, 1], pq)

    # c = z * conj(prev);  fast integer-octant atan2 (rtl_fm.c:485-513)
    # with the octant branches merged BEFORE the division so each sample
    # pays ONE divide; the 0/0 lane is masked after
    cr = zi * pi + zq * pq
    cj = zq * pi - zi * pq
    yabs = jnp.abs(cj)
    num = jnp.where(cr >= 0, cr - yabs, cr + yabs)
    den = jnp.where(cr >= 0, cr + yabs, yabs - cr)
    base = jnp.where(cr >= 0, _PI4, _PI34)
    ang = base - _PI4 * (num / den)
    ang = jnp.where((cr == 0) & (cj == 0), 0.0, ang)
    d_ref[:] = jnp.where(cj < 0, -ang, ang)

    # per-tile outputs: seam pairs + level partials (combined outside).
    # These refs hold the FULL (grid, 4)/(grid, 2) arrays in SMEM (a
    # (1, x) VMEM block violates Mosaic's (8, 128)-divisibility rule and
    # VMEM refuses scalar stores — both measured on hardware); each grid
    # step writes its own row at a dynamic index, scalar by scalar.
    fl_ref[g, 0] = zi[0, 0]
    fl_ref[g, 1] = zq[0, 0]
    fl_ref[g, 2] = zi[t4 - 1, 127]
    fl_ref[g, 3] = zq[t4 - 1, 127]
    lv_ref[g, 0] = jnp.sum(zi) + jnp.sum(zq)
    lv_ref[g, 1] = jnp.sum(zi * zi) + jnp.sum(zq * zq)

    carry[0, 0] = zi[t4 - 1, 127]
    carry[0, 1] = zq[t4 - 1, 127]


def fused_capture_fm(block_i16, downsample: int, rotate: bool = True,
                     tile_rows: int = 144, interpret: bool = False):
    """``(2N,) int16 -> (d (K,), firstlast (G, 4), levels (G, 2))``.

    ``d`` is the fast-atan discriminator stream (seam samples still in
    fast-atan form — fix them with :func:`fused_capture_fm_demod`);
    ``firstlast[g] = [zi_first, zq_first, zi_last, zq_last]`` of tile g;
    ``levels[g] = [sum(zi)+sum(zq), sum(zi^2)+sum(zq^2)]``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = int(downsample)
    k = block_i16.shape[0] // (2 * d)
    rows = k // _P
    assert (k % _P == 0 and rows % tile_rows == 0
            and tile_rows % 32 == 0), (k, rows, tile_rows)
    grid = rows // tile_rows
    rows4 = rows // 4
    t4 = tile_rows // 4
    # four phase-groups per kernel row: (rows4, 128) output is the flat
    # sample order (the regroup happens here in XLA, not in-kernel)
    x = block_i16.reshape(rows4, 4 * _P * 2 * d)
    m = _fs4_decim_matrix(d, _P, bool(rotate))
    mi, mq = jnp.asarray(m[:, :_P]), jnp.asarray(m[:, _P:])
    kern = functools.partial(_fused_kernel, scale=float(_SCALE))
    dd, fl, lv = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((t4, 4 * _P * 2 * d), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_P * 2 * d, _P), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_P * 2 * d, _P), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((t4, 128), lambda g: (g, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((grid, 4), lambda g: (0, 0),
                                memory_space=pltpu.SMEM),
                   pl.BlockSpec((grid, 2), lambda g: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((rows4, 128), jnp.float32),
                   jax.ShapeDtypeStruct((grid, 4), jnp.float32),
                   jax.ShapeDtypeStruct((grid, 2), jnp.float32)],
        scratch_shapes=[pltpu.SMEM((1, 2), jnp.float32)],
        interpret=interpret,
    )(x, mi, mq)
    return dd.reshape(-1), fl, lv


def pick_tile_rows(k_per_block: int) -> int:
    """Largest supported tile height so block seams land on tile starts:
    must divide the per-block row count AND be a multiple of 32 (the
    kernel regroups each (T, 32) plane into full-lane (T/4, 128) views,
    needing T/4 sublane-aligned); 0 = no usable geometry (caller falls
    back to the unfused path)."""
    if k_per_block % _P:
        return 0
    rpb = k_per_block // _P
    for cand in (256, 224, 192, 160, 128, 96, 64, 32):
        if rpb % cand == 0:
            return cand
    return 0


def fused_capture_fm_demod(prev_iq, blocks_flat, downsample: int,
                           k_per_block: int, rotate: bool = True,
                           interpret: bool = False):
    """Full fused front for the flat chunk engine.

    ``blocks_flat``: (M*2N,) int16, M blocks of ``k_per_block`` output
    samples each.  Returns ``(new_prev_iq (2,), d (K,), levels (M,))``
    with semantics identical to ``capture_frontend_planar`` +
    ``fm_discriminate_planar(..., seam_stride=k_per_block)`` + the
    rms level formula (golden-tested against that composition).
    """
    t = pick_tile_rows(k_per_block)
    dd, fl, lv = fused_capture_fm(blocks_flat, downsample, rotate,
                                  tile_rows=t, interpret=interpret)
    k_tot = dd.shape[0]
    m = k_tot // k_per_block
    tiles_per_block = (k_per_block // _P) // t
    grid = fl.shape[0]

    # --- seam quirk: std atan2 at sample 0 of every block --------------
    # (fm_demod, rtl_fm.c:588-590); seams sit at tile starts by
    # construction.  prev pair for block b = last pair of the previous
    # tile (the chunk's carried prev_iq for b == 0).
    gidx = jnp.arange(m) * tiles_per_block
    z0 = fl[gidx, 0:2]                                  # (M, 2) seam pair
    prev_last = fl[jnp.maximum(gidx - 1, 0), 2:4]
    prev = jnp.where((jnp.arange(m) == 0)[:, None], prev_iq[None, :],
                     prev_last)
    cr = z0[:, 0] * prev[:, 0] + z0[:, 1] * prev[:, 1]
    cj = z0[:, 1] * prev[:, 0] - z0[:, 0] * prev[:, 1]
    d_seam = polar_discriminant(cr, cj)
    dd = dd.at[gidx * (t * _P)].set(d_seam)

    # --- levels: combine per-tile partials per block --------------------
    lvb = lv.reshape(m, tiles_per_block, 2).sum(axis=1)
    tsum, psum = lvb[:, 0], lvb[:, 1]
    nn = 2 * k_per_block
    dc = tsum / nn
    err = tsum * 2 * dc - dc * dc * nn
    levels = jnp.sqrt(jnp.maximum(psum - err, 0.0) / nn)

    new_prev = fl[grid - 1, 2:4]
    return new_prev, dd, levels
