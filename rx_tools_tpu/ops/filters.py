"""Scalar stream filters: de-emphasis IIR, DC blockers, squelch RMS.

- :func:`deemph_filter` — the FM de-emphasis one-pole IIR
  (``deemph_filter``, ``src/rtl_fm.c:667-682``):
  ``avg += (x - avg) / a`` with ``a = round(1/(1-exp(-1/(rate*tc))))``
  (``rtl_fm.c:1410-1415``).  A first-order *linear* recurrence
  ``y[n] = (1-1/a) y[n-1] + x[n]/a`` — parallelized exactly with
  ``lax.associative_scan`` (log-depth, fully on the VPU) instead of the
  reference's per-sample loop.  The C version's int rounding is dropped in
  float (SNR-bounded parity), and its process-global ``static int avg``
  ("cheating") becomes honest carried state.
- :func:`dc_block_audio` / :func:`dc_block_raw` — block-mean DC removal with
  exponential smoothing across blocks (``rtl_fm.c:684-721``), weight
  ``block_const`` (default 9).
- :func:`rms_level` — the squelch power estimator with DC-in-squares
  correction (``rms``, ``rtl_fm.c:739-757``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


def deemph_alpha(rate_out: int, time_constant_us: int) -> int:
    """``deemph_a`` from the -c time constant (us=75, eu=50); rtl_fm.c:1412."""
    tc = time_constant_us * 1e-6
    return int(round(1.0 / (1.0 - math.exp(-1.0 / (rate_out * tc)))))


def _iir_row_scan(b, c: float):
    """Inclusive first-order scan along the minor axis with CONSTANT decay:
    ``S[..., l] = c*S[..., l-1] + b[..., l]`` via Hillis-Steele shifted
    adds.  Because the decay is position-independent, each doubling level
    needs only the scalar ``c**s`` — no A-coefficient array — so this
    moves half the HBM traffic of the generic affine
    ``lax.associative_scan`` (measured 2x end-to-end on the deemph stage,
    docs/PERF.md round-3).  Minor-axis shifts are wide lane operations.
    """
    ll = b.shape[-1]
    s = 1
    while s < ll:
        pad = [(0, 0)] * (b.ndim - 1) + [(s, 0)]
        b = b + np.float32(c ** s) * jnp.pad(b, pad)[..., :ll]
        s *= 2
    return b


@functools.lru_cache(maxsize=16)
def _scan_matrix(lanes: int, c: float) -> np.ndarray:
    """(lanes, lanes) upper-triangular decay matrix: U[m, l] = c**(l-m)
    for l >= m.  ``b_row @ U`` computes the inclusive first-order scan
    ``S[l] = sum_{m<=l} c**(l-m) b[m]`` along the row — the whole in-row
    scan as ONE MXU contraction instead of log2(lanes) shifted-add passes
    over the data (each of which re-reads and re-writes the full array)."""
    i = np.arange(lanes)
    e = i[None, :] - i[:, None]
    return np.where(e >= 0, np.float64(c) ** np.maximum(e, 0),
                    0.0).astype(np.float32)


def _iir_scan_flat_mxu(avg, b, c: float, lanes: int = 128):
    """``y[n] = c*y[n-1] + b[n]`` (y[-1] = avg) over a flat stream, via a
    triangular MXU matmul per 128-lane row plus a tiny row-carry scan.

    Round-4 finding (tools/chipsuite13/14.py): the blocked Hillis-Steele
    (:func:`_iir_scan_flat`) measured 5 GB/s at bench geometry — its
    log2(block) shifted-add passes each traverse the whole array and the
    shifts defeat XLA's tiling.  The same recurrence as ``bp @ U``
    (U = ``_scan_matrix``) is one pass over the data on the MXU.  Same
    math up to sum reassociation (the dot evaluates each prefix as a
    fresh inner product), inside every golden tolerance.
    """
    k = b.shape[0]
    r = -(-k // lanes)
    bp = jnp.pad(b, (0, r * lanes - k)).reshape(r, lanes)
    u = jnp.asarray(_scan_matrix(lanes, float(c)))
    s_in = jax.lax.dot_general(bp, u, (((1,), (0,)), ((), ())),
                               precision=_HI)            # (r, lanes)
    cl = float(c) ** lanes
    # row ends via a full-width masked reduce (a [:, -1] column slice
    # lowers to a scalar loop on this backend — docs/PERF.md)
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, lanes), 1)
    ends = jnp.sum(jnp.where(lane == lanes - 1, s_in, 0.0), axis=1)
    ends_scan = _iir_row_scan(ends, cl)                  # (r,) inclusive
    decay = jnp.asarray((np.float64(cl) ** np.arange(r)).astype(np.float32))
    car = (jnp.concatenate([jnp.zeros((1,), b.dtype), ends_scan[:-1]])
           + decay * avg)
    cvec = jnp.asarray((np.float64(c) ** np.arange(1, lanes + 1)
                        ).astype(np.float32))
    y = (s_in + car[:, None] * cvec[None, :]).reshape(-1)[:k]
    return y[-1], y


def _iir_scan_batch_mxu(avg, b, c: float, lanes: int = 128):
    """Batched (C, M) minor-axis IIR scan via the triangular MXU matmul.

    Per-channel boundaries stay intact because M %% lanes == 0: the
    (C, M) stack reshapes row-major to (C*M/lanes, lanes) with every row
    inside one channel; the row-carry scan then runs per channel over
    the (C, M/lanes) row-end grid.  The channelizer's batched deemph was
    the same Hillis-Steele construct the flat path replaced (~30x on the
    stage, tools/chipsuite14/15.py)."""
    cdim, m = b.shape
    rows = m // lanes
    bp = b.reshape(cdim * rows, lanes)
    u = jnp.asarray(_scan_matrix(lanes, float(c)))
    s_in = jax.lax.dot_general(bp, u, (((1,), (0,)), ((), ())),
                               precision=_HI)
    cl = float(c) ** lanes
    lane = jax.lax.broadcasted_iota(jnp.int32, s_in.shape, 1)
    ends = jnp.sum(jnp.where(lane == lanes - 1, s_in, 0.0),
                   axis=1).reshape(cdim, rows)
    ends_scan = _iir_row_scan(ends, cl)                  # per-channel (C, R)
    decay = jnp.asarray((np.float64(cl) **
                         np.arange(rows)).astype(np.float32))
    car = (jnp.concatenate(
        [jnp.zeros((cdim, 1), b.dtype), ends_scan[:, :-1]], axis=1)
        + decay[None, :] * avg[:, None])                 # (C, R)
    cvec = jnp.asarray((np.float64(c) ** np.arange(1, lanes + 1)
                        ).astype(np.float32))
    y = (s_in.reshape(cdim, rows, lanes)
         + car[:, :, None] * cvec[None, None, :]).reshape(cdim, m)
    last = jnp.sum(jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, y.shape, 1) == m - 1, y, 0.0),
        axis=1)
    return last, y


def _iir_scan_flat(avg, b, c: float, block: int = 512):
    """``y[n] = c*y[n-1] + b[n]`` (y[-1] = avg) over a flat stream, as a
    two-level blocked scan: in-row Hillis-Steele over ``block`` lanes
    (log2(block) passes over the data instead of log2(N)), then a tiny
    carry scan over the N/block row ends, then one fused combine."""
    k = b.shape[0]
    r = -(-k // block)
    bp = jnp.pad(b, (0, r * block - k)).reshape(r, block)
    s_in = _iir_row_scan(bp, c)                     # (R, L) in-row scans
    cl = float(c) ** block
    ends = _iir_row_scan(s_in[:, -1], cl)           # (R,) inclusive carries
    # carry INTO row i: rows 0..i-1's inclusive carry, plus the decayed avg
    car = (jnp.concatenate([jnp.zeros((1,), b.dtype), ends[:-1]])
           + jnp.asarray(np.float32(cl) ** np.arange(r)) * avg)
    cvec = jnp.asarray((np.float64(c) ** np.arange(1, block + 1)
                        ).astype(np.float32))
    y = (s_in + car[:, None] * cvec[None, :]).reshape(-1)[:k]
    return y[-1], y


def deemph_filter(avg, x, deemph_a: int, axis: int = 0):
    """(carry, block) -> (carry, block) one-pole IIR, parallel-scan form.

    ``axis`` selects the time axis: 0 for a flat (N,) stream, -1/1 for a
    batched (C, N) channel stack (``avg`` then has shape (C,)).  The
    recurrence ``y[n] = (1-1/a) y[n-1] + x[n]/a`` has a constant decay,
    so the scan uses scalar per-level coefficients (:func:`_iir_row_scan`)
    rather than the generic affine associative scan.
    """
    if x.ndim > 1 and axis not in (-1, 1):
        # the blocked Hillis-Steele scans the MINOR axis; a 2-D input with
        # axis=0 would silently compute the wrong recurrence (advisor
        # finding, round 3) — fail loudly instead
        raise ValueError(
            f"deemph_filter on a {x.ndim}-D input scans the minor axis; "
            f"got axis={axis} (transpose the input or pass axis=-1)")
    inv_a = float(1.0 / deemph_a)
    c = 1.0 - inv_a
    b = x * jnp.float32(inv_a)
    if x.ndim == 1:
        if deemph_mxu_path():
            # one triangular MXU matmul instead of log2(block) whole-array
            # shifted-add passes: ~30x on the stage at bench geometry
            # (chipsuite14); CPU keeps the Hillis-Steele form (golden
            # semantics pinned there, and CPU has no MXU to feed)
            return _iir_scan_flat_mxu(avg, b, c)
        return _iir_scan_flat(avg, b, c)
    # batched (C, M): scan along the minor axis
    m = x.shape[-1]
    if jax.default_backend() == "tpu" and m % 128 == 0:
        return _iir_scan_batch_mxu(avg, b, c)
    s_in = _iir_row_scan(b, c)
    cvec = jnp.asarray((np.float64(c) ** np.arange(1, m + 1)
                        ).astype(np.float32))
    y = s_in + avg[..., None] * cvec
    return y[..., -1], y


# test hook: force the MXU scan form on any backend (deemph_filter's
# dispatch is TPU-only; CPU bitwise tests of blocked consumers set this)
_MXU_FORCE = False


def deemph_mxu_path() -> bool:
    """True when :func:`deemph_filter` on a flat stream would take the
    triangular-MXU scan — callers that must stay BIT-identical to a
    per-block loop of it (the scan engine's batched tail) gate on this."""
    return _MXU_FORCE or jax.default_backend() == "tpu"


def deemph_blocks(avg, x, deemph_a: int):
    """``M`` sequential per-block :func:`deemph_filter` calls as ONE
    program: ``x`` (M, K) -> ``(avg_end, y (M, K))``, BIT-identical to
    the loop on the MXU path (gate on :func:`deemph_mxu_path`).

    Same construction as ``ops.resample.resample_rows_blocks``: the
    in-row triangular dots of every block run as one batched dot, the
    per-block row-end scans run batched along the row axis, and only the
    cross-block average chain — M scalar affine steps, each replaying the
    exact f32 operation order the per-block call uses for its final
    element — is sequential.
    """
    inv_a = float(1.0 / deemph_a)
    c = 1.0 - inv_a
    b = x * jnp.float32(inv_a)
    mblk, k = b.shape
    lanes = 128
    r = -(-k // lanes)
    pad = r * lanes - k
    bp = jnp.pad(b, ((0, 0), (0, pad))).reshape(mblk * r, lanes)
    u = jnp.asarray(_scan_matrix(lanes, float(c)))
    s_in = jax.lax.dot_general(bp, u, (((1,), (0,)), ((), ())),
                               precision=_HI)            # (M*R, lanes)
    cl = float(c) ** lanes
    lane = jax.lax.broadcasted_iota(jnp.int32, s_in.shape, 1)
    ends = jnp.sum(jnp.where(lane == lanes - 1, s_in, 0.0),
                   axis=1).reshape(mblk, r)              # (M, R)
    ends_scan = _iir_row_scan(ends, cl)                  # per-block (M, R)
    decay = jnp.asarray((np.float64(cl) ** np.arange(r)).astype(np.float32))
    cvec = jnp.asarray((np.float64(c) ** np.arange(1, lanes + 1)
                        ).astype(np.float32))
    # cross-block average chain: avg_i = y_i[-1], replayed exactly as the
    # per-block call computes that element (car[last] = base + cl^last*avg;
    # y_end = s_in[last] + car[last]*cvec[last]); K % lanes == 0 keeps the
    # last element on the last row (callers' block sizes guarantee it)
    last_row = (k - 1) // lanes
    last_lane = (k - 1) % lanes
    s_last = jnp.sum(jnp.where(
        (lane == last_lane)
        & (jax.lax.broadcasted_iota(jnp.int32, s_in.shape, 0) % r
           == last_row), s_in, 0.0), axis=1).reshape(mblk, r).sum(axis=1)
    base_last = (jnp.concatenate(
        [jnp.zeros((mblk, 1), b.dtype), ends_scan[:, :-1]], axis=1)
        [:, last_row])                                   # (M,)
    avgs = [avg]
    for i in range(mblk):
        car_last = base_last[i] + np.float32(cl ** last_row) * avgs[i]
        avgs.append(s_last[i] + car_last * cvec[last_lane])
    avg_vec = jnp.stack(avgs[:-1])                       # (M,) at starts
    car = (jnp.concatenate(
        [jnp.zeros((mblk, 1), b.dtype), ends_scan[:, :-1]], axis=1)
        + decay[None, :] * avg_vec[:, None])             # (M, R)
    y = (s_in.reshape(mblk, r, lanes)
         + car[:, :, None] * cvec[None, None, :]).reshape(mblk, -1)[:, :k]
    return avgs[-1], y


def dc_block_audio(dc_avg, x, block_const: int = 9):
    """(carry, block) -> (carry, block); rtl_fm.c:684-697."""
    avg = jnp.mean(x)
    avg = (avg + dc_avg * block_const) / jnp.float32(block_const + 1)
    return avg, x - avg


def dc_block_raw(dc_iq, x, block_const: int = 9):
    """Raw I/Q DC block pre-demod; ``dc_iq`` shape (2,); rtl_fm.c:699-721."""
    avg = jnp.mean(x, axis=0)
    avg = (avg + dc_iq * block_const) / jnp.float32(block_const + 1)
    return avg, x - avg[None, :]


def mad_level(x):
    """Mean absolute deviation (``mad``, ``rtl_fm.c:722-737``).

    An alternative squelch estimator the reference ships but never calls;
    provided for capability parity.  ``x``: any shape, pooled.
    """
    v = x.reshape(-1)
    avg = jnp.sum(v) / v.shape[0]          # truncating int div in C; float here
    return jnp.sum(jnp.abs(v - avg)) / v.shape[0]


def rms_level(x):
    """RMS over all interleaved components with DC correction (rtl_fm.c:739).

    ``x``: (N, 2) — the reference calls ``rms(lowpassed, len, 1)`` over the
    interleaved buffer, i.e. I and Q samples pooled together.
    """
    v = x.reshape(-1)
    n = v.shape[0]
    t = jnp.sum(v)
    p = jnp.sum(v * v)
    dc = t / n
    err = t * 2 * dc - dc * dc * n
    return jnp.sqrt(jnp.maximum(p - err, 0.0) / n)


def rms_level_planar(zi, zq):
    """Same estimator over planar I/Q streams (no interleaved reshape —
    the planar chain's squelch path; identical value)."""
    n = 2 * zi.shape[0]
    t = jnp.sum(zi) + jnp.sum(zq)
    p = jnp.sum(zi * zi) + jnp.sum(zq * zq)
    dc = t / n
    err = t * 2 * dc - dc * dc * n
    return jnp.sqrt(jnp.maximum(p - err, 0.0) / n)
