"""Rational audio resampler (fast -> slow), ``low_pass_real`` re-designed.

The reference (``src/rtl_fm.c:389-409``) accumulates samples and emits one
averaged output every time a fractional phase (``prev_lpr_index += slow``)
crosses ``fast``, dividing by the *truncated* ratio ``fast // slow`` — e.g.
170 kHz -> 32 kHz emits alternating 5- and 6-sample windows, all divided
by 5.  Output length is data-dependent (±1 per block), which is hostile to
XLA's static shapes; following SURVEY.md §7 this is jitted as a fixed-capacity
output plus a valid count:

- :func:`resample_divisible` — static fast path when ``fast % slow == 0``:
  a pure reshape-sum, fully fused.
- :func:`resample_rational` — the general carried-phase path via cumsum +
  emit-mask + gather; capacity ``N*slow//fast + 2``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SincResampleState(NamedTuple):
    """Carry for :func:`resample_sinc`: FIR tail + exact rational phase."""
    tail: jnp.ndarray      # (T,) trailing input samples
    num: jnp.ndarray       # () int32: phase numerator (units of 1/slow input)

    @staticmethod
    def init(taps: int):
        return SincResampleState(jnp.zeros((taps,), jnp.float32),
                                 jnp.zeros((), jnp.int32))


def _sinc_phase_lut(taps: int, phases: int, cutoff: float) -> np.ndarray:
    """(phases, taps) windowed-sinc interpolation weights, unity gain."""
    w = np.empty((phases, taps), np.float32)
    center = (taps - 1) / 2.0
    for p in range(phases):
        frac = p / phases
        t = np.arange(taps) - center - frac
        h = np.sinc(cutoff * t) * cutoff * np.kaiser(taps, 8.6)
        w[p] = h / h.sum()
    return w


def resample_sinc(state: SincResampleState, x, fast: int, slow: int,
                  taps: int = 16, phases: int = 128):
    """High-quality arbitrary-ratio resampler — beyond the reference.

    The reference's ``low_pass_real`` is an accumulate-and-dump with
    alternating window lengths; measured it caps the whole wbfm chain at
    ~21 dB audio SNR while the chain upstream delivers ~70 dB
    (docs/PERF.md).  This is the classic polyphase windowed-sinc
    interpolator instead: output ``k`` sits at input position
    ``(num0 + k*fast) / slow``; the integer part indexes a ``taps``-wide
    gather, the fractional part selects one of ``phases`` precomputed
    Kaiser-sinc weight rows.  Fully parallel (gather + weighted sum), no
    scan.  Enabled by ``FmConfig.resample_quality = taps``.

    Returns ``(state, y, n_valid)`` with static capacity like
    :func:`resample_rational`; gain is the reference-compatible window
    average (unity).
    """
    import math as _m
    g = _m.gcd(int(fast), int(slow))
    fast, slow = int(fast) // g, int(slow) // g
    n = x.shape[0]
    cap = n * slow // fast + 2
    if cap * fast + slow >= 2 ** 31:
        raise ValueError("block too large for int32 resampler phase")
    lut = jnp.asarray(_sinc_phase_lut(taps, phases, min(1.0, slow / fast)))
    xp = jnp.concatenate([state.tail, x])               # (T + N,)
    k = jnp.arange(cap, dtype=jnp.int32)
    num = state.num + k * jnp.int32(fast)               # position*slow
    idx = num // jnp.int32(slow)                        # integer input index
    frac = num - idx * jnp.int32(slow)
    ph = (frac * jnp.int32(phases)) // jnp.int32(slow)
    # window for output k: xp[idx + 0 .. idx + T - 1] (tail supplies history)
    valid = idx + taps - 1 < xp.shape[0]
    idxc = jnp.clip(idx, 0, xp.shape[0] - taps)
    windows = xp[idxc[:, None] + jnp.arange(taps)[None, :]]   # (cap, T)
    weights = lut[ph]                                          # (cap, T)
    y = jnp.sum(windows * weights, axis=1)
    y = jnp.where(valid, y, 0.0)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    # carry: keep the last T inputs; advance num by consumed inputs
    consumed = n                                           # all inputs consumed
    new_num = state.num + n_valid * jnp.int32(fast) - consumed * jnp.int32(slow)
    return (SincResampleState(xp[-taps:], new_num.astype(jnp.int32)),
            y, n_valid)


def _cumsum_mxu(x, lanes: int = 128):
    """Inclusive cumsum over a flat float32 stream via a triangular MXU
    matmul per 128-lane row + a tiny row-carry cumsum.

    ``jnp.cumsum`` on this backend runs far below bandwidth on long
    streams (round-3: ~35 GB/s; it was half the resampler's remaining
    cost).  One pass over the data through the MXU instead
    (filters._scan_matrix with c=1).  Reassociates sums (each prefix is
    a fresh inner product) — same f32 error class as the log-depth scan.
    """
    from rx_tools_tpu.ops.filters import _scan_matrix
    k = x.shape[0]
    r = -(-k // lanes)
    xp = jnp.pad(x, (0, r * lanes - k)).reshape(r, lanes)
    u = jnp.asarray(_scan_matrix(lanes, 1.0))
    s_in = jax.lax.dot_general(xp, u, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST)
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, lanes), 1)
    ends = jnp.sum(jnp.where(lane == lanes - 1, s_in, 0.0), axis=1)
    car = jnp.cumsum(ends) - ends                        # exclusive (r,)
    return (s_in + car[:, None]).reshape(-1)[:k]


def _csum_flat(x):
    """Inclusive cumsum for the resampler.  The triangular-MXU variant
    (:func:`_cumsum_mxu`) wins standalone (26 vs 8 GB/s) but LOSES inside
    the resampler (5.7 vs 38 GB/s in-chain — the dot is a fusion barrier
    that re-materializes what the row gather then re-reads;
    tools/chipsuite14/15.py round-4), so the chain keeps ``jnp.cumsum``."""
    return jnp.cumsum(x)


def _pick_rows(v, idx, lanes: int = 128):
    """``v[idx]`` for a flat ``v`` and int32 ``idx`` (any shape), without an
    elementwise gather.

    Elementwise gathers on this TPU backend run at ~1 element per several
    cycles (measured ~7 ns/element — the entire resampler cost was one
    42k-element gather, docs/PERF.md round-3).  Row gathers are the
    embedding-lookup pattern the hardware does well: reshape ``v`` to
    ``(R, lanes)``, gather whole rows, then select the lane with an
    iota-keyed masked reduce (full VPU width).  Values are identical —
    the same elements are picked, no arithmetic changes.
    """
    n = v.shape[0]
    r = -(-n // lanes)
    v2 = jnp.pad(v, (0, r * lanes - n)).reshape(r, lanes)
    rows = v2[idx // lanes]                        # (..., lanes) row gather
    lane = (idx % lanes)[..., None]
    sel = jnp.arange(lanes, dtype=jnp.int32) == lane
    return jnp.sum(jnp.where(sel, rows, 0.0), axis=-1)


# A/B escape hatch for the gather-free TPU resampler (tools/chipsuite17)
_ROWS_OFF = False
# test hook: force the rows path on any backend (the dispatch below is
# TPU-only; CPU golden tests of rows-path consumers set this)
_ROWS_FORCE = False


def rows_path_eligible(n: int, fast: int, slow: int) -> bool:
    """True when :func:`resample_rational` would dispatch block length
    ``n`` to the gather-free rows formulation (callers that must stay
    BIT-identical to it — e.g. the scan engine's batched tail — gate on
    this)."""
    import math as _m
    g = _m.gcd(int(fast), int(slow))
    f, s = int(fast) // g, int(slow) // g
    if _ROWS_OFF:
        return False
    if not (_ROWS_FORCE or jax.default_backend() == "tpu"):
        return False
    return n % 128 == 0 and f // s + 1 <= 16


class ResampleState(NamedTuple):
    acc: jnp.ndarray      # () float32 pending window sum   (now_lpr)
    phase: jnp.ndarray    # () int32 fractional phase       (prev_lpr_index)

    @staticmethod
    def init():
        return ResampleState(jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32))


def resample_divisible(x, fast: int, slow: int):
    """Exact-ratio path: window = fast//slow samples, divisor fast//slow."""
    assert fast % slow == 0
    k = fast // slow
    n = (x.shape[0] // k) * k
    return x[:n].reshape(-1, k).sum(axis=1) * jnp.float32(1.0 / k)


def _resample_rows(state: ResampleState, x, fast: int, slow: int):
    """Gather-free resampler: row-local prefix sums + two masked-reduce
    extractions (round-4; fast/slow already gcd-reduced, ``fast > slow``).

    The cumsum+row-gather formulation's cost was structural: a global
    ``jnp.cumsum`` over the chunk plus a (cap, 128) row gather that
    re-reads every row ~fast/slow times.  This formulation touches HBM
    once per stage, all full-lane constructs (the capture-frontend trick
    applied to the resampler):

    1. row-local inclusive prefix sums ``S = x.reshape(R,128) @ U`` (one
       MXU triangular matmul — no global scan, and numerically BETTER
       than the global cumsum: window sums difference row-scale values,
       not stream-scale ones);
    2. ``csumext`` extends each row with the tail of the previous row
       (negative lanes), so any emission window — including row-crossing
       ones — is a difference of two lanes of ONE row;
    3. windows in (row, slot) layout via an iota-keyed masked reduce:
       ``w[r, e]`` = window sum of emission ``K0[r] + e`` (slot validity
       zeroes ghosts);
    4. flat (cap,) extraction in OUTPUT layout: out-row q reads the
       W+2 consecutive ``w`` rows covering its 128 emissions and
       matches slots by the emission index equation — a second masked
       reduce, no scatter/compaction.

    Semantics identical to :func:`resample_rational`'s path (same
    emission grid, truncated divisor, carried acc/phase); values differ
    only by f32 summation association.
    """
    n = x.shape[0]
    ll = 128
    r = n // ll
    w_max = fast // slow + 1             # max samples per window
    ext = w_max + 2
    e_slots = (ll * slow) // fast + 2    # max emissions per row + margin
    nr = w_max + 2                       # w-rows covering 128 emissions
    cap = n * slow // fast + 2
    divisor = jnp.float32(1.0 / (fast // slow))
    phase = state.phase.astype(jnp.int32)

    from rx_tools_tpu.ops.filters import _scan_matrix
    xp = x.reshape(r, ll)
    u = jnp.asarray(_scan_matrix(ll, 1.0))
    s = jax.lax.dot_general(xp, u, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST)  # (R, L)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (r, ll), 1)
    rowtot = jnp.sum(jnp.where(lane_i == ll - 1, s, 0.0), axis=1)  # (R,)
    # negative-lane extension: lane EXT-1-j of row r == -(sum of the last
    # j+1 samples of row r-1); row 0's extension is zero (chunk start)
    prev_tail = s[:-1, ll - ext:] - rowtot[:-1, None]
    prev_tail = jnp.concatenate(
        [jnp.zeros((1, ext), s.dtype), prev_tail], axis=0)
    csumext = jnp.concatenate([prev_tail, s], axis=1)      # (R, L+EXT)

    # --- stage 3: window sums in (row, slot) layout ---------------------
    ri = jnp.arange(r, dtype=jnp.int32)[:, None]           # (R, 1)
    ei = jnp.arange(e_slots, dtype=jnp.int32)[None, :]     # (1, E)
    k0 = (phase + (ll * ri) * slow) // fast                # (R, 1)
    k0n = (phase + (ll * (ri + 1)) * slow) // fast
    k_re = k0 + ei                                         # (R, E)
    total = (phase + n * slow) // fast
    pos = ((k_re + 1) * fast - phase + slow - 1) // slow - 1
    pos_prev = (k_re * fast - phase + slow - 1) // slow - 1
    valid = (ei < (k0n - k0)) & (k_re < total)
    el = pos - ll * ri + ext
    sl = jnp.maximum(pos_prev - ll * ri + ext, 0)
    lanes = jnp.arange(ll + ext, dtype=jnp.int32)
    ends = jnp.sum(jnp.where(lanes == el[..., None],
                             csumext[:, None, :], 0.0), axis=-1)
    starts = jnp.sum(jnp.where(lanes == sl[..., None],
                               csumext[:, None, :], 0.0), axis=-1)
    w = jnp.where(valid, ends - starts, 0.0)               # (R, E)

    # --- stage 4: flat extraction in output layout ----------------------
    cap_r = -(-cap // ll)
    q = jnp.arange(cap_r, dtype=jnp.int32)[:, None]        # (capR, 1)
    kq = ll * q
    pos_q = jnp.clip(((kq + 1) * fast - phase + slow - 1) // slow - 1,
                     0, n - 1)
    r0 = jnp.clip(pos_q // ll, 0, max(r - nr, 0))          # (capR, 1)
    rwin = r0 + jnp.arange(nr, dtype=jnp.int32)[None, :]   # (capR, NR)
    win = jnp.take(w, rwin, axis=0)                        # (capR, NR, E)
    k0w = (phase + (ll * rwin) * slow) // fast             # (capR, NR)
    target = (k0w[..., None]
              + jnp.arange(e_slots, dtype=jnp.int32))      # (capR, NR, E)
    tf = target.reshape(cap_r, 1, nr * e_slots)
    wf = win.reshape(cap_r, 1, nr * e_slots)
    out_k = (kq + jnp.arange(ll, dtype=jnp.int32)[None, :])[..., None]
    y = jnp.sum(jnp.where(tf == out_k, wf, 0.0), axis=-1)  # (capR, L)
    y = y.reshape(-1)[:cap]
    kk = jnp.arange(cap)
    y = y + jnp.where(kk == 0, state.acc, 0.0)
    y = jnp.where(kk < total, y * divisor, 0.0)
    n_valid = total.astype(jnp.int32)

    # --- carried state --------------------------------------------------
    carry_excl = jnp.cumsum(rowtot) - rowtot               # (R,) small
    total_x = carry_excl[-1] + rowtot[-1]                  # grand sum
    pos_last = jnp.clip((total * fast - phase + slow - 1) // slow - 1,
                        0, n - 1)
    csum_last = (jnp.take(s.reshape(-1), pos_last)
                 + jnp.take(carry_excl, pos_last // ll))
    consumed_end = jnp.where(total > 0, csum_last + state.acc, 0.0)
    new_acc = total_x + state.acc - consumed_end
    new_phase = (phase + n * slow) % fast
    return (ResampleState(new_acc.astype(jnp.float32),
                          new_phase.astype(jnp.int32)),
            y, n_valid)


def resample_rows_blocks(state: ResampleState, x, fast: int, slow: int):
    """``M`` sequential per-block :func:`_resample_rows` calls as ONE
    program: ``x`` (M, N) -> ``(state, y (M, cap), n_valid (M,))``,
    BIT-identical to the loop (tests pin this).

    The scan engine's per-block audio tail is its measured residual vs
    the flat engine (tools/chipsuite25.py: scan 28.5 GB/s -> 44.2 with
    the resampler ablated, vs flat 39.8 — M small resampler programs
    cost ~per-op overhead, not work).  The per-block carried state is
    deterministic: the phase chain is exact integer arithmetic, and the
    acc chain is M scalar f32 steps whose inputs (per-block grand totals
    and consumed-prefix sums) come from batched reductions — so every
    array stage runs batched over a leading block axis with the SAME
    per-element operation order as the per-block calls, and only the
    M-step scalar acc chain is sequential.  Gate callers on
    :func:`rows_path_eligible` (this must match what per-block
    ``resample_rational`` would dispatch to)."""
    import math as _m
    g = _m.gcd(int(fast), int(slow))
    fast, slow = int(fast) // g, int(slow) // g
    mblk, n = x.shape
    ll = 128
    r = n // ll
    w_max = fast // slow + 1
    ext = w_max + 2
    e_slots = (ll * slow) // fast + 2
    nr = w_max + 2
    cap = n * slow // fast + 2
    divisor = jnp.float32(1.0 / (fast // slow))
    if (mblk * n) * slow + fast >= 2 ** 31:
        raise ValueError("chunk too large for the int32 phase chain")

    # exact integer per-block phase chain (same values the loop carries)
    phs = [state.phase.astype(jnp.int32)]
    for _ in range(1, mblk):
        phs.append((phs[-1] + n * slow) % fast)
    phase = jnp.stack(phs)                                 # (M,)
    phb = phase[:, None, None]

    from rx_tools_tpu.ops.filters import _scan_matrix
    xp = x.reshape(mblk * r, ll)
    u = jnp.asarray(_scan_matrix(ll, 1.0))
    s = jax.lax.dot_general(xp, u, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (mblk * r, ll), 1)
    rowtot = jnp.sum(jnp.where(lane_i == ll - 1, s, 0.0),
                     axis=1).reshape(mblk, r)              # (M, R)
    s3 = s.reshape(mblk, r, ll)
    prev_tail = s3[:, :-1, ll - ext:] - rowtot[:, :-1, None]
    prev_tail = jnp.concatenate(
        [jnp.zeros((mblk, 1, ext), s.dtype), prev_tail], axis=1)
    csumext = jnp.concatenate([prev_tail, s3], axis=2)     # (M, R, L+EXT)

    # --- stage 3: window sums in (block, row, slot) layout ---------------
    ri = jnp.arange(r, dtype=jnp.int32)[None, :, None]
    ei = jnp.arange(e_slots, dtype=jnp.int32)[None, None, :]
    k0 = (phb + (ll * ri) * slow) // fast
    k0n = (phb + (ll * (ri + 1)) * slow) // fast
    k_re = k0 + ei                                         # (M, R, E)
    total = (phase + n * slow) // fast                     # (M,)
    pos = ((k_re + 1) * fast - phb + slow - 1) // slow - 1
    pos_prev = (k_re * fast - phb + slow - 1) // slow - 1
    valid = (ei < (k0n - k0)) & (k_re < total[:, None, None])
    el = pos - ll * ri + ext
    sl = jnp.maximum(pos_prev - ll * ri + ext, 0)
    lanes = jnp.arange(ll + ext, dtype=jnp.int32)
    ends = jnp.sum(jnp.where(lanes == el[..., None],
                             csumext[:, :, None, :], 0.0), axis=-1)
    starts = jnp.sum(jnp.where(lanes == sl[..., None],
                               csumext[:, :, None, :], 0.0), axis=-1)
    w = jnp.where(valid, ends - starts, 0.0)               # (M, R, E)

    # --- stage 4: flat extraction in output layout -----------------------
    cap_r = -(-cap // ll)
    q = jnp.arange(cap_r, dtype=jnp.int32)[None, :, None]
    kq = ll * q                                            # (1, capR, 1)
    pos_q = jnp.clip(((kq + 1) * fast - phb + slow - 1) // slow - 1,
                     0, n - 1)
    r0 = jnp.clip(pos_q // ll, 0, max(r - nr, 0))          # (M, capR, 1)
    rwin = r0 + jnp.arange(nr, dtype=jnp.int32)[None, None, :]
    # batched row gather: global rows of the (M*R, E) stack (identical
    # elements to the per-block jnp.take(w, rwin, axis=0))
    blk_off = (jnp.arange(mblk, dtype=jnp.int32) * r)[:, None, None]
    win = jnp.take(w.reshape(mblk * r, e_slots),
                   (rwin + blk_off).reshape(-1), axis=0
                   ).reshape(mblk, cap_r, nr, e_slots)
    k0w = (phb[..., None] + (ll * rwin[..., None]) * slow) // fast
    target = k0w + jnp.arange(e_slots, dtype=jnp.int32)    # (M, capR, NR, E)
    tf = target.reshape(mblk, cap_r, 1, nr * e_slots)
    wf = win.reshape(mblk, cap_r, 1, nr * e_slots)
    out_k = (kq + jnp.arange(ll, dtype=jnp.int32)[None, None, :])[..., None]
    y = jnp.sum(jnp.where(tf == out_k, wf, 0.0), axis=-1)  # (M, capR, L)
    y = y.reshape(mblk, -1)[:, :cap]
    kk = jnp.arange(cap)[None, :]

    # --- the M-step scalar acc chain (exact per-block op order) ----------
    carry_excl = jnp.cumsum(rowtot, axis=1) - rowtot       # (M, R)
    total_x = carry_excl[:, -1] + rowtot[:, -1]            # (M,)
    pos_last = jnp.clip((total * fast - phase + slow - 1) // slow - 1,
                        0, n - 1)
    csum_last = (jnp.take_along_axis(
                     s3.reshape(mblk, r * ll), pos_last[:, None], axis=1)[:, 0]
                 + jnp.take_along_axis(
                     carry_excl, (pos_last // ll)[:, None], axis=1)[:, 0])
    accs = [state.acc]
    for i in range(mblk):
        consumed_end = jnp.where(total[i] > 0, csum_last[i] + accs[i], 0.0)
        accs.append(total_x[i] + accs[i] - consumed_end)
    acc_vec = jnp.stack(accs[:-1])                         # (M,) at starts
    y = y + jnp.where(kk == 0, acc_vec[:, None], 0.0)
    y = jnp.where(kk < total[:, None], y * divisor, 0.0)
    final_phase = (phase[mblk - 1] + n * slow) % fast
    return (ResampleState(accs[-1].astype(jnp.float32),
                          final_phase.astype(jnp.int32)),
            y, total.astype(jnp.int32))


def resample_rational(state: ResampleState, x, fast: int, slow: int):
    """General carried-phase resampler.

    Returns ``(state, y, n_valid)``; ``y`` has static capacity
    ``N*slow//fast + 2`` and rows past ``n_valid`` are zero.  The divisor is
    the truncated ``fast // slow``, matching the reference.
    """
    if fast < slow:
        # the reference's low_pass_real is strictly fast->slow; its C would
        # divide by zero here (rate_out/rate_out2 == 0) — fail loudly instead
        raise ValueError(
            f"resample target {slow} exceeds input rate {fast}: "
            "low_pass_real only downsamples (use -r below -s)")
    n = x.shape[0]
    import math as _m
    _g = _m.gcd(int(fast), int(slow))
    if n * (slow // _g) + fast >= 2 ** 31:
        # the cumulative phase n*slow must fit int32 (x64 is off in jax by
        # default); callers chunk their streams below this envelope —
        # ~268k samples at 170k->32k, far above any single read buffer
        raise ValueError(
            f"block of {n} samples overflows the int32 resampler phase for "
            f"ratio {fast}/{slow}; split the stream into smaller chunks")
    cap = n * slow // fast + 2
    divisor = jnp.float32(1.0 / (fast // slow))
    # Reduce the ratio so int32 phase arithmetic (phase + j*slow) can't
    # overflow on large blocks; emission positions and the truncated divisor
    # depend only on fast/slow, and the carried phase is kept in reduced units.
    import math as _math
    g = _math.gcd(int(fast), int(slow))
    fast, slow = int(fast) // g, int(slow) // g
    # round-4 TPU path: gather-free row formulation (same emission grid
    # and carried state; f32 association differs) — see _resample_rows
    if (not _ROWS_OFF
            and (_ROWS_FORCE or jax.default_backend() == "tpu")
            and n % 128 == 0 and fast // slow + 1 <= 16):
        return _resample_rows(state, x, fast, slow)
    # phase after consuming sample j (1-indexed): c_j = phase0 + j*slow
    j = jnp.arange(1, n + 1)
    c = state.phase + j * slow
    crossings = c // fast                                # how many emits so far
    csum = _csum_flat(x)
    # k-th emission happens at the j where crossings first reaches k+1
    k = jnp.arange(cap)
    total_emits = crossings[-1]
    # position of k-th emit: smallest j with c_j >= (k+1)*fast
    #   c_j >= m  <=>  j >= (m - phase0 + slow - 1) // slow   (ints, all > 0)
    m = (k + 1) * fast
    pos = (m - state.phase + slow - 1) // slow - 1       # 0-indexed sample idx
    valid = k < total_emits
    posc = jnp.clip(pos, 0, n - 1)
    ends = _pick_rows(csum, posc.astype(jnp.int32))
    starts = jnp.concatenate([jnp.zeros(1, x.dtype), ends[:-1]])
    y = (ends - starts) + jnp.where(k == 0, state.acc, 0.0)
    y = jnp.where(valid, y * divisor, 0.0)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    # leftover
    total = csum[-1] + state.acc
    consumed_end = jnp.where(total_emits > 0, _pick_rows(
        csum, jnp.clip(
            (total_emits * fast - state.phase + slow - 1) // slow - 1,
            0, n - 1).astype(jnp.int32)[None])[0]
        + state.acc, 0.0)
    new_acc = total - consumed_end
    new_phase = (state.phase + n * slow) % fast
    return (ResampleState(new_acc.astype(jnp.float32), new_phase.astype(jnp.int32)),
            y, n_valid)


def _resample_cm_periodic(state: ResampleState, x, fast: int, slow: int):
    """Channel-major batched resampler via the exact emission periodicity
    (``pos(k+slow) == pos(k)+fast``): ``x`` (C, M) -> ``y`` (C, cap).

    The same one-mask MXU contraction as the PFB's time-major
    ``_resample_tmaj_periodic`` (models/pfb.py), framed along axis 1 —
    replaces the cumsum + (C, M) transposes + transposed-accumulator
    gathers of :func:`resample_rational_batch` when the reduced ``fast``
    is small.  Same emission grid, truncated divisor and carried-state
    semantics; window sums associate differently (dot vs csum
    difference), inside f32 noise.
    """
    import math as _m
    g = _m.gcd(int(fast), int(slow))
    fast, slow = int(fast) // g, int(slow) // g
    c_ch, m = x.shape
    cap = m * slow // fast + 2
    divisor = jnp.float32(1.0 / (fast // slow))
    w_max = fast // slow + 1
    e = w_max + 1
    assert e <= fast, (fast, slow)
    phase0 = state.phase[0].astype(jnp.int32)
    total = (phase0 + m * slow) // fast

    g_frames = -(-(m + 1) // fast) + 1
    pad_cols = g_frames * fast - m
    xp = jnp.concatenate(
        [jnp.zeros((c_ch, e), x.dtype), x,
         jnp.zeros((c_ch, pad_cols), x.dtype)], axis=1)
    main = xp[:, e:].reshape(c_ch, g_frames, fast)
    look = xp[:, : g_frames * fast].reshape(c_ch, g_frames, fast)[:, :, :e]
    frames = jnp.concatenate([look, main], axis=2)   # (C, G, fast+E)

    j = jnp.arange(slow, dtype=jnp.int32)
    posj = ((j + 1) * fast - phase0 + slow - 1) // slow - 1
    posjp = (j * fast - phase0 + slow - 1) // slow - 1
    i_rel = jnp.arange(fast + e, dtype=jnp.int32)[:, None] - e
    s_mask = ((i_rel > posjp[None, :])
              & (i_rel <= posj[None, :])).astype(x.dtype)

    yg = jax.lax.dot_general(frames, s_mask, (((2,), (0,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST)
    y = yg.reshape(c_ch, g_frames * slow)[:, :cap]
    kk = jnp.arange(cap)[None, :]
    y = y + jnp.where(kk == 0, 1.0, 0.0) * state.acc[:, None]
    y = jnp.where(kk < total, y * divisor, 0.0)

    tail_cols = min(fast + e, m)
    last_pos = jnp.clip((total * fast - phase0 + slow - 1) // slow - 1,
                        -1, m - 1)
    col_i = (jnp.arange(tail_cols, dtype=jnp.int32)[None, :]
             + (m - tail_cols))
    new_acc = jnp.sum(x[:, m - tail_cols:]
                      * (col_i > last_pos).astype(x.dtype), axis=1)
    new_phase = jnp.full((c_ch,), (phase0 + m * slow) % fast, jnp.int32)
    return (ResampleState(new_acc.astype(jnp.float32), new_phase),
            y, total.astype(jnp.int32))


def resample_rational_batch(state: ResampleState, x, fast: int, slow: int):
    """Batched :func:`resample_rational` over a channel axis: ``x`` (C, N).

    The emission pattern depends only on (phase, fast, slow) — not on the
    data — and every channel of a channelizer consumes equal-length blocks,
    so all channels share one phase trajectory.  This computes the
    positions/masks ONCE and gathers along the shared index vector, instead
    of vmapping C copies of the index arithmetic and C separate gathers
    (measured: the vmapped tail dominated the PFB channelizer's runtime —
    docs/PERF.md).

    ``state.acc``: (C,) per-channel leftovers; ``state.phase``: (C,) int32
    — identical by construction, element 0 is used.  Returns
    ``(state, y (C, cap), n_valid ())``.
    """
    if fast < slow:
        raise ValueError(
            f"resample target {slow} exceeds input rate {fast}: "
            "low_pass_real only downsamples (use -r below -s)")
    c_ch, n = x.shape
    import math as _m
    g = _m.gcd(int(fast), int(slow))
    if n * (slow // g) + fast >= 2 ** 31:
        raise ValueError(
            f"block of {n} samples overflows the int32 resampler phase for "
            f"ratio {fast}/{slow}; split the stream into smaller chunks")
    # NOTE: a vmapped _resample_rows was tried here and REVERTED — it cut
    # the 64-channel PFB step 4.07 -> 1.43 GB/s (round-4 A/B, recorded in
    # docs/PERF.md): under vmap the shared index math duplicates per
    # channel and the windowed take lowers to a worse gather than the
    # shared-index row gather below.  The gather-free rows formulation
    # serves the FLAT path only.
    # Round-5c TPU path: when the reduced ratio's frame is small, the
    # periodic-mask MXU contraction replaces the cumsum + transposes +
    # transposed-accumulator gathers entirely (see _resample_cm_periodic;
    # the tmaj twin measured ~2x on the PFB step's resampler share).
    _gg = _m.gcd(int(fast), int(slow))
    _fr, _sr = int(fast) // _gg, int(slow) // _gg
    _e = _fr // _sr + 2
    if ((_ROWS_FORCE or jax.default_backend() == "tpu")
            and not _ROWS_OFF and _fr + _e <= 512 and _e <= _fr):
        return _resample_cm_periodic(state, x, fast, slow)
    cap = n * slow // fast + 2
    divisor = jnp.float32(1.0 / (fast // slow))
    fast, slow = int(fast) // g, int(slow) // g
    phase0 = state.phase[0]

    k = jnp.arange(cap)
    total_emits = (phase0 + n * slow) // fast
    m = (k + 1) * fast
    pos = (m - phase0 + slow - 1) // slow - 1            # shared, 0-indexed
    valid = k < total_emits
    posc = jnp.clip(pos, 0, n - 1)

    csum = jnp.cumsum(x, axis=1)                          # (C, N)
    # row gather over the transposed accumulator: each index picks one
    # C-wide row (the embedding pattern), not C scalar elements — the
    # elementwise form runs at ~1 element/several cycles on this backend
    ends = jnp.take(csum.T, posc, axis=0).T               # (C, cap)
    starts = jnp.concatenate(
        [jnp.zeros((c_ch, 1), x.dtype), ends[:, :-1]], axis=1)
    y = (ends - starts) + jnp.where(k == 0, 1.0, 0.0)[None, :] * state.acc[:, None]
    y = jnp.where(valid[None, :], y * divisor, 0.0)
    n_valid = jnp.sum(valid.astype(jnp.int32))

    total = csum[:, -1] + state.acc
    last_pos = jnp.clip((total_emits * fast - phase0 + slow - 1) // slow - 1,
                        0, n - 1)
    consumed_end = jnp.where(total_emits > 0,
                             jnp.take(csum.T, last_pos[None], axis=0)[0]
                             + state.acc, 0.0)
    new_acc = total - consumed_end
    new_phase = jnp.full((c_ch,), (phase0 + n * slow) % fast, jnp.int32)
    return (ResampleState(new_acc.astype(jnp.float32), new_phase),
            y, n_valid)
