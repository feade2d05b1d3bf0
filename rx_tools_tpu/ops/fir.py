"""Decimating FIR kernels.

Three decimation paths, mirroring the reference's signal chains:

- :func:`boxcar_decimate` — square-window accumulate-by-``D`` (``low_pass``,
  ``src/rtl_fm.c:351-371``).  NOTE reference semantics: the boxcar keeps the
  window *sum* (gain ``D``), not the mean; downstream ``output_scale``
  compensates.  Carried state handles blocks not divisible by ``D``.
- :func:`fifth_order_decimate` / :func:`fifth_order_cascade` — the halfband
  decimate-by-2 with binomial taps ``(1,5,10,10,5,1)/16``
  (``src/rtl_fm.c:411-440``), cascaded ``passes`` times, with 5 carried
  samples per component per pass ("don't fully shift": the reference's
  ``>>4`` keeps 2× gain per pass; we keep the same gain in float).
- :func:`droop_fir` — the 9-tap symmetric CIC droop-compensation FIR
  (``generic_fir``, ``src/rtl_fm.c:442-465``).  Reference timing quirk kept:
  the output at ``n`` is the filter over ``x[n-9 .. n-1]`` (a one-sample
  pre-delay on top of the 4-sample group delay).

All kernels are pure ``(state, x) -> (state, y)`` over ``(N, 2)`` float32
I/Q blocks, implemented as small sets of strided slices + fused adds — VPU
work that XLA fuses into neighbouring ops; no HBM round trips per tap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from rx_tools_tpu.ops.cic import cic_9_taps

_F5 = np.array([1, 5, 10, 10, 5, 1], dtype=np.float32)  # binomial(5)


class BoxcarState(NamedTuple):
    acc: jnp.ndarray         # (2,) partial window sum (now_r, now_j)
    phase: jnp.ndarray       # () int32, samples already in window (prev_index)

    @staticmethod
    def init():
        return BoxcarState(jnp.zeros(2, jnp.float32), jnp.zeros((), jnp.int32))


def boxcar_decimate(state: BoxcarState, x, downsample: int):
    """Accumulate-by-``downsample`` with carry.

    Returns ``(state, y, n_valid)`` with ``y`` of fixed capacity
    ``N // downsample + 1``; rows past ``n_valid`` are zero.  When the
    streaming layer aligns blocks (``N % downsample == 0`` and zero phase),
    ``n_valid == N // downsample`` always and the padded row is dead.
    """
    n = x.shape[0]
    d = int(downsample)
    cap = n // d + 1
    csum = jnp.cumsum(x, axis=0)                       # (N, 2)
    k = jnp.arange(cap)
    # emit positions: p_k = (k+1)*D - 1 - phase, valid while p_k < N
    p = (k + 1) * d - 1 - state.phase
    valid = p < n
    pc = jnp.clip(p, 0, n - 1)
    ends = csum[pc]                                    # inclusive prefix at emit
    starts = jnp.concatenate([jnp.zeros((1, 2), x.dtype), ends[:-1]], axis=0)
    y = ends - starts
    y = y.at[0].add(state.acc)
    y = jnp.where(valid[:, None], y, 0.0)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    # leftover partial window
    total = csum[-1] + state.acc if n > 0 else state.acc
    consumed = jnp.sum(jnp.where(valid[:, None], y, 0.0), axis=0)
    new_acc = total - consumed
    new_phase = (state.phase + n) % d
    return BoxcarState(new_acc.astype(jnp.float32), new_phase), y, n_valid


class FifthOrderState(NamedTuple):
    hist: jnp.ndarray        # (passes, 5, 2) trailing samples per pass

    @staticmethod
    def init(passes: int):
        return FifthOrderState(jnp.zeros((passes, 5, 2), jnp.float32))


def fifth_order_decimate(hist, x):
    """One decimate-by-2 pass.  ``hist``: (5, 2) trailing samples.

    ``y[k] = (x'[2k] + 5(x'[2k+1]+x'[2k+4]) + 10(x'[2k+2]+x'[2k+3]) + x'[2k+5]) / 16``
    where ``x' = concat(hist, x)`` — i.e. the reference recurrence with the
    ``>>4`` shift done in float (2× passband gain per pass preserved).
    """
    n = x.shape[0]
    xp = jnp.concatenate([hist, x], axis=0)            # (N + 5, 2)
    acc = None
    for t, c in enumerate(_F5):
        term = xp[t: t + n: 2] * c
        acc = term if acc is None else acc + term
    y = acc * jnp.float32(1.0 / 16.0)
    return xp[-5:], y


def fifth_order_cascade(state: FifthOrderState, x, passes: int):
    """``passes`` cascaded halfband stages: N -> N / 2**passes."""
    hists = []
    y = x
    for p in range(passes):
        h, y = fifth_order_decimate(state.hist[p], y)
        hists.append(h)
    return FifthOrderState(jnp.stack(hists)), y


class DroopState(NamedTuple):
    hist: jnp.ndarray        # (9, 2) trailing samples

    @staticmethod
    def init():
        return DroopState(jnp.zeros((9, 2), jnp.float32))


def droop_fir(state: DroopState, x, passes: int):
    """CIC droop compensation: 9-tap symmetric FIR over ``x[n-9 .. n-1]``."""
    taps = jnp.asarray(cic_9_taps(passes))             # (9,)
    n = x.shape[0]
    xp = jnp.concatenate([state.hist, x], axis=0)      # (N + 9, 2)
    acc = None
    for t in range(9):
        term = xp[t: t + n] * taps[t]
        acc = term if acc is None else acc + term
    return DroopState(xp[-9:]), acc


def low_pass_simple(x, step: int):
    """Post-demod block-sum decimator (``low_pass_simple``,
    ``src/rtl_fm.c:373-387``).  Keeps the sum (not mean), like the reference.

    The reference's off-by-one tail write (``rtl_fm.c:385``) is *not*
    reproduced — it writes one sample past the valid region and is dropped by
    the caller's length accounting anyway.
    """
    n = (x.shape[0] // step) * step
    return x[:n].reshape(-1, step).sum(axis=1)
