"""Polyphase filterbank (PFB) channelizer — D uniform channels for ~2 passes.

``models/channelizer.py`` mixes each station down with its own NCO: flexible
(arbitrary offsets) but O(C·N) with two transcendentals per channel-sample —
measured 16.8M cos/sin per 131k block at C=64, which dominates its runtime
(docs/PERF.md).  When the channels sit on a uniform grid (the common case:
FM band scanning, trunked radio, multi-carrier monitoring), the classic
critically-sampled PFB computes ALL D channels at once:

    y[m, c] = sum_n h[n] * x[m*D - n] * exp(-j*2*pi*c*n/D)

which factors into (1) a depthwise length-T FIR over stride-D polyphase
branches and (2) one D-point FFT across the branch axis per output step —
O(N·T + N·log D) total, independent of how many of the D channels you
keep.  Channel c is centered at +c*fs/D (c > D/2 alias to negative
frequencies); the per-channel stopband is the Kaiser prototype's (~ -90 dB
class), vs the mixer channelizer's boxcar decimator at -13 dB.

The demod tail (discriminator -> deemph -> audio resample, per channel) is
shared with the mixer channelizer (``channelizer.demod_tail``,
``src/rtl_fm.c:808-823`` semantics).  No counterpart exists in the
reference — it needs one process + one dongle per station.

TPU mapping: the branch FIR is a depthwise `conv_general_dilated` over a
`(2D, M+T-1)` layout (I/Q × branches as feature groups), the FFT is one
batched `jnp.fft.fft` — both dense, static-shaped, fusion-friendly; no
gathers, no transcendentals outside the FFT.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rx_tools_tpu import ops
from rx_tools_tpu.models import channelizer as _chan
from rx_tools_tpu.ops.polyfir import design_lowpass
from rx_tools_tpu.ops.resample import ResampleState


@dataclass(frozen=True)
class PfbConfig:
    """Static config: D uniform channels == decimation factor D."""
    capture_rate: int
    n_channels: int                  # D: channel count == decimation
    taps_per_branch: int = 8         # T: prototype length is T*D
    mode: str = "fm"
    custom_atan: int = 0
    deemph_a: int = 0
    rate_out2: int = -1              # per-channel audio resample target
    output_scale: int = 1
    beta: float = 8.6                # Kaiser prototype shape

    @property
    def channel_rate(self) -> int:
        return self.capture_rate // self.n_channels

    def channel_freqs(self, center: float = 0.0):
        """Channel center frequencies (Hz offsets from the capture center);
        channel c sits at +c*fs/D, c >= D/2 wraps negative."""
        d = self.n_channels
        fs = self.capture_rate
        return [center + (c if c < d / 2 else c - d) * fs / d
                for c in range(d)]


class PfbState(NamedTuple):
    tail: jnp.ndarray              # (T*D, 2) trailing input samples
    prev_iq: jnp.ndarray           # (D, 2) per-channel discriminator seam
    deemph_avg: jnp.ndarray        # (D,)
    resamp: ResampleState          # (D,) acc / phase


def init_state(cfg: PfbConfig) -> PfbState:
    d, t = cfg.n_channels, cfg.taps_per_branch
    return PfbState(
        tail=jnp.zeros((t * d, 2), jnp.float32),
        prev_iq=jnp.zeros((d, 2), jnp.float32),
        deemph_avg=jnp.zeros((d,), jnp.float32),
        resamp=ResampleState(jnp.zeros((d,), jnp.float32),
                             jnp.zeros((d,), jnp.int32)))


def block_samples(cfg: PfbConfig, target: int = 131072) -> int:
    """Block size (complex samples) aligned to the channel count."""
    step = cfg.n_channels
    return max(1, -(-target // step)) * step


def _prototype(cfg: PfbConfig) -> np.ndarray:
    """Kaiser-sinc prototype, cutoff = one channel width (fs/D)."""
    return design_lowpass(cfg.taps_per_branch * cfg.n_channels,
                          1.0 / cfg.n_channels, cfg.beta)


def filterbank(cfg: PfbConfig, tail, block):
    """The filterbank front half: block -> (new_tail, zi (D, M), zq (D, M)).

    ``tail``: (T*D, 2) carried input history.  Channel-planar output (I/Q
    as separate (D, M) arrays) feeds the planar demod tail.  Also usable
    standalone for spectral monitoring or custom per-channel DSP.
    """
    d, t = cfg.n_channels, cfg.taps_per_branch
    x = block.astype(jnp.float32).reshape(-1, 2) * jnp.float32(128.0 / 32767.0)
    n = x.shape[0]
    assert n % d == 0, (n, d)
    m = n // d

    h = jnp.asarray(_prototype(cfg))                        # (T*D,)
    # hp2[t, q] = h[(T-1-t)*D + (D-1-q)]: the branch FIR taps arranged so
    # W[m, q] = sum_t Y[m+t, q] * hp2[t, q] realizes sum_n h[n] x[mD - n]
    # split by n mod D (derivation: n = T*D - 1 - (t*D + q))
    hp2 = h.reshape(t, d)[::-1, ::-1]                       # (T, D)

    xp = jnp.concatenate([tail, x], axis=0)                 # (T*D + N, 2)
    # polyphase frames: Y[k, q] = xp[k*D + 1 + q], k = 0 .. M+T-2
    y_fr = jax.lax.slice(xp, (1, 0), (1 + (m + t - 1) * d, 2))
    y_fr = y_fr.reshape(m + t - 1, d, 2)                    # (M+T-1, D, 2)

    # depthwise FIR along the frame axis, per (branch, component) channel
    lhs = y_fr.reshape(m + t - 1, 2 * d).T[None]            # (1, 2D, M+T-1)
    rhs = jnp.repeat(hp2.T[:, None, :], 2, axis=0
                     ).reshape(2 * d, 1, t)                 # (2D, 1, T)
    w = jax.lax.conv_general_dilated(
        lhs, rhs[:, :, ::-1],                               # correlation
        window_strides=(1,), padding="VALID",
        feature_group_count=2 * d)[0]                       # (2D, M), ch 2q+c

    # PLANAR back half (round-3 construct rules, docs/PERF.md): split the
    # conv's channel axis by pure reshape — the sliced axis keeps a WIDE
    # trailing dim (M), which vectorizes, unlike the former (M, D, 2)
    # trailing-2 slices/stacks.
    w3 = w.reshape(d, 2, m)                                 # [q, c, m]
    wi, wq = w3[:, 0, :], w3[:, 1, :]                       # (D, M)
    # u[p] = W[D-1-p]; channel c = sum_p u[p] e^{+j2pi c p/D} so channel c
    # sits at +c*fs/D — that positive-exponent kernel is ifft*D; the
    # extra D matches the mixer channelizer's boxcar-sum gain
    u = (wi[::-1, :] + 1j * wq[::-1, :]) * jnp.float32(d)
    ch = jnp.fft.ifft(u, axis=0) * jnp.float32(d)           # (D, M) complex
    zi = jnp.real(ch).astype(jnp.float32)
    zq = jnp.imag(ch).astype(jnp.float32)
    return xp[-(t * d):], zi, zq


@functools.lru_cache(maxsize=16)
def _dft_matrix(d: int) -> np.ndarray:
    """(2D, 2D) real matrix folding branch-reversal + D-point inverse DFT
    + the x D gain, consuming INTERLEAVED branch columns.

    Row c in [0, D) is Re(channel c), row D+c is Im; column j = 2q+c' is
    branch q, component c'.  Realizes exactly what ``filterbank`` does
    with ``wi[::-1] + 1j*wq[::-1]`` -> ``ifft * D`` (the channel-c kernel
    ``D * exp(+2j*pi*c*(D-1-q)/D)``), as one real matmul so the MXU does
    the DFT and the I/Q deinterleave never touches a 2-wide axis.
    """
    q = np.arange(d)
    th = 2 * np.pi * np.outer(np.arange(d), (d - 1 - q)) / d   # (C, Q)
    m = np.zeros((2 * d, 2 * d), np.float32)
    m[:d, 0::2] = d * np.cos(th)
    m[:d, 1::2] = -d * np.sin(th)
    m[d:, 0::2] = d * np.sin(th)
    m[d:, 1::2] = d * np.cos(th)
    return m


def _fb_pre_mxu(cfg: PfbConfig, tail, block):
    """The branch-FIR half of :func:`filterbank_mxu`:
    ``block -> (new_tail, w (2D, M))`` — shared with the channel-sharded
    step (``parallel/chanshard.py``), whose devices dot ``w`` against
    their own slice of the DFT matrix."""
    d, t = cfg.n_channels, cfg.taps_per_branch
    n = block.shape[0] // 2
    assert n % d == 0, (n, d)
    m = n // d
    y = block.astype(jnp.float32) * jnp.float32(128.0 / 32767.0)
    xp_flat = jnp.concatenate([tail.reshape(-1), y])        # (2(T*D+N),)

    h = jnp.asarray(_prototype(cfg))
    hp2 = h.reshape(t, d)[::-1, ::-1]                       # (T, D)
    # the conv formulation correlates with the TAP-REVERSED kernel:
    # W[m, q] = sum_w Y[m+w, q] * hp2[T-1-w, q]
    hb = jnp.repeat(hp2, 2, axis=1)[::-1]                   # (T, 2D), col 2q+c

    # frames[k, 2q+c] = xp[k*D + 1 + q][c]  (same framing as filterbank)
    frames = jax.lax.slice(xp_flat, (2,), (2 + (m + t - 1) * 2 * d,))
    ft = frames.reshape(m + t - 1, 2 * d).T                 # (2D, M+T-1)
    w = ft[:, :m] * hb[0][:, None]
    for tt in range(1, t):
        w = w + ft[:, tt:tt + m] * hb[tt][:, None]          # (2D, M)
    return xp_flat[-(2 * t * d):].reshape(t * d, 2), w


def filterbank_mxu(cfg: PfbConfig, tail, block):
    """MXU formulation of :func:`filterbank` — identical semantics.

    Round-3 construct rules (docs/PERF.md): the conv formulation's
    depthwise ``conv_general_dilated`` and its middle-axis splits keep the
    branch axis (2D wide) on the VPU lane axis at partial width.  Here the
    branch FIR is T shifted multiply-adds over a ``(2D, M+T-1)`` layout
    (wide minor-axis slices, full lane width) and the branch DFT +
    deinterleave is ONE ``(2D, 2D) @ (2D, M)`` matmul on the MXU
    (for D=64 the contraction is exactly 128 lanes).  Precision HIGHEST
    keeps f32-equivalent accuracy (inputs are 15-bit ints x scale).
    """
    d = cfg.n_channels
    new_tail, w = _fb_pre_mxu(cfg, tail, block)
    ch = jax.lax.dot_general(jnp.asarray(_dft_matrix(d)), w,
                             (((1,), (0,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST)
    return new_tail, ch[:d], ch[d:]


# ---------------------------------------------------------------------------
# Round-5 TIME-MAJOR formulation: every tail construct row-major
# ---------------------------------------------------------------------------

class PfbStateTM(NamedTuple):
    """Carried state of :func:`pfb_step_tmaj`.

    ``tailx``: the last ``(T+1)*D`` input complex samples, flat interleaved
    f32 — one frame MORE than the channel-major state so the filterbank
    can emit the previous block's final frame again (the discriminator's
    previous-sample column then comes from the conv output itself instead
    of a carried seam concat)."""
    tailx: jnp.ndarray             # (2*(T+1)*D,) flat interleaved f32
    deemph_avg: jnp.ndarray        # (D,)
    resamp: ResampleState          # (D,) acc / phase


def init_state_tmaj(cfg: PfbConfig) -> PfbStateTM:
    d, t = cfg.n_channels, cfg.taps_per_branch
    return PfbStateTM(
        tailx=jnp.zeros((2 * (t + 1) * d,), jnp.float32),
        deemph_avg=jnp.zeros((d,), jnp.float32),
        resamp=ResampleState(jnp.zeros((d,), jnp.float32),
                             jnp.zeros((d,), jnp.int32)))


def _iir_tmaj(avg, b, c: float, rows: int = 128):
    """First-order IIR scan along the TIME (major) axis of ``b`` (M, D):
    ``y[t] = c*y[t-1] + b[t]`` per channel column, as one batched
    triangular MXU contraction per 128-step row block plus a tiny
    row-carry combine — the time-major twin of
    ``ops.filters._iir_scan_batch_mxu`` (M %% 128 == 0)."""
    m, d = b.shape
    r = m // rows
    bp = b.reshape(r, rows, d)
    from rx_tools_tpu.ops.filters import _scan_matrix
    u = jnp.asarray(_scan_matrix(rows, float(c)))         # U[s, t] = c^(t-s)
    s_in = jnp.einsum("rsc,st->rtc", bp, u,
                      precision=jax.lax.Precision.HIGHEST)
    cl = float(c) ** rows
    ends = s_in[:, rows - 1, :]                            # (R, D)
    # inclusive scan of row ends with decay cl (R is tiny: shifts are cheap)
    es = ends
    s = 1
    while s < r:
        es = es + np.float32(cl ** s) * jnp.pad(es, ((s, 0), (0, 0)))[:r]
        s *= 2
    decay = jnp.asarray((np.float64(cl) ** np.arange(r)).astype(np.float32))
    car = (jnp.concatenate([jnp.zeros((1, d), b.dtype), es[:-1]], axis=0)
           + decay[:, None] * avg[None, :])                # (R, D)
    cvec = jnp.asarray((np.float64(c) **
                        np.arange(1, rows + 1)).astype(np.float32))
    y = (s_in + car[:, None, :] * cvec[None, :, None]).reshape(m, d)
    return y[m - 1, :], y


def filterbank_tmaj(cfg: PfbConfig, tailx, block):
    """Time-major filterbank: block -> (new_tailx, ch2 (M+1, 2D)).

    Identical math to :func:`filterbank_mxu` transposed — the polyphase
    frames' NATURAL layout is (frames, 2D), so the branch FIR is T
    shifted MAJOR-axis adds (no transpose anywhere) and the branch
    DFT/deinterleave is ``W @ dft.T`` on the MXU.  Emits M+1 output
    frames: row 0 re-derives the PREVIOUS block's last frame from the
    carried tail, so the discriminator's previous-sample stream is a pure
    offset read of this array (``ch2[:-1]``) instead of a seam concat.
    Columns: [Re ch 0..D-1 | Im ch 0..D-1].
    """
    d, t = cfg.n_channels, cfg.taps_per_branch
    n = block.shape[0] // 2
    assert n % d == 0, (n, d)
    m = n // d
    y = block.astype(jnp.float32) * jnp.float32(128.0 / 32767.0)
    xp = jnp.concatenate([tailx, y])               # (2*((T+1)*D + N),)

    h = jnp.asarray(_prototype(cfg))
    hp2 = h.reshape(t, d)[::-1, ::-1]
    hb = jnp.repeat(hp2, 2, axis=1)[::-1]                  # (T, 2D)

    # frames2[k, 2q+c] = xp_c[k*D + 1 + q][c], k = 0..M+T-1; one extra
    # frame of history vs the channel-major path (tail is (T+1)*D)
    frames = jax.lax.slice(xp, (2,), (2 + (m + t) * 2 * d,))
    f2 = frames.reshape(m + t, 2 * d)                      # (M+T, 2D)
    w = f2[0: m + 1] * hb[0][None, :]
    for tt in range(1, t):
        w = w + f2[tt: tt + m + 1] * hb[tt][None, :]       # (M+1, 2D)

    ch2 = jax.lax.dot_general(w, jnp.asarray(_dft_matrix(d)),
                              (((1,), (1,)), ((), ())),
                              precision=jax.lax.Precision.HIGHEST)
    return xp[-(2 * (t + 1) * d):], ch2


@partial(jax.jit, static_argnums=0)
def pfb_step_tmaj(cfg: PfbConfig, state: PfbStateTM, block):
    """Time-major PFB step: one wideband block -> D channels, demodulated.

    Same semantics as :func:`pfb_step` (per-channel tail of
    ``full_demod``, src/rtl_fm.c:808-823) with audio returned TIME-MAJOR:
    ``(state, audio (cap, D), n_valid ())`` — hosts transpose for free
    (``np.asarray(audio).T`` is a view).  Every stage is a row-major
    construct: the disc previous sample is ``ch2[:-1]`` (offset read, no
    concat), deemph and the resampler prefix sums are batched triangular
    MXU contractions along time, and the resampler's extraction is a
    whole-row gather — no (C, M) transposes, no minor-axis seams
    (docs/PERF.md round-5 campaign).
    """
    d = cfg.n_channels
    if ((block.shape[0] // 2 // d) % 128 != 0
            and (cfg.deemph_a or cfg.rate_out2 > 0)):
        raise ValueError(
            f"pfb_step_tmaj needs per-channel block length divisible by "
            f"128 (got {block.shape[0] // 2 // d}); pick a block of "
            f"128*{d}*k complex samples (block_samples default is fine)")
    tailx, ch2 = filterbank_tmaj(cfg, state.tailx, block)
    m = ch2.shape[0] - 1

    cur, prev = ch2[1:], ch2[:-1]                          # (M, 2D)
    ar, aj = cur[:, :d], cur[:, d:]
    br, bj = prev[:, :d], prev[:, d:]

    if cfg.mode == "raw":
        audio = ch2[1:]                                    # (M, 2D) packed
        return (PfbStateTM(tailx, state.deemph_avg, state.resamp),
                audio, jnp.int32(m))

    if cfg.mode == "fm":
        cr = ar * br + aj * bj
        cj = aj * br - ar * bj
        if cfg.custom_atan == ops.DISC_STD:
            dd = ops.polar_discriminant(cr, cj)
        else:
            if cfg.custom_atan == ops.DISC_FAST:
                dd = ops.polar_disc_fast(cr, cj)
            elif cfg.custom_atan == ops.DISC_LUT:
                ai = jnp.round(ar).astype(jnp.int32)
                ji = jnp.round(aj).astype(jnp.int32)
                bi = jnp.round(br).astype(jnp.int32)
                qi = jnp.round(bj).astype(jnp.int32)
                dd = ops.polar_disc_lut(ai * bi + ji * qi,
                                        ji * bi - ai * qi)
            else:
                dd = ops.esbensen_disc(ar, aj, br, bj)
            # per-block seam quirk (fm_demod rtl_fm.c:588-590): output
            # row 0 uses the std atan2 — a broadcast select against the
            # (1, D) row, not a concat
            trow = jax.lax.broadcasted_iota(jnp.int32, dd.shape, 0)
            dd = jnp.where(trow == 0,
                           ops.polar_discriminant(cr[0:1], cj[0:1]), dd)
    elif cfg.mode == "am":
        dd = jnp.sqrt(ar * ar + aj * aj) * jnp.float32(cfg.output_scale)
    elif cfg.mode == "usb":
        dd = (ar + aj) * jnp.float32(cfg.output_scale)
    elif cfg.mode == "lsb":
        dd = (ar - aj) * jnp.float32(cfg.output_scale)
    else:
        raise ValueError(cfg.mode)

    davg = state.deemph_avg
    if cfg.deemph_a:
        inv_a = 1.0 / cfg.deemph_a
        davg, dd = _iir_tmaj(davg, dd * jnp.float32(inv_a), 1.0 - inv_a)

    racc, rphase = state.resamp.acc, state.resamp.phase
    if cfg.rate_out2 > 0:
        import math as _m
        _g = _m.gcd(int(cfg.channel_rate), int(cfg.rate_out2))
        _fr = cfg.channel_rate // _g
        # the periodic-mask resampler (one MXU contraction, no prefix
        # sums/gathers) applies when the reduced frame is small — the
        # round-5c ablation put the csum-based tail at ~2/3 of the step
        _e = _fr // (cfg.rate_out2 // _g) + 2
        rs_fn = (_resample_tmaj_periodic
                 if _fr + _e <= 512 and _e <= _fr
                 else _resample_tmaj)
        st_r, audio, nv = rs_fn(
            ResampleState(racc, rphase), dd,
            cfg.channel_rate, cfg.rate_out2)
        racc, rphase = st_r.acc, st_r.phase
    else:
        audio, nv = dd, jnp.int32(m)

    return (PfbStateTM(tailx, davg, ResampleState(racc, rphase)),
            audio, nv)


def _resample_tmaj_periodic(state: ResampleState, x, fast: int, slow: int):
    """Time-major batched resampler via the EXACT emission periodicity:
    ``pos(k + slow) == pos(k) + fast``, so every ``fast``-input frame
    emits exactly ``slow`` outputs with the same intra-frame window
    pattern (shifted by the carried phase).  The whole resampler is then
    ONE (fast+E, slow) phase-dependent 0/1 mask contracted against
    extended input frames on the MXU — no prefix sums, no gathers, no
    concats at rate (round-5c; viable when the reduced ``fast`` is small,
    e.g. the PFB's 75/64 channel->audio ratio; the flat chain's 42857/8000
    stays on :func:`_resample_tmaj`).

    ``x`` (M, D) -> ``(state, y (cap, D), n_valid ())``; same emission
    grid, divisor and carried state as ``_resample_tmaj`` (window sums
    associate differently — dot vs csum-difference — inside f32 noise).
    """
    import math as _m
    g = _m.gcd(int(fast), int(slow))
    fast, slow = int(fast) // g, int(slow) // g
    m, d = x.shape
    cap = m * slow // fast + 2
    divisor = jnp.float32(1.0 / (fast // slow))
    w_max = fast // slow + 1
    e = w_max + 1                          # lookback rows per frame
    assert e <= fast, (fast, slow)         # frame build needs one-frame look
    phase0 = state.phase[0].astype(jnp.int32)
    total = (phase0 + m * slow) // fast

    g_frames = -(-(m + 1) // fast) + 1     # cover cap outputs incl. edges
    pad_rows = g_frames * fast - m
    xp = jnp.concatenate(
        [jnp.zeros((e, d), x.dtype), x,
         jnp.zeros((pad_rows, d), x.dtype)], axis=0)   # (E + G*fast, D)
    main = xp[e:].reshape(g_frames, fast, d)
    look = xp[: g_frames * fast].reshape(g_frames, fast, d)[:, :e]
    frames = jnp.concatenate([look, main], axis=1)     # (G, fast+E, D)

    # window pattern for outputs j = 0..slow-1 of each frame (phase is
    # traced; everything else static): input i_rel of frame g is global
    # row g*fast + (i - E); output k = g*slow + j consumes
    # (pos(j-1), pos(j)] shifted into the frame
    j = jnp.arange(slow, dtype=jnp.int32)
    posj = ((j + 1) * fast - phase0 + slow - 1) // slow - 1    # (slow,)
    posjp = (j * fast - phase0 + slow - 1) // slow - 1
    i_rel = jnp.arange(fast + e, dtype=jnp.int32)[:, None] - e  # (fast+E, 1)
    s_mask = ((i_rel > posjp[None, :])
              & (i_rel <= posj[None, :])).astype(x.dtype)  # (fast+E, slow)

    yg = jax.lax.dot_general(frames, s_mask, (((1,), (0,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST)
    # (G, D, slow) -> time-major (G*slow, D)
    y = jnp.transpose(yg, (0, 2, 1)).reshape(g_frames * slow, d)[:cap]
    kk = jnp.arange(cap)
    y = y + jnp.where(kk == 0, 1.0, 0.0)[:, None] * state.acc[None, :]
    y = jnp.where((kk < total)[:, None], y * divisor, 0.0)

    # carried state: leftover = sum of inputs after the last complete
    # window (the trailing partial window pos(total-1)+1 .. m-1 — at most
    # w_max rows, so only the last frame's rows need reading)
    tail_rows = min(fast + e, m)
    last_pos = jnp.clip((total * fast - phase0 + slow - 1) // slow - 1,
                        -1, m - 1)
    xt = x[m - tail_rows:]
    row_i = (jnp.arange(tail_rows, dtype=jnp.int32)[:, None]
             + (m - tail_rows))
    new_acc = jnp.sum(xt * (row_i > last_pos).astype(x.dtype), axis=0)
    new_phase = jnp.full((d,), (phase0 + m * slow) % fast, jnp.int32)
    return (ResampleState(new_acc.astype(jnp.float32), new_phase),
            y, total.astype(jnp.int32))


def _resample_tmaj(state: ResampleState, x, fast: int, slow: int):
    """Time-major batched resampler: ``x`` (M, D) -> ``y`` (cap, D).

    All channels share one (data-independent) emission grid, computed
    once.  Prefix sums along time via the batched triangular MXU
    contraction (row-carry combined), window ends/starts via WHOLE-ROW
    gathers of the (M, D) accumulator — the channel axis rides the lane
    dimension throughout, so nothing transposes and nothing gathers
    elementwise.  Same emission grid / truncated divisor / carried state
    as ``ops.resample.resample_rational_batch`` (f32 association differs).
    """
    import math as _m
    g = _m.gcd(int(fast), int(slow))
    fast, slow = int(fast) // g, int(slow) // g
    m, d = x.shape
    if m * slow + fast >= 2 ** 31:
        raise ValueError("block too large for int32 resampler phase")
    cap = m * slow // fast + 2
    divisor = jnp.float32(1.0 / (fast // slow))
    phase0 = state.phase[0]

    # prefix sums along time: triangular contraction + row carry (c = 1)
    _, csum = _iir_tmaj(jnp.zeros((d,), jnp.float32), x, 1.0)

    k = jnp.arange(cap)
    total_emits = (phase0 + m * slow) // fast
    pos = ((k + 1) * fast - phase0 + slow - 1) // slow - 1  # (cap,) shared
    valid = k < total_emits
    posc = jnp.clip(pos, 0, m - 1).astype(jnp.int32)
    ends = jnp.take(csum, posc, axis=0)                     # (cap, D) rows
    starts = jnp.concatenate(
        [jnp.zeros((1, d), x.dtype), ends[:-1]], axis=0)
    y = (ends - starts) + jnp.where(k == 0, 1.0, 0.0)[:, None] * state.acc[None, :]
    y = jnp.where(valid[:, None], y * divisor, 0.0)
    n_valid = total_emits.astype(jnp.int32)

    total = csum[m - 1, :] + state.acc                      # (D,)
    last_pos = jnp.clip((total_emits * fast - phase0 + slow - 1) // slow - 1,
                        0, m - 1)
    consumed_end = jnp.where(total_emits > 0,
                             jnp.take(csum, last_pos[None], axis=0)[0]
                             + state.acc, 0.0)
    new_acc = total - consumed_end
    new_phase = jnp.full((d,), (phase0 + m * slow) % fast, jnp.int32)
    return (ResampleState(new_acc.astype(jnp.float32), new_phase),
            y, n_valid)


@partial(jax.jit, static_argnums=0)
def pfb_scan_blocks_tmaj(cfg: PfbConfig, state: PfbStateTM, blocks):
    """``B`` chained :func:`pfb_step_tmaj` calls in ONE program:
    ``blocks`` (B, 2N) -> ``(state, audio (B, cap, D), n_valid (B,))``.

    The CLI's per-block dispatch pays one host->device round trip per
    block (~26 ms over a tunneled TPU — orders of magnitude above the
    step's compute); chunked dispatch amortizes it 1/B exactly like the
    FM chain's ChunkedFmRunner (stream/chunked.py).  A traced Python
    loop with static ``blocks[i]`` indexing (the dynamic-slice cliff,
    docs/PERF.md), bit-identical to B separate dispatches."""
    audio, nv = [], []
    for i in range(blocks.shape[0]):
        state, a, v = pfb_step_tmaj(cfg, state, blocks[i])
        audio.append(a)
        nv.append(v)
    return state, jnp.stack(audio), jnp.stack(nv)


@partial(jax.jit, static_argnums=0)
def pfb_step(cfg: PfbConfig, state: PfbState, block):
    """One wideband block -> D channels, demodulated.

    ``block``: (2N,) int16 at capture_rate, N % D == 0.  Returns
    ``(state, audio (D, cap), n_valid (D,))`` — same contract as
    ``channelizer.channelize_step``.

    Uses :func:`filterbank_mxu` — measured 31x the conv formulation
    standalone and 2x end-to-end on the chip (docs/PERF.md round-3).
    """
    tail, zi, zq = filterbank_mxu(cfg, state.tail, block)

    prev, davg, racc, rphase, audio, n_valid = _chan.demod_tail_batch_planar(
        cfg, state.prev_iq, state.deemph_avg, state.resamp.acc,
        state.resamp.phase, zi, zq)

    new_state = PfbState(tail=tail, prev_iq=prev, deemph_avg=davg,
                         resamp=ResampleState(racc, rphase))
    return new_state, audio, n_valid
