"""Offline block processing: whole-chunk programs with per-block semantics.

For file/recorded input there is no realtime arrival constraint, so instead
of stepping block-by-block from the host (one dispatch per ~7 ms of signal),
a whole recording chunk is moved to the device once and processed in one
compiled program:

    blocks (M, 2N) --scan--> audio (M, cap), n_valid (M,)

One dispatch per M blocks amortises host/dispatch overhead to nothing —
the TPU analog of the reference's dongle/demod thread overlap
(``src/rtl_fm.c:866-958``).  The carried state threads through exactly as
it threads between pthread buffer handoffs in the reference.

Round-5 engine structure: the capture-rate front half (rescale + fs/4
rotate + decimate, ``rtlsdr_callback`` rtl_fm.c:828-863, plus the
discriminator) carries NO cross-block state on the default boxcar path,
so it runs ONCE over the whole chunk — a single block-banded MXU dot and
one fused elementwise pass instead of M small ones (M small frontend dots
measured ~2x slower than one big one, docs/PERF.md round-5).  The audio
tail (levels, deemphasis, DC block, resampler) keeps the per-block loop
with carried state, so outputs stay BIT-IDENTICAL to stepping
``fm_chain_step`` block by block (tests/test_stream.py pins this) — the
engine change is invisible to every consumer, including checkpoints.
Stateful-front configs (fifth-order cascade, raw DC, squelch gating,
opt-in fused kernel) take the legacy per-block path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rx_tools_tpu import ops
from rx_tools_tpu.models import fmchain


def stack_blocks(iq: np.ndarray, block_size: int) -> np.ndarray:
    """Chop interleaved CS16 into (M, 2*block_size); truncate the tail."""
    n = iq.shape[0] // (2 * block_size)
    return iq[: n * 2 * block_size].reshape(n, 2 * block_size)


def _batched_front_ok(cfg: fmchain.FmConfig, k_per_block: int) -> bool:
    """The chunk-wide front requires a stateless capture path: boxcar
    decimation (no fifth-order history), no raw DC EMA, squelch off (the
    per-block zeroing feeds the discriminator), and not the opt-in fused
    Pallas kernel (which fuses capture+disc per block by design).

    Bitwise note: the engine's bit-identity contract vs per-block
    stepping holds for every stage EXCEPT the audio DC block's mean —
    XLA's tiling of a plain full reduce is not association-stable across
    program contexts (measured last-ulp drift at some block sizes, and
    present even in the legacy multi-block loop), so ``-E dc`` configs
    agree with per-block stepping to float rounding (~1e-7 relative,
    occasionally +/-1 output LSB), not byte-for-byte.  All other configs
    are byte-exact (tests/test_stream.py battery)."""
    from rx_tools_tpu.ops import fused_frontend
    return (cfg.downsample_passes == 0 and cfg.fir_quality <= 9
            and not cfg.dc_block_raw
            and cfg.squelch_level == 0
            and cfg.mode in ("fm", "am", "usb", "lsb", "raw")
            and not fused_frontend.fused_eligible(cfg, k_per_block))


def scan_fm_blocks_impl(cfg: fmchain.FmConfig, state: fmchain.FmState,
                        blocks):
    """Run the FM chain over ``blocks`` (M, 2N) int16 in one compiled
    program.  Returns ``(state, audio (M, cap), n_valid (M,), levels (M,))``
    — bit-identical to stepping ``fm_chain_step`` per block.
    """
    m, twon = blocks.shape
    k_per_block = twon // 2 // cfg.downsample
    if _batched_front_ok(cfg, k_per_block):
        return _scan_batched_front(cfg, state, blocks)
    # Legacy per-block loop — a traced Python loop with static block
    # indices, NOT lax.scan: a rolled scan reads block k with a
    # dynamic-slice each iteration, which on TPU costs ~1.6 ms per
    # MB-sized slice (measured 20 ms vs 0.094 ms per 12-block chunk,
    # 200x) — and lax.scan's unroll option still emits dynamic indexing,
    # so only static blocks[i] gets the fast path (docs/PERF.md "the
    # dynamic-slice cliff").
    audio, n_valid, levels = [], [], []
    for i in range(m):
        state, a, nv, lv = fmchain.fm_chain_step_impl(cfg, state, blocks[i])
        audio.append(a)
        n_valid.append(nv)
        levels.append(lv)
    return (state, jnp.stack(audio), jnp.stack(n_valid), jnp.stack(levels))


scan_fm_blocks = partial(jax.jit, static_argnums=0)(scan_fm_blocks_impl)


def _scan_batched_front(cfg, state, blocks):
    """Chunk-wide capture front + discriminator, per-block audio tail.

    The front is elementwise/windowed with no cross-block state (the fs/4
    phase is continuous because N % 4 == 0, and every decimation window
    lies inside one block), so one chunk-wide call computes exactly what
    M per-block calls would, value-for-value; the discriminator's
    per-buffer std-atan2 seam quirk (``fm_demod`` rtl_fm.c:588-590) is
    kept at every block boundary via ``seam_stride``.  The tail loop
    below replays ``_fm_post`` per block with the carried state, so
    deemph/DC/resampler sum associations — and therefore the emitted
    bytes — match the legacy engine exactly.
    """
    m, twon = blocks.shape
    n = twon // 2
    kpb = n // cfg.downsample

    zi, zq = ops.capture_frontend_planar(blocks.reshape(-1), cfg.downsample,
                                         rotate=not cfg.offset_tuning)

    prev_iq = state.prev_iq
    d = None
    if cfg.mode == "fm":
        if cfg.custom_atan != ops.DISC_STD:
            prev_iq, d = ops.fm_discriminate_planar(prev_iq, zi, zq,
                                                    cfg.custom_atan,
                                                    seam_stride=kpb)
        # DISC_STD stays per-block (in the tail loop): XLA's atan2
        # lowering is shape-dependent in the last ulp, and this engine's
        # contract is BIT-identical output to per-block stepping.  The
        # rational-polynomial modes (fast/lut/ale) are IEEE-exact
        # elementwise, so the chunk-wide form changes nothing.
    elif cfg.mode == "am":
        d = jnp.sqrt(zi * zi + zq * zq) * jnp.float32(cfg.output_scale)
    elif cfg.mode == "usb":
        d = (zi + zq) * jnp.float32(cfg.output_scale)
    elif cfg.mode == "lsb":
        d = (zi - zq) * jnp.float32(cfg.output_scale)
    else:  # raw
        d = jnp.stack([zi, zq], axis=-1).reshape(-1)

    # Per-block resampler calls are the measured residual of this engine
    # (tools/chipsuite25.py: scan 28.5 GB/s -> 44.2 with the resampler
    # ablated, vs flat 39.8 — M small programs cost per-op overhead, not
    # work).  When every per-block call would dispatch to the gather-free
    # rows formulation, the whole per-block resampler sequence runs as
    # ONE batched program instead (ops.resample.resample_rows_blocks),
    # BIT-identical to the loop by construction (unit-pinned).
    from rx_tools_tpu.ops import filters as _filters
    from rx_tools_tpu.ops.resample import (resample_rows_blocks,
                                           rows_path_eligible)
    k2 = kpb // max(cfg.post_downsample, 1)
    batched_rs = (cfg.mode != "raw" and cfg.rate_out2 > 0
                  and cfg.resample_quality == 0
                  and not cfg.dc_block_audio
                  and rows_path_eligible(k2, cfg.rate_out, cfg.rate_out2))
    batched_deemph = (batched_rs and cfg.deemph_a
                      and _filters.deemph_mxu_path())
    # per-block levels as ONE pair of row reductions (the per-row reduce
    # over a contiguous (M, K) row is the same-association reduction the
    # per-block slice call lowers to — the bit-identity battery pins it)
    lv = _rms_level_rows(zi.reshape(m, kpb), zq.reshape(m, kpb))

    audio, n_valid = [], []
    st = state
    deemph_avg, dc_avg = state.deemph_avg, state.dc_avg
    for i in range(m):
        level = lv[i]
        if cfg.mode == "raw":
            # raw leaves the whole carried state untouched on this path
            # (no discriminator seam, no IIR tail — rtl_fm.c:658-665)
            a = jax.lax.slice(d, (2 * i * kpb,), (2 * (i + 1) * kpb,))
            audio.append(a)
            n_valid.append(jnp.int32(a.shape[0]))
            continue
        if d is None:                 # fm + std atan2: per-block disc
            zib = jax.lax.slice(zi, (i * kpb,), ((i + 1) * kpb,))
            zqb = jax.lax.slice(zq, (i * kpb,), ((i + 1) * kpb,))
            prev_iq, a = ops.fm_discriminate_planar(prev_iq, zib, zqb,
                                                    cfg.custom_atan)
        else:
            a = jax.lax.slice(d, (i * kpb,), ((i + 1) * kpb,))
        if batched_rs:
            # replicate _fm_post's per-block stages up to the resampler;
            # deemph joins the batched program below when on the MXU path
            if cfg.post_downsample > 1:
                a = ops.low_pass_simple(a, cfg.post_downsample)
            if cfg.deemph_a and not batched_deemph:
                deemph_avg, a = ops.deemph_filter(deemph_avg, a,
                                                  cfg.deemph_a)
            audio.append(a)
            continue
        st, a_out, nv, _ = fmchain._fm_post(
            cfg, st, a, level, prev_iq, st.dc_iq, st.fifth, st.droop,
            st.boxcar, st.polyfir, st.squelch_hits)
        audio.append(a_out)
        n_valid.append(nv)
    if batched_rs:
        a2 = jnp.stack(audio)                       # (M, K2)
        if batched_deemph:
            deemph_avg, a2 = _filters.deemph_blocks(deemph_avg, a2,
                                                    cfg.deemph_a)
        resamp, y, nv = resample_rows_blocks(
            st.resamp, a2, cfg.rate_out, cfg.rate_out2)
        st = fmchain.FmState(
            dc_iq=st.dc_iq, boxcar=st.boxcar, fifth=st.fifth,
            droop=st.droop, prev_iq=prev_iq, deemph_avg=deemph_avg,
            dc_avg=dc_avg, resamp=resamp, squelch_hits=st.squelch_hits,
            polyfir=st.polyfir, sincresamp=st.sincresamp)
        return st, y, nv, lv
    return (st, jnp.stack(audio), jnp.stack(n_valid), lv)


def _rms_level_rows(zib, zqb):
    """Per-block squelch RMS over a (M, K) row stack — the exact per-row
    operation sequence of ``ops.rms_level_planar`` on each block slice
    (``rms``, rtl_fm.c:739-757), as one batched pass."""
    n = 2 * zib.shape[1]
    t = jnp.sum(zib, axis=1) + jnp.sum(zqb, axis=1)
    p = jnp.sum(zib * zib, axis=1) + jnp.sum(zqb * zqb, axis=1)
    dc = t / n
    err = t * 2 * dc - dc * dc * n
    return jnp.sqrt(jnp.maximum(p - err, 0.0) / n)


def gather_valid(audio: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """Host-side: concatenate the valid prefixes of each scanned block."""
    return np.concatenate([audio[i, : int(n_valid[i])]
                           for i in range(audio.shape[0])])
