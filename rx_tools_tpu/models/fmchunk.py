"""Scan-free chunk processing: the whole FM chain as parallel passes.

``stream.scan`` runs ``fm_chain_step`` under ``lax.scan`` — correct, but
the scan serializes block k+1 behind block k even though almost nothing in
the chain actually depends sequentially on the data.  This module
re-derives the chain so an (M, 2N) chunk is ONE parallel program:

- capture rescale / fs/4 rotate / boxcar decimate: elementwise + reshape
  reductions — embarrassingly parallel (the 95% of the work at capture
  rate);
- raw & audio DC blockers: per-block means with an exponential carry —
  an affine recurrence over M scalars, evaluated with
  ``lax.associative_scan`` (log-depth);
- discriminator: the "previous sample" is just the decimated stream
  shifted by one — parallel once the stream is materialized;
- de-emphasis IIR: already an associative scan (ops.deemph_filter), now
  over the whole chunk at once;
- rational resampler: cumsum + emission mask (ops.resample_rational),
  inherently scan-free, now over the whole chunk.

Only log-depth scans remain on the critical path.  Measured (docs/PERF.md
"the dynamic-slice cliff"): on TPU this and the traced-loop engine
(``stream/scan.py``, which unrolls its block loop with static indices for
the same reason) overlap within the chip's run-to-run variance; bench.py
runs both and reports the better.  Semantics match ``scan_fm_blocks``
exactly for the supported
configs (golden-tested, including mixed-engine chains); unsupported
configs (fifth-order cascade, HQ resampler) stay on the scanned engine —
check :func:`supports`.

Returns one flat audio stream per chunk plus per-block levels for the
squelch/hop control, and the same carried state pytree as fm_chain_step so
chunks chain bit-compatibly with the scanned path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rx_tools_tpu import ops
from rx_tools_tpu.models import fmchain
from rx_tools_tpu.ops.resample import resample_rational



def supports(cfg: fmchain.FmConfig) -> bool:
    """Configs the flat formulation covers (the common/hot ones)."""
    return (cfg.downsample_passes == 0 and cfg.fir_quality <= 9
            and cfg.resample_quality == 0
            and cfg.mode in ("fm", "am", "usb", "lsb", "raw"))


def _ema_scan(means, prev, block_const: int):
    """avg_k = (means_k + c*avg_{k-1}) / (c+1) over the leading axis."""
    c = jnp.float32(block_const)
    a = jnp.full(means.shape[:1], c / (c + 1.0), means.dtype)
    if means.ndim > 1:
        a = a[:, None] * jnp.ones_like(means)
    b = means / (c + 1.0)

    def compose(l, r):
        return l[0] * r[0], l[1] * r[0] + r[1]

    As, Bs = jax.lax.associative_scan(compose, (a, b))
    return Bs + As * prev


@partial(jax.jit, static_argnums=0)
def fm_chunk_step(cfg: fmchain.FmConfig, state: fmchain.FmState, blocks):
    """(M, 2N) int16 -> (state, audio (cap,), n_valid, levels (M,)).

    One parallel program per chunk; carried state identical to
    ``fm_chain_step`` so engines interoperate.
    """
    assert supports(cfg), "config not supported by the flat engine"
    m, twon = blocks.shape
    n = twon // 2
    d = cfg.downsample
    dc_iq = state.dc_iq
    # --- fully fused front (round-4): capture + fast-atan discriminator +
    # level partials in ONE Pallas kernel (ops/fused_frontend.py) — the
    # K-rate op boundaries (planar splits, shifted prev, level reduces)
    # were costing more HBM round-trips than the math (chipsuite15)
    from rx_tools_tpu.ops import fused_frontend
    if fused_frontend.fused_eligible(cfg, n // d):
        prev_iq, audio, levels = fused_frontend.fused_capture_fm_demod(
            state.prev_iq, blocks.reshape(-1), d, n // d,
            rotate=not cfg.offset_tuning)
        return _fm_tail(cfg, state, audio, levels, prev_iq, dc_iq,
                        state.squelch_hits, m)
    if not cfg.dc_block_raw:
        # fused capture head (rescale + fs/4 + boxcar decimate) over the
        # whole chunk at once as two masked reduces, PLANAR output; the
        # fs/4 phase is continuous across blocks because n % 4 == 0.
        # Planar (zi, zq) all the way through the demod avoids 2-wide-axis
        # slicing, which lowers to a scalar loop on TPU (docs/PERF.md
        # round-3 campaign, 60x).
        zi, zq = ops.capture_frontend_planar(blocks.reshape(-1), d,
                                             rotate=not cfg.offset_tuning)
    else:
        x = (blocks.astype(jnp.float32).reshape(m, n, 2)
             * jnp.float32(128.0 / 32767.0))
        # --- raw DC block: per-block EMA via associative scan ------------
        means = jnp.mean(x, axis=1)                    # (M, 2)
        avgs = _ema_scan(means, state.dc_iq[None, :], 9)
        x = x - avgs[:, None, :]
        dc_iq = avgs[-1]

        flat = x.reshape(m * n, 2)
        if not cfg.offset_tuning:
            flat = ops.rotate_fs4(flat)

        # --- capture decimation (aligned boxcar) -------------------------
        z = flat.reshape(m * n // d, d, 2).sum(axis=1)     # (K, 2)
        zi, zq = z[:, 0], z[:, 1]
    k_per_block = n // d

    # --- squelch levels per block ---------------------------------------
    zib = zi.reshape(m, k_per_block)
    zqb = zq.reshape(m, k_per_block)
    t = jnp.sum(zib, axis=1) + jnp.sum(zqb, axis=1)
    p = jnp.sum(zib * zib, axis=1) + jnp.sum(zqb * zqb, axis=1)
    nn = 2 * k_per_block
    dc = t / nn
    err = t * 2 * dc - dc * dc * nn
    levels = jnp.sqrt(jnp.maximum(p - err, 0.0) / nn)  # (M,)
    if cfg.squelch_level > 0:
        squelched = levels < cfg.squelch_level
        zi = jnp.where(squelched[:, None], 0.0, zib).reshape(-1)
        zq = jnp.where(squelched[:, None], 0.0, zqb).reshape(-1)
        # squelch_hits: consecutive run length ending at the last block
        run = jnp.cumprod(squelched[::-1].astype(jnp.int32))[::-1]
        tail_hits = jnp.sum(run)
        squelch_hits = jnp.where(tail_hits == m,
                                 state.squelch_hits + m, tail_hits)
    else:
        squelch_hits = state.squelch_hits

    # --- demodulate (planar) ---------------------------------------------
    prev_iq = state.prev_iq
    if cfg.mode == "fm":
        prev_iq, audio = ops.fm_discriminate_planar(
            prev_iq, zi, zq, cfg.custom_atan, seam_stride=k_per_block)
    elif cfg.mode == "am":
        audio = jnp.sqrt(zi * zi + zq * zq) * jnp.float32(cfg.output_scale)
    elif cfg.mode == "usb":
        audio = (zi + zq) * jnp.float32(cfg.output_scale)
    elif cfg.mode == "lsb":
        audio = (zi - zq) * jnp.float32(cfg.output_scale)
    else:  # raw
        audio = jnp.stack([zi, zq], axis=-1).reshape(-1)
        new_state = state._replace(dc_iq=dc_iq, squelch_hits=squelch_hits)
        return new_state, audio, jnp.int32(audio.shape[0]), levels

    return _fm_tail(cfg, state, audio, levels, prev_iq, dc_iq,
                    squelch_hits, m)


def _fm_tail(cfg, state, audio, levels, prev_iq, dc_iq, squelch_hits, m):
    """Shared audio post-processing: post-downsample, deemph, audio DC
    block, rational resample, state assembly (both front paths)."""
    if cfg.post_downsample > 1:
        audio = ops.low_pass_simple(audio, cfg.post_downsample)
    deemph_avg = state.deemph_avg
    if cfg.deemph_a:
        deemph_avg, audio = ops.deemph_filter(deemph_avg, audio, cfg.deemph_a)
    dc_avg = state.dc_avg
    if cfg.dc_block_audio:
        ab = audio.reshape(m, -1)
        means = jnp.mean(ab, axis=1)
        avgs = _ema_scan(means, state.dc_avg, 9)
        audio = (ab - avgs[:, None]).reshape(-1)
        dc_avg = avgs[-1]
    resamp = state.resamp
    if cfg.rate_out2 > 0:
        resamp, audio, n_valid = resample_rational(
            resamp, audio, cfg.rate_out, cfg.rate_out2)
    else:
        n_valid = jnp.int32(audio.shape[0])

    new_state = fmchain.FmState(
        dc_iq=dc_iq, boxcar=state.boxcar, fifth=state.fifth,
        droop=state.droop, prev_iq=prev_iq, deemph_avg=deemph_avg,
        dc_avg=dc_avg, resamp=resamp, squelch_hits=squelch_hits,
        polyfir=state.polyfir, sincresamp=state.sincresamp)
    return new_state, audio, n_valid, levels
