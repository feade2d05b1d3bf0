"""Time-axis sharding of the FM chain: overlap-save halos over ICI.

A long recording is split into ``S`` contiguous time shards, one per device.
The reference carries small filter state across block boundaries
(``lp_i_hist``/``pre_r,pre_j``/``dc_avg``/deemph ``avg`` —
``src/rtl_fm.c:130-131,139,152-153,669``); across *shard* boundaries that
state becomes a **halo**: each shard receives the trailing ``warmup`` blocks
of its left neighbour via a one-hop ``ppermute`` ring (ICI traffic only),
re-derives the carried state by running them through the chain from zero
state, and only then emits its own blocks.

Boundary semantics (documented per SURVEY.md §7 "hard parts"):

- FIR state (fifth-order hists, droop hist, discriminator seam, boxcar
  accumulator) is fully determined by the last few *input* samples, so one
  warm-up block makes shard outputs **exactly** equal to the unsharded run.
- Deemphasis (round-4): the one-pole IIR is *linear*, so its cross-shard
  state is carried **exactly** without any sequential dependency: each
  shard computes its deemph-from-zero outputs ``y0`` locally; the
  from-zero end state ``B = y0[-1]`` (and the state at its halo cut,
  ``y0[Lpart-1]``) are all_gathered — S pairs of scalars — and the true
  initial state of every shard follows from the affine recurrence
  ``init_s = B_{s-1} + c^L * init_{s-1}`` evaluated in a static loop.
  The correction ``y = y0 + init_s * c^(n+1)`` is exact (same algebra
  ``ops.filters._iir_scan_flat`` uses within a chunk): sharded output ==
  unsharded output to float rounding, no warm-up transient, asserted on
  ALL shards with no skip window in ``tests/test_parallel.py``.
- The rational resampler's fractional phase at a shard boundary is
  *deterministic* for aligned blocks (``phase_s = (samples_before * slow)
  % fast``) and is seeded analytically; its carried window remainder
  (``now_lpr``) is recovered exactly by replaying the halo's audio through
  the resampler with the halo-start phase (the partial window never spans
  more than ~fast/slow samples, far less than one halo block).
- Audio DC block (``-E dc``, round-5): ``dc_block_audio`` is a *linear*
  per-block EMA applied after the (nonlinear) discriminator
  (``rtl_fm.c:684-697``), so its cross-shard state is carried exactly
  like deemph.  Because its per-block means are taken over the
  deemph-corrected audio, and that correction is itself linear in the
  deemph initial state, each shard publishes its from-zero EMA ends as
  an affine pair ``(A0, A1)`` in the deemph init — all six scalars ride
  the SAME single all_gather — and the static cross-shard loop first
  resolves every shard's deemph init, then every shard's DC init from
  it.  Sharded == unsharded on all shards, no warm-up window.
- The raw DC block (``-E rdc``) remains warm-up approximated (transient
  bounded by ``(9/10)**warmup`` per block): its EMA feeds the
  *nonlinear* discriminator, so no post-hoc linear correction exists;
  those configs take the legacy warm-up path (:func:`exact_iir_supported`
  gates).

Shard 0's left halo is zeros and its warm-up output is discarded like every
other shard's — since the unsharded run also starts from zero state, shard
0 reproduces it exactly once the same discard is applied on the unsharded
side for comparison, and in production the first ``warmup`` blocks of the
whole stream are the usual capture turn-on transient (the reference mutes
those anyway: ``BUFFER_DUMP``, ``rtl_fm.c:839-843``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from rx_tools_tpu.models import fmchain
from rx_tools_tpu.stream.scan import stack_blocks


import functools


@functools.lru_cache(maxsize=32)
def _ema0_matrix(m: int, a: float) -> np.ndarray:
    """(m, m) lower-triangular EMA-from-zero operator: row k of ``E @ b``
    is ``sum_{j<=k} a**(k-j) * b[j]`` — the per-block DC EMA
    (``rtl_fm.c:684-697``) unrolled as one tiny static matmul."""
    i = np.arange(m)
    e = i[:, None] - i[None, :]
    return np.where(e >= 0, np.float64(a) ** np.maximum(e, 0),
                    0.0).astype(np.float32)


def shard_recording(iq: np.ndarray, n_shards: int, block_size: int) -> np.ndarray:
    """Split interleaved CS16 into (S, M, 2*block_size) contiguous shards."""
    blocks = stack_blocks(iq, block_size)
    m = blocks.shape[0] // n_shards
    return blocks[: n_shards * m].reshape(n_shards, m, -1)


def _resampler_phase(cfg: fmchain.FmConfig, audio_in_before: int):
    """Deterministic resampler phase after ``audio_in_before`` input samples."""
    if cfg.rate_out2 <= 0:
        return 0
    import math
    g = math.gcd(cfg.rate_out, cfg.rate_out2)
    fast, slow = cfg.rate_out // g, cfg.rate_out2 // g
    return (audio_in_before * slow) % fast


def exact_iir_supported(cfg: fmchain.FmConfig) -> bool:
    """Configs whose shard boundaries are EXACT (see module docstring):
    the cross-shard IIR state — deemph average, audio-DC EMA (round-5)
    and the resampler window remainder — is linear post-demod and
    carried in closed form.  The raw DC block's EMA feeds the nonlinear
    discriminator and stays on the legacy warm-up path."""
    return (not cfg.dc_block_raw
            and cfg.mode in ("fm", "am", "usb", "lsb")
            and (cfg.deemph_a > 0 or cfg.rate_out2 > 0
                 or cfg.dc_block_audio))


@partial(jax.jit, static_argnames=("cfg", "mesh", "warmup", "cont"))
def time_sharded_fm(cfg: fmchain.FmConfig, sharded_blocks, *, mesh: Mesh,
                    warmup: int = 2, cont: bool = False, halo0=None,
                    block_offset_mod=None, iir_carry=None):
    """Process (S, M, 2N) int16 blocks, S sharded over ``mesh`` axis ``t``.

    Returns ``(audio (S, M, cap), n_valid (S, M), carry (S, 3))`` with the
    same sharding; ``carry[s] = [deemph_avg_end, resampler_acc_end,
    dc_avg_end]`` of shard ``s`` (exact-path configs; zeros otherwise) — a
    continuation super-chunk passes ``iir_carry = carry_prev[-1]`` so even
    the super-chunk seams are exact.
    Each shard's first ``warmup`` blocks of *output* correspond to its
    warm-up replay of the left neighbour's data and are already dropped:
    outputs are aligned to the shard's own M blocks.

    Continuation mode (``cont=True``) chains super-chunks of a capture too
    long to hold in memory (the ``-E shard`` streaming discipline,
    mirroring the reference's fixed-block streaming ``rtl_fm.c:80-88``):
    ``halo0`` is the trailing ``warmup`` blocks of the PREVIOUS super-chunk
    (shard 0's left halo, replayed exactly like every interior shard
    boundary) and ``block_offset_mod`` the global index of this
    super-chunk's first block reduced mod the resampler modulus (see
    :func:`resampler_modulus`), so every shard emits on the global output
    grid.  Shapes are identical across super-chunks, so the whole run
    compiles exactly twice (first chunk, continuation chunks).
    """
    import dataclasses

    from rx_tools_tpu import ops
    from rx_tools_tpu.ops.resample import ResampleState, resample_rational

    s, m, twon = sharded_blocks.shape
    block_size = twon // 2
    if cfg.rate_out2 > 0:
        import math
        g = math.gcd(cfg.rate_out, cfg.rate_out2)
        fast, slow = cfg.rate_out // g, cfg.rate_out2 // g
    else:
        fast, slow = 1, 0
    audio_per_block = block_size // cfg.downsample // cfg.post_downsample
    apb = audio_per_block
    if not cont:
        halo0 = jnp.zeros((warmup, twon), sharded_blocks.dtype)
        block_offset_mod = jnp.int32(0)
    if iir_carry is None:
        iir_carry = jnp.zeros((3,), jnp.float32)
    exact = exact_iir_supported(cfg)
    # front chain for the exact path: everything up to (and excluding) the
    # deemph/audio-DC/resampler tail, which is applied shard-flat with the
    # exact closed-form state below
    cfg_front = (dataclasses.replace(cfg, deemph_a=0, rate_out2=-1,
                                     dc_block_audio=False)
                 if exact else cfg)

    def _varying(a):
        if "t" in getattr(jax.typeof(a), "vma", ()):
            return a
        return jax.lax.pcast(a, ("t",), to="varying")

    def per_shard(blocks, halo0, off_mod, carry_in):
        # blocks: (1, M, 2N) local slice; halo0/off_mod/carry_in replicated
        blocks = blocks[0]
        idx = jax.lax.axis_index("t")
        n_dev = jax.lax.axis_size("t")
        # --- halo: trailing `warmup` blocks from the left neighbour -------
        halo = blocks[-warmup:]
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        halo = jax.lax.ppermute(halo, "t", perm)
        left0 = halo0 if cont else jnp.zeros_like(halo)
        halo = jnp.where(idx == 0, left0, halo)

        # --- seed state: zero + analytic resampler phase ------------------
        # mod is taken factor-by-factor so int32 arithmetic cannot overflow
        # for arbitrarily long recordings.  phase0 = phase at HALO start.
        st = fmchain.init_state(cfg_front)
        f = max(fast, 1)
        start_block = off_mod + idx * m - warmup
        phase0 = (((start_block % f) * (apb % f)) % f * (slow % f)) % f
        if not cont:
            phase0 = jnp.where(idx == 0, 0, phase0)
        if not exact:
            st = st._replace(resamp=st.resamp._replace(
                phase=phase0.astype(jnp.int32)))

        # the carry differs per device from step 1 on: mark it varying
        st = jax.tree.map(_varying, st)
        # Per-shard blocks run through the scan engine's batched-front
        # implementation (round-5; stream/scan.py — chunk-wide capture
        # front, batched tail, bit-identical per-block semantics); its
        # legacy traced loop covers stateful-front configs.
        # Warm-up replay first (restores FIR/discriminator/squelch state
        # exactly; on the exact path its front audio also feeds the
        # resampler-acc recovery below).
        from rx_tools_tpu.stream.scan import scan_fm_blocks_impl
        st, halo_a, _, _ = scan_fm_blocks_impl(cfg_front, st, halo)
        if not cont:
            # shard 0 replayed zeros; reset its IIR/seam state back to init
            fresh = fmchain.init_state(cfg_front)
            st = jax.tree.map(
                lambda warmed, fr: jnp.where(idx == 0, fr, warmed), st, fresh)
        st, audio_s, n_valid_s, _ = scan_fm_blocks_impl(cfg_front, st,
                                                        blocks)
        if not exact:
            return (audio_s[None], n_valid_s[None],
                    jnp.zeros((1, 3), jnp.float32))

        # --- exact linear tail: deemph + audio DC + rational resampler ----
        # (cfg_front has no resampler, so every block's audio is full:
        # the stacks flatten to the contiguous front-audio streams)
        x = audio_s.reshape(-1)                        # (L,) own front audio
        xh = halo_a.reshape(-1)                        # (Lh,) halo's
        l_own = m * apb
        l_part = (m - warmup) * apb
        m_part = m - warmup
        carry_avg, carry_acc, carry_dc = (carry_in[0], carry_in[1],
                                          carry_in[2])
        lane = jnp.arange(l_own)
        dc_on = bool(cfg.dc_block_audio)

        # -- local deemph from ZERO state + its publishable ends: y0[n]
        #    already IS the from-zero state after n+1 samples, so B_full =
        #    y0[-1] and the state at the halo cut is y0[l_part-1]
        if cfg.deemph_a:
            inv_a = 1.0 / cfg.deemph_a
            c = 1.0 - inv_a
            _, y0 = ops.deemph_filter(
                jnp.zeros((), jnp.float32), x, cfg.deemph_a)
            b_full = jnp.sum(jnp.where(lane == l_own - 1, y0, 0.0))
            b_part = (jnp.sum(jnp.where(lane == l_part - 1, y0, 0.0))
                      if l_part > 0 else jnp.zeros(()))
            a_full = np.float32(np.float64(c) ** l_own)
            a_part = np.float32(np.float64(c) ** l_part)
            cvec = jnp.asarray((np.float64(c) **
                                np.arange(1, l_own + 1)).astype(np.float32))
        else:
            y0 = x
            b_full = b_part = jnp.zeros(())
            a_full = a_part = np.float32(0.0)
            cvec = None

        # -- local audio-DC from-zero EMA (round-5), AFFINE in the deemph
        #    init: the EMA consumes per-block means of the deemph-corrected
        #    audio y = y0 + init_d*cvec, so
        #      avg_dc[k](init_d, init_dc) = A0[k] + init_d*A1[k]
        #                                   + adc**(k+1) * init_dc
        #    with A0/A1 the from-zero EMAs of mean(y0)/10 and mean(cvec)/10
        #    (adc = 9/10; weight const 9, rtl_fm.c:684-697).  The six
        #    scalars (deemph + DC, part + full) ride ONE all_gather.
        if dc_on:
            ema0 = jnp.asarray(_ema0_matrix(m, 0.9))
            mean0 = jnp.mean(y0.reshape(m, apb), axis=1)
            a0vec = ema0 @ (mean0 * jnp.float32(0.1))            # (m,)
            if cfg.deemph_a:
                cmean = jnp.mean(cvec.reshape(m, apb), axis=1)
                a1vec = ema0 @ (cmean * jnp.float32(0.1))
            else:
                cmean = jnp.zeros((m,), jnp.float32)
                a1vec = jnp.zeros((m,), jnp.float32)
            adc_full = np.float32(np.float64(0.9) ** m)
            adc_part = np.float32(np.float64(0.9) ** m_part)
            blk = jnp.arange(m)
            a0_full = jnp.sum(jnp.where(blk == m - 1, a0vec, 0.0))
            a1_full = jnp.sum(jnp.where(blk == m - 1, a1vec, 0.0))
            a0_part = (jnp.sum(jnp.where(blk == m_part - 1, a0vec, 0.0))
                       if m_part > 0 else jnp.zeros(()))
            a1_part = (jnp.sum(jnp.where(blk == m_part - 1, a1vec, 0.0))
                       if m_part > 0 else jnp.zeros(()))
            # EXACT per-block means of this shard's last `warmup` blocks,
            # published as (mean0, cmean) pairs — the right neighbour
            # rebuilds mean_k = mean0_k + init_d*cmean_k for its halo's
            # DC trajectory.  (The locally REPLAYED halo audio cannot
            # supply these: its first samples carry the from-zero
            # front-state transient, and a block MEAN — unlike the
            # geometrically-decaying deemph state — never forgets it.)
            tail_means = jnp.concatenate([mean0[-warmup:], cmean[-warmup:]])
        else:
            a0_full = a1_full = a0_part = a1_part = jnp.zeros(())
            adc_full = adc_part = np.float32(0.0)
            tail_means = jnp.zeros((2 * warmup,), jnp.float32)

        gat = jax.lax.all_gather(jnp.concatenate(
            [jnp.stack([b_part, b_full, a0_part, a0_full, a1_part, a1_full]),
             tail_means]).astype(jnp.float32), "t")       # (S, 6+2*warmup)

        # -- static cross-shard affine recurrences: first every shard's
        #    deemph init, then (depending on those) every shard's DC init
        d_inits = [carry_avg if cont else jnp.zeros(())]
        d_halo = [jnp.zeros(())]           # shard 0's halo value-irrelevant
        for k in range(1, n_dev):
            d_inits.append(gat[k - 1, 1] + a_full * d_inits[k - 1])
            d_halo.append(gat[k - 1, 0] + a_part * d_inits[k - 1])
        init_own = jnp.stack(d_inits)[idx]
        init_halo = jnp.stack(d_halo)[idx]
        if dc_on:
            dc_inits = [carry_dc if cont else jnp.zeros(())]
            dc_halo = [jnp.zeros(())]
            halo_means = [jnp.zeros((warmup,))]    # shard 0: value-irrelevant
            for k in range(1, n_dev):
                b_dc_full = gat[k - 1, 3] + gat[k - 1, 5] * d_inits[k - 1]
                b_dc_part = gat[k - 1, 2] + gat[k - 1, 4] * d_inits[k - 1]
                dc_inits.append(b_dc_full + adc_full * dc_inits[k - 1])
                dc_halo.append(b_dc_part + adc_part * dc_inits[k - 1])
                halo_means.append(gat[k - 1, 6: 6 + warmup]
                                  + d_inits[k - 1]
                                  * gat[k - 1, 6 + warmup: 6 + 2 * warmup])
            init_dc = jnp.stack(dc_inits)[idx]
            init_dc_halo = jnp.stack(dc_halo)[idx]
            hmean_exact = jnp.stack(halo_means)[idx]          # (warmup,)

        # -- local corrections ---------------------------------------------
        if cfg.deemph_a:
            y = y0 + init_own * cvec
            avg_end = gat[idx, 1] + a_full * init_own
        else:
            y = y0
            avg_end = jnp.zeros(())
        if dc_on:
            adcvec = jnp.asarray((np.float64(0.9) **
                                  np.arange(1, m + 1)).astype(np.float32))
            avg_blocks = a0vec + init_own * a1vec + init_dc * adcvec  # (m,)
            y = (y.reshape(m, apb) - avg_blocks[:, None]).reshape(-1)
            dc_end = gat[idx, 3] + gat[idx, 5] * init_own + adc_full * init_dc
        else:
            dc_end = jnp.zeros(())

        # -- halo audio through the same exact corrections (feeds only the
        #    resampler's partial-window recovery below) ---------------------
        if cfg.rate_out2 > 0:
            if cfg.deemph_a:
                _, yh = ops.deemph_filter(
                    jnp.zeros((), jnp.float32), xh, cfg.deemph_a)
                lh = xh.shape[0]
                cvech = jnp.asarray((np.float64(c) **
                                     np.arange(1, lh + 1)).astype(np.float32))
                yh = yh + init_halo * cvech
            else:
                yh = xh
            if dc_on:
                # block means come from the neighbour's EXACT published
                # pairs, not from the replayed halo audio (whose leading
                # transient would bias them — see the gather comment)
                emah = jnp.asarray(_ema0_matrix(warmup, 0.9))
                avgh0 = emah @ (hmean_exact * jnp.float32(0.1))
                adcvech = jnp.asarray((np.float64(0.9) **
                                       np.arange(1, warmup + 1)
                                       ).astype(np.float32))
                avgh = avgh0 + init_dc_halo * adcvech
                yh = (yh.reshape(warmup, apb) - avgh[:, None]).reshape(-1)
        else:
            yh = xh

        if cfg.rate_out2 > 0:
            # resampler window remainder recovered exactly from the halo:
            # replay its audio with the halo-start phase; the returned acc
            # is the true partial-window sum at the shard boundary
            st_r0 = ResampleState(jnp.zeros((), jnp.float32),
                                  phase0.astype(jnp.int32))
            st_rh, _, _ = resample_rational(st_r0, yh,
                                            cfg.rate_out, cfg.rate_out2)
            own_phase = jnp.where(idx == 0 if not cont else False,
                                  jnp.int32(0), st_rh.phase)
            acc0 = st_rh.acc
            if cont:
                acc0 = jnp.where(idx == 0, carry_acc, acc0)
            else:
                acc0 = jnp.where(idx == 0, 0.0, acc0)
            st_r = ResampleState(acc0.astype(jnp.float32), own_phase)
            out_a, out_nv = [], []
            for i in range(m):
                st_r, yo, nv = resample_rational(
                    st_r, jax.lax.slice(y, (i * apb,), ((i + 1) * apb,)),
                    cfg.rate_out, cfg.rate_out2)
                out_a.append(yo)
                out_nv.append(nv)
            acc_end = st_r.acc
        else:
            out_a = [jax.lax.slice(y, (i * apb,), ((i + 1) * apb,))
                     for i in range(m)]
            out_nv = [jnp.int32(apb)] * m
            acc_end = jnp.zeros(())
        carry = jnp.stack([avg_end.astype(jnp.float32),
                           acc_end.astype(jnp.float32),
                           dc_end.astype(jnp.float32)])
        return (jnp.stack(out_a)[None], jnp.stack(out_nv)[None], carry[None])

    spec = P("t", None, None)
    fn = jax.shard_map(per_shard, mesh=mesh,
                       in_specs=(spec, P(None, None), P(), P()),
                       out_specs=(P("t", None, None), P("t", None),
                                  P("t", None)))
    return fn(sharded_blocks, halo0, block_offset_mod, iir_carry)


def resampler_modulus(cfg: fmchain.FmConfig) -> int:
    """The modulus the global block index must be reduced by when seeding
    a continuation super-chunk's resampler phase (``fast`` in the
    reference's accumulate-and-dump resampler, ``rtl_fm.c:389-409``)."""
    if cfg.rate_out2 <= 0:
        return 1
    import math
    return cfg.rate_out // math.gcd(cfg.rate_out, cfg.rate_out2)
