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
- IIR state (deemphasis average, DC-block average) has infinite memory; it
  converges geometrically (deemph time constant 75/50 us; DC pole
  ``9/10`` per block), so ``warmup`` blocks leave a transient bounded by
  ``(9/10)**warmup`` of the DC offset — SNR-equivalent, tested in
  ``tests/test_parallel.py``.
- The rational resampler's fractional phase at a shard boundary is
  *deterministic* for aligned blocks (``phase_s = (samples_before * slow)
  % fast``) and is seeded analytically, so every shard emits on the global
  output grid (no drift at seams).

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


@partial(jax.jit, static_argnames=("cfg", "mesh", "warmup", "cont"))
def time_sharded_fm(cfg: fmchain.FmConfig, sharded_blocks, *, mesh: Mesh,
                    warmup: int = 2, cont: bool = False, halo0=None,
                    block_offset_mod=None):
    """Process (S, M, 2N) int16 blocks, S sharded over ``mesh`` axis ``t``.

    Returns ``(audio (S, M, cap), n_valid (S, M))`` with the same sharding.
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
    s, m, twon = sharded_blocks.shape
    block_size = twon // 2
    if cfg.rate_out2 > 0:
        import math
        g = math.gcd(cfg.rate_out, cfg.rate_out2)
        fast, slow = cfg.rate_out // g, cfg.rate_out2 // g
    else:
        fast, slow = 1, 0
    audio_per_block = block_size // cfg.downsample // cfg.post_downsample
    if not cont:
        halo0 = jnp.zeros((warmup, twon), sharded_blocks.dtype)
        block_offset_mod = jnp.int32(0)

    def per_shard(blocks, halo0, off_mod):
        # blocks: (1, M, 2N) local slice; halo0/off_mod replicated
        blocks = blocks[0]
        idx = jax.lax.axis_index("t")
        # --- halo: trailing `warmup` blocks from the left neighbour -------
        halo = blocks[-warmup:]
        n_dev = jax.lax.axis_size("t")
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        halo = jax.lax.ppermute(halo, "t", perm)
        left0 = halo0 if cont else jnp.zeros_like(halo)
        halo = jnp.where(idx == 0, left0, halo)

        # --- seed state: zero + analytic resampler phase ------------------
        # mod is taken factor-by-factor so int32 arithmetic cannot overflow
        # for arbitrarily long recordings.
        st = fmchain.init_state(cfg)
        f = max(fast, 1)
        start_block = off_mod + idx * m - warmup
        phase0 = (((start_block % f) * (audio_per_block % f)) % f * (slow % f)) % f
        if not cont:
            phase0 = jnp.where(idx == 0, 0, phase0)
        st = st._replace(resamp=st.resamp._replace(
            phase=phase0.astype(jnp.int32)))

        # the carry differs per device from step 1 on: mark it varying
        def _varying(a):
            if "t" in getattr(jax.typeof(a), "vma", ()):
                return a
            return jax.lax.pcast(a, ("t",), to="varying")
        st = jax.tree.map(_varying, st)
        # Traced Python loops with static block indices, not lax.scan:
        # rolled-scan dynamic-slices cost ~1.6 ms per MB-sized block read on
        # TPU (see stream/scan.py, docs/PERF.md "the dynamic-slice cliff").
        # warm-up replay (outputs discarded)
        for i in range(halo.shape[0]):
            st, _, _, _ = fmchain.fm_chain_step_impl(cfg, st, halo[i])
        if not cont:
            # shard 0 replayed zeros; reset its IIR/seam state back to init
            fresh = fmchain.init_state(cfg)
            st = jax.tree.map(
                lambda warmed, f: jnp.where(idx == 0, f, warmed), st, fresh)
        audio, n_valid = [], []
        for i in range(blocks.shape[0]):
            st, a, nv, _ = fmchain.fm_chain_step_impl(cfg, st, blocks[i])
            audio.append(a)
            n_valid.append(nv)
        audio = jnp.stack(audio)
        n_valid = jnp.stack(n_valid)
        return audio[None], n_valid[None]

    spec = P("t", None, None)
    fn = jax.shard_map(per_shard, mesh=mesh,
                       in_specs=(spec, P(None, None), P()),
                       out_specs=(P("t", None, None), P("t", None)))
    return fn(sharded_blocks, halo0, block_offset_mod)


def resampler_modulus(cfg: fmchain.FmConfig) -> int:
    """The modulus the global block index must be reduced by when seeding
    a continuation super-chunk's resampler phase (``fast`` in the
    reference's accumulate-and-dump resampler, ``rtl_fm.c:389-409``)."""
    if cfg.rate_out2 <= 0:
        return 1
    import math
    return cfg.rate_out // math.gcd(cfg.rate_out, cfg.rate_out2)
