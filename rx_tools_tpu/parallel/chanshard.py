"""Channel-axis sharding of the PFB channelizer.

The PFB's channel axis is embarrassingly parallel — like rx_power's hop
axis (the threading the reference's own TODO wished for,
``src/rtl_power.c:29-36``), every channel's demod tail is independent
once the branch DFT has split the capture.  Sharding recipe
(round-5, verdict item 8):

- the branch FIR (``models/pfb._fb_pre_mxu``) runs replicated — it is the
  shared capture-rate work, O(N*T), and replicating it costs less than
  any collective that would distribute it;
- the branch DFT is computed PER SHARD: device ``s`` dots the shared
  ``w (2D, M)`` against its own ``(2*D/n, 2D)`` row-slice of the DFT
  matrix (the rows for its channels' Re/Im planes), which IS the
  channel partition — no post-dot scatter;
- the batched demod tail (discriminator/deemph/resampler,
  ``channelizer.demod_tail_batch_planar``) runs on the local
  ``(D/n, M)`` channel stack with the per-channel state sharded the
  same way.

Zero collectives in the steady state (HLO-asserted in
``tests/test_parallel.py``); cross-device traffic is only the host
gather of the per-channel audio.  Per-channel math is untouched, so the
sharded step is BIT-identical to the single-device ``pfb_step``
(also asserted).  User-reachable: ``rx_channels -n D -t N``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rx_tools_tpu.models import channelizer as _chan
from rx_tools_tpu.models import pfb
from rx_tools_tpu.ops.resample import ResampleState


@functools.lru_cache(maxsize=32)
def _dft_slices(d: int, n_dev: int, lo: int = 0, hi: int | None = None
                ) -> np.ndarray:
    """(n_dev, 2*(hi-lo)/n, 2D) stacked per-shard row slices of the DFT
    matrix for channels [lo, hi): shard ``s`` gets the Re rows of its
    channels followed by their Im rows, so its local dot output is
    exactly ``[zi_local; zq_local]``.  The default range is all D
    channels; a sub-range serves multi-process channel partitions
    (each process computes the replicated branch FIR + ONLY its own
    channels' DFT rows and demod tails)."""
    hi = d if hi is None else hi
    m = pfb._dft_matrix(d)                       # (2D, 2D)
    dn = (hi - lo) // n_dev
    return np.stack([
        np.concatenate([m[lo + s * dn: lo + (s + 1) * dn],
                        m[d + lo + s * dn: d + lo + (s + 1) * dn]])
        for s in range(n_dev)])


def channel_sharded_pfb_step(cfg: pfb.PfbConfig, state: pfb.PfbState,
                             block, mesh: Mesh, channels=None):
    """One wideband block -> channel stack, channel axis sharded over
    mesh axis ``c``.  Same contract and BIT-identical results as
    ``pfb.pfb_step`` (restricted to ``channels=(lo, hi)`` when given —
    the per-channel state leaves then have ``hi-lo`` rows and the
    returned audio covers only those channels; the channel count must
    divide by the mesh size)."""
    n_dev = mesh.devices.size
    d = cfg.n_channels
    lo, hi = channels if channels is not None else (0, d)
    if (hi - lo) % n_dev:
        raise ValueError(
            f"{hi - lo} channels do not shard over {n_dev} devices")
    sh2 = NamedSharding(mesh, P("c", None))
    sh1 = NamedSharding(mesh, P("c"))
    prev = jax.device_put(state.prev_iq, sh2)
    davg = jax.device_put(state.deemph_avg, sh1)
    racc = jax.device_put(state.resamp.acc, sh1)
    rph = jax.device_put(state.resamp.phase, sh1)
    dfts = jax.device_put(jnp.asarray(_dft_slices(d, n_dev, lo, hi)),
                          NamedSharding(mesh, P("c", None, None)))
    tail, audio, nv, prev, davg, racc, rph = _sharded_step(
        cfg, mesh, hi - lo)(state.tail, block, dfts, prev, davg, racc, rph)
    return (pfb.PfbState(tail=tail, prev_iq=prev, deemph_avg=davg,
                         resamp=ResampleState(racc, rph)),
            audio, nv)


@functools.lru_cache(maxsize=32)
def _sharded_step(cfg: pfb.PfbConfig, mesh: Mesh, n_chan: int | None = None):
    """Jitted shard_map step, cached per (cfg, mesh, channel count)."""
    n_dev = mesh.devices.size
    dn = (cfg.n_channels if n_chan is None else n_chan) // n_dev

    def local(w, dfts, prev, davg, racc, rph):
        ch = jax.lax.dot_general(dfts[0], w, (((1,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST)
        zi, zq = ch[:dn], ch[dn:]
        prev, davg, racc, rph, audio, nv = _chan.demod_tail_batch_planar(
            cfg, prev, davg, racc, rph, zi, zq)
        return audio, nv, prev, davg, racc, rph

    smapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None), P("c", None, None), P("c", None),
                  P("c"), P("c"), P("c")),
        out_specs=(P("c", None), P("c"), P("c", None),
                   P("c"), P("c"), P("c")))

    def run(tail, block, dfts, prev, davg, racc, rph):
        new_tail, w = pfb._fb_pre_mxu(cfg, tail, block)
        return (new_tail,) + smapped(w, dfts, prev, davg, racc, rph)

    return jax.jit(run)
