"""Hop-axis sharding of rx_power sweeps.

The reference's sweep is a serial loop over up to 10000 frequency hops
(``scanner``, ``src/rtl_power.c:670-772``) — an embarrassingly-parallel
axis its own TODO wanted to thread (``rtl_power.c:29-36``).  Here the hop
axis ``H`` shards over the mesh and every device integrates its own hops'
FFTs locally.

Implementation note (measured, not theoretical): annotating shardings and
letting the SPMD partitioner split the batched FFT does NOT work — XLA's
``fft`` op is unpartitionable on sharded operands, so the partitioner
inserts an **all-gather of the whole segment batch** before it (observed
in compiled HLO).  The sweep therefore runs under ``shard_map``: manual
SPMD, each device calls the dense per-hop body on its local (H/n) slice,
and the steady state compiles to **zero collectives** (asserted in
``tests/test_parallel.py``).  The only cross-device traffic is the final
host gather of ``(H, bin_len)`` accumulators per CSV interval — negligible
next to the FFT work, which is why sweep scaling stays near linear (the
``BASELINE.md`` >= 85% multi-host target).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rx_tools_tpu.models import powerscan


def shard_hop_blocks(blocks: np.ndarray, mesh: Mesh):
    """Place (H, L) hop read-blocks with H sharded over mesh axis ``h``."""
    return jax.device_put(blocks, NamedSharding(mesh, P("h", None)))


def hop_sharded_sweep(cfg: powerscan.PowerConfig, acc: powerscan.SweepAccum,
                      blocks, mesh: Mesh) -> powerscan.SweepAccum:
    """One sweep pass with hops sharded across devices via shard_map.

    ``blocks``: (H, buf_len) int16, H divisible by mesh size.  The
    accumulators stay resident and sharded across integration intervals;
    only the CSV flush gathers them to the host.
    """
    sharding = NamedSharding(mesh, P("h", None))
    acc = powerscan.SweepAccum(
        avg=jax.device_put(acc.avg, sharding),
        samples=jax.device_put(acc.samples, NamedSharding(mesh, P("h"))),
    )
    blocks = jax.device_put(blocks, sharding)
    avg, samples = _sharded_fn(cfg, mesh)(acc.avg, acc.samples, blocks)
    return powerscan.SweepAccum(avg, samples)


@functools.lru_cache(maxsize=64)
def _sharded_fn(cfg: powerscan.PowerConfig, mesh: Mesh):
    """Jitted shard_map, cached per (cfg, mesh) — rebuilding it per call
    would retrace every sweep."""

    def local(avg, samples, blk):
        a = powerscan.sweep_step(cfg, powerscan.SweepAccum(avg, samples), blk)
        return a.avg, a.samples

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("h", None), P("h"), P("h", None)),
        out_specs=(P("h", None), P("h"))))


def int_hop_sharded(cfg: powerscan.PowerConfig, blocks, mesh: Mesh):
    """``--int-fft`` hop sharding: each device runs the bit-exact integer
    scanner (``powerscan.int_sweep_powers``) on its own hop rows — zero
    collectives, exactly like the float path — and the host accumulates
    the gathered (H, segs, bin_len) int32 powers into int64.

    ``blocks``: (H, buf_len) int16, H divisible by mesh size.  Integer
    outputs are deterministic per hop, so sharded == unsharded
    bit-for-bit (tested in tests/test_parallel.py round-4)."""
    blocks = jax.device_put(blocks, NamedSharding(mesh, P("h", None)))
    return _int_sharded_fn(cfg, mesh)(blocks)


@functools.lru_cache(maxsize=64)
def _int_sharded_fn(cfg: powerscan.PowerConfig, mesh: Mesh):
    def local(blk):
        return powerscan.int_sweep_powers(cfg, blk)

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("h", None),),
        out_specs=P("h", None, None)))
