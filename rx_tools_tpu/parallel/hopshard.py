"""Hop-axis sharding of rx_power sweeps.

The reference's sweep is a serial loop over up to 10000 frequency hops
(``scanner``, ``src/rtl_power.c:670-772``) — an embarrassingly-parallel
axis its own TODO wanted to thread (``rtl_power.c:29-36``).  Here the hop
axis ``H`` of the batched sweep (``models.powerscan.sweep_step``) is simply
annotated with a ``PartitionSpec("h")`` and jit partitions the vmapped hop
body across the mesh: every device integrates its own hops' FFTs locally,
zero communication in the steady state.  The stitch (crop + concatenate,
``csv_dbm``) happens on fully-integrated per-hop accumulators, so the only
collective is the final gather of ``(H, bin_len)`` floats per interval —
negligible next to the FFT work, which is why sweep scaling stays near
linear (the ``BASELINE.md`` >= 85% multi-host target).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rx_tools_tpu.models import powerscan


def shard_hop_blocks(blocks: np.ndarray, mesh: Mesh):
    """Place (H, L) hop read-blocks with H sharded over mesh axis ``h``."""
    return jax.device_put(blocks, NamedSharding(mesh, P("h", None)))


def hop_sharded_sweep(cfg: powerscan.PowerConfig, acc: powerscan.SweepAccum,
                      blocks, mesh: Mesh) -> powerscan.SweepAccum:
    """One sweep pass with hops sharded across devices.

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
    return powerscan.sweep_step(cfg, acc, blocks)
