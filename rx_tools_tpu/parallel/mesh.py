"""Device meshes — the framework's "multi-dongle" axis.

The reference's TODO wished for "threading... multiple dongles... multiple
FFT workers" (``src/rtl_power.c:29-36``) but stayed single-threaded.  Here
the scaling axes are first-class (SURVEY.md §2.6):

- ``t`` (time): shard a long I/Q stream across chips; FIR carried state
  becomes overlap-save halos exchanged over ICI (``timeshard``).
- ``h`` (hops): rx_power's frequency hops are independent between retunes —
  one hop's FFT+integrate per chip (``hopshard``).

Meshes are standard ``jax.sharding.Mesh`` objects; multi-host scaling uses
the stock ``jax.distributed`` runtime (DCN between hosts, ICI within a
slice) — nothing custom to port, by design.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "t",
              devices=None) -> Mesh:
    """1-D mesh over the first ``n_devices`` of ``devices`` (default: all
    global devices; pass ``jax.local_devices()`` for a process-local mesh
    in a multi-process job)."""
    devs = jax.devices() if devices is None else list(devices)
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def local_mesh(axis: str = "t") -> Mesh:
    """Mesh over this process's addressable devices only."""
    return Mesh(np.array(jax.local_devices()), (axis,))
