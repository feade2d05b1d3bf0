"""Multi-host runtime: standard JAX distributed initialization.

The reference has no distributed layer at all (SURVEY.md §2.6: "no sockets,
no MPI/NCCL/Gloo"); scaling past one host here rides the stock JAX runtime:
``jax.distributed.initialize`` brings up the cross-host control plane, ICI
carries collectives within a slice, DCN between slices/hosts.  Nothing
bespoke — by design, so the same sharded programs (``timeshard``/
``hopshard``) run unchanged from 1 chip to a pod.

Usage (one call near process start, before device use):

    from rx_tools_tpu.parallel import multihost
    multihost.init()                      # env-driven (TPU pods: automatic)
    mesh = make_mesh(axis="h")            # now spans all hosts' devices

Env-driven config follows the JAX convention: on Cloud TPU pods ``init()``
with no arguments autodetects; elsewhere pass coordinator/num/id explicitly
or set ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
``JAX_PROCESS_ID``.

Failure semantics: fail-fast (the JAX default).  A lost host aborts the
step; resume from the last checkpoint (``stream.checkpoint``) — the same
at-most-one-interval loss contract as the reference's append-only CSV
(``SURVEY.md §5 checkpoint/resume``).
"""

from __future__ import annotations

import os

import jax

_initialized = False


def init(coordinator_address: str | None = None,
         num_processes: int | None = None,
         process_id: int | None = None) -> int:
    """Initialize the multi-host runtime; returns this process's index.

    No-op (returns 0) when single-process: nothing configured and no
    environment markers present.
    """
    global _initialized
    if _initialized:
        return jax.process_index()
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    # multi-host only when >1 worker is actually configured ("localhost"
    # singletons appear on tunneled single-chip setups)
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    on_pod = ("," in workers) or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if coordinator_address is None and not on_pod:
        return 0        # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    _initialized = True
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that should own stdout/CSV emission."""
    return jax.process_index() == 0


def process_count() -> int:
    """Number of processes in the distributed job (1 when single-host)."""
    return jax.process_count()


def allgather(arr):
    """Gather a host-local array from every process: (P, *arr.shape).

    The cross-process assembly step of a partitioned sweep: each process
    integrates only its own hops' accumulators, and the primary stitches
    the gathered stack into the global CSV (the TPU-native replacement for
    the reference's serial hop loop, ``src/rtl_power.c:670-772``).
    Single-process: returns ``arr[None]`` without touching collectives.
    """
    import numpy as np
    if jax.process_count() == 1:
        return np.asarray(arr)[None]
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(arr, tiled=False))


def allgather_exact_i64(arr):
    """int64-exact cross-process gather: (P, *arr.shape).

    ``process_allgather`` rides jax arrays, and with x64 disabled an int64
    operand would silently narrow to int32 — fatal for the ``--int-fft``
    accumulators (|X|^2 sums legitimately exceed 2^31).  Split into two
    uint32 planes, gather, reassemble: bit-exact at any accumulator
    magnitude.  Single-process: ``arr[None]`` untouched."""
    import numpy as np
    a = np.asarray(arr, np.int64)
    if jax.process_count() == 1:
        return a[None]
    u = a.view(np.uint64)
    lo = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (u >> np.uint64(32)).astype(np.uint32)
    glo = allgather(lo).astype(np.uint64)
    ghi = allgather(hi).astype(np.uint64)
    return ((ghi << np.uint64(32)) | glo).view(np.int64)


def broadcast_flags(flags):
    """Broadcast a small int array from the primary to every process.

    Keeps control decisions (flush now? stop now?) single-sourced so all
    processes enter collectives in lockstep; follows the reference's
    controller-thread pattern (one control plane, ``rtl_fm.c:999-1050``)
    across the DCN.  Single-process: identity.
    """
    import numpy as np
    if jax.process_count() == 1:
        return np.asarray(flags)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.broadcast_one_to_all(flags))
