"""Offline block processing: ``lax.scan`` over stacked blocks inside one jit.

For file/recorded input there is no realtime arrival constraint, so instead
of stepping block-by-block from the host (one dispatch per ~7 ms of signal),
a whole recording chunk is moved to the device once and scanned:

    blocks (M, 2N) --scan--> audio (M, cap), n_valid (M,)

One dispatch per M blocks amortises host/dispatch overhead to nothing and
lets XLA pipeline HBM prefetch of block ``k+1`` under compute of ``k`` —
the TPU analog of the reference's dongle/demod thread overlap
(``src/rtl_fm.c:866-958``).  The carried state threads through the scan
exactly as it threads between pthread buffer handoffs in the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rx_tools_tpu.models import fmchain


def stack_blocks(iq: np.ndarray, block_size: int) -> np.ndarray:
    """Chop interleaved CS16 into (M, 2*block_size); truncate the tail."""
    n = iq.shape[0] // (2 * block_size)
    return iq[: n * 2 * block_size].reshape(n, 2 * block_size)


@partial(jax.jit, static_argnums=0)
def scan_fm_blocks(cfg: fmchain.FmConfig, state: fmchain.FmState, blocks):
    """Run the FM chain over ``blocks`` (M, 2N) int16 in one compiled scan.

    Returns ``(state, audio (M, cap), n_valid (M,), levels (M,))``.
    """
    # A traced Python loop with static block indices, NOT lax.scan: a rolled
    # scan reads block k with a dynamic-slice each iteration, which on TPU
    # costs ~1.6 ms per MB-sized slice (measured 20 ms vs 0.094 ms per
    # 12-block chunk, 200x) — and lax.scan's unroll option still emits
    # dynamic indexing, so only static blocks[i] gets the fast path
    # (docs/PERF.md "the dynamic-slice cliff").
    audio, n_valid, levels = [], [], []
    for i in range(blocks.shape[0]):
        state, a, nv, lv = fmchain.fm_chain_step_impl(cfg, state, blocks[i])
        audio.append(a)
        n_valid.append(nv)
        levels.append(lv)
    return (state, jnp.stack(audio), jnp.stack(n_valid), jnp.stack(levels))


def gather_valid(audio: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """Host-side: concatenate the valid prefixes of each scanned block."""
    return np.concatenate([audio[i, : int(n_valid[i])]
                           for i in range(audio.shape[0])])
