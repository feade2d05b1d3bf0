"""Checkpoint/resume for streaming state.

The reference has none (SURVEY.md §5): a killed rx_power loses at most one
integration interval because the CSV is append-only, and rx_fm's WAV header
pre-writes 0xFFFFFFFF sizes so a truncated file stays playable.  The carried
DSP state here is a small pytree (filter halos, IIR averages, resampler
phase, spectrum accumulators — tens of floats), so resumable offline
processing is nearly free: snapshot ``(state, source position)`` every N
blocks with :func:`save_checkpoint`.

Format: ``.npz`` of the flattened pytree leaves plus the treedef repr and a
user ``meta`` dict — dependency-free and forward-compatible.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def save_checkpoint(path: str, state, meta: dict | None = None) -> None:
    """Atomic: a kill mid-save leaves the previous checkpoint intact
    (write to a sibling temp file, then ``os.replace``)."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def read_meta(path: str) -> dict:
    """Read just the meta dict — cheap pre-validation before committing to
    a full state restore (shape mismatches raise from load_checkpoint)."""
    with np.load(path) as z:
        return json.loads(bytes(z["__meta__"].tobytes()).decode() or "{}")


def load_checkpoint(path: str, state_like):
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``state_like``: a template pytree with the same structure (e.g. a fresh
    ``init_state(cfg)``).  Returns ``(state, meta)``.
    """
    with np.load(path) as z:
        leaves, treedef = jax.tree.flatten(state_like)
        n = len(leaves)
        loaded = [z[f"leaf_{i}"] for i in range(n)]
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode() or "{}")
    restored = [np.asarray(l).astype(np.asarray(t).dtype).reshape(np.asarray(t).shape)
                for l, t in zip(loaded, leaves)]
    return jax.tree.unflatten(treedef, restored), meta
