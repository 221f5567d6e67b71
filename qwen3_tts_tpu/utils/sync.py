"""Reliable device synchronization.

On some PJRT backends (notably the experimental axon/tunnelled TPU platform)
`block_until_ready()` returns immediately instead of waiting for the
computation.  A 1-element device->host copy is a dependable barrier on every
backend: the copy cannot complete before the producing computation does.
Timing code must use `hard_sync`, never bare block_until_ready.
"""

from __future__ import annotations

import jax
import numpy as np


def hard_sync(tree) -> None:
    """Block until the computation producing `tree` has finished, by pulling
    a single element of one leaf to the host."""
    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "ndim")]
    if not leaves:
        return
    leaf = leaves[0]
    idx = (0,) * leaf.ndim
    np.asarray(leaf[idx])  # tiny dependent slice; host copy = barrier
