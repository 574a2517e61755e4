"""Batched host->device upload.

The reference parallelizes scene upload across four Vulkan queues
(ref src/main.cpp:151-162, sample_example.cpp:60-70); the TPU-native analog
is minimizing host->HBM round trips: instead of one `jax.device_put` per
scene array (~40 transfers over a possibly-tunneled link), all numpy leaves
of a pytree are grouped by dtype, concatenated into one flat staging buffer
per dtype, shipped with a single `jax.device_put` each (<= 4 transfers),
and sliced back into their shapes ON DEVICE (SURVEY §5.8).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def batched_device_put(tree, device=None):
    """Transfer every numpy leaf of `tree` to the device with one
    `jax.device_put` per distinct dtype.  Leaves that are already device
    arrays (or None) pass through untouched."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)

    host_idx = []
    host_arr = []
    for i, x in enumerate(leaves):
        if isinstance(x, np.ndarray) or isinstance(
            x, (np.generic, int, float, bool)
        ):
            host_idx.append(i)
            host_arr.append(np.asarray(x))

    by_dtype: dict = {}
    for i, a in zip(host_idx, host_arr):
        by_dtype.setdefault(a.dtype.str, []).append((i, a))

    out = list(leaves)
    for _, group in by_dtype.items():
        flats = [a.reshape(-1) for _, a in group]
        blob = np.concatenate(flats) if len(flats) > 1 else flats[0]
        dblob = (
            jax.device_put(blob, device) if device is not None
            else jax.device_put(blob)
        )
        off = 0
        for (i, a), f in zip(group, flats):
            n = f.size
            out[i] = jax.lax.slice(dblob, (off,), (off + n,)).reshape(a.shape)
            off += n
    return jax.tree_util.tree_unflatten(treedef, out)
