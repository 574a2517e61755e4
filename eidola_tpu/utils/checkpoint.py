"""Frame-state checkpoint/restore.

The reference has no checkpointing (SURVEY §5.4) — its temporal state dies
with the process.  Ours is an explicit pytree (render/frame.py FrameState),
so deterministic save/resume and replay tests are one npz away.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def save_pytree(path: str, tree) -> None:
    """Save any pytree of arrays (FrameState, reservoirs, ...) to npz."""
    leaves, _ = jax.tree_util.tree_flatten(tree)
    np.savez_compressed(
        path, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    )


def load_pytree(path: str, template):
    """Load into the structure of `template` (e.g. init_frame_state(...))."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(leaves) != len(data.files):
        raise ValueError(
            f"checkpoint has {len(data.files)} leaves, template needs "
            f"{len(leaves)}"
        )
    new = [
        jnp.asarray(data[f"leaf_{i}"], dtype=leaves[i].dtype)
        for i in range(len(leaves))
    ]
    for old, n in zip(leaves, new):
        if old.shape != n.shape:
            raise ValueError(f"shape mismatch: {old.shape} vs {n.shape}")
    return jax.tree_util.tree_unflatten(treedef, new)
