"""Pixel-space data parallelism over a device Mesh.

The reference is single-GPU (SURVEY §2.4); its only parallelism is one
thread per pixel plus multi-queue async upload.  The TPU-native scaling
axis is the same one the pixels already expose: shard the image rows across
chips (SURVEY §5.7 forward pointer).  Scene data (BVH, materials, lights,
textures) is replicated — it is read-only and every chip needs random access
during traversal.

Mechanics: we annotate the carried FrameState + per-frame rasters with
NamedSharding(P("rows")) and jit the unchanged frame function.  XLA's SPMD
partitioner keeps every pointwise/stage-local op row-local and inserts
collectives only where the algorithm genuinely communicates:
  - a-trous taps near shard edges     -> halo exchange (collective-permute)
  - motion-vector temporal gathers    -> all-gather of the (small) reservoir
  - auto-exposure log-average         -> psum
All of these ride ICI.  No hand-written communication layer is warranted
(SURVEY §5.8) — the dataflow IS the schedule.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.config import RenderConfig
from ..render.frame import FrameState, render_frame

ROWS = "rows"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (ROWS,))


def _row_sharded(mesh: Mesh, a, h_candidates):
    """Shard dim0 across rows when it matches an image height; otherwise
    replicate."""
    if hasattr(a, "shape") and a.ndim >= 1 and a.shape[0] in h_candidates:
        spec = P(ROWS, *([None] * (a.ndim - 1)))
    else:
        spec = P()
    return jax.device_put(a, NamedSharding(mesh, spec))


def shard_pytree(mesh: Mesh, tree, cfg: RenderConfig):
    """Place every image-shaped leaf row-sharded, everything else replicated."""
    n = mesh.devices.size
    hs = {cfg.height, cfg.half_height if cfg.indirect_half_res else cfg.height}
    hs = {h for h in hs if h % n == 0}
    return jax.tree_util.tree_map(lambda a: _row_sharded(mesh, a, hs), tree)


def make_sharded_step(cfg: RenderConfig, mesh: Mesh):
    """jitted multi-chip frame step.  Inputs must be placed via shard_pytree
    (state) / replicate (scene, camera, params); jit infers the partitioning
    from input placement and keeps outputs row-sharded."""

    @jax.jit
    def step(scene, cam, params, tm, state: FrameState):
        return render_frame(cfg, scene, cam, params, tm, state)

    return step
