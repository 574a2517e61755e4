"""Pixel-space data parallelism over a device Mesh.

The reference is single-GPU (SURVEY §2.4); its only parallelism is one
thread per pixel plus multi-queue async upload.  The TPU-native scaling
axis is the same one the pixels already expose: shard the image rows across
chips (SURVEY §5.7 forward pointer).  Scene data (BVH, materials, lights,
textures) is replicated — it is read-only and every chip needs random access
during traversal.

Mechanics: we annotate the carried FrameState + per-frame rasters with
NamedSharding(P("rows")) and jit the frame function traced under a row-BAND
context (ops/halo.py) matching the mesh size.  The band context bounds the
two op families whose naive global form the SPMD partitioner would emulate
with full-image collectives (measured with tools/spmd_hlo.py before the
banding: ~40 MB of masked-all-reduce per 8k-pixel frame):
  - temporal/spatial image gathers  -> ±halo-row clamp + banded gather
                                       (2·halo-row halo exchange)
  - the wavefront ray sort          -> band-local sort, traversal vmapped
                                       over bands (zero communication)
What remains is what the algorithm genuinely communicates:
  - a-trous taps near shard edges     -> halo exchange (collective-permute)
  - auto-exposure log-average         -> psum
  - the deep-bounce tile lane set     -> bounded by the lane count
All of these ride ICI.  tests/test_parallel.py asserts the compiled HLO's
collective payload stays bounded; dryrun_multichip prints it every run.
"""
from __future__ import annotations

import functools

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


def padded_height(h: int, n_devices: int, half_res: bool = True) -> int:
    """Smallest height >= h whose full-res AND half-res row counts both
    divide by n_devices (e.g. 1080 on 8 chips -> 1088: render 8 extra rows,
    crop at output).  Use this to pick production multi-chip extents."""
    q = n_devices * (2 if half_res else 1)
    return -(-h // q) * q


def _row_sharded(mesh: Mesh, a, h_candidates):
    """Shard dim0 across rows when it matches an image height; otherwise
    replicate."""
    if hasattr(a, "shape") and a.ndim >= 1 and a.shape[0] in h_candidates:
        spec = P(ROWS, *([None] * (a.ndim - 1)))
    else:
        spec = P()
    return jax.device_put(a, NamedSharding(mesh, spec))


def shard_pytree(mesh: Mesh, tree, cfg: RenderConfig):
    """Place every image-shaped leaf row-sharded, everything else replicated.

    Fails LOUDLY when an image height does not divide by the device count
    (padding silently, or worse silently replicating the half-res GI state,
    would hide a 2x memory/traffic regression at production shapes) —
    callers should pick extents via `padded_height` and crop."""
    n = mesh.devices.size
    hs = {cfg.height}
    if cfg.indirect_half_res:
        hs.add(cfg.half_height)
    bad = sorted(h for h in hs if h % n != 0)
    if bad:
        raise ValueError(
            f"image heights {bad} not divisible by {n} devices; render at "
            f"height {padded_height(cfg.height, n, cfg.indirect_half_res)} "
            f"(padded_height) and crop the output instead"
        )
    return jax.tree_util.tree_map(lambda a: _row_sharded(mesh, a, hs), tree)


def assert_row_sharded(tree, heights, n_devices: int):
    """Test/dryrun helper: every leaf whose dim0 is an image height must
    actually be split across `n_devices` shards (not replicated)."""
    def check(a):
        if hasattr(a, "shape") and a.ndim >= 1 and a.shape[0] in heights:
            ns = len({s.device for s in a.addressable_shards})
            shard0 = a.addressable_shards[0].data.shape[0]
            if ns != n_devices or shard0 * n_devices != a.shape[0]:
                raise AssertionError(
                    f"leaf {a.shape} not row-sharded: {ns} shards of "
                    f"dim0={shard0}"
                )
    jax.tree_util.tree_map(check, tree)


@functools.lru_cache(maxsize=16)
def make_sharded_step(cfg: RenderConfig, mesh: Mesh):
    """jitted multi-chip frame step, memoized on (cfg, mesh) so repeated
    requests share one compile (SPMD full-pipeline compiles run minutes on
    XLA:CPU).  Inputs must be placed via shard_pytree (state) / replicate
    (scene, camera, params); jit infers the partitioning from input placement
    and keeps outputs row-sharded."""

    from ..ops.halo import band_context

    @jax.jit
    def step(scene, cam, params, tm, state: FrameState):
        # trace under the band context: band-aware ops (ops/halo.py
        # gathers, the banded wavefront sort) split along shard boundaries
        with band_context(mesh.devices.size):
            return render_frame(cfg, scene, cam, params, tm, state)

    return step
