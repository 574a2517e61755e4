"""Stackless threaded BVH: host-side build + wavefront device traversal.

TPU-native replacement for the reference's hardware acceleration structure
(ref src/accelstruct.cpp:71-162 builds BLAS/TLAS via VK_KHR_acceleration_
structure; shaders/traceray_rq.glsl:108-185 traverses it per thread).

Design (not a translation):
- Geometry is flattened to world space at load (the reference's scenes are
  static; instancing is applied on the host like the TLAS instance transforms,
  accelstruct.cpp:132-162).
- The tree is a complete binary heap over Morton-sorted triangles with fixed
  leaf width.  Completeness lets us thread the tree with analytically
  computed preorder "miss" links, so device traversal is STACKLESS: every
  ray carries one node index and steps
        hit internal  -> left child  (2i+1)
        miss / leaf   -> miss[i]
  which vectorizes perfectly over a flat ray stream (no per-ray stacks, no
  divergent control flow — just masked lane updates inside lax.while_loop).
- Empty padding leaves carry inverted AABBs and degenerate triangles, so they
  are culled by the slab test and can never produce hits.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .intersect import ray_aabb, ray_triangle, safe_inv_dir

LEAF_SIZE = 4
_BIG = 1e30


class BVH(NamedTuple):
    bmin: jnp.ndarray      # (N, 3) f32 node AABB min (heap order)
    bmax: jnp.ndarray      # (N, 3) f32 node AABB max
    miss: jnp.ndarray      # (N,) i32 preorder escape link (-1 = done)
    v0: jnp.ndarray        # (P*LEAF, 3) f32 sorted/padded triangle verts
    e1: jnp.ndarray        # (P*LEAF, 3) f32 v1 - v0
    e2: jnp.ndarray        # (P*LEAF, 3) f32 v2 - v0
    prim_id: jnp.ndarray   # (P*LEAF,) i32 original triangle id (-1 = pad)
    leaf_start: jnp.ndarray  # () i32: heap index of first leaf (= P-1)


class HitRecord(NamedTuple):
    tri: jnp.ndarray   # (R,) i32 original triangle id, -1 on miss
    t: jnp.ndarray     # (R,) f32 hit distance (_BIG on miss)
    u: jnp.ndarray     # (R,) f32 barycentric u
    v: jnp.ndarray     # (R,) f32 barycentric v


def _expand_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 10 bits of v so they occupy every 3rd bit."""
    v = v.astype(np.uint32)
    v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
    v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
    v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
    v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
    return v


def morton3d(p01: np.ndarray) -> np.ndarray:
    """30-bit Morton codes for points normalized to [0,1]^3; p01: (T,3)."""
    q = np.clip(p01 * 1024.0, 0.0, 1023.0).astype(np.uint32)
    return (
        (_expand_bits(q[:, 0]) << np.uint32(2))
        | (_expand_bits(q[:, 1]) << np.uint32(1))
        | _expand_bits(q[:, 2])
    )


def _miss_links(num_nodes: int) -> np.ndarray:
    """Preorder escape links for a complete heap-ordered binary tree.

    miss[0] = -1; a left child's escape is its right sibling; a right child's
    escape is its parent's escape.  Computed level by level (parents first).
    """
    miss = np.full(num_nodes, -1, np.int64)
    level_start = 1
    while level_start < num_nodes:
        level_end = min(2 * level_start + 1, num_nodes)
        idx = np.arange(level_start, level_end)
        is_left = (idx % 2) == 1
        parent = (idx - 1) // 2
        miss[idx] = np.where(is_left, idx + 1, miss[parent])
        level_start = level_end
    return miss.astype(np.int32)


def build_bvh(
    v0: np.ndarray, v1: np.ndarray, v2: np.ndarray, leaf_size: int = LEAF_SIZE
) -> BVH:
    """Build the threaded BVH on the host (load-time, like the reference's
    one-shot BLAS build, accelstruct.cpp:55-65).

    v0/v1/v2: (T, 3) world-space triangle vertices (float32).
    """
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    T = v0.shape[0]
    assert T > 0, "empty scene"

    centroid = (v0 + v1 + v2) / 3.0
    lo = centroid.min(axis=0)
    hi = centroid.max(axis=0)
    extent = np.maximum(hi - lo, 1e-12)
    codes = morton3d((centroid - lo) / extent)
    order = np.argsort(codes, kind="stable").astype(np.int64)

    num_leaves = -(-T // leaf_size)
    P = 1 << max(0, int(np.ceil(np.log2(max(num_leaves, 1)))))
    cap = P * leaf_size

    pad = cap - T
    sv0 = np.concatenate([v0[order], np.zeros((pad, 3), np.float32)])
    sv1 = np.concatenate([v1[order], np.zeros((pad, 3), np.float32)])
    sv2 = np.concatenate([v2[order], np.zeros((pad, 3), np.float32)])
    prim_id = np.concatenate([order.astype(np.int32), np.full(pad, -1, np.int32)])
    valid = prim_id >= 0

    tmin = np.minimum(np.minimum(sv0, sv1), sv2)
    tmax = np.maximum(np.maximum(sv0, sv1), sv2)
    tmin = np.where(valid[:, None], tmin, _BIG)
    tmax = np.where(valid[:, None], tmax, -_BIG)

    leaf_bmin = tmin.reshape(P, leaf_size, 3).min(axis=1)
    leaf_bmax = tmax.reshape(P, leaf_size, 3).max(axis=1)

    N = 2 * P - 1
    bmin = np.full((N, 3), _BIG, np.float32)
    bmax = np.full((N, 3), -_BIG, np.float32)
    bmin[P - 1:] = leaf_bmin
    bmax[P - 1:] = leaf_bmax
    # bottom-up union over internal levels
    level_start = P - 1
    while level_start > 0:
        parent_start = (level_start - 1) // 2
        parents = np.arange(parent_start, level_start)
        l, r = 2 * parents + 1, 2 * parents + 2
        bmin[parents] = np.minimum(bmin[l], bmin[r])
        bmax[parents] = np.maximum(bmax[l], bmax[r])
        level_start = parent_start

    return BVH(
        bmin=jnp.asarray(bmin),
        bmax=jnp.asarray(bmax),
        miss=jnp.asarray(_miss_links(N)),
        v0=jnp.asarray(sv0),
        e1=jnp.asarray(sv1 - sv0),
        e2=jnp.asarray(sv2 - sv0),
        prim_id=jnp.asarray(prim_id),
        leaf_start=jnp.asarray(P - 1, jnp.int32),
    )


def _traverse(bvh: BVH, o, d, t_min, t_max, any_hit: bool, max_steps: int):
    """Shared wavefront traversal core.  o, d: (R,3); t_min/t_max: (R,)."""
    R = o.shape[0]
    inv_d = safe_inv_dir(d)
    leaf_size = LEAF_SIZE
    leaf_start = bvh.leaf_start

    init = (
        jnp.zeros(R, jnp.int32),                    # node cursor
        jnp.asarray(t_max, jnp.float32) + jnp.zeros(R, jnp.float32),
        jnp.full(R, -1, jnp.int32),                 # padded-tri slot of best hit
        jnp.zeros(R, jnp.float32),                  # u
        jnp.zeros(R, jnp.float32),                  # v
        jnp.int32(0),                               # step counter
    )

    def cond(state):
        node, _, _, _, _, step = state
        return jnp.any(node >= 0) & (step < max_steps)

    def body(state):
        node, t_best, tri_best, u_best, v_best, step = state
        live = node >= 0
        nid = jnp.maximum(node, 0)
        hit_box, _ = ray_aabb(o, inv_d, t_min, t_best, bvh.bmin[nid], bvh.bmax[nid])
        hit_box = hit_box & live
        is_leaf = nid >= leaf_start

        do_tris = hit_box & is_leaf
        first = jnp.maximum(nid - leaf_start, 0) * leaf_size
        for k in range(leaf_size):
            slot = first + k
            h, tk, uk, vk = ray_triangle(
                o, d, bvh.v0[slot], bvh.e1[slot], bvh.e2[slot], t_min, t_best
            )
            h = h & do_tris
            closer = h & (tk < t_best)
            t_best = jnp.where(closer, tk, t_best)
            tri_best = jnp.where(closer, slot, tri_best)
            u_best = jnp.where(closer, uk, u_best)
            v_best = jnp.where(closer, vk, v_best)

        nxt = jnp.where(hit_box & ~is_leaf, 2 * nid + 1, bvh.miss[nid])
        node = jnp.where(live, nxt, node)
        if any_hit:
            node = jnp.where(tri_best >= 0, -1, node)
        return node, t_best, tri_best, u_best, v_best, step + 1

    _, t, tri_slot, u, v = jax.lax.while_loop(cond, body, init)[:5]
    tri = jnp.where(tri_slot >= 0, bvh.prim_id[jnp.maximum(tri_slot, 0)], -1)
    return HitRecord(tri=tri, t=t, u=u, v=v), tri_slot


def closest_hit(bvh: BVH, o, d, t_min, t_max, max_steps: int = 100_000):
    """Closest-hit query over a flat ray stream
    (ref traceray_rq.glsl:108-147 ClosestHit)."""
    rec, _ = _traverse(bvh, o, d, t_min, t_max, any_hit=False, max_steps=max_steps)
    return rec


def any_hit(bvh: BVH, o, d, t_min, t_max, max_steps: int = 100_000):
    """Occlusion query: returns bool (R,) occluded
    (ref traceray_rq.glsl:153-185 AnyHit, terminate-on-first-hit)."""
    rec, _ = _traverse(bvh, o, d, t_min, t_max, any_hit=True, max_steps=max_steps)
    return rec.tri >= 0
