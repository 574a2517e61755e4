"""Stackless threaded BVH: host-side build + wavefront packet traversal.

TPU-native replacement for the reference's hardware acceleration structure
(ref src/accelstruct.cpp:71-162 builds BLAS/TLAS via VK_KHR_acceleration_
structure; shaders/traceray_rq.glsl:108-185 traverses it per thread).

Design (measured-in, not a translation):
- Geometry is flattened to world space at load (the reference's scenes are
  static; instancing is applied on the host like the TLAS instance
  transforms, accelstruct.cpp:132-162).
- Topology is binned SAH (ops/bvh_build.py), flattened to PREORDER with
  escape links, so traversal is STACKLESS:  hit internal -> i+1; miss or
  leaf -> escape[i].
- PACKET TRAVERSAL: TPU row-gathers cost ~5 ns per ROW regardless of width,
  so per-ray cursors are gather-bound.  Instead, 128 coherent rays share ONE
  node cursor (a "packet"); the packet advances if ANY member ray hits the
  node box.  Per step this is a single (P,)-row gather plus dense (P, 128)
  vector math — full 8x128 VPU lane occupancy, 128x fewer gathers.  Callers
  should order rays coherently (image tiles); `closest_hit` packs a flat ray
  stream row-major.
- ONE GATHER PER STEP: each 64-float node row carries bmin/bmax, the miss
  and leaf links as bitcast int32, AND the leaf's four triangles as
  (v0, e1, e2) so leaf steps need no second fetch.
- Empty padding leaves carry inverted AABBs and degenerate triangles, so
  they are culled by the slab test and can never produce hits; padded rays
  (t_max <= 0) never hit anything.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

LEAF_SIZE = 8
PACKET = 128
_BIG = 1e30
_ROW = 8 + LEAF_SIZE * 12  # 6 aabb + 2 links + 8 triangles x (v0,e1,e2,pad)


class BVH(NamedTuple):
    nodes: jnp.ndarray     # (N, 64) f32 packed node+leaf rows (see build_bvh)
    prim_id: jnp.ndarray   # (P*LEAF,) i32 original triangle id (-1 = pad)
    n_tris: jnp.ndarray    # () i32 true triangle count


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


def build_bvh(
    v0: np.ndarray, v1: np.ndarray, v2: np.ndarray, leaf_size: int = LEAF_SIZE
) -> BVH:
    """Build the threaded BVH on the host (load-time, like the reference's
    one-shot FAST_TRACE BLAS build, accelstruct.cpp:55-65): binned-SAH
    topology, flattened to preorder with escape links so the device walk is
    `hit internal -> i+1; miss/leaf -> escape[i]`.

    v0/v1/v2: (T, 3) world-space triangle vertices (float32).
    """
    from .bvh_build import build_sah_topology, flatten_preorder

    assert leaf_size == LEAF_SIZE
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    T = v0.shape[0]
    assert T > 0, "empty scene"

    tb_min = np.minimum(np.minimum(v0, v1), v2)
    tb_max = np.maximum(np.maximum(v0, v1), v2)
    centroid = (tb_min + tb_max) * 0.5

    lefts, rights, n_bmin, n_bmax, node_tris = build_sah_topology(
        tb_min, tb_max, centroid, leaf_size
    )
    bmin, bmax, escape, blk, leaf_tris = flatten_preorder(
        lefts, rights, n_bmin, n_bmax, node_tris, leaf_size
    )

    n_nodes = bmin.shape[0]
    n_leaves = len(leaf_tris)
    prim_id = np.full(n_leaves * leaf_size, -1, np.int32)
    blocks = np.zeros((n_leaves, leaf_size, 12), np.float32)
    for b, tris in enumerate(leaf_tris):
        k = tris.size
        prim_id[b * leaf_size : b * leaf_size + k] = tris
        blocks[b, :k, 0:3] = v0[tris]
        blocks[b, :k, 3:6] = v1[tris] - v0[tris]
        blocks[b, :k, 6:9] = v2[tris] - v0[tris]

    nodes = np.zeros((n_nodes, _ROW), np.float32)
    nodes[:, 0:3] = bmin
    nodes[:, 3:6] = bmax
    nodes[:, 6] = escape.astype(np.int32).view(np.float32)
    nodes[:, 7] = blk.astype(np.int32).view(np.float32)
    is_leaf = blk >= 0
    nodes[is_leaf, 8:] = blocks.reshape(n_leaves, leaf_size * 12)

    return BVH(
        nodes=jnp.asarray(nodes),
        prim_id=jnp.asarray(prim_id),
        n_tris=jnp.asarray(T, jnp.int32),
    )


def _pad_to_packets(a, pad_r: int, fill):
    if pad_r == 0:
        return a
    return jnp.concatenate(
        [a, jnp.full((pad_r,) + a.shape[1:], fill, a.dtype)], axis=0
    )


def _traverse(bvh: BVH, o, d, t_min, t_max, any_hit: bool, max_steps: int):
    """Packet traversal core.  o, d: (R, 3); t_min/t_max: (R,).

    Rays are grouped into packets of 128 consecutive entries sharing one node
    cursor; all per-ray quantities are (P, 128) so every VPU op runs at full
    lane occupancy and each step costs one (P,)-row gather.
    """
    R = o.shape[0]
    n_pkt = -(-R // PACKET)
    pad_r = n_pkt * PACKET - R

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    o = _pad_to_packets(o, pad_r, 0.0)
    d = _pad_to_packets(d, pad_r, 1.0)
    t_min = _pad_to_packets(t_min, pad_r, 0.0)
    t_max = _pad_to_packets(t_max, pad_r, -1.0)  # dead rays: t_max < t_min

    def comp(a, k):
        return a[:, k].reshape(n_pkt, PACKET)

    ox, oy, oz = comp(o, 0), comp(o, 1), comp(o, 2)
    dx, dy, dz = comp(d, 0), comp(d, 1), comp(d, 2)
    t_min = t_min.reshape(n_pkt, PACKET)
    t_max = t_max.reshape(n_pkt, PACKET)

    def inv(c):
        s = jnp.where(c >= 0.0, 1.0, -1.0)
        return s / jnp.maximum(jnp.abs(c), 1e-12)

    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    init = (
        jnp.zeros(n_pkt, jnp.int32),                    # per-packet node cursor
        t_max,
        jnp.full((n_pkt, PACKET), -1, jnp.int32),       # best padded-tri slot
        jnp.zeros((n_pkt, PACKET), jnp.float32),        # u
        jnp.zeros((n_pkt, PACKET), jnp.float32),        # v
        jnp.int32(0),
    )

    def cond(state):
        node, _, _, _, _, step = state
        return jnp.any(node >= 0) & (step < max_steps)

    def body(state):
        node, t_best, tri_best, u_best, v_best, step = state
        live = node >= 0
        nid = jnp.maximum(node, 0)

        row = bvh.nodes[nid]                       # ONE gather: (n_pkt, 64)
        col = lambda i: row[:, i : i + 1]          # (n_pkt, 1) -> broadcast

        # slab test for all 128 packet rays
        tx0 = (col(0) - ox) * ix
        tx1 = (col(3) - ox) * ix
        ty0 = (col(1) - oy) * iy
        ty1 = (col(4) - oy) * iy
        tz0 = (col(2) - oz) * iz
        tz1 = (col(5) - oz) * iz
        t_near = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        t_far = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        ray_hit = (t_near <= t_far) & (t_far >= t_min) & (t_near <= t_best)
        pkt_hit = jnp.any(ray_hit, axis=1) & live

        miss = jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
        leaf_first = jax.lax.bitcast_convert_type(row[:, 7], jnp.int32)
        is_leaf = leaf_first >= 0

        do_tris = (pkt_hit & is_leaf)[:, None] & ray_hit
        for k in range(LEAF_SIZE):
            b = 8 + k * 12
            v0x, v0y, v0z = col(b), col(b + 1), col(b + 2)
            e1x, e1y, e1z = col(b + 3), col(b + 4), col(b + 5)
            e2x, e2y, e2z = col(b + 6), col(b + 7), col(b + 8)
            # Moller-Trumbore against all packet rays
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tvx = ox - v0x
            tvy = oy - v0y
            tvz = oz - v0z
            uk = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            vk = (dx * qx + dy * qy + dz * qz) * inv_det
            tk = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            h = (
                (jnp.abs(det) > 1e-12)
                & (uk >= 0.0)
                & (vk >= 0.0)
                & (uk + vk <= 1.0)
                & (tk > t_min)
            )
            closer = h & do_tris & (tk < t_best)
            t_best = jnp.where(closer, tk, t_best)
            slot = (leaf_first[:, None] * LEAF_SIZE + k).astype(jnp.int32)
            tri_best = jnp.where(closer, slot, tri_best)
            u_best = jnp.where(closer, uk, u_best)
            v_best = jnp.where(closer, vk, v_best)

        nxt = jnp.where(pkt_hit & ~is_leaf, nid + 1, miss)
        node = jnp.where(live, nxt, node)
        if any_hit:
            # retire the packet once every LIVE ray found an occluder
            need = (t_max >= t_min) & (tri_best < 0)
            node = jnp.where(jnp.any(need, axis=1), node, -1)
        return node, t_best, tri_best, u_best, v_best, step + 1

    _, t, tri_slot, u, v = jax.lax.while_loop(cond, body, init)[:5]

    def flat(a):
        return a.reshape(n_pkt * PACKET)[:R]

    t, tri_slot, u, v = flat(t), flat(tri_slot), flat(u), flat(v)
    tri = jnp.where(tri_slot >= 0, bvh.prim_id[jnp.maximum(tri_slot, 0)], -1)
    return HitRecord(tri=tri, t=t, u=u, v=v), tri_slot


def closest_hit(bvh: BVH, o, d, t_min, t_max, max_steps: int = 100_000):
    """Closest-hit query over a flat ray stream
    (ref traceray_rq.glsl:108-147 ClosestHit).  Rays should be ordered
    coherently (consecutive 128 rays share a traversal cursor)."""
    rec, _ = _traverse(bvh, o, d, t_min, t_max, any_hit=False, max_steps=max_steps)
    return rec


def any_hit(bvh: BVH, o, d, t_min, t_max, max_steps: int = 100_000):
    """Occlusion query: returns bool (R,) occluded
    (ref traceray_rq.glsl:153-185 AnyHit, packet retires when all members
    are resolved)."""
    rec, _ = _traverse(bvh, o, d, t_min, t_max, any_hit=True, max_steps=max_steps)
    return rec.tri >= 0
