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
- PACKET TRAVERSAL: TPU row-gathers cost ~the same per ROW regardless of
  width, so per-ray cursors are gather-bound.  Instead, 128 coherent rays
  share ONE node cursor (a "packet"); the packet advances if ANY member ray
  hits the node box.  Per step this is a single (P, 8)-row gather plus dense
  (P, 128) vector math — full 8x128 VPU lane occupancy.
- DEFERRED LEAF INTERSECTION: measured on TPU v5e, inline Moller-Trumbore at
  every step is ~80% of traversal time while only ~10% of steps visit a
  leaf.  The walk therefore only records (packet, leaf) EVENTS into a
  bounded per-packet queue; when any queue fills (or the walk ends) the
  queue is drained as a COMPACTED event list, folded per packet with a
  segmented prefix-min scan.  Intersection work is proportional to actual
  leaf visits, not steps.
- HIERARCHICAL DRAIN (round 2): each leaf of `leaf_size` triangles is split
  into sub-blocks of 8 Morton-sorted triangles, each with its own AABB.
  Draining is two-phase: (1) per (packet, leaf) event, ONE row gather pulls
  all sub-block AABBs and a vectorized slab pass marks which sub-blocks any
  live ray overlaps; (2) the surviving (packet, sub-block) SUB-EVENTS are
  compacted globally (popcount + cumsum over a dense per-packet mask
  buffer) and intersected in chunks of 8-triangle MT tests.  MT flops drop
  from leaf_size x 128 per event to ~avg_hit_subs x 8 x 128 — the slab
  pre-pass costs ~1/25th of the MT it replaces.
- Draining tightens per-ray t_best between walk rounds, so the walk prunes
  nodes beyond the closest hit found so far; resolved occlusion rays get
  t_best = -inf which retires them from the slab test entirely.
- Empty padding leaves carry degenerate triangles (zero extent) that can
  never produce hits; padded rays (t_max <= 0) never hit anything.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

import os

LEAF_SIZE_TPU = int(os.environ.get("EIDOLA_LEAF", "64"))
LEAF_SIZE_CPU = 8   # smaller unroll keeps XLA:CPU compile/test time sane
SUB_TRIS = 8        # triangles per sub-block (hierarchical drain unit)
PACKET = 128
QUEUE = int(os.environ.get("EIDOLA_QUEUE", "32"))
CHUNK = int(os.environ.get("EIDOLA_CHUNK", "4096"))
# drain variant: "flat" = one 64-tri MT per event; "hier" = sub-block
# compaction (measured slower on v5e: the drain is gather-bound, see below)
DRAIN = os.environ.get("EIDOLA_DRAIN", "flat")
_BIG = 1e30


class BVH(NamedTuple):
    walk: jnp.ndarray         # (N, 8) f32: bmin, bmax, miss-link, leaf-id (bitcast i32)
    leaf_blocks: jnp.ndarray  # (L*n_sub, SUB_TRIS*12) f32: (v0, e1, e2, pad) per tri
    sub_aabb: jnp.ndarray     # (L, n_sub*8) f32: per sub-block bmin3,bmax3,pad2
    prim_id: jnp.ndarray      # (L*leaf_size,) i32 original triangle id (-1 = pad)
    n_tris: jnp.ndarray       # () i32 true triangle count

    @property
    def n_sub(self) -> int:
        return self.sub_aabb.shape[1] // 8


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
    v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
    leaf_size: int | None = None,
    as_numpy: bool = False,
) -> BVH:
    """Build the threaded BVH on the host (load-time, like the reference's
    one-shot FAST_TRACE BLAS build, accelstruct.cpp:55-65): binned-SAH
    topology, flattened to preorder with escape links so the device walk is
    `hit internal -> i+1; miss/leaf -> escape[i]`.

    v0/v1/v2: (T, 3) world-space triangle vertices (float32).
    """
    from .bvh_build import build_sah_topology, flatten_preorder

    if leaf_size is None:
        leaf_size = (
            LEAF_SIZE_TPU if jax.default_backend() not in ("cpu",)
            else LEAF_SIZE_CPU
        )
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    T = v0.shape[0]
    assert T > 0, "empty scene"

    tb_min = np.minimum(np.minimum(v0, v1), v2)
    tb_max = np.maximum(np.maximum(v0, v1), v2)
    centroid = (tb_min + tb_max) * 0.5

    from ..native import build_bvh_native

    native = build_bvh_native(tb_min, tb_max, centroid, leaf_size)
    if native is not None:
        bmin, bmax, escape, blk, leaf_tris = native
    else:
        lefts, rights, n_bmin, n_bmax, node_tris = build_sah_topology(
            tb_min, tb_max, centroid, leaf_size
        )
        bmin, bmax, escape, blk, leaf_tris = flatten_preorder(
            lefts, rights, n_bmin, n_bmax, node_tris, leaf_size
        )

    n_nodes = bmin.shape[0]
    n_leaves = len(leaf_tris)
    sub_tris = min(SUB_TRIS, leaf_size)
    n_sub = leaf_size // sub_tris
    assert n_sub * sub_tris == leaf_size, "leaf_size must be a multiple of 8"

    # --- vectorized leaf packing with per-leaf Morton order --------------
    # Sorting each leaf's triangles by centroid Morton code keeps every
    # sub-block of `sub_tris` consecutive triangles spatially tight so its
    # AABB prunes well in the hierarchical drain.
    ext = tb_max.max(axis=0) - tb_min.min(axis=0)
    origin = tb_min.min(axis=0)
    c01 = (centroid - origin) / np.maximum(ext, 1e-20)
    morton = morton3d(c01)

    lens = np.asarray([t.size for t in leaf_tris], np.int64)
    all_tris = (
        np.concatenate(leaf_tris).astype(np.int64)
        if n_leaves else np.zeros(0, np.int64)
    )
    leaf_id = np.repeat(np.arange(n_leaves, dtype=np.int64), lens)
    order = np.lexsort((morton[all_tris], leaf_id))
    all_tris = all_tris[order]
    starts = np.zeros(n_leaves + 1, np.int64)
    np.cumsum(lens, out=starts[1:])
    pos_in_leaf = np.arange(all_tris.size, dtype=np.int64) - starts[leaf_id]
    slot = leaf_id * leaf_size + pos_in_leaf

    prim_id = np.full(n_leaves * leaf_size, -1, np.int32)
    prim_id[slot] = all_tris.astype(np.int32)
    blocks = np.zeros((n_leaves * leaf_size, 12), np.float32)
    blocks[slot, 0:3] = v0[all_tris]
    blocks[slot, 3:6] = v1[all_tris] - v0[all_tris]
    blocks[slot, 6:9] = v2[all_tris] - v0[all_tris]

    # per sub-block AABBs; empty sub-blocks get inverted boxes (never hit)
    sub_idx = leaf_id * n_sub + pos_in_leaf // sub_tris
    sub_min = np.full((n_leaves * n_sub, 3), _BIG, np.float32)
    sub_max = np.full((n_leaves * n_sub, 3), -_BIG, np.float32)
    np.minimum.at(sub_min, sub_idx, tb_min[all_tris])
    np.maximum.at(sub_max, sub_idx, tb_max[all_tris])
    sub_aabb = np.zeros((n_leaves * n_sub, 8), np.float32)
    sub_aabb[:, 0:3] = sub_min
    sub_aabb[:, 3:6] = sub_max

    walk = np.zeros((n_nodes, 8), np.float32)
    walk[:, 0:3] = bmin
    walk[:, 3:6] = bmax
    walk[:, 6] = escape.astype(np.int32).view(np.float32)
    walk[:, 7] = blk.astype(np.int32).view(np.float32)

    conv = (lambda x: x) if as_numpy else jnp.asarray
    return BVH(
        walk=conv(walk),
        leaf_blocks=conv(blocks.reshape(n_leaves * n_sub, sub_tris * 12)),
        sub_aabb=conv(sub_aabb.reshape(n_leaves, n_sub * 8)),
        prim_id=conv(prim_id),
        n_tris=conv(np.int32(T)) if as_numpy else jnp.asarray(T, jnp.int32),
    )


def _pad_to_packets(a, pad_r: int, fill):
    if pad_r == 0:
        return a
    return jnp.concatenate(
        [a, jnp.full((pad_r,) + a.shape[1:], fill, a.dtype)], axis=0
    )


def _mt_block(row, ox, oy, oz, dx, dy, dz, t_min, t_lim):
    """Leaf-block Moller-Trumbore for one leaf row per event.

    row: (C, leaf_size*12); ray components: (C, PACKET).  Returns the
    per-event best (t, slot-in-leaf k, u, v) with t = _BIG where nothing
    hit."""
    leaf_size = row.shape[1] // 12
    col = lambda i: row[:, i : i + 1]
    t_b = jnp.full(ox.shape, _BIG, jnp.float32)
    k_b = jnp.zeros(ox.shape, jnp.int32)
    u_b = jnp.zeros(ox.shape, jnp.float32)
    v_b = jnp.zeros(ox.shape, jnp.float32)
    for k in range(leaf_size):
        b = k * 12
        v0x, v0y, v0z = col(b), col(b + 1), col(b + 2)
        e1x, e1y, e1z = col(b + 3), col(b + 4), col(b + 5)
        e2x, e2y, e2z = col(b + 6), col(b + 7), col(b + 8)
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
            & (tk < t_lim)
            & (tk < t_b)
        )
        t_b = jnp.where(h, tk, t_b)
        k_b = jnp.where(h, k, k_b)
        u_b = jnp.where(h, uk, u_b)
        v_b = jnp.where(h, vk, v_b)
    return t_b, k_b, u_b, v_b


def _traverse(bvh: BVH, o, d, t_min, t_max, any_hit: bool, max_steps: int):
    """Packet traversal core.  o, d: (R, 3); t_min/t_max: (R,).

    Rays are grouped into packets of 128 consecutive entries sharing one node
    cursor.  The walk is slab-only; leaf visits are queued and intersected in
    compacted event chunks (see module docstring).
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
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (n_pkt, QUEUE), 1)

    def walk_rounds(carry):
        (node, t_best, tri_best, u_best, v_best, queue, cnt, step) = carry

        def w_cond(c):
            node, cnt, step = c[0], c[6], c[7]
            return jnp.any(node >= 0) & jnp.all(cnt < QUEUE) & (step < max_steps)

        def w_body(c):
            node, t_best, tri_best, u_best, v_best, queue, cnt, step = c
            live = node >= 0
            nid = jnp.maximum(node, 0)
            row = bvh.walk[nid]                       # ONE gather: (n_pkt, 8)
            col = lambda i: row[:, i : i + 1]
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
            leaf_id = jax.lax.bitcast_convert_type(row[:, 7], jnp.int32)
            is_leaf = leaf_id >= 0

            push = pkt_hit & is_leaf
            queue = jnp.where(
                (push & (cnt <= QUEUE - 1))[:, None] & (k_iota == cnt[:, None]),
                leaf_id[:, None],
                queue,
            )
            cnt = cnt + push.astype(jnp.int32)

            nxt = jnp.where(pkt_hit & ~is_leaf, nid + 1, miss)
            node = jnp.where(live, nxt, node)
            return (node, t_best, tri_best, u_best, v_best, queue, cnt,
                    step + 1)

        return jax.lax.while_loop(
            w_cond, w_body,
            (node, t_best, tri_best, u_best, v_best, queue, cnt, step),
        )

    n_sub = bvh.n_sub
    sub_tris = bvh.leaf_blocks.shape[1] // 12
    leaf_size = n_sub * sub_tris
    n_dense = n_pkt * QUEUE
    # flat drain view: one row per LEAF (all sub-block rows concatenated)
    leaf_rows = bvh.leaf_blocks.reshape(-1, leaf_size * 12)

    def drain_skip(carry):
        """Measurement-only mode (EIDOLA_DRAIN=skip): drop queued events
        without intersecting — isolates walk cost.  WRONG results."""
        node, t_best, tri_best, u_best, v_best, queue, cnt, step = carry
        cnt = jnp.zeros_like(cnt)
        return (node, t_best, tri_best, u_best, v_best, queue, cnt, step)

    def drain_flat(carry):
        """Single-phase drain: one `leaf_size`-triangle MT per event.
        Measured FASTER than the hierarchical variant on v5e — the drain is
        bound by per-chunk gathers and loop overhead, not MT flops, so
        splitting events into sub-events multiplies the expensive part."""
        node, t_best, tri_best, u_best, v_best, queue, cnt, step = carry
        offsets = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(cnt, dtype=jnp.int32)]
        )
        total = offsets[-1]
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)[:, 0]

        def d_cond(c):
            return c[0] * CHUNK < total

        def d_body(c):
            ci, t_best, tri_best, u_best, v_best = c
            s = ci * CHUNK + c_iota                       # (CHUNK,) event slots
            valid = s < total
            ps = (
                jnp.searchsorted(offsets, s, side="right").astype(jnp.int32)
                - 1
            )
            ps = jnp.clip(ps, 0, n_pkt - 1)
            j = jnp.clip(s - offsets[ps], 0, QUEUE - 1)
            leaf = queue[ps, j]                            # (CHUNK,)
            row = leaf_rows[leaf]                          # (CHUNK, leaf*12)
            g = lambda a: a[ps]                            # (CHUNK, PACKET)
            t_e, k_e, u_e, v_e = _mt_block(
                row, g(ox), g(oy), g(oz), g(dx), g(dy), g(dz),
                g(t_min), g(t_best),
            )
            t_e = jnp.where(valid[:, None], t_e, _BIG)
            slot_e = leaf[:, None] * leaf_size + k_e

            sh = 1
            while sh < CHUNK:
                same = jnp.concatenate(
                    [jnp.zeros(sh, bool), ps[sh:] == ps[:-sh]]
                )[:, None]

                def shift(a, fill):
                    return jnp.concatenate(
                        [jnp.full((sh,) + a.shape[1:], fill, a.dtype), a[:-sh]]
                    )

                better = same & (shift(t_e, _BIG) < t_e)
                t_e = jnp.where(better, shift(t_e, _BIG), t_e)
                slot_e = jnp.where(better, shift(slot_e, 0), slot_e)
                u_e = jnp.where(better, shift(u_e, 0.0), u_e)
                v_e = jnp.where(better, shift(v_e, 0.0), v_e)
                sh *= 2

            lo = jnp.maximum(offsets[:-1], ci * CHUNK)
            hi = jnp.minimum(offsets[1:], ci * CHUNK + CHUNK)
            has = hi > lo
            rr = jnp.clip(hi - 1 - ci * CHUNK, 0, CHUNK - 1)
            t_p, slot_p, u_p, v_p = t_e[rr], slot_e[rr], u_e[rr], v_e[rr]
            better = has[:, None] & (t_p < t_best)
            t_best = jnp.where(better, t_p, t_best)
            tri_best = jnp.where(better, slot_p, tri_best)
            u_best = jnp.where(better, u_p, u_best)
            v_best = jnp.where(better, v_p, v_best)
            return ci + 1, t_best, tri_best, u_best, v_best

        _, t_best, tri_best, u_best, v_best = jax.lax.while_loop(
            d_cond, d_body,
            (jnp.int32(0), t_best, tri_best, u_best, v_best),
        )
        if any_hit:
            t_best = jnp.where(tri_best >= 0, -_BIG, t_best)
        cnt = jnp.zeros_like(cnt)
        return (node, t_best, tri_best, u_best, v_best, queue, cnt, step)

    def drain_hier(carry):
        """Two-phase hierarchical drain (see module docstring):
        phase 1 slab-tests each queued leaf's sub-block AABBs against the
        packet's live rays and records a per-event sub-block bitmask; phase
        2 compacts the surviving (packet, sub-block) sub-events globally and
        runs `sub_tris`-wide MT on them."""
        node, t_best, tri_best, u_best, v_best, queue, cnt, step = carry
        offsets = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(cnt, dtype=jnp.int32)]
        )
        total = offsets[-1]
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)[:, 0]

        # ---- phase 1: per-event sub-block masks into a dense buffer ----
        def m_cond(c):
            return c[0] * CHUNK < total

        def m_body(c):
            ci, emask = c
            s = ci * CHUNK + c_iota
            valid = s < total
            ps = (
                jnp.searchsorted(offsets, s, side="right").astype(jnp.int32)
                - 1
            )
            ps = jnp.clip(ps, 0, n_pkt - 1)
            j = jnp.clip(s - offsets[ps], 0, QUEUE - 1)
            leaf = queue[ps, j]                        # (CHUNK,)
            arow = bvh.sub_aabb[leaf]                  # ONE gather: (CHUNK, n_sub*8)
            g = lambda a: a[ps]                        # (CHUNK, PACKET)
            gox, goy, goz = g(ox), g(oy), g(oz)
            gix, giy, giz = g(ix), g(iy), g(iz)
            gtmin, gtb = g(t_min), g(t_best)
            mask = jnp.zeros((CHUNK,), jnp.int32)
            for sblk in range(n_sub):
                b = sblk * 8
                col = lambda i: arow[:, b + i : b + i + 1]
                tx0 = (col(0) - gox) * gix
                tx1 = (col(3) - gox) * gix
                ty0 = (col(1) - goy) * giy
                ty1 = (col(4) - goy) * giy
                tz0 = (col(2) - goz) * giz
                tz1 = (col(5) - goz) * giz
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                    jnp.minimum(tz0, tz1),
                )
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                    jnp.maximum(tz0, tz1),
                )
                hit = jnp.any((tn <= tf) & (tf >= gtmin) & (tn <= gtb), axis=1)
                mask = mask | (hit.astype(jnp.int32) << sblk)
            ds = jnp.where(valid, ps * QUEUE + j, n_dense)
            emask = emask.at[ds].set(mask, mode="drop")
            return ci + 1, emask

        _, emask = jax.lax.while_loop(
            m_cond, m_body, (jnp.int32(0), jnp.zeros(n_dense, jnp.int32))
        )

        # popcount + global compaction of sub-events
        subcnt = jnp.zeros(n_dense, jnp.int32)
        for sblk in range(n_sub):
            subcnt = subcnt + ((emask >> sblk) & 1)
        subcum = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(subcnt, dtype=jnp.int32)]
        )
        total_sub = subcum[-1]
        pkt_iota = jax.lax.broadcasted_iota(jnp.int32, (n_pkt, 1), 0)[:, 0]
        pkt_sub_lo = subcum[pkt_iota * QUEUE]
        pkt_sub_hi = subcum[(pkt_iota + 1) * QUEUE]

        # ---- phase 2: MT on compacted (packet, sub-block) sub-events ----
        def d_cond(c):
            return c[0] * CHUNK < total_sub

        def d_body(c):
            ci, t_best, tri_best, u_best, v_best = c
            ss = ci * CHUNK + c_iota                  # (CHUNK,) sub-event slots
            valid = ss < total_sub
            e = (
                jnp.searchsorted(subcum, ss, side="right").astype(jnp.int32)
                - 1
            )
            e = jnp.clip(e, 0, n_dense - 1)
            r = ss - subcum[e]
            m = emask[e]
            # sub-block id = index of the r'th set bit of m
            sub = jnp.zeros((CHUNK,), jnp.int32)
            cacc = jnp.zeros((CHUNK,), jnp.int32)
            for sblk in range(n_sub):
                bit = (m >> sblk) & 1
                sub = jnp.where((bit == 1) & (cacc == r), sblk, sub)
                cacc = cacc + bit
            ps = e // QUEUE
            j = e % QUEUE
            leaf = queue[ps, j]
            subrow = leaf * n_sub + sub
            row = bvh.leaf_blocks[subrow]              # (CHUNK, sub_tris*12)
            g = lambda a: a[ps]                        # (CHUNK, PACKET)
            t_e, k_e, u_e, v_e = _mt_block(
                row, g(ox), g(oy), g(oz), g(dx), g(dy), g(dz),
                g(t_min), g(t_best),
            )
            t_e = jnp.where(valid[:, None], t_e, _BIG)
            slot_e = subrow[:, None] * sub_tris + k_e

            # segmented prefix-min by packet id (sub-events are packet-major)
            sh = 1
            while sh < CHUNK:
                same = jnp.concatenate(
                    [jnp.zeros(sh, bool), ps[sh:] == ps[:-sh]]
                )[:, None]

                def shift(a, fill):
                    return jnp.concatenate(
                        [jnp.full((sh,) + a.shape[1:], fill, a.dtype), a[:-sh]]
                    )

                better = same & (shift(t_e, _BIG) < t_e)
                t_e = jnp.where(better, shift(t_e, _BIG), t_e)
                slot_e = jnp.where(better, shift(slot_e, 0), slot_e)
                u_e = jnp.where(better, shift(u_e, 0.0), u_e)
                v_e = jnp.where(better, shift(v_e, 0.0), v_e)
                sh *= 2

            # fold each packet's chunk-suffix row into its best-so-far
            lo = jnp.maximum(pkt_sub_lo, ci * CHUNK)
            hi = jnp.minimum(pkt_sub_hi, ci * CHUNK + CHUNK)
            has = hi > lo
            rr = jnp.clip(hi - 1 - ci * CHUNK, 0, CHUNK - 1)
            t_p, slot_p, u_p, v_p = t_e[rr], slot_e[rr], u_e[rr], v_e[rr]
            better = has[:, None] & (t_p < t_best)
            t_best = jnp.where(better, t_p, t_best)
            tri_best = jnp.where(better, slot_p, tri_best)
            u_best = jnp.where(better, u_p, u_best)
            v_best = jnp.where(better, v_p, v_best)
            return ci + 1, t_best, tri_best, u_best, v_best

        _, t_best, tri_best, u_best, v_best = jax.lax.while_loop(
            d_cond, d_body,
            (jnp.int32(0), t_best, tri_best, u_best, v_best),
        )
        if any_hit:
            # resolved rays retire from the slab test entirely
            t_best = jnp.where(tri_best >= 0, -_BIG, t_best)
        cnt = jnp.zeros_like(cnt)
        return (node, t_best, tri_best, u_best, v_best, queue, cnt, step)

    drain = {"hier": drain_hier, "skip": drain_skip}.get(DRAIN, drain_flat)

    init = (
        jnp.zeros(n_pkt, jnp.int32),                     # per-packet cursor
        t_max,                                           # t_best (prune bound)
        jnp.full((n_pkt, PACKET), -1, jnp.int32),        # best padded-tri slot
        jnp.zeros((n_pkt, PACKET), jnp.float32),         # u
        jnp.zeros((n_pkt, PACKET), jnp.float32),         # v
        jnp.zeros((n_pkt, QUEUE), jnp.int32),            # leaf-event queue
        jnp.zeros(n_pkt, jnp.int32),                     # queue counts
        jnp.int32(0),                                    # step budget
    )

    def o_cond(carry):
        node, step = carry[0], carry[7]
        return jnp.any(node >= 0) & (step < max_steps)

    def o_body(carry):
        return drain(walk_rounds(carry))

    out = jax.lax.while_loop(o_cond, o_body, init)
    t_best, tri_slot, u, v = out[1], out[2], out[3], out[4]

    def flat(a):
        return a.reshape(n_pkt * PACKET)[:R]

    t, tri_slot, u, v = flat(t_best), flat(tri_slot), flat(u), flat(v)
    tri = jnp.where(tri_slot >= 0, bvh.prim_id[jnp.maximum(tri_slot, 0)], -1)
    t = jnp.where(tri >= 0, jnp.abs(t), _BIG)
    return HitRecord(tri=tri, t=t, u=u, v=v), tri_slot


def closest_hit(bvh: BVH, o, d, t_min, t_max, max_steps: int = 100_000):
    """Closest-hit query over a flat ray stream
    (ref traceray_rq.glsl:108-147 ClosestHit).  Rays should be ordered
    coherently (consecutive 128 rays share a traversal cursor)."""
    rec, _ = _traverse(bvh, o, d, t_min, t_max, any_hit=False, max_steps=max_steps)
    return rec


def any_hit(bvh: BVH, o, d, t_min, t_max, max_steps: int = 100_000):
    """Occlusion query: returns bool (R,) occluded
    (ref traceray_rq.glsl:153-185 AnyHit; resolved rays retire from the
    packet's slab test)."""
    rec, _ = _traverse(bvh, o, d, t_min, t_max, any_hit=True, max_steps=max_steps)
    return rec.tri >= 0
