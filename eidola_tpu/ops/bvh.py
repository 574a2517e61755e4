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
  queue is drained as a COMPACTED flat event list: each event gathers its
  leaf's full triangle row and runs leaf_size MT tests across the event's
  128 lanes, then a segmented prefix-min scan + run-end scatter folds the
  per-event results back into each packet's per-ray best.  Intersection
  work is proportional to actual leaf visits, not steps.  (A hierarchical
  per-sub-block-AABB drain was built and measured SLOWER — see
  docs/PERF_NOTES.md — the per-chunk gather/scan machinery, not MT flops,
  dominates drain cost.)
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
PACKET = 128
QUEUE = int(os.environ.get("EIDOLA_QUEUE", "32"))
CHUNK = int(os.environ.get("EIDOLA_CHUNK", "4096"))
# sub-packet width: leaf events are recorded per SUBW-ray sub-group of the
# 128-ray walk packet (see _traverse docstring).  Measured on v5 lite the
# narrower widths LOSE (32: 233/1178 ms vs 128: 80/836 ms on the 2M-ray
# primaries/bounce microbench): the event-count increase multiplies the
# chunk machinery faster than the sub-union shrinkage cuts MT lanes.
SUBW = int(os.environ.get("EIDOLA_SUBW", "128"))
# drain variant: "flat" (default) or "skip" (measurement only: walk cost)
DRAIN = os.environ.get("EIDOLA_DRAIN", "flat")
# leaf intersection math: "auto" (fused on TPU, cols on CPU), "cols"
# (unrolled per-triangle VPU loop), "mxu" (Pallas MXU kernel over
# per-event coefficient tensors, ops/bvh_mxu.py — 80->74 ms primaries /
# 858->751 bounce), "fused" (ops/bvh_fused.py: static per-leaf
# coefficient table DMA'd by leaf id + in-kernel segmented fold; the
# measured TPU winner — 74->68.5 ms primaries / 536->480 bounce on top of
# the o15d6+octant stack — and the TPU default via "auto"), or "matmul"
# (pure-XLA feature-space dots; measured LOSS, kept for record)
MT_MODE = os.environ.get("EIDOLA_MT", "auto")
# octant-ordered walk tables (ops/bvh_oct.py): near-child-first descent by
# ray-direction octant.  Default ON ("0" disables): builds the 8
# per-octant threadings (8x walk HBM) and walks the majority-octant table
# per packet — measured on v5 lite bounce 748->716 alone, composing to
# 480 ms with o15d6 keys + the fused drain (vs 748 base).
OCT_ORDER = os.environ.get("EIDOLA_OCT", "1") == "1"
# spatial-split BVH build (SBVH, ops/bvh_build.build_sbvh_topology):
# chops straddling triangle references at bin planes to cut child overlap
# (fewer packet leaf events); numpy-only build path, opt-in until measured
SBVH = os.environ.get("EIDOLA_SBVH", "0") == "1"
# frontier size of the pre-cull cover table (ops/bvh_build.collect_frontier)
CULL_K = int(os.environ.get("EIDOLA_CULL_K", "64"))


def _fused_mt_active() -> bool:
    """Whether closest-hit drains use the fused table kernel (and BVH
    builds must therefore precompute the per-leaf coefficient tables).
    "auto" resolves to fused on TPU (measured fastest drain: PERF_NOTES
    "Fused table drain"), cols on CPU (tests/dryrun compile budget)."""
    if MT_MODE == "fused":
        return True
    return MT_MODE == "auto" and jax.default_backend() != "cpu"
# MT dot precision (EIDOLA_MT_PREC) — ONE default shared by every drain
# (the matmul record path below, ops/bvh_mxu.py and ops/bvh_fused.py all
# key off this constant, frozen at import so a mid-process env change
# can't pair a bf16 coefficient table with the exact 6-pass dot).
# "default" = single-pass bf16-input dot with f32 accumulate — measured
# +10% frame cost for exact f32 (PERF_NOTES "MT dot precision"); the
# bf16 error is absorbed by offset_ray epsilons + stochastic accumulation.
MT_PREC = os.environ.get("EIDOLA_MT_PREC", "default")
# exact-f32 winner refinement (EIDOLA_REFINE): after the walk, re-intersect
# each ray's WINNING triangle once with exact f32 Möller-Trumbore and
# replace (t, u, v).  The bf16 drains (MT_PREC=default) carry ~0.2% mean /
# 4% max relative hit-t error — orders of magnitude larger than
# offset_ray's ULP-scale nudge (ops/math.py), so secondary/shadow rays
# spawned from pos = o + t*d re-hit their own surface: measured cornell
# mean luminance -67% on TPU vs the CPU-f32 golden
# (tools/tpu_golden_bisect.py, round 5).  One exact MT per ray is
# negligible next to the walk, so "auto" turns it on whenever the drains
# may be inexact (any non-CPU backend); CPU keeps the exact cols drain
# and skips the extra compile.
REFINE = os.environ.get("EIDOLA_REFINE", "auto")
_BIG = 1e30


def _refine_active() -> bool:
    if REFINE == "auto":
        return jax.default_backend() != "cpu"
    return REFINE == "1"


# any-hit (occlusion) drains must be EXACT on TPU (bf16 sign tests falsely
# occlude coplanar/self geometry — see the use_fused comment in _traverse).
# EIDOLA_ANY_EXACT picks HOW:
#   "fused" (default) — keep the fused MXU kernel but run its coefficient
#       dot at Precision.HIGHEST over an f32 table (the 6-pass bf16
#       decomposition is f32-exact); requires _cm_dtype() == f32, which
#       bvh_fused forces when this mode is active.  Measured round 5:
#       the cols fallback cost ~2.9x more per occlusion drain.
#   "cols" / "1"   — exact f32 VPU sign tests (_mt_any_cols): the
#       portable oracle; gathers full leaf rows per event (3 KB at
#       leaf 64) and unrolls leaf_size triangles on the VPU.
#   "0"            — bf16 fused any-kernel (WRONG shadows on TPU; A/B only).
ANY_EXACT = os.environ.get("EIDOLA_ANY_EXACT", "fused")


def _any_exact_active() -> bool:
    return ANY_EXACT != "0"


def _any_exact_fused() -> bool:
    """Exact any-hit satisfied INSIDE the fused kernel: either the global
    precision is already highest (f32 table + 6-pass dot everywhere), or
    the fused-exact mode is on (f32 table, HIGHEST passed per any-hit
    call while closest drains keep the fast DEFAULT dot)."""
    return MT_PREC == "highest" or ANY_EXACT == "fused"


class BVH(NamedTuple):
    walk: jnp.ndarray         # (N, 8) f32: bmin, bmax, miss-link, leaf-id (bitcast i32)
    leaf_blocks: jnp.ndarray  # (L, leaf_size*12) f32: (v0, e1, e2, pad) per tri
    prim_id: jnp.ndarray      # (L*leaf_size,) i32 original triangle id (-1 = pad)
    n_tris: jnp.ndarray       # () i32 true triangle count
    # static MT coefficient tables for the fused drain (EIDOLA_MT=fused;
    # ops/bvh_fused.py) — None unless that mode was active at build time
    leaf_cmat: jnp.ndarray | None = None    # (L, KDIM, 4*leaf_size) f32/bf16 (EIDOLA_CMAT)
    leaf_anchor: jnp.ndarray | None = None  # (L, 3) f32
    # octant-ordered walk threadings (EIDOLA_OCT=1, ops/bvh_oct.py):
    # (8*N, 8) — table o*N.. is the near-child-first preorder for rays in
    # direction octant o; None keeps the single build-order walk
    walk_oct: jnp.ndarray | None = None
    # inverse of prim_id: original triangle id -> padded leaf slot, for
    # seeding a traversal's t_max by re-testing a PREDICTED triangle (e.g.
    # last frame's hit at the same pixel, render/direct.py primary_seed)
    slot_of_tri: jnp.ndarray | None = None  # (T,) i32
    # greedy SAH-cut cover of the tree (ops/bvh_build.collect_frontier):
    # a ray segment missing every box provably misses the whole tree —
    # the alpha pre-cull table (render/tracer.py, EIDOLA_ALPHA_CULL)
    cull_boxes: jnp.ndarray | None = None   # (K, 6) f32

    @property
    def leaf_size(self) -> int:
        return self.leaf_blocks.shape[1] // 12


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
    octant: bool | None = None,
    spatial: bool | None = None,
    prim_ids: np.ndarray | None = None,
    n_tris_global: int | None = None,
) -> BVH:
    """Build the threaded BVH on the host (load-time, like the reference's
    one-shot FAST_TRACE BLAS build, accelstruct.cpp:55-65): binned-SAH
    topology, flattened to preorder with escape links so the device walk is
    `hit internal -> i+1; miss/leaf -> escape[i]`.

    v0/v1/v2: (T, 3) world-space triangle vertices (float32).

    prim_ids: optional (T,) external triangle ids for SUBSET builds (the
    opaque/alpha split, scene/data.py): hit records report prim_ids[i]
    instead of the input position i, and slot_of_tri is sized
    n_tris_global (default max(prim_ids)+1) with -1 for ids this BVH does
    not own.
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

    use_spatial = spatial if spatial is not None else SBVH
    native = None if use_spatial else build_bvh_native(
        tb_min, tb_max, centroid, leaf_size
    )
    if native is not None:
        bmin, bmax, escape, blk, leaf_tris = native
    else:
        if use_spatial:
            from .bvh_build import build_sbvh_topology

            lefts, rights, n_bmin, n_bmax, node_tris = build_sbvh_topology(
                v0, v1, v2, leaf_size
            )
        else:
            lefts, rights, n_bmin, n_bmax, node_tris = build_sah_topology(
                tb_min, tb_max, centroid, leaf_size
            )
        bmin, bmax, escape, blk, leaf_tris = flatten_preorder(
            lefts, rights, n_bmin, n_bmax, node_tris, leaf_size
        )

    n_nodes = bmin.shape[0]
    n_leaves = len(leaf_tris)

    # --- vectorized leaf packing with per-leaf Morton order --------------
    # Sorting each leaf's triangles by centroid Morton code keeps spatially
    # close triangles in adjacent slots (cheap, and keeps the layout stable
    # for golden tests).
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

    walk = np.zeros((n_nodes, 8), np.float32)
    walk[:, 0:3] = bmin
    walk[:, 3:6] = bmax
    walk[:, 6] = escape.astype(np.int32).view(np.float32)
    walk[:, 7] = blk.astype(np.int32).view(np.float32)

    blocks2 = blocks.reshape(n_leaves, leaf_size * 12)
    leaf_cmat = leaf_anchor = None
    if _fused_mt_active():
        from .bvh_fused import build_leaf_tables_np

        leaf_cmat, leaf_anchor = build_leaf_tables_np(blocks2, leaf_size)

    walk_oct = None
    if octant if octant is not None else OCT_ORDER:
        from .bvh_oct import build_octant_tables

        walk_oct = build_octant_tables(walk)

    from .bvh_build import collect_frontier

    cull_boxes = collect_frontier(walk, CULL_K)

    if prim_ids is not None:
        ids = np.asarray(prim_ids, np.int32)
        assert ids.shape[0] == T
        prim_id = np.where(prim_id >= 0, ids[np.maximum(prim_id, 0)],
                           np.int32(-1))
        n_slot = (int(n_tris_global) if n_tris_global is not None
                  else int(ids.max()) + 1)
    else:
        n_slot = T
    slot_of_tri = np.full(n_slot, -1, np.int32)
    occupied = prim_id >= 0
    slot_of_tri[prim_id[occupied]] = np.nonzero(occupied)[0].astype(np.int32)

    conv = (lambda x: x) if as_numpy else jnp.asarray
    copt = lambda x: None if x is None else conv(x)
    return BVH(
        walk=conv(walk),
        leaf_blocks=conv(blocks2),
        prim_id=conv(prim_id),
        n_tris=conv(np.int32(T)) if as_numpy else jnp.asarray(T, jnp.int32),
        leaf_cmat=copt(leaf_cmat),
        leaf_anchor=copt(leaf_anchor),
        walk_oct=copt(walk_oct),
        slot_of_tri=conv(slot_of_tri),
        cull_boxes=conv(cull_boxes),
    )


def _pad_to_packets(a, pad_r: int, fill):
    if pad_r == 0:
        return a
    return jnp.concatenate(
        [a, jnp.full((pad_r,) + a.shape[1:], fill, a.dtype)], axis=0
    )



def _mt_cols(col, n_tris: int, ox, oy, oz, dx, dy, dz, t_min, t_lim):
    """Moller-Trumbore over `n_tris` triangles whose per-lane-row constants
    come from `col(i)` (field i of the packed (v0, e1, e2, pad) layout,
    broadcast to the ray shape).  Returns the per-row best
    (t, slot-in-block k, u, v) with t = _BIG where nothing hit."""
    t_b = jnp.full(ox.shape, _BIG, jnp.float32)
    k_b = jnp.zeros(ox.shape, jnp.int32)
    u_b = jnp.zeros(ox.shape, jnp.float32)
    v_b = jnp.zeros(ox.shape, jnp.float32)
    for k in range(n_tris):
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


def _mt_any_cols(col, n_tris, ox, oy, oz, dx, dy, dz, t_min, t_lim):
    """Occlusion-only Moller-Trumbore: a sign-based boolean test with NO
    divisions and NO best-hit tracking — any-hit queries only need "does
    some triangle block [t_min, t_lim]" (ref traceray_rq.glsl:153-185
    AnyHit terminates on first hit; blocker identity is never used).
    Multiplying the barycentric/range tests through by det (resp. det^2,
    positive) removes the divide:  u >= 0  <=>  u_num*det >= 0,  etc.
    Returns a (..., ) bool per lane."""
    hit_any = jnp.zeros(ox.shape, bool)
    for k in range(n_tris):
        b = k * 12
        v0x, v0y, v0z = col(b), col(b + 1), col(b + 2)
        e1x, e1y, e1z = col(b + 3), col(b + 4), col(b + 5)
        e2x, e2y, e2z = col(b + 6), col(b + 7), col(b + 8)
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        tvx = ox - v0x
        tvy = oy - v0y
        tvz = oz - v0z
        u_num = tvx * px + tvy * py + tvz * pz
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        v_num = dx * qx + dy * qy + dz * qz
        t_num = e2x * qx + e2y * qy + e2z * qz
        det2 = det * det
        ud = u_num * det
        vd = v_num * det
        td = t_num * det
        h = (
            (jnp.abs(det) > 1e-12)
            & (ud >= 0.0)
            & (vd >= 0.0)
            & (ud + vd <= det2)
            & (td > t_min * det2)
            & (td < t_lim * det2)
        )
        hit_any = hit_any | h
    return hit_any


def _mt_matmul(row, n_tris, ox, oy, oz, dx, dy, dz, t_min, t_lim):
    """Leaf-block Moller-Trumbore as ONE batched MXU matmul per chunk.

    MT's four determinant forms are all LINEAR in the 10 ray features
    f = [o', d, o'xd, 1] (o' = o recentred to the leaf anchor for FP
    conditioning), with per-triangle coefficient vectors:

        det   = -d . n                      (n = e1 x e2)
        t_num =  o'. n          - v0'. n
        u_num =  (o'xd) . e2    + d . (v0' x e2)
        v_num = -(o'xd) . e1    + d . (e1 x v0')

    (scalar-triple-product expansions of the classic P = d x e2 /
    Q = tv x e1 forms — identical math to _mt_cols reorganized, so
    results match up to FP reassociation.)  The whole leaf block is then
    (lanes x 10) @ (10 x 4*n_tris) — systolic-array work instead of an
    unrolled per-triangle VPU loop — followed by an elementwise epilogue
    and a min-reduce over the triangle axis.  Coefficients are computed
    in-graph from the SAME gathered (v0, e1, e2) rows (per event x tri —
    128x cheaper than per event x lane x tri).

    row: (CE, n_tris*12); rays: (CE, LANES).  Returns per-lane best
    (t, slot k, u, v) with t = _BIG on miss, exactly like _mt_cols.
    """
    ce = row.shape[0]
    tri = row.reshape(ce, n_tris, 12)
    v0 = tri[:, :, 0:3]
    e1 = tri[:, :, 3:6]
    e2 = tri[:, :, 6:9]
    anchor = v0[:, 0, :]                           # (CE, 3) leaf anchor
    v0c = v0 - anchor[:, None, :]                  # (CE, n, 3)
    nvec = jnp.cross(e1, e2)

    z3 = jnp.zeros_like(nvec)
    z1 = jnp.zeros_like(nvec[..., :1])
    const_t = -jnp.sum(v0c * nvec, -1, keepdims=True)
    # coefficient rows over features [o'(3), d(3), o'xd(3), 1]
    c_det = jnp.concatenate([z3, -nvec, z3, z1], -1)
    c_t = jnp.concatenate([nvec, z3, z3, const_t], -1)
    c_u = jnp.concatenate([z3, jnp.cross(v0c, e2), e2, z1], -1)
    c_v = jnp.concatenate([z3, jnp.cross(e1, v0c), -e1, z1], -1)
    oxp = ox - anchor[:, 0:1]
    oyp = oy - anchor[:, 1:2]
    ozp = oz - anchor[:, 2:3]
    cx = oyp * dz - ozp * dy
    cy = ozp * dx - oxp * dz
    cz = oxp * dy - oyp * dx
    feats = jnp.stack(
        [oxp, oyp, ozp, dx, dy, dz, cx, cy, cz, jnp.ones_like(ox)], -1
    )                                              # (CE, LANES, 10)

    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[MT_PREC]

    def bdot(c):
        # (CE, LANES, 10) @ (CE, 10, n) — one quantity per dot, nothing
        # between the dot and its elementwise consumers (fusion-friendly)
        return jax.lax.dot_general(
            feats, c.transpose(0, 2, 1),
            (((2,), (1,)), ((0,), (0,))), precision=prec,
        )

    det = bdot(c_det)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tk = bdot(c_t) * inv_det
    uk = bdot(c_u) * inv_det
    vk = bdot(c_v) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (uk >= 0.0)
        & (vk >= 0.0)
        & (uk + vk <= 1.0)
        & (tk > t_min[..., None])
        & (tk < t_lim[..., None])
    )
    tm = jnp.where(hit, tk, _BIG)
    k = jnp.argmin(tm, axis=-1).astype(jnp.int32)  # first min, like the
    #                                                unrolled (tk < t_b) scan
    t_b = jnp.take_along_axis(tm, k[..., None], -1)[..., 0]
    miss = t_b >= _BIG
    u_b = jnp.where(
        miss, 0.0, jnp.take_along_axis(uk, k[..., None], -1)[..., 0]
    )
    v_b = jnp.where(
        miss, 0.0, jnp.take_along_axis(vk, k[..., None], -1)[..., 0]
    )
    k = jnp.where(miss, 0, k)
    return t_b, k, u_b, v_b


def _mt_block(row, ox, oy, oz, dx, dy, dz, t_min, t_lim):
    """Leaf-block MT where row (C, n*12) holds per-row triangle data
    (compat wrapper over _mt_cols)."""
    return _mt_cols(
        lambda i: row[:, i : i + 1], row.shape[1] // 12,
        ox, oy, oz, dx, dy, dz, t_min, t_lim,
    )


def _traverse(bvh, o, d, t_min, t_max, any_hit: bool, max_steps: int,
              inst=None, with_stats: bool = False):
    """Packet traversal core.  o, d: (R, 3); t_min/t_max: (R,).

    WALK: 128 coherent rays share one node cursor; the packet advances when
    ANY member ray hits the node box — one (n_pkt, 8) row gather plus dense
    (n_pkt, 128) vector math per step (full VPU tile occupancy).

    INSTANCING: when `inst` (ops/bvh_instanced.InstIndex) is given, leaf
    ids index a global leaf table; the drain gathers the event's shared
    mesh leaf row + instance inverse transform and intersects the rays in
    OBJECT space (t is preserved because the transformed direction is not
    renormalized).  inst=None compiles the flattened fast path unchanged.

    SUB-PACKET EVENTS (round 2): leaf events are recorded per SUBW-ray
    SUB-packet, masked by that sub-group's own slab result — each sub-packet
    receives exactly the leaf set its own walk would visit, while the walk
    itself stays at full-packet cost.  Measured on v5 lite, the drain is
    ~92% of traversal and its cost is (events x lanes x tris): divergent
    128-ray packets union ~150 leaves while 32-ray sub-unions are several
    times smaller, so quartering the event granularity cuts total MT lanes
    even though the event COUNT rises.

    DRAIN: compacted sub-events, G = 128/SUBW events packed per dense
    128-lane row (reshape-free packing since sub-packets are consecutive
    lanes); triangle constants broadcast per 32-lane group; per-packet-run
    segmented prefix-min folds results into the per-ray t_best between
    walk rounds (tightening prunes the remaining walk).
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

    # octant-ordered threading: pick ONE per-octant walk table per packet by
    # majority direction sign (ops/bvh_oct.py); same gather shape per step
    walk_tab = getattr(bvh, "walk_oct", None)
    if walk_tab is not None:
        n_nodes_w = bvh.walk.shape[0]
        half_p = PACKET // 2
        oct_base = n_nodes_w * (
            (jnp.sum(dx < 0.0, axis=1) > half_p).astype(jnp.int32)
            + 2 * (jnp.sum(dy < 0.0, axis=1) > half_p).astype(jnp.int32)
            + 4 * (jnp.sum(dz < 0.0, axis=1) > half_p).astype(jnp.int32)
        )

    leaf_size = bvh.leaf_size
    full = dict(ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
                ix=ix, iy=iy, iz=iz, t_min=t_min)
    if walk_tab is not None:
        full["oct"] = oct_base

    def run_stage(S, carry_rounds, next_cap):
        """One compaction stage: the walk/drain loop over S's packet
        arrays, running until the live-packet count fits next_cap (0 =
        run to completion) or the step budget is spent."""
        ox, oy, oz = S["ox"], S["oy"], S["oz"]
        dx, dy, dz = S["dx"], S["dy"], S["dz"]
        ix, iy, iz = S["ix"], S["iy"], S["iz"]
        t_min = S["t_min"]
        oct_base = S.get("oct")
        n_pkt = ox.shape[0]
        G = max(PACKET // SUBW, 1)
        n_sp = n_pkt * G
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (n_sp, QUEUE), 1)

        def walk_rounds(carry):
            def w_cond(c):
                node, cnt, step = c[0], c[6], c[7]
                return jnp.any(node >= 0) & jnp.all(cnt < QUEUE) & (step < max_steps)

            def w_body(c):
                (node, t_best, tri_best, u_best, v_best, queue, cnt, step,
                 ev_total, chunks, live_steps) = c
                live = node >= 0
                # live-packet integral: sum over steps of live packets — the
                # dense walk streams ALL n_pkt packets every step, so
                # steps * n_pkt / live_steps is the compaction headroom
                live_steps = live_steps + jnp.sum(live.astype(jnp.int32))
                nid = jnp.maximum(node, 0)
                if walk_tab is not None:
                    row = walk_tab[oct_base + nid]        # ONE gather: (n_pkt, 8)
                else:
                    row = bvh.walk[nid]                   # ONE gather: (n_pkt, 8)
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
                sub_hit = jnp.any(ray_hit.reshape(n_pkt, G, SUBW), axis=2)
                pkt_hit = jnp.any(sub_hit, axis=1) & live

                miss = jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
                leaf_id = jax.lax.bitcast_convert_type(row[:, 7], jnp.int32)
                is_leaf = leaf_id >= 0

                # push the event ONLY into sub-packets whose own rays overlap
                push = (sub_hit & (pkt_hit & is_leaf)[:, None]).reshape(n_sp)
                leaf_sp = jnp.broadcast_to(
                    leaf_id[:, None], (n_pkt, G)
                ).reshape(n_sp)
                queue = jnp.where(
                    (push & (cnt <= QUEUE - 1))[:, None] & (k_iota == cnt[:, None]),
                    leaf_sp[:, None],
                    queue,
                )
                cnt = cnt + push.astype(jnp.int32)

                nxt = jnp.where(pkt_hit & ~is_leaf, nid + 1, miss)
                node = jnp.where(live, nxt, node)
                return (node, t_best, tri_best, u_best, v_best, queue, cnt,
                        step + 1, ev_total, chunks, live_steps)

            return jax.lax.while_loop(w_cond, w_body, carry)

        leaf_size = bvh.leaf_size
        leaf_rows = bvh.leaf_blocks
        CE = CHUNK                     # sub-events per drain step
        assert CE % G == 0
        CR = CE // G                   # dense 128-lane rows per drain step

        # (n_sp, SUBW) views for per-sub-event ray gathers
        def spv(a):
            return a.reshape(n_sp, SUBW)

        oxs, oys, ozs = spv(ox), spv(oy), spv(oz)
        dxs, dys, dzs = spv(dx), spv(dy), spv(dz)
        tmins = spv(t_min)

        def expand_ev(x):
            """(CE,) per-event value -> (CR, PACKET) dense broadcast (each event
            owns one SUBW-lane group)."""
            return jnp.broadcast_to(
                x.reshape(CR, G, 1), (CR, G, SUBW)
            ).reshape(CR, PACKET)

        def shift_ev(a, sh_ev, fill):
            """Shift (CR, PACKET) by sh_ev EVENTS (= sh_ev * SUBW lanes in the
            flat event-major layout)."""
            flat = a.reshape(CE * SUBW)
            return jnp.concatenate(
                [jnp.full(sh_ev * SUBW, fill, a.dtype), flat[: -sh_ev * SUBW]]
            ).reshape(CR, PACKET)

        def drain_skip(carry):
            """Measurement-only mode (EIDOLA_DRAIN=skip): drop queued events
            without intersecting — isolates walk cost.  WRONG results."""
            (node, t_best, tri_best, u_best, v_best, queue, cnt, step,
             ev_total, chunks, live_steps) = carry
            ev_total = ev_total + jnp.sum(cnt)
            cnt = jnp.zeros_like(cnt)
            return (node, t_best, tri_best, u_best, v_best, queue, cnt, step,
                    ev_total, chunks, live_steps)

        def drain_flat(carry):
            (node, t_best, tri_best, u_best, v_best, queue, cnt, step,
             ev_total, chunks, live_steps) = carry
            offsets = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(cnt, dtype=jnp.int32)]
            )
            total = offsets[-1]
            c_iota = jax.lax.broadcasted_iota(jnp.int32, (CE, 1), 0)[:, 0]

            def d_cond(c):
                return c[0] * CE < total

            def d_body(c):
                ci, t_best, tri_best, u_best, v_best = c
                s = ci * CE + c_iota                     # (CE,) sub-event slots
                valid = s < total
                sp = (
                    jnp.searchsorted(offsets, s, side="right").astype(jnp.int32)
                    - 1
                )
                sp = jnp.clip(sp, 0, n_sp - 1)
                j = jnp.clip(s - offsets[sp], 0, QUEUE - 1)
                leaf = queue[sp, j]                      # (CE,)
                from .bvh_fused import EB as _FEB

                use_fused = (
                    _fused_mt_active()
                    and SUBW == PACKET
                    and CE % _FEB == 0
                    and getattr(bvh, "leaf_cmat", None) is not None
                    # occlusion drains must be EXACT: with bf16 coefficient
                    # dots a shadow ray re-hits its own (or a coplanar
                    # neighbouring) triangle at |t| ~ 0.4% of the leaf
                    # extent > t_min, turning lit pixels black (TPU golden
                    # bisect, round 5: cornell mean luminance -52% from
                    # false occlusion alone).  Closest-hit keeps the bf16
                    # MXU drain because the end-of-walk exact re-test
                    # (EIDOLA_REFINE) repairs the winner's t/u/v; an
                    # any-hit verdict has no winner to repair, so its
                    # sign tests must be f32-exact — either inside the
                    # fused kernel (f32 table + HIGHEST 6-pass dot,
                    # _any_exact_fused) or via the VPU cols fallback.
                    and not (any_hit and _any_exact_active()
                             and not (_any_exact_fused()
                                      and bvh.leaf_cmat is not None
                                      and bvh.leaf_cmat.dtype
                                      == jnp.float32))
                )
                if inst is None:
                    dma_row = leaf
                    if not use_fused:
                        row = leaf_rows[leaf]            # (CE, leaf_size*12)
                else:
                    dma_row = inst.leaf_mesh_row[leaf]
                    if not use_fused:
                        row = leaf_rows[dma_row]
                    xf = inst.inst_inv[inst.leaf_inst[leaf]]   # (CE, 12)

                def g(a):
                    # (CE, SUBW) sub-event lanes packed dense as (CR, PACKET)
                    return a[sp].reshape(CR, PACKET)

                tb_s = spv(t_best)
                tri_s = spv(tri_best)
                us_ = spv(u_best)
                vs_ = spv(v_best)
                gox, goy, goz = g(oxs), g(oys), g(ozs)
                gdx, gdy, gdz = g(dxs), g(dys), g(dzs)
                gtmin, gtb = g(tmins), g(tb_s)
                if inst is not None:
                    # rays -> instance object space (unnormalized direction
                    # keeps hit t identical across spaces)
                    xc = lambda i: expand_ev(xf[:, i])
                    gox, goy, goz = (
                        xc(0) * gox + xc(1) * goy + xc(2) * goz + xc(3),
                        xc(4) * gox + xc(5) * goy + xc(6) * goz + xc(7),
                        xc(8) * gox + xc(9) * goy + xc(10) * goz + xc(11),
                    )
                    gdx, gdy, gdz = (
                        xc(0) * gdx + xc(1) * gdy + xc(2) * gdz,
                        xc(4) * gdx + xc(5) * gdy + xc(6) * gdz,
                        xc(8) * gdx + xc(9) * gdy + xc(10) * gdz,
                    )

                valid_d = expand_ev(valid.astype(jnp.int32)) > 0
                if any_hit:
                    # occlusion events: boolean sign-based MT (no divides, no
                    # payload), segmented prefix-OR on ONE channel instead of
                    # the 4-channel prefix-min — blocker identity is never used
                    if use_fused:
                        from .bvh_fused import mt_any_fused

                        anchor_row = bvh.leaf_anchor[dma_row]      # (CE, 3)
                        # exact sign tests: 6-pass HIGHEST dot over the
                        # f32 table when the global default dot is bf16
                        aprec = (jax.lax.Precision.HIGHEST
                                 if _any_exact_active() else None)
                        hit_e = mt_any_fused(
                            bvh.leaf_cmat, anchor_row, dma_row, sp,
                            valid.astype(jnp.int32),
                            gox, goy, goz, gdx, gdy, gdz, gtmin, gtb,
                            leaf_size, prec=aprec,
                        ) > 0
                    else:
                        col = lambda i: expand_ev(row[:, i])
                        hit_e = _mt_any_cols(
                            col, leaf_size,
                            gox, goy, goz, gdx, gdy, gdz, gtmin, gtb,
                        ) & valid_d
                        # run length within a chunk is bounded by the queue
                        # depth (cnt[sp] <= QUEUE events per sub-packet), so
                        # scan passes beyond sh=QUEUE/2 can never match a
                        # same-segment pair — 12 doubling passes at CHUNK=4096
                        # collapse to 5 exact ones
                        sh = 1
                        while sh < min(CE, QUEUE):
                            same = expand_ev(
                                jnp.concatenate(
                                    [jnp.zeros(sh, bool), sp[sh:] == sp[:-sh]]
                                ).astype(jnp.int32)
                            ) > 0
                            hit_e = hit_e | (same & shift_ev(hit_e, sh, False))
                            sh *= 2
                    nxt_sp = jnp.concatenate(
                        [sp[1:], jnp.full(1, -1, jnp.int32)]
                    )
                    nxt_valid = jnp.concatenate([valid[1:], jnp.zeros(1, bool)])
                    run_end = valid & ((sp != nxt_sp) | ~nxt_valid)
                    idx = jnp.where(run_end, sp, n_sp)   # n_sp = dropped
                    m_t = jnp.where(hit_e, -_BIG, gtb)
                    m_slot = jnp.where(hit_e, 0, g(tri_s))

                    def scat(best_s, m):
                        out = best_s.at[idx].set(
                            m.reshape(CE, SUBW), mode="drop"
                        )
                        return out.reshape(n_pkt, PACKET)

                    t_best = scat(tb_s, m_t)
                    tri_best = scat(tri_s, m_slot)
                    return ci + 1, t_best, tri_best, u_best, v_best

                if use_fused:
                    # fused table drain: coefficient blocks DMA'd by leaf id,
                    # per-sub-packet fold runs in-kernel — t_e/slot_e/u_e/v_e
                    # are already per-row PREFIX folds, so the XLA scan below
                    # is skipped (run-end scatter consumes them unchanged)
                    from .bvh_fused import mt_fused

                    anchor_row = bvh.leaf_anchor[dma_row]          # (CE, 3)
                    t_e, slot_e, u_e, v_e = mt_fused(
                        bvh.leaf_cmat, anchor_row, dma_row, leaf, sp,
                        valid.astype(jnp.int32),
                        gox, goy, goz, gdx, gdy, gdz, gtmin, gtb, leaf_size,
                    )
                    nxt_sp = jnp.concatenate(
                        [sp[1:], jnp.full(1, -1, jnp.int32)]
                    )
                    nxt_valid = jnp.concatenate([valid[1:], jnp.zeros(1, bool)])
                    run_end = valid & ((sp != nxt_sp) | ~nxt_valid)
                    idx = jnp.where(run_end, sp, n_sp)   # n_sp = dropped
                    improved = t_e < gtb
                    m_t = jnp.where(improved, t_e, gtb)
                    m_slot = jnp.where(improved, slot_e, g(tri_s))
                    m_u = jnp.where(improved, u_e, g(us_))
                    m_v = jnp.where(improved, v_e, g(vs_))

                    def scat_f(best_s, m):
                        out = best_s.at[idx].set(
                            m.reshape(CE, SUBW), mode="drop"
                        )
                        return out.reshape(n_pkt, PACKET)

                    t_best = scat_f(tb_s, m_t)
                    tri_best = scat_f(tri_s, m_slot)
                    u_best = scat_f(us_, m_u)
                    v_best = scat_f(vs_, m_v)
                    return ci + 1, t_best, tri_best, u_best, v_best

                use_mxu = MT_MODE == "mxu" or (
                    MT_MODE == "auto" and jax.default_backend() != "cpu"
                )
                if use_mxu and SUBW == PACKET:
                    # fused Pallas kernel: MXU dot + in-VMEM epilogue/reduce
                    from .bvh_mxu import mt_mxu

                    t_e, k_e, u_e, v_e = mt_mxu(
                        row, leaf_size,
                        gox, goy, goz, gdx, gdy, gdz, gtmin, gtb,
                    )
                elif MT_MODE == "matmul" and SUBW == PACKET:
                    t_e, k_e, u_e, v_e = _mt_matmul(
                        row, leaf_size,
                        gox, goy, goz, gdx, gdy, gdz, gtmin, gtb,
                    )
                else:
                    col = lambda i: expand_ev(row[:, i])
                    t_e, k_e, u_e, v_e = _mt_cols(
                        col, leaf_size, gox, goy, goz, gdx, gdy, gdz, gtmin, gtb,
                    )
                t_e = jnp.where(valid_d, t_e, _BIG)
                slot_e = expand_ev(leaf) * leaf_size + k_e

                # segmented prefix-min by sub-packet id (events are sp-major;
                # run length <= QUEUE bounds the scan passes — see any_hit fold)
                sh = 1
                while sh < min(CE, QUEUE):
                    same = expand_ev(
                        jnp.concatenate(
                            [jnp.zeros(sh, bool), sp[sh:] == sp[:-sh]]
                        ).astype(jnp.int32)
                    ) > 0
                    better = same & (shift_ev(t_e, sh, _BIG) < t_e)
                    t_e = jnp.where(better, shift_ev(t_e, sh, _BIG), t_e)
                    slot_e = jnp.where(better, shift_ev(slot_e, sh, 0), slot_e)
                    u_e = jnp.where(better, shift_ev(u_e, sh, 0.0), u_e)
                    v_e = jnp.where(better, shift_ev(v_e, sh, 0.0), v_e)
                    sh *= 2

                # scatter-fold: the LAST event of each sub-packet's run within
                # this chunk carries the run's prefix-min; merge it with the
                # carried best (gathered as gtb / old payload per event — O(CE)
                # rows, not O(n_sp) like a gather-fold would cost every chunk)
                nxt_sp = jnp.concatenate(
                    [sp[1:], jnp.full(1, -1, jnp.int32)]
                )
                nxt_valid = jnp.concatenate([valid[1:], jnp.zeros(1, bool)])
                # a valid event ends its run when the next slot is a different
                # sub-packet OR padding (padding slots clip to the last sp!)
                run_end = valid & ((sp != nxt_sp) | ~nxt_valid)
                idx = jnp.where(run_end, sp, n_sp)       # n_sp = dropped
                improved = t_e < gtb
                m_t = jnp.where(improved, t_e, gtb)
                m_slot = jnp.where(improved, slot_e, g(tri_s))
                m_u = jnp.where(improved, u_e, g(us_))
                m_v = jnp.where(improved, v_e, g(vs_))

                def scat(best_s, m):
                    out = best_s.at[idx].set(
                        m.reshape(CE, SUBW), mode="drop"
                    )
                    return out.reshape(n_pkt, PACKET)

                t_best = scat(tb_s, m_t)
                tri_best = scat(tri_s, m_slot)
                u_best = scat(us_, m_u)
                v_best = scat(vs_, m_v)
                return ci + 1, t_best, tri_best, u_best, v_best

            ci, t_best, tri_best, u_best, v_best = jax.lax.while_loop(
                d_cond, d_body,
                (jnp.int32(0), t_best, tri_best, u_best, v_best),
            )
            if any_hit:
                # resolved rays retire from the slab test entirely
                t_best = jnp.where(tri_best >= 0, -_BIG, t_best)
            ev_total = ev_total + total
            chunks = chunks + ci
            cnt = jnp.zeros_like(cnt)
            return (node, t_best, tri_best, u_best, v_best, queue, cnt, step,
                    ev_total, chunks, live_steps)

        drain = drain_skip if DRAIN == "skip" else drain_flat

        def o_cond(c):
            state, _ = c
            node, step = state[0], state[7]
            live = jnp.sum((node >= 0).astype(jnp.int32))
            return (live > next_cap) & (step < max_steps)

        def o_body(c):
            state, r = c
            return drain(walk_rounds(state)), r + 1

        return jax.lax.while_loop(o_cond, o_body, carry_rounds)


    # ---- staged live-packet compaction (round 4) -----------------------
    # The dense walk streams every (n_pkt, 128) ray plane from HBM each
    # step regardless of how many packets still have live cursors, and
    # the measured live-packet integral is a few % of steps x n_pkt on
    # the bench scenes (tools/roofline.py "live-steps").  Stages: run the
    # loop until the live count fits the next (4x smaller) capacity,
    # scatter results back, gather the survivors into the smaller
    # problem, continue.  Per-packet work is unchanged (packets are
    # independent; only drain chunk grouping shifts), so results match
    # the single-stage walk.
    compact = os.environ.get("EIDOLA_COMPACT", "auto")
    stage_on = (
        compact == "1"
        or (compact == "auto" and jax.default_backend() != "cpu")
    )
    min_cap = int(os.environ.get("EIDOLA_COMPACT_MIN", "512"))
    caps = [n_pkt]
    if stage_on:
        c = n_pkt
        while c > min_cap and len(caps) < 4:
            c = max(-(-c // 4), min_cap)
            caps.append(c)

    res_t = t_max
    res_tri = jnp.full((n_pkt, PACKET), -1, jnp.int32)
    res_u = jnp.zeros((n_pkt, PACKET), jnp.float32)
    res_v = jnp.zeros((n_pkt, PACKET), jnp.float32)
    idx = jnp.arange(n_pkt, dtype=jnp.int32)
    node = jnp.zeros(n_pkt, jnp.int32)
    t_b, tri_b, u_b, v_b = res_t, res_tri, res_u, res_v
    step = ev_total = chunks = live_steps = jnp.int32(0)
    rounds = jnp.int32(0)
    G_ = max(PACKET // SUBW, 1)

    for k, cap in enumerate(caps):
        next_cap = caps[k + 1] if k + 1 < len(caps) else 0
        S = full if k == 0 else {key: a[idx] for key, a in full.items()}
        carry = (
            node, t_b, tri_b, u_b, v_b,
            jnp.zeros((cap * G_, QUEUE), jnp.int32),
            jnp.zeros(cap * G_, jnp.int32),
            step, ev_total, chunks, live_steps,
        )
        state, rounds = run_stage(S, (carry, rounds), jnp.int32(next_cap))
        (node, t_b, tri_b, u_b, v_b, _q, _c, step, ev_total, chunks,
         live_steps) = state
        if k == 0:
            res_t, res_tri, res_u, res_v = t_b, tri_b, u_b, v_b
        else:
            res_t = res_t.at[idx].set(t_b)
            res_tri = res_tri.at[idx].set(tri_b)
            res_u = res_u.at[idx].set(u_b)
            res_v = res_v.at[idx].set(v_b)
        if k + 1 < len(caps):
            # survivors first (stable: keeps packet order otherwise)
            order = jnp.argsort((node < 0).astype(jnp.int32))
            sel = order[:next_cap]
            idx = idx[sel]
            node, t_b, tri_b, u_b, v_b = (
                node[sel], t_b[sel], tri_b[sel], u_b[sel], v_b[sel]
            )

    t_best, tri_slot, u, v = res_t, res_tri, res_u, res_v

    if not any_hit and _refine_active():
        # exact-f32 re-intersection of the winning triangle (see REFINE):
        # restores f32 hit params on top of the bf16 drain's search
        slot = jnp.maximum(tri_slot, 0)
        leaf_g = slot // leaf_size
        k_in = slot % leaf_size
        row_g = leaf_g if inst is None else inst.leaf_mesh_row[leaf_g]
        Lb = bvh.leaf_blocks.shape[0]
        blk = bvh.leaf_blocks.reshape(Lb * leaf_size, 12)[
            row_g * leaf_size + k_in]                  # (n_pkt, PACKET, 12)
        rox, roy, roz, rdx, rdy, rdz = ox, oy, oz, dx, dy, dz
        if inst is not None:
            # same object-space transform the drain used (unnormalized
            # direction keeps t identical across spaces)
            xf = inst.inst_inv[inst.leaf_inst[leaf_g]]  # (n_pkt, PACKET, 12)
            xc = lambda i: xf[..., i]
            rox, roy, roz = (
                xc(0) * ox + xc(1) * oy + xc(2) * oz + xc(3),
                xc(4) * ox + xc(5) * oy + xc(6) * oz + xc(7),
                xc(8) * ox + xc(9) * oy + xc(10) * oz + xc(11),
            )
            rdx, rdy, rdz = (
                xc(0) * dx + xc(1) * dy + xc(2) * dz,
                xc(4) * dx + xc(5) * dy + xc(6) * dz,
                xc(8) * dx + xc(9) * dy + xc(10) * dz,
            )
        bb = lambda i: blk[..., i]
        v0x, v0y, v0z = bb(0), bb(1), bb(2)
        e1x, e1y, e1z = bb(3), bb(4), bb(5)
        e2x, e2y, e2z = bb(6), bb(7), bb(8)
        px = rdy * e2z - rdz * e2y                      # pvec = d x e2
        py = rdz * e2x - rdx * e2z
        pz = rdx * e2y - rdy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = jnp.where(jnp.abs(det) > 1e-24, 1.0 / det, 0.0)
        tvx, tvy, tvz = rox - v0x, roy - v0y, roz - v0z
        u2 = (tvx * px + tvy * py + tvz * pz) * inv_det
        qx = tvy * e1z - tvz * e1y                      # qvec = tvec x e1
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        v2 = (rdx * qx + rdy * qy + rdz * qz) * inv_det
        t2 = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        okr = (
            (tri_slot >= 0) & (inv_det != 0.0)
            & jnp.isfinite(t2) & (t2 > 0.0)
        )
        t_best = jnp.where(okr, t2, t_best)
        u = jnp.where(okr, u2, u)
        v = jnp.where(okr, v2, v)

    stats = (
        {"events": ev_total, "chunks": chunks, "steps": step,
         "rounds": rounds, "live_steps": live_steps}
        if with_stats else None
    )

    def flat(a):
        return a.reshape(n_pkt * PACKET)[:R]

    def ret(rec, tri_slot):
        return (rec, tri_slot, stats) if with_stats else (rec, tri_slot)

    t, tri_slot, u, v = flat(t_best), flat(tri_slot), flat(u), flat(v)
    if any_hit:
        # occlusion drain records a sentinel slot 0 (blocker identity is
        # never used); report tri 0 so `rec.tri >= 0` reads "occluded"
        tri = jnp.where(tri_slot >= 0, 0, -1)
        return ret(HitRecord(tri=tri, t=t, u=u, v=v), tri_slot)
    if inst is None:
        tri = jnp.where(
            tri_slot >= 0, bvh.prim_id[jnp.maximum(tri_slot, 0)], -1
        )
    else:
        slot = jnp.maximum(tri_slot, 0)
        leaf_g = slot // leaf_size
        k = slot % leaf_size
        mesh_slot = inst.leaf_mesh_row[leaf_g] * leaf_size + k
        p = inst.mesh_prim[mesh_slot]
        base = inst.inst_tri_base[inst.leaf_inst[leaf_g]]
        tri = jnp.where((tri_slot >= 0) & (p >= 0), p + base, -1)
    t = jnp.where(tri >= 0, jnp.abs(t), _BIG)
    return ret(HitRecord(tri=tri, t=t, u=u, v=v), tri_slot)



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


def closest_hit_stats(bvh, o, d, t_min, t_max, max_steps: int = 100_000,
                      inst=None):
    """closest_hit + traversal-cost counters {events, chunks, steps}.

    Leaf EVENTS are the platform-independent drain-cost driver (drain work
    = events x 128 lanes x leaf_size MT, ~92% of traversal on TPU), so A/B
    runs of build/order/sort-key variants can rank on CPU before paying a
    TPU measurement (tools/perf_events.py)."""
    rec, _, stats = _traverse(
        bvh, o, d, t_min, t_max, any_hit=False, max_steps=max_steps,
        inst=inst, with_stats=True,
    )
    return rec, stats


def any_hit_stats(bvh, o, d, t_min, t_max, max_steps: int = 100_000,
                  inst=None):
    """any_hit + traversal-cost counters (see closest_hit_stats)."""
    rec, _, stats = _traverse(
        bvh, o, d, t_min, t_max, any_hit=True, max_steps=max_steps,
        inst=inst, with_stats=True,
    )
    return rec.tri >= 0, stats
