"""Two-level (instanced) BVH: shared object-space BLAS pools + a grafted
world-space walk, so N instances of one mesh cost one copy of the heavy
per-triangle data (leaf blocks, shade attributes) plus per-instance node
rows and transforms.

TPU-native replacement for the reference's TLAS-over-BLAS instancing
(ref src/accelstruct.cpp:132-162: one VkAccelerationStructureInstanceKHR
per drawable node over shared per-mesh BLASes).  Design:

- HOST (this module): per unique mesh, a binary SAH BLAS is built ONCE in
  object space (ops/bvh.build_bvh).  For each instance the BLAS *topology*
  is re-emitted with node AABBs transformed to world space (conservative
  transformed-box-of-box) and grafted under a binary SAH top tree over the
  instance world bounds — producing ONE flat preorder/escape walk array
  the existing packet traversals run unchanged.  Node rows are ~1 byte per
  instanced triangle; the O(100 B/tri) leaf + attribute data is shared.
- DEVICE: the walk's leaf ids index a global leaf TABLE (leaf -> shared
  mesh leaf row + instance id).  The drain gathers the instance's inverse
  transform (one 12-float row per event) and intersects the event's rays
  in OBJECT space: with an unnormalized transformed direction the hit t
  is identical in both spaces, and barycentrics are transform-invariant,
  so hit records match the flattened path bit-for-bit up to FP
  reassociation.
- Shading resolves global triangle id = inst_tri_base[inst] + mesh-local
  prim id; attribute arrays stay per-mesh (object space) and normals/
  tangents rotate by the instance normal matrix at gather time
  (scene/shade_state.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .bvh import _BIG, CULL_K, build_bvh
from .bvh_build import collect_frontier


class InstIndex(NamedTuple):
    """The leaf-indirection bundle the traversal drains consume: global
    leaf id -> (shared mesh leaf row, instance) plus the per-instance
    inverse transform and triangle-id bases.  Passing inst=None to the
    walks keeps the flattened fast path bit-identical."""
    leaf_mesh_row: jnp.ndarray  # (Lg,) i32
    leaf_inst: jnp.ndarray      # (Lg,) i32
    inst_inv: jnp.ndarray       # (I, 12) f32 world->object 3x4
    mesh_prim: jnp.ndarray      # (Lm*leaf_size,) i32 mesh-local tri (-1 pad)
    inst_tri_base: jnp.ndarray  # (I,) i32


class InstancedBVH(NamedTuple):
    """Grafted world-space walk over shared object-space leaf pools.

    walk rows follow ops/bvh.BVH.walk: (N, 8) f32 = bmin3, bmax3,
    escape-link, leaf-id (bitcast i32), where leaf ids index the GLOBAL
    leaf table below rather than leaf_blocks directly."""
    walk: jnp.ndarray           # (N, 8) f32 grafted preorder/escape walk
    leaf_mesh_row: jnp.ndarray  # (Lg,) i32 -> row of leaf_blocks
    leaf_inst: jnp.ndarray      # (Lg,) i32 -> instance id
    leaf_blocks: jnp.ndarray    # (Lm, leaf_size*12) f32 OBJECT-space pool
    mesh_prim: jnp.ndarray      # (Lm*leaf_size,) i32 mesh-LOCAL tri (-1 pad)
    inst_inv: jnp.ndarray       # (I, 12) f32 world->object 3x4 (row-major)
    inst_tri_base: jnp.ndarray  # (I,) i32 global tri base per instance
    n_tris: jnp.ndarray         # () i32 total instanced triangles
    # static MT coefficient tables over the shared OBJECT-space leaf pool
    # (fused drain, ops/bvh_fused.py) — None unless EIDOLA_MT=fused
    leaf_cmat: jnp.ndarray | None = None    # (Lm, KDIM, 4*leaf_size) f32/bf16 (EIDOLA_CMAT)
    leaf_anchor: jnp.ndarray | None = None  # (Lm, 3) f32
    # octant-ordered threadings of the grafted walk (EIDOLA_OCT=1,
    # ops/bvh_oct.py) — escape-link topology is all the reorder needs, so
    # the same builder covers the instanced walk
    walk_oct: jnp.ndarray | None = None
    # primary-seed indirection (render/direct.py primary_seed): global
    # instanced triangle id -> shared OBJECT-space pool slot + instance,
    # so last frame's hit can be re-tested in instance object space
    slot_of_tri: jnp.ndarray | None = None  # (T,) i32 pool leaf slot
    inst_of_tri: jnp.ndarray | None = None  # (T,) i32 instance id
    # pre-cull cover of the grafted walk (ops/bvh_build.collect_frontier)
    cull_boxes: jnp.ndarray | None = None   # (K, 6) f32

    @property
    def leaf_size(self) -> int:
        return self.leaf_blocks.shape[1] // 12

    @property
    def inst_index(self) -> InstIndex:
        return InstIndex(
            leaf_mesh_row=self.leaf_mesh_row,
            leaf_inst=self.leaf_inst,
            inst_inv=self.inst_inv,
            mesh_prim=self.mesh_prim,
            inst_tri_base=self.inst_tri_base,
        )


def closest_hit_instanced(bvh: InstancedBVH, o, d, t_min, t_max,
                          max_steps: int = 100_000):
    from .bvh import _traverse

    rec, _ = _traverse(
        bvh, o, d, t_min, t_max, any_hit=False, max_steps=max_steps,
        inst=bvh.inst_index,
    )
    return rec


def any_hit_instanced(bvh: InstancedBVH, o, d, t_min, t_max,
                      max_steps: int = 100_000):
    from .bvh import _traverse

    rec, _ = _traverse(
        bvh, o, d, t_min, t_max, any_hit=True, max_steps=max_steps,
        inst=bvh.inst_index,
    )
    return rec.tri >= 0


def _transform_aabbs(bmin: np.ndarray, bmax: np.ndarray, m: np.ndarray):
    """World AABBs of object AABBs under affine m (3x4).  Uses the classic
    per-axis decomposition: out_min/max = t + sum_j min/max(R[:,j]*lo_j,
    R[:,j]*hi_j) — exact for boxes, no 8-corner loop."""
    r = m[:3, :3]
    t = m[:3, 3]
    lo = np.full_like(bmin, 0.0) + t
    hi = np.full_like(bmax, 0.0) + t
    for j in range(3):
        a = bmin[:, j: j + 1] * r[:, j][None, :]
        b = bmax[:, j: j + 1] * r[:, j][None, :]
        lo = lo + np.minimum(a, b)
        hi = hi + np.maximum(a, b)
    return lo.astype(np.float32), hi.astype(np.float32)


def _invert_affine(m: np.ndarray) -> np.ndarray:
    """(4x4 or 3x4) affine -> 3x4 inverse (row-major)."""
    r = np.linalg.inv(m[:3, :3])
    t = -r @ m[:3, 3]
    out = np.zeros((3, 4), np.float64)
    out[:3, :3] = r
    out[:3, 3] = t
    return out


def build_instanced_bvh(
    meshes: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    instances: list[tuple[int, np.ndarray]],
    leaf_size: int | None = None,
    mesh_prim_ids: list[np.ndarray] | None = None,
    mesh_tris_full: list[int] | None = None,
    inst_tri_base_override: np.ndarray | None = None,
    n_tris_virtual: int | None = None,
) -> InstancedBVH:
    """meshes: [(v0, v1, v2)] object-space triangle soup per unique mesh;
    instances: [(mesh_index, 4x4-or-3x4 object->world transform)].

    Ref parity: Scene/AccelStruct build BLAS per primMesh then one TLAS
    instance per node (accelstruct.cpp:71-162).

    Subset builds (the opaque/alpha split, scene/data.py): pass the
    per-mesh triangle SUBSETS plus `mesh_prim_ids` (mesh-local original
    ids of each subset tri), `mesh_tris_full` (full per-mesh counts),
    `inst_tri_base_override` (this subset's instances' bases in the full
    virtual tri numbering) and `n_tris_virtual` (full virtual count) —
    hit records then report ids in the SAME global numbering as the full
    build, so both split halves shade through one attribute pool."""
    assert meshes and instances
    # --- per-mesh BLAS (shared pools) -----------------------------------
    blas = [
        build_bvh(
            v0, v1, v2, leaf_size=leaf_size, as_numpy=True,
            prim_ids=None if mesh_prim_ids is None else mesh_prim_ids[k],
            n_tris_global=None if mesh_tris_full is None
            else mesh_tris_full[k],
        )
        for k, (v0, v1, v2) in enumerate(meshes)
    ]
    leaf_size_eff = blas[0].leaf_blocks.shape[1] // 12
    mesh_leaf_base = np.zeros(len(meshes) + 1, np.int64)
    for k, b in enumerate(blas):
        mesh_leaf_base[k + 1] = mesh_leaf_base[k] + b.leaf_blocks.shape[0]
    leaf_blocks = np.concatenate([b.leaf_blocks for b in blas], axis=0)
    mesh_prim = np.concatenate([b.prim_id for b in blas], axis=0)

    I = len(instances)
    mats = [np.asarray(m, np.float64).reshape(-1, 4)[:3] if
            np.asarray(m).size == 12 else
            np.asarray(m, np.float64).reshape(4, 4)[:3]
            for (_, m) in instances]
    mesh_of = np.asarray([mi for (mi, _) in instances], np.int64)
    if mesh_tris_full is not None:
        mesh_tris = [int(t) for t in mesh_tris_full]
    else:
        mesh_tris = [int(np.max(b.prim_id) + 1) if b.prim_id.size else 0
                     for b in blas]
    if inst_tri_base_override is not None:
        inst_tri_base = np.asarray(inst_tri_base_override, np.int64)
        assert inst_tri_base.shape[0] == I
        n_tris_total = int(n_tris_virtual)
    else:
        inst_tri_base = np.zeros(I, np.int64)
        acc = 0
        for k in range(I):
            inst_tri_base[k] = acc
            acc += mesh_tris[mesh_of[k]]
        n_tris_total = acc

    # --- per-instance transformed node arrays ---------------------------
    inst_walks = []          # list of (n_i, 8) f32 with LOCAL links
    inst_bounds = np.zeros((I, 6), np.float32)
    for k in range(I):
        b = blas[mesh_of[k]]
        w = np.array(b.walk, np.float32, copy=True)
        lo, hi = _transform_aabbs(w[:, 0:3], w[:, 3:6], mats[k])
        w[:, 0:3] = lo
        w[:, 3:6] = hi
        inst_walks.append(w)
        inst_bounds[k, 0:3] = lo[0]
        inst_bounds[k, 3:6] = hi[0]

    # --- top tree over instance bounds (binary SAH, leaf per instance) --
    from .bvh_build import build_sah_topology

    ib_min = inst_bounds[:, 0:3]
    ib_max = inst_bounds[:, 3:6]
    centroid = (ib_min + ib_max) * 0.5
    lefts, rights, n_bmin, n_bmax, node_insts = build_sah_topology(
        ib_min, ib_max, centroid, leaf_size=1
    )

    # --- graft: emit preorder where a top leaf expands to its instance's
    # walk block (links offset; block-exit links -> the top leaf's escape;
    # leaf ids offset into the GLOBAL leaf table) ------------------------
    n_top = lefts.shape[0]
    size = np.ones(n_top, np.int64)
    for i in range(n_top - 1, -1, -1):
        if lefts[i] >= 0:
            size[i] = 1 + size[lefts[i]] + size[rights[i]]
        else:
            insts = node_insts[i]
            size[i] = sum(inst_walks[j].shape[0] for j in insts)

    total_rows = int(size[0])
    walk = np.zeros((total_rows, 8), np.float32)
    leaf_mesh_row_parts: list[np.ndarray] = []
    leaf_inst_parts: list[np.ndarray] = []
    leaf_base = 0

    stack = [(0, -1)]
    cursor = 0
    while stack:
        node, esc = stack.pop()
        if lefts[node] >= 0:
            me = cursor
            cursor += 1
            walk[me, 0:3] = n_bmin[node]
            walk[me, 3:6] = n_bmax[node]
            walk[me, 6] = np.int32(esc).view(np.float32)
            walk[me, 7] = np.int32(-1).view(np.float32)
            l, r = lefts[node], rights[node]
            right_pos = me + 1 + size[l]
            stack.append((r, esc))
            stack.append((l, right_pos))
        else:
            insts = node_insts[node]
            assert len(insts) == 1, "top leaves hold exactly one instance"
            k = int(insts[0])
            w = inst_walks[k]
            n_i = w.shape[0]
            block = np.array(w, copy=True)
            esc_local = block[:, 6].view(np.int32)
            blk_local = block[:, 7].view(np.int32)
            esc_new = np.where(
                esc_local >= 0, esc_local + cursor, np.int32(esc)
            ).astype(np.int32)
            b = blas[mesh_of[k]]
            n_leaves_mesh = b.leaf_blocks.shape[0]
            blk_new = np.where(
                blk_local >= 0, blk_local + leaf_base, blk_local
            ).astype(np.int32)
            block[:, 6] = esc_new.view(np.float32)
            block[:, 7] = blk_new.view(np.float32)
            walk[cursor: cursor + n_i] = block
            cursor += n_i
            leaf_mesh_row_parts.append(
                np.arange(n_leaves_mesh, dtype=np.int32)
                + np.int32(mesh_leaf_base[mesh_of[k]])
            )
            leaf_inst_parts.append(
                np.full(n_leaves_mesh, k, np.int32)
            )
            leaf_base += n_leaves_mesh
    assert cursor == total_rows

    inst_inv = np.stack(
        [_invert_affine(m).reshape(12) for m in mats]
    ).astype(np.float32)

    from .bvh import OCT_ORDER, _fused_mt_active

    leaf_cmat = leaf_anchor = None
    if _fused_mt_active():
        from .bvh_fused import build_leaf_tables_np

        leaf_cmat, leaf_anchor = build_leaf_tables_np(
            leaf_blocks, leaf_size_eff
        )
        leaf_cmat = jnp.asarray(leaf_cmat)
        leaf_anchor = jnp.asarray(leaf_anchor)

    walk_oct = None
    if OCT_ORDER:
        from .bvh_oct import build_octant_tables

        walk_oct = jnp.asarray(build_octant_tables(walk))

    # global tri -> (shared pool slot, instance) for primary-ray seeding:
    # per mesh, invert mesh_prim (pool slot -> mesh-local tri) over the
    # mesh's leaf range, then lay the per-mesh tables out per instance in
    # inst_tri_base order
    n_leaf_slots = leaf_size_eff
    mesh_slot_of_local = []
    for k, b in enumerate(blas):
        lo = int(mesh_leaf_base[k]) * n_leaf_slots
        hi = int(mesh_leaf_base[k + 1]) * n_leaf_slots
        mp = mesh_prim[lo:hi]
        inv = np.full(mesh_tris[k], -1, np.int32)   # -1 = not in this BVH
        occ = mp >= 0
        inv[mp[occ]] = (np.nonzero(occ)[0] + lo).astype(np.int32)
        mesh_slot_of_local.append(inv)
    # global virtual-tri tables, scattered at each instance's base (subset
    # builds leave -1 holes for tris the OTHER split half owns)
    slot_of_tri = np.full(max(n_tris_total, 1), -1, np.int32)
    inst_of_tri = np.full(max(n_tris_total, 1), -1, np.int32)
    for k in range(I):
        base = int(inst_tri_base[k])
        n_m = mesh_tris[mesh_of[k]]
        slot_of_tri[base: base + n_m] = mesh_slot_of_local[mesh_of[k]]
        inst_of_tri[base: base + n_m] = k
    if not n_tris_total:
        slot_of_tri = np.zeros(0, np.int32)
        inst_of_tri = np.zeros(0, np.int32)

    return InstancedBVH(
        walk=jnp.asarray(walk),
        leaf_mesh_row=jnp.asarray(np.concatenate(leaf_mesh_row_parts)),
        leaf_inst=jnp.asarray(np.concatenate(leaf_inst_parts)),
        leaf_blocks=jnp.asarray(leaf_blocks),
        mesh_prim=jnp.asarray(mesh_prim),
        inst_inv=jnp.asarray(inst_inv),
        inst_tri_base=jnp.asarray(inst_tri_base.astype(np.int32)),
        n_tris=jnp.asarray(n_tris_total, jnp.int32),
        leaf_cmat=leaf_cmat,
        leaf_anchor=leaf_anchor,
        walk_oct=walk_oct,
        slot_of_tri=jnp.asarray(slot_of_tri),
        inst_of_tri=jnp.asarray(inst_of_tri),
        cull_boxes=jnp.asarray(collect_frontier(walk, CULL_K)),
    )
