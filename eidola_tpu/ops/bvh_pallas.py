"""Pallas TPU traversal kernel: per-group trip counts + inline leaf drain.

Replaces the XLA while-loop walk (ops/bvh.py _traverse) for the hot path.
Why a kernel (measured on v5 lite, 64.5k-tri stress scene, 2.07M rays):

    per-packet walk retire-steps   primaries        sorted bounce rays
    mean / p50 / p99 / max         26/29/65/77      125/11/583/739

The XLA walk is GLOBALLY lockstepped: every step processes every packet
until the slowest retires (2.9x waste on primaries, 5.9x on bounce rays),
and every leaf drain is a global barrier + chunked compaction machinery
(searchsorted, segmented scans, scatters).  This kernel gives each GROUP of
8 packets (one (8, 128) VPU tile, one packet per sublane row) its own
while-loop, so a group retires as soon as ITS rays finish, and drains leaf
events inline from a tiny per-packet queue with an async HBM->VMEM copy per
event.  Work done ~= sum over groups of their own trip counts, not
n_groups x global max.

The walk table lives in VMEM (fetched once per kernel launch — constant
index map); leaf triangle rows stay in HBM and are DMA'd per event.
Traversal semantics are identical to ops/bvh.py (stackless escape-link
walk, ref traceray_rq.glsl:108-185); results are bit-identical modulo
closest-hit ties.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh import BVH, HitRecord, PACKET, _BIG

GROUP = 8            # packets per program = sublane rows of one VPU tile
LQ = 4               # leaf events buffered per packet before a drain
# walk tables larger than this stay on the XLA path (VMEM residency cap)
VMEM_NODE_CAP = 180_000


def _kernel(walk_ref, leaf_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
            dz_ref, tmin_ref, tmax_ref,
            t_ref, slot_ref, u_ref, v_ref,
            tri_scratch, sems, *, leaf_size: int, any_hit: bool,
            max_steps: int):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmin, tmax = tmin_ref[:], tmax_ref[:]

    def inv(c):
        return jnp.where(c >= 0.0, 1.0, -1.0) / jnp.maximum(jnp.abs(c), 1e-12)

    ix, iy, iz = inv(dx), inv(dy), inv(dz)
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (GROUP, LQ), 1)

    sel_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)

    def walk_step(c):
        cursors, qcnt, queue, t_best, slot, u, v, step = c
        # VMEM dim0 slices must be 8-aligned (Mosaic tiling): read the
        # aligned (8, 8) block around each cursor and select its row.  The
        # selection happens in the INT32 domain — float arithmetic on the
        # bitcast miss/leaf payloads would corrupt them (NaN patterns,
        # TPU denormal flush-to-zero).
        rows = []
        for s in range(GROUP):
            nid = jnp.maximum(cursors[s, 0], 0)
            base = (nid // 8) * 8
            blk = walk_ref[pl.ds(base, 8), :]             # (8, 8) aligned
            blk_i = jax.lax.bitcast_convert_type(blk, jnp.int32)
            sel = sel_iota == (nid - base)
            rows.append(
                jnp.sum(jnp.where(sel, blk_i, 0), axis=0, keepdims=True)
            )
        node_i = jnp.concatenate(rows, axis=0)            # (GROUP, 8) i32
        node = jax.lax.bitcast_convert_type(node_i, jnp.float32)
        col = lambda i: node[:, i : i + 1]
        tx0 = (col(0) - ox) * ix
        tx1 = (col(3) - ox) * ix
        ty0 = (col(1) - oy) * iy
        ty1 = (col(4) - oy) * iy
        tz0 = (col(2) - oz) * iz
        tz1 = (col(5) - oz) * iz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        ray_hit = (tn <= tf) & (tf >= tmin) & (tn <= t_best)
        live = cursors >= 0                                   # (GROUP, 1)
        pkt_hit = jnp.any(ray_hit, axis=1, keepdims=True) & live
        miss = node_i[:, 6:7]
        leaf_id = node_i[:, 7:8]
        is_leaf = leaf_id >= 0

        push = pkt_hit & is_leaf
        queue = jnp.where(push & (q_iota == qcnt), leaf_id, queue)
        qcnt = qcnt + push.astype(jnp.int32)

        nid = jnp.maximum(cursors, 0)
        nxt = jnp.where(pkt_hit & ~is_leaf, nid + 1, miss)
        cursors = jnp.where(live, nxt, cursors)
        return cursors, qcnt, queue, t_best, slot, u, v, step + 1

    def drain_step(c):
        cursors, qcnt, queue, t_best, slot, u, v, step = c
        active = qcnt > 0                                  # (GROUP, 1)
        qi = jnp.maximum(qcnt - 1, 0)
        leaf = jnp.zeros((GROUP, 1), jnp.int32)
        for k in range(LQ):
            leaf = jnp.where(qi == k, queue[:, k : k + 1], leaf)
        qcnt = jnp.maximum(qcnt - 1, 0)

        # Mosaic only squeezes 32-bit scalars, so gate on an i32 view
        act_i = active.astype(jnp.int32)
        for s in range(GROUP):
            @pl.when(act_i[s, 0] == 1)
            def _(s=s):
                pltpu.make_async_copy(
                    leaf_ref.at[leaf[s, 0]], tri_scratch.at[s], sems.at[s]
                ).start()
        for s in range(GROUP):
            @pl.when(act_i[s, 0] == 1)
            def _(s=s):
                pltpu.make_async_copy(
                    leaf_ref.at[leaf[s, 0]], tri_scratch.at[s], sems.at[s]
                ).wait()

        row3 = tri_scratch[:]                    # (GROUP, 8, ls*12/8)
        ncol = row3.shape[2]
        rcol = lambda i: row3[:, i // ncol, (i % ncol) : (i % ncol) + 1]
        t_b = t_best
        for k in range(leaf_size):
            b = k * 12
            v0x, v0y, v0z = rcol(b), rcol(b + 1), rcol(b + 2)
            e1x, e1y, e1z = rcol(b + 3), rcol(b + 4), rcol(b + 5)
            e2x, e2y, e2z = rcol(b + 6), rcol(b + 7), rcol(b + 8)
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
                active
                & (jnp.abs(det) > 1e-12)
                & (uk >= 0.0)
                & (vk >= 0.0)
                & (uk + vk <= 1.0)
                & (tk > tmin)
                & (tk < t_b)
            )
            t_b = jnp.where(h, tk, t_b)
            slot = jnp.where(h, leaf * leaf_size + k, slot)
            u = jnp.where(h, uk, u)
            v = jnp.where(h, vk, v)
        t_best = t_b
        if any_hit:
            # resolved rays retire from the slab test entirely
            t_best = jnp.where(slot >= 0, -_BIG, t_best)
        return cursors, qcnt, queue, t_best, slot, u, v, step

    def cond(c):
        cursors, qcnt, step = c[0], c[1], c[7]
        return (jnp.any(cursors >= 0) | jnp.any(qcnt > 0)) & (
            step < max_steps
        )

    def body(c):
        can_walk = jnp.any(c[0] >= 0) & jnp.all(c[1] < LQ)
        return jax.lax.cond(can_walk, walk_step, drain_step, c)

    init = (
        jnp.zeros((GROUP, 1), jnp.int32),                  # cursors
        jnp.zeros((GROUP, 1), jnp.int32),                  # qcnt
        jnp.zeros((GROUP, LQ), jnp.int32),                 # queue
        tmax,                                              # t_best
        jnp.full((GROUP, PACKET), -1, jnp.int32),          # slot
        jnp.zeros((GROUP, PACKET), jnp.float32),           # u
        jnp.zeros((GROUP, PACKET), jnp.float32),           # v
        jnp.int32(0),
    )
    out = jax.lax.while_loop(cond, body, init)
    t_ref[:] = out[3]
    slot_ref[:] = out[4]
    u_ref[:] = out[5]
    v_ref[:] = out[6]


def pallas_supported(bvh: BVH) -> bool:
    """Walk table must fit VMEM alongside scratch (bigger scenes use the
    XLA path until a two-level scheme lands)."""
    return bvh.walk.shape[0] <= VMEM_NODE_CAP


@functools.partial(
    jax.jit, static_argnames=("any_hit", "max_steps", "leaf_size")
)
def _run(walk, leaf_rows, o, d, t_min, t_max, *, any_hit: bool,
         max_steps: int, leaf_size: int):
    R = o.shape[0]
    lanes = GROUP * PACKET
    n_grp = -(-R // lanes)
    pad = n_grp * lanes - R

    def padded(a, fill):
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
            )
        return a

    o = padded(o, 0.0)
    d = padded(d, 1.0)
    t_min = padded(t_min, 0.0)
    t_max = padded(t_max, -1.0)  # dead padding never hits

    def comp(a, k):
        return a[:, k].reshape(n_grp * GROUP, PACKET)

    args = (
        comp(o, 0), comp(o, 1), comp(o, 2),
        comp(d, 0), comp(d, 1), comp(d, 2),
        t_min.reshape(n_grp * GROUP, PACKET),
        t_max.reshape(n_grp * GROUP, PACKET),
    )

    # walk rows pad to a multiple of 8 so aligned (8, 8) block reads stay
    # in bounds; padded rows are never selected
    n_pad = (-walk.shape[0]) % 8
    if n_pad:
        walk = jnp.concatenate(
            [walk, jnp.zeros((n_pad, 8), jnp.float32)], axis=0
        )

    ray_spec = pl.BlockSpec(
        (GROUP, PACKET), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    t, slot, u, v = pl.pallas_call(
        functools.partial(
            _kernel, leaf_size=leaf_size, any_hit=any_hit,
            max_steps=max_steps,
        ),
        grid=(n_grp,),
        in_specs=[
            # whole walk table in VMEM, fetched once (constant index map)
            pl.BlockSpec(
                walk.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            # leaf rows (L, 8, cols): leading-dim sliced DMA per event
            pl.BlockSpec(memory_space=pltpu.ANY),
        ] + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((n_grp * GROUP, PACKET), jnp.float32),
            jax.ShapeDtypeStruct((n_grp * GROUP, PACKET), jnp.int32),
            jax.ShapeDtypeStruct((n_grp * GROUP, PACKET), jnp.float32),
            jax.ShapeDtypeStruct((n_grp * GROUP, PACKET), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM(
                (GROUP,) + tuple(leaf_rows.shape[1:]), jnp.float32
            ),
            pltpu.SemaphoreType.DMA((GROUP,)),
        ],
        interpret=jax.default_backend() == "cpu",
    )(walk, leaf_rows, *args)

    flat = lambda a: a.reshape(n_grp * lanes)[:R]
    return flat(t), flat(slot), flat(u), flat(v)


def _traverse_pallas(bvh: BVH, o, d, t_min, t_max, any_hit: bool,
                     max_steps: int):
    leaf_size = bvh.leaf_size
    # (L, rows, cols) layout with 128-aligned lanes where possible: the DMA
    # slices the untiled leading dim per event; inner dims must respect the
    # (sublane, 128) tiling (leaf 64 -> 768 floats = 6 x 128)
    ncol = 128 if (leaf_size * 12) % 128 == 0 else leaf_size * 12 // 8
    leaf_rows = bvh.leaf_blocks.reshape(-1, leaf_size * 12 // ncol, ncol)
    R = o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    t, slot, u, v = _run(
        bvh.walk, leaf_rows, o, d, t_min, t_max,
        any_hit=any_hit, max_steps=max_steps, leaf_size=leaf_size,
    )
    tri = jnp.where(slot >= 0, bvh.prim_id[jnp.maximum(slot, 0)], -1)
    t = jnp.where(tri >= 0, jnp.abs(t), _BIG)
    return HitRecord(tri=tri, t=t, u=u, v=v)


def closest_hit_pallas(bvh: BVH, o, d, t_min, t_max,
                       max_steps: int = 100_000):
    """Drop-in for ops.bvh.closest_hit on the Pallas path."""
    return _traverse_pallas(bvh, o, d, t_min, t_max, False, max_steps)


def any_hit_pallas(bvh: BVH, o, d, t_min, t_max, max_steps: int = 100_000):
    """Drop-in for ops.bvh.any_hit on the Pallas path."""
    rec = _traverse_pallas(bvh, o, d, t_min, t_max, True, max_steps)
    return rec.tri >= 0
