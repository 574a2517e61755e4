"""4-ary ("wide") BVH: host-side collapse of the binary SAH tree + a
packet walk that tests FOUR child AABBs per row gather.

TPU-native rationale (VERDICT r2 next-round #2; replaces the per-thread
hardware traversal of ref shaders/traceray_rq.glsl:108-147):

- The binary escape walk (ops/bvh.py) pays ONE step (= one row gather +
  slab test) per VISITED node, and it must visit every child of a hit
  node to discover misses.  A 4-ary node row carries all four children's
  AABBs in one 32-float gather row, so a missed child costs ZERO steps:
  steps ~ hit internal nodes (roughly half the binary count after
  collapsing) instead of ~ all tested nodes.
- Descent is nearest-first: the packet reduces each child's slab t_near
  over its live lanes and descends the minimum; remaining hit internal
  children go to a short per-packet STACK (dense (n_pkt, D) i32 ops, no
  gathers) pushed farthest-first so pops are near-first — tightening
  t_best before far subtrees are walked prunes them.
- Leaf children enqueue into the SAME bounded per-packet event queue and
  compacted drain as the binary walk (events are (packet, leaf) pairs
  either way; the drain is unchanged and measured-in, docs/PERF_NOTES.md).

The wide BVH shares leaf_blocks/prim_id layout with ops/bvh.BVH, so hit
records are bit-identical in content (same leaves, same MT tests) — only
the walk order differs.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .bvh import (
    _BIG,
    CHUNK,
    PACKET,
    QUEUE,
    HitRecord,
    _mt_cols,
    _pad_to_packets,
    build_bvh,
)

WIDTH = 4          # children per node row
STACK_PAD = 4      # slack over the exact build-time bound


class WideBVH(NamedTuple):
    """walk4 rows: 32 f32 = 4 x (bmin3, bmax3) in cols [c*6, c*6+6), child
    refs bitcast-i32 in cols 24..27 (>= 0: internal row index; < 0: ~leaf
    id), cols 28..31 reserved.  Absent children carry inverted boxes (can
    never be hit).  stack_bound: (1,) i32 exact worst-case pending-sibling
    stack depth (computed on the host tree; the device stack is padded to
    a static power-of-two >= it)."""
    walk4: jnp.ndarray        # (N4, 32) f32
    leaf_blocks: jnp.ndarray  # (L, leaf_size*12) f32 (shared layout w/ BVH)
    prim_id: jnp.ndarray      # (L*leaf_size,) i32
    n_tris: jnp.ndarray       # () i32
    stack_pad: jnp.ndarray    # (D,) u8 zeros: device stack depth as SHAPE
    #                           (shapes stay static under jit; a value leaf
    #                           would be traced and unusable as a dimension)

    @property
    def leaf_size(self) -> int:
        return self.leaf_blocks.shape[1] // 12


def collapse_to_wide(walk: np.ndarray) -> tuple[np.ndarray, int]:
    """Collapse a flattened binary preorder/escape BVH (ops/bvh.BVH.walk
    layout) into 4-ary rows.

    Binary node i: internal -> left = i+1, right = esc[i+1]; leaf id in
    col 7.  A quad node's children are the up-to-four grandchildren of a
    binary internal node (binary children that are leaves pass through).
    Returns (walk4 (N4, 32) f32, exact stack bound)."""
    walk = np.asarray(walk, np.float32)
    esc = walk[:, 6].view(np.int32)
    blk = walk[:, 7].view(np.int32)
    n = walk.shape[0]

    def bin_children(i: int) -> tuple[int, int]:
        left = i + 1
        right = int(esc[left])
        return left, right

    def expand(i: int) -> list[int]:
        """Binary node -> its quad-children as binary node ids (leaves pass
        through, internals are replaced by their two binary children)."""
        out = []
        for c in bin_children(i):
            if blk[c] >= 0:
                out.append(c)
            else:
                out.extend(bin_children(c))
        return out

    rows_bounds: list[np.ndarray] = []
    rows_refs: list[list[int]] = []      # temp: binary ids (patched below)
    rows_is_leaf: list[list[bool]] = []

    if blk[0] >= 0:
        # degenerate single-leaf scene: one row, one leaf child
        row_b = np.concatenate([walk[0, 0:6], np.zeros(18, np.float32)])
        rows_bounds.append(row_b)
        rows_refs.append([int(blk[0])])
        rows_is_leaf.append([True])
    else:
        row_of: dict[int, int] = {}
        order: list[int] = []
        stack = [0]
        while stack:
            b = stack.pop()
            row_of[b] = len(order)
            order.append(b)
            kids = expand(b)
            refs, leafs, bounds = [], [], []
            internals = []
            for k in kids:
                if blk[k] >= 0:
                    refs.append(int(blk[k]))
                    leafs.append(True)
                else:
                    refs.append(k)          # patched to row index below
                    leafs.append(False)
                    internals.append(k)
                bounds.append(walk[k, 0:6])
            while len(bounds) < WIDTH:
                bounds.append(
                    np.asarray([_BIG, _BIG, _BIG, -_BIG, -_BIG, -_BIG],
                               np.float32)
                )
                refs.append(0)
                leafs.append(True)
            rows_bounds.append(np.concatenate(bounds))
            rows_refs.append(refs)
            rows_is_leaf.append(leafs)
            # preorder: first internal child emitted next
            for k in reversed(internals):
                stack.append(k)

        for r, (refs, leafs) in enumerate(zip(rows_refs, rows_is_leaf)):
            rows_refs[r] = [
                v if is_l else row_of[v] for v, is_l in zip(refs, leafs)
            ]

    n4 = len(rows_bounds)
    walk4 = np.zeros((n4, 32), np.float32)
    walk4[:, 0:24] = np.stack(rows_bounds)
    refs_arr = np.zeros((n4, WIDTH), np.int32)
    for r, (refs, leafs) in enumerate(zip(rows_refs, rows_is_leaf)):
        for c, (v, is_l) in enumerate(zip(refs, leafs)):
            refs_arr[r, c] = ~np.int32(v) if is_l else np.int32(v)
    # absent children (inverted boxes) got ref ~0: harmless, never hit
    walk4[:, 24:28] = refs_arr.view(np.float32)

    # exact pending-sibling stack bound, children-first (children follow
    # parents in preorder, so a reverse sweep sees children first):
    # S(n) = max over internal children i of (S(i) + n_internal - 1)
    s = np.zeros(n4, np.int64)
    for r in range(n4 - 1, -1, -1):
        ints = [
            v for v, is_l in zip(rows_refs[r], rows_is_leaf[r]) if not is_l
        ]
        if ints:
            s[r] = max(s[i] + len(ints) - 1 for i in ints)
    return walk4, int(s[0])


def build_bvh_wide(v0, v1, v2, leaf_size: int | None = None) -> WideBVH:
    """Binary SAH build (ops/bvh.build_bvh, native-accelerated) + collapse."""
    base = build_bvh(v0, v1, v2, leaf_size=leaf_size, as_numpy=True)
    walk4, bound = collapse_to_wide(base.walk)
    return WideBVH(
        walk4=jnp.asarray(walk4),
        leaf_blocks=jnp.asarray(base.leaf_blocks),
        prim_id=jnp.asarray(base.prim_id),
        n_tris=jnp.asarray(base.n_tris, jnp.int32),
        stack_pad=jnp.zeros(_pad_depth(bound), jnp.uint8),
    )


def wide_from_bvh(bvh) -> WideBVH:
    """Collapse an already-built binary BVH (device arrays ok)."""
    walk4, bound = collapse_to_wide(np.asarray(bvh.walk))
    return WideBVH(
        walk4=jnp.asarray(walk4),
        leaf_blocks=bvh.leaf_blocks,
        prim_id=bvh.prim_id,
        n_tris=bvh.n_tris,
        stack_pad=jnp.zeros(_pad_depth(bound), jnp.uint8),
    )


def _pad_depth(bound: int) -> int:
    """Static device stack depth: next multiple of 8 >= host bound + pad."""
    b = bound + STACK_PAD
    return max(-(-b // 8) * 8, 8)


def _traverse_wide(bvh: WideBVH, o, d, t_min, t_max, any_hit: bool,
                   max_steps: int):
    """4-wide packet traversal.  o, d: (R, 3); t_min/t_max: (R,).

    Per step: ONE (n_pkt, 32) row gather; 4 slab tests over the dense
    (n_pkt, 128) lanes; leaf children enqueue (same drain as ops/bvh.py,
    full-packet events); internal hit children: nearest (packet-reduced
    t_near) becomes the cursor, the rest push to the per-packet stack
    farthest-first."""
    R = o.shape[0]
    n_pkt = -(-R // PACKET)
    pad_r = n_pkt * PACKET - R
    D = bvh.stack_pad.shape[0]

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    o = _pad_to_packets(o, pad_r, 0.0)
    d = _pad_to_packets(d, pad_r, 1.0)
    t_min = _pad_to_packets(t_min, pad_r, 0.0)
    t_max = _pad_to_packets(t_max, pad_r, -1.0)

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
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (n_pkt, D), 1)

    def walk_rounds(carry):
        (cur, sp, stck, t_best, tri_best, u_best, v_best, queue, cnt,
         step) = carry

        def w_cond(c):
            cur, sp, cnt, step = c[0], c[1], c[8], c[9]
            alive = jnp.any((cur >= 0) | (sp > 0))
            # a step can push up to WIDTH leaf events; pause for a drain
            # while there is still room for all of them (a binary walk can
            # get away with < QUEUE because it pushes at most one)
            return alive & jnp.all(cnt <= QUEUE - WIDTH) & (step < max_steps)

        def w_body(c):
            (cur, sp, stck, t_best, tri_best, u_best, v_best, queue, cnt,
             step) = c
            live = cur >= 0
            row = bvh.walk4[jnp.maximum(cur, 0)]      # ONE gather: (n_pkt, 32)
            refs = jax.lax.bitcast_convert_type(
                row[:, 24:28], jnp.int32
            )                                          # (n_pkt, 4)

            hit_any = []
            tnear_pkt = []
            for ci in range(WIDTH):
                b = ci * 6
                col = lambda i: row[:, b + i: b + i + 1]
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
                ray_hit = (t_near <= t_far) & (t_far >= t_min) & (
                    t_near <= t_best
                )
                hit_any.append(jnp.any(ray_hit, axis=1) & live)
                tnear_pkt.append(
                    jnp.min(jnp.where(ray_hit, t_near, _BIG), axis=1)
                )
            hit = jnp.stack(hit_any, axis=1)           # (n_pkt, 4)
            tnear = jnp.stack(tnear_pkt, axis=1)       # (n_pkt, 4)

            is_leaf = refs < 0
            leaf_hit = hit & is_leaf
            int_hit = hit & ~is_leaf

            # --- enqueue leaf children (up to 4 per step) ----------------
            for ci in range(WIDTH):
                push = leaf_hit[:, ci]
                queue = jnp.where(
                    (push & (cnt <= QUEUE - 1))[:, None]
                    & (k_iota == cnt[:, None]),
                    (~refs[:, ci])[:, None],
                    queue,
                )
                cnt = cnt + push.astype(jnp.int32)

            # --- pick nearest internal child as next cursor --------------
            t_int = jnp.where(int_hit, tnear, _BIG)
            first = jnp.argmin(t_int, axis=1)          # (n_pkt,)
            has_int = jnp.any(int_hit, axis=1)
            ref_first = jnp.take_along_axis(
                refs, first[:, None], axis=1
            )[:, 0]

            # --- push the other hit internal children farthest-first -----
            one_hot = jax.nn.one_hot(first, WIDTH, dtype=jnp.bool_)
            pending = int_hit & ~(one_hot & has_int[:, None])
            for _ in range(WIDTH - 1):
                t_pend = jnp.where(pending, tnear, -_BIG)
                pick = jnp.argmax(t_pend, axis=1)
                has = jnp.any(pending, axis=1)
                ref_p = jnp.take_along_axis(refs, pick[:, None], axis=1)[:, 0]
                stck = jnp.where(
                    (has & (sp <= D - 1))[:, None] & (d_iota == sp[:, None]),
                    ref_p[:, None],
                    stck,
                )
                sp = sp + has.astype(jnp.int32)
                pending = pending & ~jax.nn.one_hot(
                    pick, WIDTH, dtype=jnp.bool_
                )

            # --- advance: descend / pop / retire --------------------------
            want_pop = live & ~has_int
            can_pop = want_pop & (sp > 0)
            sp_new = sp - can_pop.astype(jnp.int32)
            popped = jnp.take_along_axis(
                stck, jnp.maximum(sp_new, 0)[:, None], axis=1
            )[:, 0]
            nxt = jnp.where(
                has_int, ref_first, jnp.where(can_pop, popped, -1)
            )
            # packets whose cursor already retired may still hold stack
            # entries from before a drain pause: pop those too
            idle_pop = (~live) & (sp > 0)
            sp_new = sp_new - idle_pop.astype(jnp.int32)
            popped2 = jnp.take_along_axis(
                stck, jnp.maximum(sp_new, 0)[:, None], axis=1
            )[:, 0]
            nxt = jnp.where(idle_pop, popped2, nxt)
            cur = jnp.where(live | idle_pop, nxt, cur)
            return (cur, sp_new, stck, t_best, tri_best, u_best, v_best,
                    queue, cnt, step + 1)

        return jax.lax.while_loop(
            w_cond, w_body,
            (cur, sp, stck, t_best, tri_best, u_best, v_best, queue, cnt,
             step),
        )

    # ---- drain: full-packet events, compacted chunks (G = 1 simplification
    # of ops/bvh.py drain_flat — each event owns a full 128-lane row) -------
    leaf_size = bvh.leaf_size
    leaf_rows = bvh.leaf_blocks
    CE = CHUNK // 8

    def drain(carry):
        (cur, sp, stck, t_best, tri_best, u_best, v_best, queue, cnt,
         step) = carry
        offsets = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(cnt, dtype=jnp.int32)]
        )
        total = offsets[-1]
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (CE, 1), 0)[:, 0]

        def d_cond(c):
            return c[0] * CE < total

        def d_body(c):
            ci, t_best, tri_best, u_best, v_best = c
            s = ci * CE + c_iota
            valid = s < total
            pk = (
                jnp.searchsorted(offsets, s, side="right").astype(jnp.int32)
                - 1
            )
            pk = jnp.clip(pk, 0, n_pkt - 1)
            j = jnp.clip(s - offsets[pk], 0, QUEUE - 1)
            leaf = queue[pk, j]                       # (CE,)
            row = leaf_rows[leaf]                     # (CE, leaf_size*12)

            def g(a):
                return a[pk]                          # (CE, PACKET)

            gox, goy, goz = g(ox), g(oy), g(oz)
            gdx, gdy, gdz = g(dx), g(dy), g(dz)
            gtmin, gtb = g(t_min), g(t_best)

            col = lambda i: row[:, i: i + 1]
            t_e, k_e, u_e, v_e = _mt_cols(
                col, leaf_size, gox, goy, goz, gdx, gdy, gdz, gtmin, gtb,
            )
            t_e = jnp.where(valid[:, None], t_e, _BIG)
            slot_e = leaf[:, None] * leaf_size + k_e

            # segmented prefix-min by packet id (events are packet-major)
            sh = 1
            while sh < CE:
                same = jnp.concatenate(
                    [jnp.zeros(sh, bool), pk[sh:] == pk[:-sh]]
                )[:, None]

                def shift(a, fill):
                    return jnp.concatenate(
                        [jnp.full((sh, PACKET), fill, a.dtype), a[:-sh]]
                    )

                better = same & (shift(t_e, _BIG) < t_e)
                t_e = jnp.where(better, shift(t_e, _BIG), t_e)
                slot_e = jnp.where(better, shift(slot_e, 0), slot_e)
                u_e = jnp.where(better, shift(u_e, 0.0), u_e)
                v_e = jnp.where(better, shift(v_e, 0.0), v_e)
                sh *= 2

            nxt_pk = jnp.concatenate([pk[1:], jnp.full(1, -1, jnp.int32)])
            nxt_valid = jnp.concatenate([valid[1:], jnp.zeros(1, bool)])
            run_end = valid & ((pk != nxt_pk) | ~nxt_valid)
            idx = jnp.where(run_end, pk, n_pkt)
            improved = t_e < gtb
            m_t = jnp.where(improved, t_e, gtb)
            m_slot = jnp.where(improved, slot_e, g(tri_best))
            m_u = jnp.where(improved, u_e, g(u_best))
            m_v = jnp.where(improved, v_e, g(v_best))

            def scat(best, m):
                return best.at[idx].set(m, mode="drop")

            return (ci + 1, scat(t_best, m_t), scat(tri_best, m_slot),
                    scat(u_best, m_u), scat(v_best, m_v))

        _, t_best, tri_best, u_best, v_best = jax.lax.while_loop(
            d_cond, d_body,
            (jnp.int32(0), t_best, tri_best, u_best, v_best),
        )
        if any_hit:
            t_best = jnp.where(tri_best >= 0, -_BIG, t_best)
        cnt = jnp.zeros_like(cnt)
        return (cur, sp, stck, t_best, tri_best, u_best, v_best, queue, cnt,
                step)

    init = (
        jnp.zeros(n_pkt, jnp.int32),                     # cursor (row 0)
        jnp.zeros(n_pkt, jnp.int32),                     # stack pointer
        jnp.zeros((n_pkt, D), jnp.int32),                # sibling stack
        t_max,                                           # t_best
        jnp.full((n_pkt, PACKET), -1, jnp.int32),        # best padded slot
        jnp.zeros((n_pkt, PACKET), jnp.float32),         # u
        jnp.zeros((n_pkt, PACKET), jnp.float32),         # v
        jnp.zeros((n_pkt, QUEUE), jnp.int32),            # event queue
        jnp.zeros(n_pkt, jnp.int32),                     # queue counts
        jnp.int32(0),                                    # step budget
    )

    def o_cond(carry):
        cur, sp, step = carry[0], carry[1], carry[9]
        return jnp.any((cur >= 0) | (sp > 0)) & (step < max_steps)

    def o_body(carry):
        return drain(walk_rounds(carry))

    out = jax.lax.while_loop(o_cond, o_body, init)
    t_best, tri_slot, u, v = out[3], out[4], out[5], out[6]

    def flat(a):
        return a.reshape(n_pkt * PACKET)[:R]

    t, tri_slot, u, v = flat(t_best), flat(tri_slot), flat(u), flat(v)
    tri = jnp.where(tri_slot >= 0, bvh.prim_id[jnp.maximum(tri_slot, 0)], -1)
    t = jnp.where(tri >= 0, jnp.abs(t), _BIG)
    return HitRecord(tri=tri, t=t, u=u, v=v), tri_slot


def closest_hit_wide(bvh: WideBVH, o, d, t_min, t_max,
                     max_steps: int = 100_000):
    rec, _ = _traverse_wide(
        bvh, o, d, t_min, t_max, any_hit=False, max_steps=max_steps
    )
    return rec


def any_hit_wide(bvh: WideBVH, o, d, t_min, t_max,
                 max_steps: int = 100_000):
    rec, _ = _traverse_wide(
        bvh, o, d, t_min, t_max, any_hit=True, max_steps=max_steps
    )
    return rec.tri >= 0
