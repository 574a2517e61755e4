"""Packet-coherent ray ordering: image tiles + sorted wavefronts.

The BVH walker (ops/bvh.py) gives every 128 consecutive rays one shared
traversal cursor, so consecutive rays should be spatially coherent.  Two
ordering strategies:

1. Image tiles (`closest_hit_img`/`any_hit_img`): an 8x16 pixel tile
   (= exactly one 128-lane packet) has a far tighter frustum than a
   128-pixel scanline run.  Pure reshape/transpose — no gathers.  This is
   the TPU analog of the reference's 8x8 workgroup rasterization
   (ref host_device.h:31-38, SWIZZLED experiment direct_gen.comp:35-50).
2. Sorted wavefronts (`closest_hit_sorted`/`any_hit_sorted`): bounce and
   shadow rays have no raster coherence, so sort them by (dead, origin
   Morton cell, direction octant) before traversal — the ray
   sorting/compaction step of a wavefront architecture (SURVEY §5.7).
   Dead rays (t_max < t_min) cluster into packets that retire in one
   step.  Measured ~2-3x on TPU v5e for diffuse-bounce batches.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .bvh import BVH, HitRecord, PACKET
from .bvh import any_hit as _any_hit_xla
from .bvh import closest_hit as _closest_hit_xla

TILE_H = 8
TILE_W = 16

# traversal backend: "xla" = the vectorized while-loop walk with sub-packet
# event drain (default; measured fastest on v5 lite); "pallas" = per-group
# trip-count kernel (ops/bvh_pallas.py) — A/B'd slower (127 vs 81 ms on 2M
# primaries): its per-step (8,8) scalar work can't amortize like the
# megavector walk, kept for future iteration
_TRAV = os.environ.get("EIDOLA_TRAV", "xla")
# wavefront sort-key layout (see ray_sort_keys): o21d3 | d3o21 | o15d6.
# o15d6 (6 direction bits over 5 origin-grid bits/axis) is the measured
# TPU default: bounce 748 -> 564 ms alone, 480 composed with octant
# tables + fused drain (PERF_NOTES "Sort keys / queue depth / seeding")
_KEY = os.environ.get("EIDOLA_KEY", "o15d6")


def _is_inst(bvh) -> bool:
    return hasattr(bvh, "leaf_mesh_row")


# --- measured ray accounting (EIDOLA_COUNT_RAYS=1) -------------------------
# VERDICT r4 weak #6: bench.py's mrays_per_s was MODELED from the config.
# With the flag on, every traversal front door inserts a host callback that
# accumulates its LIVE ray count (t_max >= t_min lanes actually dispatched,
# including every lap of the alpha-march queue and each banded shard), so a
# frame's ray total is measured from the running computation, not assumed.
RAY_LEDGER: list = []


def _count_rays(t_min, t_max):
    if os.environ.get("EIDOLA_COUNT_RAYS") != "1":
        return
    live = jnp.sum(
        (jnp.asarray(t_max, jnp.float32)
         >= jnp.asarray(t_min, jnp.float32)).astype(jnp.float32)
    )
    jax.debug.callback(
        lambda v: RAY_LEDGER.append(float(np.sum(np.asarray(v)))), live
    )


def _use_pallas(bvh: BVH) -> bool:
    if (_TRAV != "pallas" or jax.default_backend() == "cpu"
            or _is_inst(bvh)):
        return False
    from .bvh_pallas import pallas_supported

    return pallas_supported(bvh)


def closest_hit(bvh, o, d, t_min, t_max, max_steps: int = 100_000):
    if _is_inst(bvh):
        from .bvh_instanced import closest_hit_instanced

        return closest_hit_instanced(
            bvh, o, d, t_min, t_max, max_steps=max_steps
        )
    if _use_pallas(bvh):
        from .bvh_pallas import closest_hit_pallas

        return closest_hit_pallas(bvh, o, d, t_min, t_max, max_steps)
    return _closest_hit_xla(bvh, o, d, t_min, t_max, max_steps=max_steps)


def any_hit(bvh, o, d, t_min, t_max, max_steps: int = 100_000):
    if _is_inst(bvh):
        from .bvh_instanced import any_hit_instanced

        return any_hit_instanced(bvh, o, d, t_min, t_max, max_steps=max_steps)
    if _use_pallas(bvh):
        from .bvh_pallas import any_hit_pallas

        return any_hit_pallas(bvh, o, d, t_min, t_max, max_steps)
    return _any_hit_xla(bvh, o, d, t_min, t_max, max_steps=max_steps)


def _tileable(h: int, w: int) -> bool:
    return h % TILE_H == 0 and w % TILE_W == 0


def to_tiles(a, h: int, w: int):
    """(h, w, ...) -> (h*w, ...) in tile-major order."""
    if not _tileable(h, w):
        return a.reshape((h * w,) + a.shape[2:])
    th, tw = TILE_H, TILE_W
    x = a.reshape((h // th, th, w // tw, tw) + a.shape[2:])
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape((h * w,) + a.shape[2:])


def from_tiles(a, h: int, w: int):
    """Inverse of to_tiles: (h*w, ...) tile-major -> (h, w, ...)."""
    if not _tileable(h, w):
        return a.reshape((h, w) + a.shape[1:])
    th, tw = TILE_H, TILE_W
    x = a.reshape((h // th, w // tw, th, tw) + a.shape[1:])
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape((h, w) + a.shape[1:])


def _img_traverse(fn, bvh: BVH, o, d, t_min, t_max, max_steps: int):
    _count_rays(t_min, t_max)
    """Tile-major flat traversal of an (H, W) ray field; under a band
    context (ops/halo.py), vmapped over row bands so every gather/scatter
    inside the walk+drain carries the band as a batch dim and SPMD keeps
    the whole traversal shard-local (tile-major order puts each band's
    h/B image rows in one contiguous flat chunk)."""
    h, w = o.shape[:2]
    args = [to_tiles(o, h, w), to_tiles(d, h, w),
            to_tiles(t_min, h, w), to_tiles(t_max, h, w)]
    from .halo import get_bands

    B = get_bands()
    R = h * w
    if (B > 1 and _tileable(h, w) and h % (B * TILE_H) == 0
            and (R // B) % PACKET == 0):
        Rb = R // B

        def band(o1, d1, tn1, tx1):
            return fn(bvh, o1, d1, tn1, tx1, max_steps=max_steps)

        out = jax.vmap(band)(
            *[a.reshape((B, Rb) + a.shape[1:]) for a in args]
        )
        flat = lambda a: a.reshape((R,) + a.shape[2:])
        if isinstance(out, HitRecord):
            return HitRecord(*[flat(a) for a in out])
        return flat(out)
    return fn(bvh, *args, max_steps=max_steps)


def closest_hit_img(bvh: BVH, o, d, t_min, t_max, max_steps: int = 100_000):
    """Closest hit for (H, W, 3) ray fields with tile-packet ordering.
    Returns a HitRecord of (H, W) arrays."""
    h, w = o.shape[:2]
    rec = _img_traverse(closest_hit, bvh, o, d, t_min, t_max, max_steps)
    return HitRecord(
        tri=from_tiles(rec.tri, h, w),
        t=from_tiles(rec.t, h, w),
        u=from_tiles(rec.u, h, w),
        v=from_tiles(rec.v, h, w),
    )


def any_hit_img(bvh: BVH, o, d, t_min, t_max, max_steps: int = 100_000):
    """Occlusion query for (H, W, 3) ray fields with tile-packet ordering."""
    h, w = o.shape[:2]
    occ = _img_traverse(any_hit, bvh, o, d, t_min, t_max, max_steps)
    return from_tiles(occ, h, w)


def _expand_bits_u32(v):
    """Spread the low 10 bits of v so they occupy every 3rd bit (jnp)."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def ray_sort_keys(bvh: BVH, o, d, dead):
    """u32 sort key ordering rays into coherent 128-lane packets.

    Default layout: dead(1) | origin 7-bit-per-axis Morton(21) | octant(3)
    — origin cells from the root AABB (bvh.walk row 0) so nearby origins
    share top-of-tree traversal; the octant separates opposing directions
    whose slab intervals disagree.

    EIDOLA_KEY selects measurable alternatives (perf-only — any
    permutation is correct).  The drain toll is the PACKET union of leaf
    visits, which grows with BOTH origin spread and direction spread;
    these trade origin bits for direction bits:
      o21d3 (default)  21 origin bits above 3 direction bits
      d3o21            octant ABOVE origin: packets never mix octants
      o15d6            5 bits/axis origin, then 2 bits/axis direction"""
    root = bvh.walk[0]
    bmin, bmax = root[0:3], root[3:6]
    ext = jnp.maximum(bmax - bmin, 1e-6)
    p = jnp.clip((o - bmin) / ext, 0.0, 1.0)
    octant = (
        ((d[..., 0] < 0).astype(jnp.uint32) << 2)
        | ((d[..., 1] < 0).astype(jnp.uint32) << 1)
        | (d[..., 2] < 0).astype(jnp.uint32)
    )
    dead_u = dead.astype(jnp.uint32) << 30

    def morton(bits: int):
        q = jnp.clip(p * float(1 << bits), 0.0, float((1 << bits) - 1))
        q = q.astype(jnp.uint32)
        return (
            (_expand_bits_u32(q[..., 0]) << 2)
            | (_expand_bits_u32(q[..., 1]) << 1)
            | _expand_bits_u32(q[..., 2])
        )

    if _KEY == "d3o21":
        return dead_u | (octant << 21) | morton(7)
    if _KEY == "o15d6":
        dq = jnp.clip((d + 1.0) * 2.0, 0.0, 3.0).astype(jnp.uint32)
        d6 = (dq[..., 0] << 4) | (dq[..., 1] << 2) | dq[..., 2]
        return dead_u | (morton(5) << 6) | d6
    return dead_u | (morton(7) << 3) | octant


def _sort_bands(R: int) -> int:
    """Band count for a flat ray field of R rays: the trace-time band
    context (ops/halo.py) when it divides R into whole packets, else 1
    (global sort — single-chip default)."""
    from .halo import get_bands

    B = get_bands()
    if B > 1 and R % B == 0 and (R // B) % PACKET == 0:
        return B
    return 1


def make_ray_order(bvh: BVH, o, d, dead):
    """(perm, inv) ordering rays by (dead, origin Morton, octant).

    The inverse permutation comes from a SCATTER, not a second sort — a
    full 2M-ray sort costs ~42 ms on v5 lite, the scatter one memory pass.
    The returned order can be REUSED by later traversals whose rays share
    (approximately) the same origins — e.g. the NEE shadow rays spawned at
    the hits of the bounce rays that produced it (SURVEY §5.7 wavefront).

    Under a band context (ops/halo.py, set by the multi-chip sharded
    step) the sort is BAND-LOCAL: (perm, inv) come back as (B, R/B)
    local index arrays, rays only permute within their own row band, and
    the sort + the permuted traversal stay shard-local under SPMD.  The
    sort is perf-only, so any permutation — banded included — is exact."""
    shape = o.shape[:-1]
    R = int(np.prod(shape)) if shape else 1
    keys = ray_sort_keys(
        bvh, o.reshape(R, 3), d.reshape(R, 3), dead.reshape(R)
    )
    B = _sort_bands(R)
    if B > 1:
        Rb = R // B
        iota = jnp.broadcast_to(
            jnp.arange(Rb, dtype=jnp.int32)[None, :], (B, Rb)
        )
        _, perm = jax.lax.sort_key_val(keys.reshape(B, Rb), iota, dimension=1)
        inv = jax.vmap(
            lambda p, i: jnp.zeros((Rb,), jnp.int32).at[p].set(i)
        )(perm, iota)
        return perm, inv
    iota = jnp.arange(R, dtype=jnp.int32)
    _, perm = jax.lax.sort_key_val(keys, iota)
    inv = jnp.zeros(R, jnp.int32).at[perm].set(iota)
    return perm, inv


def _sorted_traverse(fn, bvh: BVH, o, d, t_min, t_max, max_steps: int,
                     order=None):
    _count_rays(jnp.broadcast_to(jnp.asarray(t_min, jnp.float32),
                                 o.shape[:-1]), t_max)
    shape = o.shape[:-1]
    R = 1
    for s in shape:
        R *= s
    o = o.reshape(R, 3)
    d = d.reshape(R, 3)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), shape).reshape(R)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape).reshape(R)
    if order is None:
        order = make_ray_order(bvh, o, d, dead=t_max < t_min)
    perm, inv = order
    if perm.ndim == 2:
        # banded order: vmap the whole permute→walk→restore over the band
        # axis.  Every gather/scatter/sort inside becomes a BATCHED op
        # whose batch dim is the row-shard axis, so XLA partitions the
        # entire traversal shard-locally (no resharding of ray state).
        B, Rb = perm.shape

        def band(o1, d1, tn1, tx1, p1, i1):
            out = fn(bvh, o1[p1], d1[p1], tn1[p1], tx1[p1],
                     max_steps=max_steps)
            if isinstance(out, HitRecord):
                return HitRecord(*[a[i1] for a in out])
            return out[i1]

        out = jax.vmap(band)(
            o.reshape(B, Rb, 3), d.reshape(B, Rb, 3),
            t_min.reshape(B, Rb), t_max.reshape(B, Rb), perm, inv,
        )
        if isinstance(out, HitRecord):
            return HitRecord(*[a.reshape(shape) for a in out])
        return out.reshape(shape)
    out = fn(
        bvh, o[perm], d[perm], t_min[perm], t_max[perm], max_steps=max_steps
    )
    if isinstance(out, HitRecord):
        return HitRecord(*[a[inv].reshape(shape) for a in out])
    return out[inv].reshape(shape)


def closest_hit_sorted(bvh: BVH, o, d, t_min, t_max, max_steps: int = 100_000,
                       order=None):
    """Closest hit for incoherent (bounce) ray fields of any shape: sorts by
    (dead, origin Morton, octant), traverses, restores order.  Pass `order`
    from make_ray_order to skip the sort (reuse across same-origin waves)."""
    return _sorted_traverse(
        closest_hit, bvh, o, d, t_min, t_max, max_steps, order
    )


def any_hit_sorted(bvh: BVH, o, d, t_min, t_max, max_steps: int = 100_000,
                   order=None):
    """Occlusion query for incoherent (shadow) ray fields of any shape."""
    return _sorted_traverse(
        any_hit, bvh, o, d, t_min, t_max, max_steps, order
    )
