"""Ray-AABB and ray-triangle intersection primitives.

TPU-native replacement for the hardware ray-query intersector the reference
leans on (ref shaders/traceray_rq.glsl:108-147).  Everything is branch-free
vectorized jnp over a flat ray stream so it maps onto 8x128 VPU lanes.
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import dot3

_HUGE = 1e30


def safe_inv_dir(d, eps: float = 1e-12):
    """Reciprocal direction with zero-component protection for slab tests."""
    s = jnp.where(d >= 0.0, 1.0, -1.0)
    return s / jnp.maximum(jnp.abs(d), eps)


def ray_aabb(o, inv_d, t_min, t_max, bmin, bmax):
    """Slab test.  All args broadcast; returns hit mask.

    o, inv_d: (..., 3); bmin/bmax: (..., 3); t_min/t_max: (...,).
    """
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (t_near <= t_far) & (t_far >= t_min) & (t_near <= t_max)
    return hit, t_near


def ray_triangle(o, d, v0, e1, e2, t_min, t_max):
    """Moller-Trumbore with precomputed edges e1 = v1-v0, e2 = v2-v0.

    Returns (hit, t, u, v).  Degenerate (zero-edge) padding triangles never
    hit.  Double-sided: the reference disables backface culling for
    double-sided materials (accelstruct.cpp:150-156); we intersect both sides
    and let shading flip the normal (shade_state.glsl behaviour).
    """
    pvec = jnp.cross(d, e2)
    det = dot3(e1, pvec)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o - v0
    u = dot3(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = dot3(d, qvec) * inv_det
    t = dot3(e2, qvec) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return hit, jnp.where(hit, t, _HUGE), u, v


def brute_force_closest(o, d, v0, e1, e2, t_min, t_max):
    """O(R*T) closest-hit oracle for testing the BVH (SURVEY build plan 7.2.3).

    o, d: (R, 3); v0/e1/e2: (T, 3).  Returns (tri_id, t, u, v); tri_id = -1
    on miss.
    """
    ob = o[:, None, :]
    db = d[:, None, :]
    hit, t, u, v = ray_triangle(
        ob, db, v0[None], e1[None], e2[None], t_min[:, None], t_max[:, None]
    )
    t = jnp.where(hit, t, _HUGE)
    best = jnp.argmin(t, axis=1)
    r = jnp.arange(o.shape[0])
    best_t = t[r, best]
    found = best_t < _HUGE * 0.5
    return (
        jnp.where(found, best, -1),
        jnp.where(found, best_t, _HUGE),
        u[r, best],
        v[r, best],
    )
