"""MXU leaf intersection: the drain's Moller-Trumbore as a fused Pallas
kernel (dot + epilogue + tri-reduce entirely in VMEM).

Motivation (docs/PERF_NOTES.md round 3): MT's four determinant forms are
linear in 10 ray features, so a leaf block is one (4n x 16) @ (16 x 128)
matmul per event — systolic-array work.  The pure-XLA version of this
(`EIDOLA_MT=matmul`, ops/bvh.py _mt_matmul) LOSES because XLA materializes
the (CE, 128, 4n) intermediate to HBM (~0.5 GB per chunk).  Here the
matmul output lives only in VMEM: the kernel reduces it to the per-lane
best (t, slot, u, v) before anything is written back.

Replaces shaders/traceray_rq.glsl:108-147 leaf intersection (with
ops/bvh._mt_cols as the portable fallback).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
EB = 16         # events per grid step (measured optimum; 8 pays grid overhead)
KDIM = 16       # feature rows (10 used, padded for sublane tiling)
# MT dot precision knob — single source of truth is ops/bvh.MT_PREC
# (see ops/bvh_fused._PREC for measured costs: exact f32 is +10% on
# bounce — single-pass bf16 stays the default)
from .bvh import MT_PREC as _MT_PREC_STR

_PREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}[_MT_PREC_STR]


def build_cmat(row, n_tris):
    """Per-event MT coefficient matrix from the gathered leaf rows.

    row: (CE, n_tris*12) f32 (v0, e1, e2, pad per tri).  Returns
    (cmat (CE, 4*n_tris, KDIM) f32, anchor (CE, 3)) where the rows are
    [det block | t_num block | u_num block | v_num block] over the
    features [o'(3), d(3), o'xd(3), 1, 0...] and o' = o - anchor
    (leaf-local recentring for f32 conditioning)."""
    ce = row.shape[0]
    tri = row.reshape(ce, n_tris, 12)
    v0 = tri[:, :, 0:3]
    e1 = tri[:, :, 3:6]
    e2 = tri[:, :, 6:9]
    anchor = v0[:, 0, :]
    v0c = v0 - anchor[:, None, :]
    nvec = jnp.cross(e1, e2)

    z3 = jnp.zeros_like(nvec)
    z1 = jnp.zeros_like(nvec[..., :1])
    pad = jnp.zeros(nvec.shape[:-1] + (KDIM - 10,), jnp.float32)
    const_t = -jnp.sum(v0c * nvec, -1, keepdims=True)
    c_det = jnp.concatenate([z3, -nvec, z3, z1, pad], -1)
    c_t = jnp.concatenate([nvec, z3, z3, const_t, pad], -1)
    c_u = jnp.concatenate([z3, jnp.cross(v0c, e2), e2, z1, pad], -1)
    c_v = jnp.concatenate([z3, jnp.cross(e1, v0c), -e1, z1, pad], -1)
    cmat = jnp.stack([c_det, c_t, c_u, c_v], 1)      # (CE, 4, n, K)
    return cmat.reshape(ce, 4 * n_tris, KDIM), anchor


def build_feats(anchor, ox, oy, oz, dx, dy, dz):
    """(CE, KDIM, LANES) feature stack [o', d, o'xd, 1, 0...]."""
    oxp = ox - anchor[:, 0:1]
    oyp = oy - anchor[:, 1:2]
    ozp = oz - anchor[:, 2:3]
    cx = oyp * dz - ozp * dy
    cy = ozp * dx - oxp * dz
    cz = oxp * dy - oyp * dx
    one = jnp.ones_like(ox)
    zero = jnp.zeros_like(ox)
    rows = [oxp, oyp, ozp, dx, dy, dz, cx, cy, cz, one]
    rows += [zero] * (KDIM - len(rows))
    return jnp.stack(rows, 1)                        # (CE, K, LANES)


def _kernel(n_tris, cm_ref, f_ref, tmin_ref, tlim_ref,
            t_ref, k_ref, u_ref, v_ref):
    n = n_tris
    for e in range(EB):
        cm = cm_ref[e]                               # (4n, K)
        fe = f_ref[e]                                # (K, 128)
        out = jax.lax.dot_general(
            cm, fe, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_PREC,
        )                                            # (4n, 128)
        det = out[0 * n:1 * n]
        tn = out[1 * n:2 * n]
        un = out[2 * n:3 * n]
        vn = out[3 * n:4 * n]
        inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        t = tn * inv
        u = un * inv
        v = vn * inv
        tmin = tmin_ref[e:e + 1, :]                  # (1, 128)
        tlim = tlim_ref[e:e + 1, :]
        hit = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > tmin)
            & (t < tlim)
        )
        tm = jnp.where(hit, t, _BIG)
        tb = jnp.min(tm, axis=0, keepdims=True)      # (1, 128)
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 0)
        # first index achieving the min (ties -> lowest slot, like the
        # unrolled progressive compare)
        kb = jnp.min(jnp.where(tm <= tb, iota, n), axis=0, keepdims=True)
        onehot = iota == kb
        ub = jnp.sum(jnp.where(onehot, u, 0.0), axis=0, keepdims=True)
        vb = jnp.sum(jnp.where(onehot, v, 0.0), axis=0, keepdims=True)
        miss = tb >= _BIG
        t_ref[e:e + 1, :] = tb
        k_ref[e:e + 1, :] = jnp.where(miss, 0, kb)
        u_ref[e:e + 1, :] = jnp.where(miss, 0.0, ub)
        v_ref[e:e + 1, :] = jnp.where(miss, 0.0, vb)


@functools.partial(jax.jit, static_argnames=("n_tris",))
def mt_mxu(row, n_tris, ox, oy, oz, dx, dy, dz, t_min, t_lim):
    """Drop-in for ops/bvh._mt_cols on (CE, 128)-shaped event chunks.

    row: (CE, n_tris*12); rays/t bounds: (CE, 128).  CE must be a
    multiple of EB.  Returns per-lane best (t, slot k, u, v), t = _BIG
    on miss."""
    ce = row.shape[0]
    assert ce % EB == 0, ce
    lanes = ox.shape[1]
    cmat, anchor = build_cmat(row, n_tris)
    feats = build_feats(anchor, ox, oy, oz, dx, dy, dz)

    grid = (ce // EB,)
    bs = lambda shp: pl.BlockSpec(
        shp, lambda i: (i,) + (0,) * (len(shp) - 1),
        memory_space=pltpu.VMEM,
    )
    out_shape = [
        jax.ShapeDtypeStruct((ce, lanes), jnp.float32),
        jax.ShapeDtypeStruct((ce, lanes), jnp.int32),
        jax.ShapeDtypeStruct((ce, lanes), jnp.float32),
        jax.ShapeDtypeStruct((ce, lanes), jnp.float32),
    ]
    t, k, u, v = pl.pallas_call(
        functools.partial(_kernel, n_tris),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            bs((EB, 4 * n_tris, KDIM)),
            bs((EB, KDIM, lanes)),
            bs((EB, lanes)),
            bs((EB, lanes)),
        ],
        out_specs=[bs((EB, lanes))] * 4,
        interpret=jax.default_backend() == "cpu",
    )(cmat, feats, t_min, t_lim)
    return t, k, u, v
