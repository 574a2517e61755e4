"""Fused MXU leaf drain: per-leaf Moller-Trumbore coefficient blocks are
DMA'd HBM->VMEM by leaf id and the segmented per-sub-packet fold runs
INSIDE the kernel — the round-3 follow-up to ops/bvh_mxu.py.

Why (measured traffic model, docs/PERF_NOTES.md): with ops/bvh_mxu.py the
drain still materializes per-EVENT tensors in HBM every chunk — the
gathered leaf rows (CE, n*12), the built coefficient matrices
(CE, 4n, K) and feature stacks (CE, K, 128) the kernel then re-reads —
and runs a 5-pass segmented prefix-min scan over (CE, 128) x 4 channels
in XLA.  All of that is removable:

- The MT coefficient matrix of a leaf depends ONLY on its triangles, so
  it is built ONCE at BVH build time (host, numpy) as a static
  (L, K, 4n) table (f32 or bf16 per EIDOLA_CMAT; bf16 on TPU).  The
  kernel double-buffers per-event blocks of it (8 KB bf16 / 16 KB f32 at
  n=64) straight HBM->VMEM by (scalar-prefetched) leaf id: per event the
  chip reads the coefficients exactly once and writes nothing.
- The feature stack [o', d, o'xd, 1] is assembled in VMEM from the
  already-gathered per-event ray rows.
- The TPU grid is sequential, so the per-sub-packet fold is a running
  carry in VMEM scratch: each event merges its (4n x 16) @ (16 x 128)
  MXU result into the carry (reset at segment starts, seeded with the
  carried-in best t so the MT test also prunes against it), and the
  output rows hold the per-row prefix fold — exactly what the XLA scan
  produced, so the caller's run-end scatter is unchanged and the scan is
  deleted.

Replaces the leaf-intersection half of shaders/traceray_rq.glsl:108-147;
ops/bvh._mt_cols stays the portable oracle (EIDOLA_MT=cols) and
ops/bvh_mxu.py the previous default (EIDOLA_MT=mxu) for A/B.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
# events per grid step (ops/bvh_mxu.py measured 16 optimal; env-tunable
# for A/B since the fused kernel's per-step DMA/compute balance differs)
EB = int(os.environ.get("EIDOLA_FEB", "16"))
KDIM = 16    # feature rows (10 used, padded for sublane tiling)
# MXU pass count for the f32 coefficient dot.  Measured on v5 lite
# (stress 64.5k, 2.07M bounce rays): default 478.6 ms, highest
# (exact-f32 6-pass) 526.4 ms (+10%) — the drain is NOT fully
# DMA-bound, so exactness costs real time.  The single-pass bf16 dot's
# ~0.2% mean hit-t error vs the cols oracle is absorbed by offset_ray
# epsilons and stochastic accumulation (round 2 shipped the same
# profile; golden/estimator tests green), so "default" stays the
# default; set EIDOLA_MT_PREC=highest for bit-accurate traversal A/Bs.
# (Precision.HIGH is not implemented by Pallas-TPU.)  Single source of
# truth is ops/bvh.MT_PREC, frozen at import: _cm_dtype() below keys off
# the same frozen value, so a mid-process env change can never pair a
# bf16 coefficient table with the exact 6-pass dot.
from .bvh import MT_PREC as _MT_PREC_STR

_PREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}[_MT_PREC_STR]
# Coefficient-table storage mode (EIDOLA_CMAT), also frozen at import.
_CMAT = os.environ.get("EIDOLA_CMAT", "auto")
# Coefficient-table storage dtype.  At DEFAULT precision the MXU rounds
# both dot inputs to bf16 anyway (single pass, f32 accumulate), so
# storing the static table in bf16 is numerically the same dot while
# HALVING the dominant HBM stream of the drain (the 16 KB/event cmat DMA
# is ~60% of per-chunk traffic in the PERF_NOTES model) and the
# Bistro-scale table footprint (~700 -> ~350 MB).  "auto" = bf16 on TPU,
# f32 on CPU (interpret-mode tests exact-match the cols oracle, and
# XLA:CPU's DEFAULT-precision dot is exact f32); f32 is forced when
# EIDOLA_MT_PREC=highest (the exact 6-pass dot needs full inputs).


def _cm_dtype():
    """Storage dtype of the static coefficient table — keyed off the
    import-frozen _MT_PREC_STR/_CMAT (tests may monkeypatch the module
    attributes to exercise the bf16 path in interpret mode).  The
    fused-exact any-hit mode (EIDOLA_ANY_EXACT=fused, ops/bvh.py) needs
    full f32 inputs for its HIGHEST 6-pass dot, so it forces f32 too —
    the closest drain's DEFAULT dot rounds them to bf16 on the MXU
    anyway (bit-identical results, table bytes double: measured
    speed-neutral, PERF_NOTES 'bf16 MT coefficient table')."""
    from .bvh import ANY_EXACT as _AE

    if _MT_PREC_STR == "highest":
        return jnp.float32
    if _CMAT == "bf16":
        # explicit override (tests/A-Bs): the drain-site dtype guard in
        # ops/bvh.py sends any-hit to the cols fallback in this pairing
        return jnp.bfloat16
    if _CMAT == "f32" or _AE == "fused":
        return jnp.float32
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def build_leaf_tables_np(blocks: np.ndarray, leaf_size: int):
    """Static per-leaf MT coefficient table, built once at load time.

    blocks: (L, n*12) f32 leaf rows of (v0, e1, e2, pad) per triangle.
    Returns (cmT (L, KDIM, 4n) in _cm_dtype() — f32, or bf16 on TPU at
    DEFAULT MXU precision — anchor (L, 3) f32) where cmT.T rows
    are [det | t_num | u_num | v_num] blocks over the features
    [o'(3), d(3), o'xd(3), 1, 0...], o' = o - anchor (leaf-local
    recentring for f32 conditioning).  Feature order MUST match the
    kernel's in-VMEM stack and ops/bvh_mxu.build_cmat."""
    L = blocks.shape[0]
    n = leaf_size
    tri = blocks.reshape(L, n, 12).astype(np.float32)
    v0 = tri[:, :, 0:3]
    e1 = tri[:, :, 3:6]
    e2 = tri[:, :, 6:9]
    anchor = np.ascontiguousarray(v0[:, 0, :])
    v0c = v0 - anchor[:, None, :]
    nvec = np.cross(e1, e2)
    const_t = -np.sum(v0c * nvec, -1)

    # fill the final (L, K, 4n) layout directly — building the (L, 4n, K)
    # intermediate via concatenate/stack/transpose copies ~9 GB at Bistro
    # scale (measured minutes on one core); this writes each coefficient
    # block once.  Column blocks along 4n: [det | t_num | u_num | v_num].
    cmT = np.zeros((L, KDIM, 4 * n), np.float32)
    b = cmT.reshape(L, KDIM, 4, n)

    def put(rows, block, val):
        # val: (L, n, 3) -> rows (feature slots) x block column
        b[:, rows:rows + 3, block, :] = val.transpose(0, 2, 1)

    put(3, 0, -nvec)                 # det  = -n . d
    put(0, 1, nvec)                  # t    =  n . o' + const
    b[:, 9, 1, :] = const_t
    put(3, 2, np.cross(v0c, e2))     # u    = (v0c x e2) . d + e2 . (o'xd)
    put(6, 2, e2)
    put(3, 3, np.cross(e1, v0c))     # v    = (e1 x v0c) . d - e1 . (o'xd)
    put(6, 3, -e1)
    if _cm_dtype() == jnp.bfloat16:
        # ml_dtypes round-to-nearest-even — same rounding the MXU applies
        # to f32 inputs at DEFAULT precision, so the bf16 table dots
        # bit-identically to the f32 one on TPU
        cmT = cmT.astype(jnp.bfloat16)
    return cmT, anchor.astype(np.float32)


def _kernel(n, prec, row_ref, leaf_ref, sp_ref, valid_ref, cm_hbm,
            opx, opy, opz, dxr, dyr, dzr, tmin_ref, tlim_ref,
            t_out, s_out, u_out, v_out,
            cm_buf, sems, c_t, c_s, c_u, c_v, seg):
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)

    def dma(slot, step, e):
        return pltpu.make_async_copy(
            cm_hbm.at[row_ref[step * EB + e]],
            cm_buf.at[slot, e],
            sems.at[slot, e],
        )

    @pl.when(i == 0)
    def _():
        for e in range(EB):
            dma(0, 0, e).start()
        seg[0] = jnp.int32(-1)

    slot = jax.lax.rem(i, 2)

    @pl.when(i + 1 < nsteps)
    def _():
        nslot = jax.lax.rem(i + 1, 2)
        for e in range(EB):
            dma(nslot, i + 1, e).start()

    for e in range(EB):
        dma(slot, i, e).wait()
        idx = i * EB + e
        cmT = cm_buf[slot, e]                        # (K, 4n)
        ox_, oy_, oz_ = opx[e:e + 1], opy[e:e + 1], opz[e:e + 1]
        dx_, dy_, dz_ = dxr[e:e + 1], dyr[e:e + 1], dzr[e:e + 1]
        cx = oy_ * dz_ - oz_ * dy_
        cy = oz_ * dx_ - ox_ * dz_
        cz = ox_ * dy_ - oy_ * dx_
        one = jnp.ones_like(ox_)
        zero = jnp.zeros_like(ox_)
        fe = jnp.concatenate(
            [ox_, oy_, oz_, dx_, dy_, dz_, cx, cy, cz, one]
            + [zero] * (KDIM - 10),
            axis=0,
        )                                            # (K, 128)
        out = jax.lax.dot_general(
            cmT, fe.astype(cmT.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )                                            # (4n, 128)
        det = out[0 * n:1 * n]
        tn = out[1 * n:2 * n]
        un = out[2 * n:3 * n]
        vn = out[3 * n:4 * n]

        sp_e = sp_ref[idx]
        val = valid_ref[idx] != 0
        prev = seg[0]
        is_new = val & (sp_e != prev)
        tlim = tlim_ref[e:e + 1, :]
        # segment carry: reset to the carried-in best at segment starts
        # (which also tightens the MT bound as the fold proceeds)
        base_t = jnp.where(is_new, tlim, c_t[:])
        base_s = jnp.where(is_new, 0, c_s[:])
        base_u = jnp.where(is_new, 0.0, c_u[:])
        base_v = jnp.where(is_new, 0.0, c_v[:])

        inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        t = tn * inv
        u = un * inv
        v = vn * inv
        tmin = tmin_ref[e:e + 1, :]
        # `t <= base_t` (not < tlim): equivalent hits, and ties against
        # in-chunk earlier events resolve later-wins like the XLA scan
        hit = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > tmin)
            & (t <= base_t)
            & val
        )
        tm = jnp.where(hit, t, _BIG)
        tb = jnp.min(tm, axis=0, keepdims=True)      # (1, 128)
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 0)
        kb = jnp.min(jnp.where(tm <= tb, iota, n), axis=0, keepdims=True)
        onehot = iota == kb
        ub = jnp.sum(jnp.where(onehot, u, 0.0), axis=0, keepdims=True)
        vb = jnp.sum(jnp.where(onehot, v, 0.0), axis=0, keepdims=True)
        slot_vec = leaf_ref[idx] * n + kb            # global padded slot

        better = tb <= base_t                        # per-lane (1, 128)
        new_t = jnp.where(better, tb, base_t)
        new_s = jnp.where(better, slot_vec, base_s)
        new_u = jnp.where(better, ub, base_u)
        new_v = jnp.where(better, vb, base_v)
        c_t[:] = new_t
        c_s[:] = new_s
        c_u[:] = new_u
        c_v[:] = new_v
        t_out[e:e + 1, :] = new_t
        s_out[e:e + 1, :] = new_s
        u_out[e:e + 1, :] = new_u
        v_out[e:e + 1, :] = new_v
        seg[0] = jnp.where(val, sp_e, prev)


def _kernel_any(n, prec, row_ref, sp_ref, valid_ref, cm_hbm,
                opx, opy, opz, dxr, dyr, dzr, tmin_ref, tlim_ref,
                h_out, cm_buf, sems, c_h, seg):
    """Occlusion variant: sign-based boolean MT (no divides — tests
    multiplied through by det/det^2 like ops/bvh._mt_any_cols) with a
    1-channel prefix-OR carry.  `prec` overrides the module default dot
    precision (HIGHEST + f32 table = exact sign tests)."""
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)

    def dma(slot, step, e):
        return pltpu.make_async_copy(
            cm_hbm.at[row_ref[step * EB + e]],
            cm_buf.at[slot, e],
            sems.at[slot, e],
        )

    @pl.when(i == 0)
    def _():
        for e in range(EB):
            dma(0, 0, e).start()
        seg[0] = jnp.int32(-1)

    slot = jax.lax.rem(i, 2)

    @pl.when(i + 1 < nsteps)
    def _():
        nslot = jax.lax.rem(i + 1, 2)
        for e in range(EB):
            dma(nslot, i + 1, e).start()

    for e in range(EB):
        dma(slot, i, e).wait()
        idx = i * EB + e
        cmT = cm_buf[slot, e]                        # (K, 4n)
        ox_, oy_, oz_ = opx[e:e + 1], opy[e:e + 1], opz[e:e + 1]
        dx_, dy_, dz_ = dxr[e:e + 1], dyr[e:e + 1], dzr[e:e + 1]
        cx = oy_ * dz_ - oz_ * dy_
        cy = oz_ * dx_ - ox_ * dz_
        cz = ox_ * dy_ - oy_ * dx_
        one = jnp.ones_like(ox_)
        zero = jnp.zeros_like(ox_)
        fe = jnp.concatenate(
            [ox_, oy_, oz_, dx_, dy_, dz_, cx, cy, cz, one]
            + [zero] * (KDIM - 10),
            axis=0,
        )
        out = jax.lax.dot_general(
            cmT, fe.astype(cmT.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        det = out[0 * n:1 * n]
        tn = out[1 * n:2 * n]
        un = out[2 * n:3 * n]
        vn = out[3 * n:4 * n]

        sp_e = sp_ref[idx]
        val = valid_ref[idx] != 0
        prev = seg[0]
        is_new = val & (sp_e != prev)
        base_h = jnp.where(is_new, 0, c_h[:])

        det2 = det * det
        ud = un * det
        vd = vn * det
        td = tn * det
        tmin = tmin_ref[e:e + 1, :]
        tlim = tlim_ref[e:e + 1, :]
        h = (
            (jnp.abs(det) > 1e-12)
            & (ud >= 0.0)
            & (vd >= 0.0)
            & (ud + vd <= det2)
            & (td > tmin * det2)
            & (td < tlim * det2)
            & val
        )
        hit = jnp.max(h.astype(jnp.int32), axis=0, keepdims=True)  # (1,128)
        new_h = base_h | hit
        c_h[:] = new_h
        h_out[e:e + 1, :] = new_h
        seg[0] = jnp.where(val, sp_e, prev)


def mt_any_fused(cm_tab, anchor_row, dma_row, sp, valid,
                 gox, goy, goz, gdx, gdy, gdz, gtmin, gtb, n_tris: int,
                 prec=None):
    """Occlusion drain: returns per-row PREFIX-OR'd hit flags (CE, 128)
    i32 — run-end rows hold each sub-packet's chunk OR.  prec=HIGHEST
    (with an f32 cm_tab) makes the sign tests f32-exact while closest
    drains keep the module-default dot."""
    if prec is None:
        prec = _PREC
    ce = gox.shape[0]
    lanes = gox.shape[1]
    assert ce % EB == 0, ce
    opx = gox - anchor_row[:, 0:1]
    opy = goy - anchor_row[:, 1:2]
    opz = goz - anchor_row[:, 2:3]

    bs = lambda: pl.BlockSpec(
        (EB, lanes), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ce // EB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [bs() for _ in range(8)],
        out_specs=[bs()],
        scratch_shapes=[
            pltpu.VMEM((2, EB, KDIM, 4 * n_tris), cm_tab.dtype),
            pltpu.SemaphoreType.DMA((2, EB)),
            pltpu.VMEM((1, lanes), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    (h,) = pl.pallas_call(
        functools.partial(_kernel_any, n_tris, prec),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ce, lanes), jnp.int32)],
        interpret=jax.default_backend() == "cpu",
    )(
        dma_row.astype(jnp.int32), sp.astype(jnp.int32),
        valid.astype(jnp.int32),
        cm_tab, opx, opy, opz, gdx, gdy, gdz, gtmin, gtb,
    )
    return h


def mt_fused(cm_tab, anchor_row, dma_row, gleaf, sp, valid,
             gox, goy, goz, gdx, gdy, gdz, gtmin, gtb, n_tris: int,
             prec=None):
    """Per-chunk fused drain.  cm_tab: (L, KDIM, 4n) static table;
    anchor_row: (CE, 3) gathered anchors; dma_row/gleaf/sp/valid: (CE,)
    i32 (DMA row, global leaf id, sub-packet id, validity); rays/bounds:
    (CE, 128) with rays in the leaf's intersection space.  Returns
    per-row PREFIX-FOLDED (t, global slot, u, v) — run-end rows hold each
    sub-packet's chunk best, exactly like the XLA scan's output."""
    if prec is None:
        prec = _PREC
    ce = gox.shape[0]
    lanes = gox.shape[1]
    assert ce % EB == 0, ce
    assert cm_tab.shape[1] == KDIM and cm_tab.shape[2] == 4 * n_tris

    # leaf-local recentring fuses into the existing ray gathers
    opx = gox - anchor_row[:, 0:1]
    opy = goy - anchor_row[:, 1:2]
    opz = goz - anchor_row[:, 2:3]

    bs = lambda: pl.BlockSpec(
        (EB, lanes), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ce // EB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [bs() for _ in range(8)],
        out_specs=[bs() for _ in range(4)],
        scratch_shapes=[
            pltpu.VMEM((2, EB, KDIM, 4 * n_tris), cm_tab.dtype),
            pltpu.SemaphoreType.DMA((2, EB)),
            pltpu.VMEM((1, lanes), jnp.float32),
            pltpu.VMEM((1, lanes), jnp.int32),
            pltpu.VMEM((1, lanes), jnp.float32),
            pltpu.VMEM((1, lanes), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((ce, lanes), jnp.float32),
        jax.ShapeDtypeStruct((ce, lanes), jnp.int32),
        jax.ShapeDtypeStruct((ce, lanes), jnp.float32),
        jax.ShapeDtypeStruct((ce, lanes), jnp.float32),
    ]
    return pl.pallas_call(
        functools.partial(_kernel, n_tris, prec),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=jax.default_backend() == "cpu",
    )(
        dma_row.astype(jnp.int32), gleaf.astype(jnp.int32),
        sp.astype(jnp.int32), valid.astype(jnp.int32),
        cm_tab, opx, opy, opz, gdx, gdy, gdz, gtmin, gtb,
    )
