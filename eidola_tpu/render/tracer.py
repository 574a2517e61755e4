"""Wavefront unidirectional path tracer: NEE + MIS power heuristic + Russian
roulette (ref shaders/indirect_stage.comp:129-226 pathTraceIndirect and the
direct-stage shading path).

This is the estimator core.  The standalone `trace_radiance` renders
ground-truth images (used for golden tests and as the oracle for the ReSTIR
stages); the indirect GI stage drives the same per-bounce machinery from
G-buffer-reconstructed first hits.

TPU shape: the bounce loop is a static python loop (max_depth is compile
time); every lane stays resident — terminated lanes are masked, not
compacted (compaction is a later optimization; SURVEY §5.7 wavefront note).
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import rng as erng
from ..ops.packets import (
    any_hit_img, any_hit_sorted, closest_hit_img, closest_hit_sorted,
    make_ray_order,
)
from ..ops.math import (
    dot3,
    make_frame,
    offset_ray,
    power_heuristic,
    to_local,
    to_world,
)
from ..scene.data import SceneData
from .bsdf import eval_bsdf, pdf_bsdf, sample_bsdf
from .config import RenderConfig, RenderParams
from .pathtrace import (
    env_pdf_dir,
    env_radiance,
    env_selection_prob,
    light_pdf_for_bsdf_dir,
    sample_direct_light,
)
from .shade_state import State, get_state

_TMIN = 1e-4
_TMAX = 1e8


def _surface_opacity(scene: SceneData, tri, u, v):
    """Opacity at a hit: base-color alpha factor x base texture alpha
    (the cheap subset of GetMaterials the alpha test needs,
    ref traceray_rq.glsl:58-80)."""
    from ..scene.data import shade_row
    from ..scene.textures import sample_bilinear

    t, _ = shade_row(scene, jnp.maximum(tri, 0))
    uvs = scene.tri_uv[t]                       # (..., 3, 2)
    w0 = (1.0 - u - v)[..., None]
    uv = uvs[..., 0, :] * w0 + uvs[..., 1, :] * u[..., None] \
        + uvs[..., 2, :] * v[..., None]
    mat = scene.tri_mat[t]
    base_a = scene.materials.base_color[mat][..., 3]
    tex_a = sample_bilinear(
        scene.textures, scene.materials.base_tex[mat], uv
    )[..., 3]
    return base_a * tex_a


def _alpha_passthrough(scene: SceneData, rec, rng_state):
    """Which hits the alpha test rejects (ray continues past them):
    MASK -> opacity < cutoff; BLEND -> stochastic rand >= opacity
    (ref traceray_rq.glsl:87-101)."""
    from ..scene.data import ALPHA_BLEND, ALPHA_MASK, shade_row

    mat = scene.tri_mat[shade_row(scene, jnp.maximum(rec.tri, 0))[0]]
    am = scene.materials.alpha_mode[mat]
    opac = _surface_opacity(scene, rec.tri, rec.u, rec.v)
    rng_state, uu = erng.rand(rng_state)
    cutoff = scene.materials.alpha_cutoff[mat]
    passthrough = (rec.tri >= 0) & (
        ((am == ALPHA_MASK) & (opac < cutoff))
        | ((am == ALPHA_BLEND) & (uu >= opac))
    )
    return rng_state, passthrough


def _merge_closest(a, b):
    """Nearer of two hit records (miss t is _BIG, so min-t works)."""
    take_b = (b.tri >= 0) & ((a.tri < 0) | (b.t < a.t))
    return type(a)(*[jnp.where(take_b, y, x) for x, y in zip(a, b)])


def _alpha_march(scene: SceneData, hop_bvh, o, d, a_tmax, rec0, rng_state,
                 budget: int, max_steps: int, occl: bool):
    """HitTest hop loop on a COMPACTED queue (round 4).

    The lockstep hop loop re-ran full-width passes per hop — sort, ray
    gathers, the alpha texture test — even though only the small
    passthrough set is live, and the measured cost was ~1 s per hop at 2M
    rays REGARDLESS of live count (docs/PERF_NOTES.md round-4 alpha
    attribution).  Here the candidate set (rays whose current record is an
    untested alpha-BVH hit) is compacted into a C-ray queue each
    iteration; the alpha test AND the re-trace run at C width, so hop
    cost scales with the rays that actually hit foliage, like the
    reference paying its anyhit shader only at alpha hits
    (traceray_rq.glsl:87-101).

    Per-ray semantics are identical to the lockstep loop (test -> re-trace
    from just past the hit, up to `budget` rounds); only the BLEND rng
    stream differs (rng is consumed per queued test, not per lane per
    hop).  occl=True counts `budget` TESTS (a failed test = occluded) and
    re-traces while tests remain; occl=False counts `budget` RE-TRACES
    and the final re-trace's hit may stand untested, exactly like the
    lockstep loop's last iteration.

    Under a multi-chip band context (ops/halo.py) the march runs
    BAND-LOCALLY: all state is reshaped to (B, R/B) and the whole
    select→test→re-trace loop is vmapped over the band axis, so the
    compaction (per-band nonzero), the queue gathers/scatters and the
    re-trace all carry the row-shard axis as a batch dim and SPMD keeps
    every pass shard-local — no cross-shard argsort (round 5; the round-4
    fallback forced the width-proportional lockstep loop under bands).

    Returns (rng_state, rec, occluded) shaped like rec0.
    """
    import numpy as _np

    from ..ops.halo import get_bands

    shape = rec0.t.shape
    R = int(_np.prod(shape))
    B = get_bands()
    if not (B > 1 and R % B == 0 and (R // B) % 128 == 0):
        B = 1
    Rl = R // B
    # queue capacity: ~R/EIDOLA_MARCH_DIV rounded to packets; overflow =
    # another lap.  DIV=16 + MARCH_MIN=8192 is the measured v5-lite
    # optimum of the staged-capacity sweep (PERF_NOTES round 5: full
    # trace 767->737 / 890->816 ms vs DIV=8, and DIV=6's one-big-lap
    # loses): laps ride the live count down instead of paying R/8 width.
    div = int(os.environ.get("EIDOLA_MARCH_DIV", "16"))
    frac = -(-Rl // div)
    C = int(min(Rl, max(32768 // B if B > 1 else 32768,
                        -(-frac // 128) * 128)))

    def flat(a):
        return a.reshape((R,) + a.shape[len(shape):])

    o_f, d_f = flat(o), flat(d)
    tmax_f = jnp.broadcast_to(
        jnp.asarray(a_tmax, jnp.float32), shape).reshape(R)
    rec = type(rec0)(*[flat(x) for x in rec0])
    rng_f = flat(rng_state)
    pending0 = rec.tri >= 0
    if not occl and budget <= 0:
        pending0 = jnp.zeros_like(pending0)

    # queue selection: nonzero (prefix-sum compaction, O(R), default) vs
    # argsort (bitonic O(R log^2 R)); both produce the same lanes in the
    # same index order.  nonzero's fill lanes index R = one-past-the-end:
    # gathers clamp (masked by `valid`), scatters use mode="drop".
    sel_mode = os.environ.get("EIDOLA_MARCH_SEL", "nonzero")

    def march(o_f, d_f, tmax_f, rec, rng_f, pending):
        """The hop loop over one (band-local) flat ray set of Rl rays.

        STAGED CAPACITIES (round 5): one full-width trace attribution
        (tools/alpha_ab.py --full, PERF_NOTES round 5) put ~640-700 ms of
        a 1.1-1.3 s trace in this loop — every lap re-paid the full
        C = R/8 queue width while the live count collapses geometrically
        after the first test (requeue fractions are small).  Like the
        walk's staged compaction, the lap runs at capacity C while the
        pending count exceeds C/4, then at C/4, then C/16: per-lap cost
        tracks the rays that still need hops.  Results are identical —
        selection order and per-ray hop sequences don't change, only how
        many fill lanes ride along."""
        iota = jnp.arange(Rl, dtype=jnp.int32)
        bleft = jnp.where(pending, jnp.int32(budget), 0)
        occluded = jnp.zeros((Rl,), bool)

        caps = [C]
        cmin = min(C, max(2048, int(
            os.environ.get("EIDOLA_MARCH_MIN", "8192")) // B))
        while caps[-1] > cmin and len(caps) < 3:
            caps.append(max(-(-(caps[-1] // 4) // 128) * 128, cmin))

        def make_body(cap):
            def body(c):
                pending, rec, rng_f, occluded, bleft = c
                if sel_mode == "nonzero":
                    cnt = jnp.sum(pending, dtype=jnp.int32)
                    sel = jnp.nonzero(pending, size=cap, fill_value=Rl)[0]
                    valid = jnp.arange(cap, dtype=jnp.int32) < cnt
                else:
                    key = jnp.where(pending, iota, jnp.int32(Rl))
                    sel = jnp.argsort(key)[:cap]
                    valid = pending[sel]
                rec_sel = type(rec)(*[x[sel] for x in rec])
                rng_new, pt = _alpha_passthrough(scene, rec_sel, rng_f[sel])
                pt = pt & valid
                b_sel = bleft[sel]
                if occl:
                    b_sel = b_sel - valid.astype(jnp.int32)  # test consumed
                    occ_new = valid & ~pt                # solid hit occludes
                    go = pt & (b_sel > 0)
                else:
                    occ_new = jnp.zeros_like(valid)
                    go = pt                              # entry => b_sel > 0
                    b_sel = b_sel - go.astype(jnp.int32)  # re-trace consumed
                tn = jnp.where(go, rec_sel.t * (1.0 + 1e-4) + 1e-5, 1.0)
                tx = jnp.where(go, tmax_f[sel], -1.0)
                rec2 = closest_hit_sorted(
                    hop_bvh, o_f[sel], d_f[sel], tn, tx, max_steps=max_steps
                )
                rec_out = type(rec)(*[
                    jnp.where(go, y, x) for x, y in zip(rec_sel, rec2)
                ])
                requeue = go & (rec2.tri >= 0) & (occl | (b_sel > 0))
                rec = type(rec)(*[
                    x.at[sel].set(jnp.where(valid, y, x[sel]), mode="drop")
                    for x, y in zip(rec, rec_out)
                ])
                rng_f = rng_f.at[sel].set(
                    jnp.where(valid, rng_new, rng_f[sel]), mode="drop")
                pending = pending.at[sel].set(
                    jnp.where(valid, requeue, pending[sel]), mode="drop")
                occluded = occluded.at[sel].set(
                    occluded[sel] | occ_new, mode="drop")
                bleft = bleft.at[sel].set(
                    jnp.where(valid, b_sel, bleft[sel]), mode="drop")
                return pending, rec, rng_f, occluded, bleft
            return body

        state = (pending, rec, rng_f, occluded, bleft)
        for k, cap in enumerate(caps):
            nxt = caps[k + 1] if k + 1 < len(caps) else 0

            def cond(c, _n=jnp.int32(nxt)):
                return jnp.sum(c[0], dtype=jnp.int32) > _n

            state = jax.lax.while_loop(cond, make_body(cap), state)
        pending, rec, rng_f, occluded, _ = state
        return rec, rng_f, occluded

    if B > 1:
        bander = lambda a: a.reshape((B, Rl) + a.shape[1:])
        rec, rng_f, occluded = jax.vmap(march)(
            bander(o_f), bander(d_f), bander(tmax_f),
            type(rec)(*[bander(x) for x in rec]),
            bander(rng_f), bander(pending0),
        )
    else:
        rec, rng_f, occluded = march(o_f, d_f, tmax_f, rec, rng_f, pending0)
    rec = type(rec)(*[x.reshape(shape) for x in rec])
    return rng_f.reshape(shape), rec, occluded.reshape(shape)


def _reach_boxes(boxes, o, d, t_min, t_max):
    """Conservative segment-vs-cover test: does [t_min, t_max] of ray
    (o, d) intersect ANY box of a frontier cover (collect_frontier)?  The
    cover contains all of the tree's geometry, so False provably means the
    ray cannot hit anything in that tree.  boxes: (K, 6); K is small
    (EIDOLA_CULL_K), statically unrolled — ~20 VPU ops per box on the ray
    field, fused by XLA into one elementwise pass."""
    shape = jnp.broadcast_shapes(
        o.shape[:-1],
        jnp.shape(t_min) if jnp.ndim(t_min) else (),
        jnp.shape(t_max) if jnp.ndim(t_max) else (),
    )
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), shape)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape)
    inv = jnp.where(d >= 0.0, 1.0, -1.0) / jnp.maximum(jnp.abs(d), 1e-12)
    reach = jnp.zeros(shape, bool)
    for k in range(boxes.shape[0]):
        b = boxes[k]
        t0 = (b[0:3] - o) * inv
        t1 = (b[3:6] - o) * inv
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        reach = reach | ((tn <= tf) & (tf >= t_min) & (tn <= t_max))
    return reach


def _alpha_cull_on(hop_bvh) -> bool:
    """Pre-cull rays against the alpha tree's cover before the mandatory
    full-width closest-hit (EIDOLA_ALPHA_CULL=1).  Culled rays get
    t_max < t_min AND a fresh dead-clustered sort, so their packets retire
    in one step.  MEASURED LOSS on bistro_standin primaries (v5 lite,
    round 5): 354->411 ms instanced / 300->339 ms flat — the K=64 cover
    only rules out ~40% of rays and the opaque-hit t_max bound already
    retires those packets near the root, so the fresh sort (+~42 ms) and
    the reach test buy nothing.  Kept opt-in for scenes whose alpha set is
    spatially concentrated (where reach would be ~10%)."""
    if getattr(hop_bvh, "cull_boxes", None) is None:
        return False
    return os.environ.get("EIDOLA_ALPHA_CULL", "0") == "1"


def _march_mode() -> str:
    """auto (default: queue on TPU, lockstep on CPU) | queue | lockstep.
    Under a multi-chip band context (ops/halo.py) the queue march runs
    band-locally (vmapped over the row-shard axis, see _alpha_march), so
    it no longer needs the round-4 lockstep fallback.  On CPU the march's
    nested while_loop blows XLA:CPU compile time past the slow-compile
    alarm (same economics as EIDOLA_COMPACT=auto), and the
    width-proportional cost it removes is a TPU phenomenon — so auto
    keeps the lockstep loop there."""
    mode = os.environ.get("EIDOLA_ALPHA_MARCH", "auto")
    if mode == "auto":
        return "queue" if jax.default_backend() != "cpu" else "lockstep"
    return mode


def trace_closest(cfg: RenderConfig, scene: SceneData, o, d, t_min, t_max,
                  rng_state, coherent: bool = False, order=None):
    """Closest-hit with the HitTest alpha loop (ref traceray_rq.glsl
    ClosestHit): transparent hits re-trace from just past the hit, up to
    cfg.alpha_hops times.  Statically free when cfg.alpha_geometry is off.
    `order` (from ops.packets.make_ray_order) skips the wavefront sort —
    reuse it for waves sharing origins.  Returns (rng_state, HitRecord).

    Split scenes (scene.bvh_alpha): the opaque bulk is traversed ONCE; the
    hop loop runs only inside the small alpha BVH with t bounded by the
    opaque hit — the TPU analog of the reference paying anyhit shaders
    only on non-opaque geometry (traceray_rq.glsl gl_RayFlagsOpaque)."""
    def closest(bvh, tn, tx):
        if coherent and o.ndim == 3:
            return closest_hit_img(
                bvh, o, d, tn, tx, max_steps=cfg.traversal_max_steps
            )
        return closest_hit_sorted(
            bvh, o, d, tn, tx,
            max_steps=cfg.traversal_max_steps, order=order,
        )

    rec = closest(scene.bvh, t_min, t_max)
    if not cfg.alpha_geometry:
        if scene.bvh_alpha is not None:
            # alpha geometry treated as OPAQUE when the HitTest loop is
            # statically off (ref: rays without the anyhit flag): merge
            # the alpha half's plain closest hit, no hops
            rec = _merge_closest(rec, closest(scene.bvh_alpha, t_min, t_max))
        return rng_state, rec
    split = scene.bvh_alpha is not None
    hop_bvh = scene.bvh_alpha if split else scene.bvh
    if split:
        # alpha closest, bounded by the opaque hit (rec.t is _BIG on miss)
        a_tmax = jnp.minimum(
            jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), rec.t.shape),
            rec.t,
        )
        if _alpha_cull_on(hop_bvh):
            # rays whose bounded segment misses the alpha cover can't hit
            # alpha geometry: kill them (t_max < t_min) and sort dead-first
            # so their packets retire in one step
            reach = _reach_boxes(hop_bvh.cull_boxes, o, d, t_min, a_tmax)
            a_tmax = jnp.where(reach, a_tmax, -1.0)
            order_a = make_ray_order(hop_bvh, o, d, dead=~reach)
            rec_a = closest_hit_sorted(
                hop_bvh, o, d, t_min, a_tmax,
                max_steps=cfg.traversal_max_steps, order=order_a,
            )
        else:
            rec_a = closest(scene.bvh_alpha, t_min, a_tmax)
    else:
        a_tmax = t_max
        rec_a = rec
    if _march_mode() == "queue":
        rng_state, rec_a, _ = _alpha_march(
            scene, hop_bvh, o, d, a_tmax, rec_a, rng_state,
            budget=cfg.alpha_hops, max_steps=cfg.traversal_max_steps,
            occl=False,
        )
    else:
        for _ in range(cfg.alpha_hops):
            rng_state, passthrough = _alpha_passthrough(
                scene, rec_a, rng_state)
            new_tmin = rec_a.t * (1.0 + 1e-4) + 1e-5
            rec2 = closest_hit_sorted(
                hop_bvh, o, d,
                jnp.where(passthrough, new_tmin, t_min),
                jnp.where(passthrough, a_tmax, -1.0),
                max_steps=cfg.traversal_max_steps, order=order,
            )
            rec_a = type(rec_a)(*[
                jnp.where(passthrough, b, a) for a, b in zip(rec_a, rec2)
            ])
    if split:
        rec_a = _merge_closest(rec, rec_a)
    return rng_state, rec_a


def trace_occlusion(cfg: RenderConfig, scene: SceneData, o, d, t_min, t_max,
                    rng_state, order=None, coherent: bool = False):
    """Occlusion with stochastic alpha (ref traceray_rq.glsl:153-185 AnyHit):
    alpha-rejected hits don't occlude; the ray marches past them.
    coherent=True uses image-tile packets for the (opaque) any-hit when the
    rays are (H, W, 3) raster fields.  Returns (rng_state, occluded bool).

    Split scenes: ONE cheap any-hit OR-drain over the opaque bulk, then
    the stochastic march only through the small alpha BVH."""
    def anyhit(bvh, tx):
        if coherent and o.ndim == 3:
            return any_hit_img(
                bvh, o, d, t_min, tx, max_steps=cfg.traversal_max_steps
            )
        return any_hit_sorted(
            bvh, o, d, t_min, tx,
            max_steps=cfg.traversal_max_steps, order=order,
        )

    if not cfg.alpha_geometry:
        occ = anyhit(scene.bvh, t_max)
        if scene.bvh_alpha is not None:
            # alpha treated as opaque when the HitTest loop is off
            occ = occ | anyhit(scene.bvh_alpha, t_max)
        return rng_state, occ
    split = scene.bvh_alpha is not None
    shape = t_max.shape if hasattr(t_max, "shape") else o.shape[:-1]
    if split:
        occluded = anyhit(scene.bvh, t_max)
        hop_bvh = scene.bvh_alpha
    else:
        occluded = jnp.zeros(shape, bool)
        hop_bvh = scene.bvh
    hops = cfg.alpha_hops + 1
    cur_tmin = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), shape)
    cur_tmax = jnp.where(
        occluded, -1.0,
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape),
    )
    if _alpha_cull_on(hop_bvh):
        # rays whose shadow segment misses the alpha cover can't be
        # blocked by alpha geometry: kill them before the mandatory
        # closest-hit and cluster dead rays by a fresh sort
        reach = _reach_boxes(hop_bvh.cull_boxes, o, d, cur_tmin, cur_tmax)
        cur_tmax = jnp.where(reach, cur_tmax, -1.0)
        order = make_ray_order(hop_bvh, o, d, dead=~reach)
    if _march_mode() == "queue":
        # one full-width closest (all unoccluded rays must consult the
        # alpha set), then the test/re-trace march on the compacted queue
        rec0 = closest_hit_sorted(
            hop_bvh, o, d, cur_tmin, cur_tmax,
            max_steps=cfg.traversal_max_steps, order=order,
        )
        rng_state, _, occ_a = _alpha_march(
            scene, hop_bvh, o, d, cur_tmax, rec0, rng_state,
            budget=hops, max_steps=cfg.traversal_max_steps, occl=True,
        )
        return rng_state, occluded | occ_a
    for _ in range(hops):
        rec = closest_hit_sorted(
            hop_bvh, o, d, cur_tmin, cur_tmax,
            max_steps=cfg.traversal_max_steps, order=order,
        )
        rng_state, passthrough = _alpha_passthrough(scene, rec, rng_state)
        occluded = occluded | ((rec.tri >= 0) & ~passthrough)
        cur_tmin = jnp.where(passthrough, rec.t * (1.0 + 1e-4) + 1e-5,
                             cur_tmin)
        cur_tmax = jnp.where(passthrough & ~occluded, cur_tmax, -1.0)
    return rng_state, occluded


class PathVertex(NamedTuple):
    """First-bounce record the ReSTIR GI stage needs (ref GISample
    host_device.h:260-284: xv/nv implicit from G-buffer, xs/ns here)."""
    xs: jnp.ndarray     # (..., 3) first secondary hit position
    ns: jnp.ndarray     # (..., 3) its normal
    valid: jnp.ndarray  # (...,) bool


def nee_contribution(cfg: RenderConfig, scene: SceneData, params: RenderParams,
                     state: State, wo, rng_state, active=None,
                     want_order: bool = False):
    """One next-event-estimation sample at `state` with shadow ray + MIS
    (ref pathtrace.glsl:185-220).  Returns (rng, contribution (..., 3)) or,
    with want_order, (rng, contribution, ray order) — the wavefront order
    of the shadow rays, reusable by the NEXT bounce trace from the same
    surface (saves a ~42 ms 2M-ray sort per wave, docs/PERF_NOTES.md).
    `active` masks lanes whose shadow rays need not be traced at all."""
    from ..ops.packets import make_ray_order

    rng_state, ls = sample_direct_light(cfg, scene, params, state.pos, rng_state)

    t, b = make_frame(state.nrm)
    wo_l = to_local(t, b, state.nrm, wo)
    wi_l = to_local(t, b, state.nrm, ls.wi)
    f = eval_bsdf(state.bsdf(), wo_l, wi_l)
    cos_i = jnp.maximum(wi_l[..., 2], 0.0)

    contrib_ok = state.valid & (ls.pdf > 1e-12) & (cos_i > 0.0)
    if active is not None:
        contrib_ok = contrib_ok & active
    origin = offset_ray(state.pos, jnp.where(
        dot3(state.geo_nrm, ls.wi)[..., None] >= 0, state.geo_nrm, -state.geo_nrm))
    # shadow rays are incoherent (per-pixel light samples): sorted wavefront.
    # Dead lanes get t_max < t_min so their packets retire in one step.
    shadow_tmax = jnp.where(contrib_ok, ls.dist * 0.999, -1.0)
    order = make_ray_order(scene.bvh, origin, ls.wi, dead=~contrib_ok)
    rng_state, occluded = trace_occlusion(
        cfg, scene, origin, ls.wi,
        jnp.full(state.valid.shape, _TMIN), shadow_tmax, rng_state,
        order=order,
    )

    if cfg.use_mis:
        bsdf_pdf_wi = pdf_bsdf(state.bsdf(), wo_l, wi_l)
        w = jnp.where(ls.delta, 1.0, power_heuristic(ls.pdf, bsdf_pdf_wi))
    else:
        w = jnp.ones_like(ls.pdf)

    contrib = (
        ls.li
        * f
        * (cos_i * w / jnp.maximum(ls.pdf, 1e-12))[..., None]
    )
    contrib = jnp.where(
        (contrib_ok & ~occluded)[..., None], contrib, 0.0
    )
    if want_order:
        return rng_state, contrib, order
    return rng_state, contrib


def trace_radiance(
    cfg: RenderConfig,
    scene: SceneData,
    params: RenderParams,
    o,
    d,
    rng_state,
    num_bounces: int | None = None,
    collect_first_vertex: bool = False,
    start_state: State | None = None,
    start_wo=None,
    nee_start_depth: int = 0,
    snapshot_after_depth: int | None = None,
    kill_after_snapshot=None,
):
    """Trace radiance along rays (o, d): flat or image-shaped lanes.

    If `start_state` is given, the path starts AT that surface (the GI
    stage's G-buffer reconstruction, ref pathtrace.glsl:296-360) and (o, d)
    are ignored for the first segment; `start_wo` is the direction back
    toward the camera.

    If `snapshot_after_depth` = k, also return the radiance accumulated
    through the hit/env contributions of segment k — the exact value a
    separate `num_bounces=k` run with the same RNG prefix would produce
    (used by the tiled-multibounce split, render/indirect.py, without
    paying for a second traversal).

    Returns (rng_state, radiance, PathVertex|None[, radiance_snapshot]).
    """
    import jax

    depth_total = num_bounces if num_bounces is not None else cfg.max_depth
    shape = (start_state.valid.shape if start_state is not None else d.shape[:-1])

    radiance = jnp.zeros(shape + (3,), jnp.float32)
    throughput = jnp.ones(shape + (3,), jnp.float32)
    alive = jnp.ones(shape, bool)
    last_bsdf_pdf = jnp.zeros(shape, jnp.float32)

    first_xs = jnp.zeros(shape + (3,), jnp.float32)
    first_ns = jnp.zeros(shape + (3,), jnp.float32)
    first_ok = jnp.zeros(shape, bool)

    def accumulate(depth_gt_nee, radiance, throughput, alive, last_bsdf_pdf,
                   cur_d, state, wo, tri, rec_t):
        """Add the env/emitter contribution of the vertex just reached.
        `depth_gt_nee` is a (possibly traced) bool scalar: does NEE at
        earlier vertices already account for light found by this BSDF
        segment (→ MIS-weight or drop it)?"""
        escaped = alive & ~state.valid
        env = env_radiance(cfg, scene, params, cur_d)
        if cfg.use_nee and cfg.use_mis:
            lp = env_pdf_dir(cfg, scene, cur_d) * env_selection_prob(
                cfg, scene, params
            )
            w_env = jnp.where(
                depth_gt_nee, power_heuristic(last_bsdf_pdf, lp), 1.0
            )
        elif cfg.use_nee:
            # NEE-only estimator: drop BSDF-found light to avoid double count
            w_env = jnp.where(depth_gt_nee, 0.0, 1.0)
        else:
            w_env = jnp.ones(shape, jnp.float32)
        radiance = radiance + jnp.where(
            escaped[..., None], throughput * env * w_env[..., None], 0.0
        )

        # emitter hit (ref indirect_stage.comp:180-216)
        hit_em = alive & state.valid
        if cfg.use_nee and cfg.use_mis:
            cos_l = jnp.abs(dot3(state.geo_nrm, wo))
            lp = light_pdf_for_bsdf_dir(
                cfg, scene, params, cur_d, tri, rec_t, cos_l
            )
            w_em = jnp.where(
                depth_gt_nee, power_heuristic(last_bsdf_pdf, lp), 1.0
            )
        elif cfg.use_nee:
            # NEE-only: count emitter hits only for lights NEE can't find
            from ..scene.data import shade_row as _srow

            not_nee_light = jnp.where(
                scene.tri_light_pmf[_srow(scene, jnp.maximum(tri, 0))[0]]
                > 0.0,
                0.0, 1.0,
            )
            w_em = jnp.where(depth_gt_nee, not_nee_light, 1.0)
        else:
            w_em = jnp.ones(shape, jnp.float32)
        radiance = radiance + jnp.where(
            hit_em[..., None],
            throughput * state.emission * w_em[..., None], 0.0,
        )
        return radiance

    # ---- depth 0 (peeled: coherent primaries / the provided surface) ----
    if start_state is not None:
        state, wo = start_state, start_wo
    else:
        # camera rays: image tiles are already coherent packets
        rng_state, rec = trace_closest(
            cfg, scene, o, d,
            jnp.full(shape, _TMIN), jnp.full(shape, _TMAX),
            rng_state, coherent=True,
        )
        state = get_state(scene, o, d, rec.tri, rec.t, rec.u, rec.v)
        wo = -d
        radiance = accumulate(
            0 > nee_start_depth, radiance, throughput, alive, last_bsdf_pdf,
            d, state, wo, rec.tri, rec.t,
        )
        alive = alive & state.valid
    radiance_snap = radiance
    if snapshot_after_depth == 0 and kill_after_snapshot is not None:
        alive = alive & kill_after_snapshot

    # ---- bounces 1..depth_total: ONE scanned body (the traversal+shade
    # graph is traced/compiled once instead of once per depth — full-frame
    # XLA compiles at max_depth 4 shrink ~3x; runtime is unchanged since
    # every iteration ran the same ops anyway).  Depth-dependent estimator
    # weights become scalar-gated selects on the scanned depth index; RNG
    # draws are unconditional in the body, so streams shift vs the old
    # unrolled code for configs with rr/nee start depths > 0 (goldens
    # regenerated).
    def body(carry, k):
        (rng_state, radiance, radiance_snap, throughput, alive,
         last_bsdf_pdf, state, wo, first_xs, first_ns, first_ok) = carry

        # NEE at the current vertex, depth k-1 (ref indirect_stage.comp:143-153)
        order = None
        if cfg.use_nee:
            nee_on = (
                alive if nee_start_depth <= 0
                else alive & (k - 1 >= nee_start_depth)
            )
            rng_state, contrib, order = nee_contribution(
                cfg, scene, params, state, wo, rng_state, active=nee_on,
                want_order=True,
            )
            radiance = radiance + jnp.where(
                nee_on[..., None], throughput * contrib, 0.0
            )

        # BSDF sample to continue (ref pbr_metallicworkflow Sample)
        rng_state, u1 = erng.rand(rng_state)
        rng_state, u2 = erng.rand(rng_state)
        rng_state, u3 = erng.rand(rng_state)
        t, b = make_frame(state.nrm)
        wo_l = to_local(t, b, state.nrm, wo)
        wi_l, pdf, f = sample_bsdf(state.bsdf(), wo_l, u1, u2, u3)
        wi = to_world(t, b, state.nrm, wi_l)
        cos_i = jnp.maximum(wi_l[..., 2], 0.0)
        ok = alive & (pdf > 1e-9) & (cos_i > 0.0)
        throughput = jnp.where(
            ok[..., None],
            throughput * f * (cos_i / jnp.maximum(pdf, 1e-9))[..., None],
            throughput,
        )
        alive = ok
        last_bsdf_pdf = pdf

        # Russian roulette from rr_depth (ref indirect_stage.comp:218-224)
        if cfg.russian_roulette:
            rng_state, u_rr = erng.rand(rng_state)
            rr_on = k - 1 >= cfg.rr_depth
            p_cont = jnp.where(
                rr_on, jnp.clip(jnp.max(throughput, axis=-1), 0.05, 1.0), 1.0
            )
            survive = u_rr < p_cont
            throughput = jnp.where(
                (alive & survive)[..., None],
                throughput / p_cont[..., None], throughput,
            )
            alive = alive & survive

        # trace segment k: sorted wavefront; terminated lanes cluster into
        # dead packets (t_max < t_min) and retire in one step.  The NEE
        # shadow wave from this surface already sorted these origins —
        # reuse its order, skip a full sort.
        cur_o = offset_ray(
            state.pos,
            jnp.where(
                dot3(state.geo_nrm, wi)[..., None] >= 0,
                state.geo_nrm, -state.geo_nrm,
            ),
        )
        cur_d = wi
        rng_state, rec = trace_closest(
            cfg, scene, cur_o, cur_d,
            jnp.full(shape, _TMIN), jnp.where(alive, _TMAX, -1.0),
            rng_state, order=order,
        )
        state = get_state(
            scene, cur_o, cur_d, rec.tri, rec.t, rec.u, rec.v
        )
        wo = -cur_d
        radiance = accumulate(
            (k > nee_start_depth) if nee_start_depth > 0 else True,
            radiance, throughput, alive, last_bsdf_pdf,
            cur_d, state, wo, rec.tri, rec.t,
        )

        if collect_first_vertex:
            is1 = k == 1
            ok1 = state.valid & alive
            first_ok = jnp.where(is1, ok1, first_ok)
            first_xs = jnp.where(
                is1, jnp.where(ok1[..., None], state.pos, 0.0), first_xs
            )
            first_ns = jnp.where(
                is1, jnp.where(ok1[..., None], state.nrm, 0.0), first_ns
            )

        if snapshot_after_depth is not None and snapshot_after_depth >= 1:
            is_snap = k == snapshot_after_depth
            radiance_snap = jnp.where(is_snap, radiance, radiance_snap)
            if kill_after_snapshot is not None:
                # tiled multi-bounce (ref indirect_stage.comp:39-45):
                # lanes whose deep contribution is scaled to zero stop
                # tracing here; sorted-dead clustering retires their
                # packets in one step.  Estimator-identical because the
                # caller only uses (L_sub - L_one) where the mask is on.
                alive = alive & (~is_snap | kill_after_snapshot)

        alive = alive & state.valid
        return (rng_state, radiance, radiance_snap, throughput, alive,
                last_bsdf_pdf, state, wo, first_xs, first_ns, first_ok), None

    carry = (rng_state, radiance, radiance_snap, throughput, alive,
             last_bsdf_pdf, state, wo, first_xs, first_ns, first_ok)
    if depth_total >= 1:
        carry, _ = jax.lax.scan(
            body, carry, jnp.arange(1, depth_total + 1, dtype=jnp.int32)
        )
    (rng_state, radiance, radiance_snap, _, _, _, _, _,
     first_xs, first_ns, first_ok) = carry

    vert = (PathVertex(xs=first_xs, ns=first_ns, valid=first_ok)
            if collect_first_vertex else None)
    if snapshot_after_depth is not None:
        return rng_state, radiance, vert, radiance_snap
    return rng_state, radiance, vert
