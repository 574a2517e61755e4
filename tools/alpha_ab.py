"""Alpha-BVH trace attribution (round 5, VERDICT #1/#2).

PERF_NOTES round 4 closes with: after the split + queue march, the one
mandatory full-width closest-hit against the alpha BVH costs ~700 ms per
trace at the 70k-row instanced walk.  This tool measures WHERE that cost
lives and A/Bs the candidate fixes:

  - instanced grafted alpha walk (round-4 shipped)        EIDOLA_ALPHA_FLAT=0
  - flattened world-space alpha BVH                       EIDOLA_ALPHA_FLAT=1
  - ray pre-cull + dead-clustered sort (EIDOLA_ALPHA_CULL, render/tracer.py)

Workload mirrors trace_closest's split path: opaque closest first (image
tiles), then the alpha closest at full width with t bounded by the opaque
hit.  Counters (events/chunks/steps/live_steps) are platform-independent;
ms numbers need the TPU.

Usage:
    python tools/alpha_ab.py [--size 1920 1080] [--stats] [--which all]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("EIDOLA_CHUNK", "256")

import jax.numpy as jnp
import numpy as np

from eidola_tpu.utils.platform import enable_compile_cache

enable_compile_cache()


def timeit(f, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=[1920, 1080])
    ap.add_argument("--stats", action="store_true",
                    help="event/step counters instead of wall time")
    ap.add_argument("--full", action="store_true",
                    help="end-to-end trace_closest/trace_occlusion incl. "
                         "march, at primary and shadow ray styles")
    ap.add_argument("--scene", default="bistro_standin")
    args = ap.parse_args()

    from eidola_tpu.models.scenes import load_scene
    from eidola_tpu.ops import rng as erng
    from eidola_tpu.ops.bvh import _traverse
    from eidola_tpu.ops.packets import (
        closest_hit_img, closest_hit_sorted, make_ray_order, to_tiles,
    )
    from eidola_tpu.scene.camera import spawn_rays

    w, h = args.size
    scene, cam = load_scene(args.scene)
    ba = scene.bvh_alpha
    assert ba is not None, "scene has no alpha split"
    kind = "flat" if not hasattr(ba, "leaf_mesh_row") else "instanced"
    print(f"opaque walk rows {scene.bvh.walk.shape[0]}, alpha walk rows "
          f"{ba.walk.shape[0]} ({kind}), alpha leaves "
          f"{ba.leaf_mesh_row.shape[0] if kind == 'instanced' else ba.leaf_blocks.shape[0]}")

    st = erng.seed_pixels(h, w, jnp.uint32(7))
    _, o, d = spawn_rays(cam, h, w, st)
    tmin = jnp.full((h, w), 1e-4)
    tmax = jnp.full((h, w), 1e8)
    n = w * h

    # opaque pass gives the bound (a_tmax = opaque hit t), like trace_closest.
    # BVHs are passed as jit ARGS (closure capture would embed the leaf/
    # coefficient tables as HLO constants — a flat alpha BVH's ~350 MB
    # blows the tunnel's remote-compile request limit with HTTP 413)
    f0 = jax.jit(lambda bv, o, d: closest_hit_img(bv, o, d, tmin, tmax))
    rec = f0(scene.bvh, o, d)
    a_tmax = jnp.minimum(tmax, rec.t)
    of, df = o.reshape(n, 3), d.reshape(n, 3)
    tminf = jnp.full(n, 1e-4)
    a_tmaxf = a_tmax.reshape(n)
    order = make_ray_order(scene.bvh, of, df, dead=a_tmaxf < tminf)

    if args.stats:
        inst = ba.inst_index if kind == "instanced" else None
        perm = order[0]

        def stats_fn(o1, d1, tn, tx):
            _, _, s = _traverse(
                ba, o1[perm], d1[perm], tn[perm], tx[perm],
                any_hit=False, max_steps=100000, inst=inst, with_stats=True,
            )
            return s

        s = jax.jit(stats_fn)(of, df, tminf, a_tmaxf)
        print(f"alpha closest ({kind}): events {int(s['events'])}  "
              f"chunks {int(s['chunks'])}  steps {int(s['steps'])}  "
              f"live_steps {int(s['live_steps'])}")
        # how many rays even reach foliage? (hit count at the bound)
        rec_a = jax.jit(lambda bv: closest_hit_sorted(
            bv, of, df, tminf, a_tmaxf, order=order))(ba)
        print(f"alpha candidate hits: {int(jnp.sum(rec_a.tri >= 0))} / {n} "
              f"({float(jnp.mean((rec_a.tri >= 0).astype(jnp.float32))) * 100:.1f}%)")
        return

    if args.full:
        from eidola_tpu.ops import rng as _rng
        from eidola_tpu.render.config import RenderConfig
        from eidola_tpu.render.tracer import trace_closest, trace_occlusion

        cfg = RenderConfig(width=w, height=h, alpha_geometry=True)
        rngs = erng.seed_pixels(h, w, jnp.uint32(3))

        fc = jax.jit(lambda sc, o1, d1, r: trace_closest(
            cfg, sc, o1, d1, tmin, tmax, r, coherent=True))
        msc = timeit(fc, scene, o, d, rngs)
        print(f"trace_closest primary (full):  {msc:8.2f} ms")
        # DI-shadow style: origins at the hits, one sun-ish direction
        hitp = o + d * jnp.where(rec.t > 1e20, 10.0, rec.t)[..., None] * 0.99
        sd = jnp.broadcast_to(
            jnp.asarray([0.35, 0.8, 0.49], jnp.float32), o.shape)
        sd = sd / jnp.linalg.norm(sd, axis=-1, keepdims=True)
        fo = jax.jit(lambda sc, o1, d1, r: trace_occlusion(
            cfg, sc, o1, d1, tmin, jnp.full((h, w), 1e7), r,
            coherent=True))
        mso = timeit(fo, scene, hitp, sd, rngs)
        print(f"trace_occlusion shadow (full): {mso:8.2f} ms")
        return

    ms0 = timeit(f0, scene.bvh, o, d)
    print(f"opaque closest (tiled):        {ms0:8.2f} ms")
    fa = jax.jit(lambda bv, o1, d1, tx: closest_hit_sorted(
        bv, o1, d1, tminf, tx, order=order))
    ms = timeit(fa, ba, of, df, a_tmaxf)
    print(f"alpha closest ({kind}, bounded): {ms:8.2f} ms   "
          f"{n / ms / 1e3:.1f} Mrays/s")

    if getattr(ba, "cull_boxes", None) is not None:
        from eidola_tpu.render.tracer import _reach_boxes

        def culled(bv, o1, d1, tx):
            reach = _reach_boxes(bv.cull_boxes, o1, d1, tminf, tx)
            tx = jnp.where(reach, tx, -1.0)
            order_a = make_ray_order(bv, o1, d1, dead=~reach)
            return closest_hit_sorted(bv, o1, d1, tminf, tx, order=order_a)

        fc = jax.jit(culled)
        rec_c = fc(ba, of, df, a_tmaxf)
        rec_u = fa(ba, of, df, a_tmaxf)
        same = int(jnp.sum(rec_c.tri == rec_u.tri))
        reach = jax.jit(lambda bv: _reach_boxes(
            bv.cull_boxes, of, df, tminf, a_tmaxf))(ba)
        print(f"cull reach fraction: "
              f"{float(jnp.mean(reach.astype(jnp.float32))) * 100:.1f}%  "
              f"(tri match {same}/{n})")
        ms_c = timeit(fc, ba, of, df, a_tmaxf)
        print(f"alpha closest ({kind}, CULLED):  {ms_c:8.2f} ms   "
              f"{n / ms_c / 1e3:.1f} Mrays/s")


if __name__ == "__main__":
    main()
