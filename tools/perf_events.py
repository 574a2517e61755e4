"""Platform-independent traversal-cost A/B: leaf-event / chunk / step
counters (ops/bvh.closest_hit_stats) on the perf_trace.py workloads.

The drain is ~92% of TPU traversal and its cost is events x lanes x MT
(docs/PERF_NOTES.md), so EVENT COUNTS rank build/order/sort-key variants
on CPU without paying tunnel compiles; a TPU timing run confirms winners.

Usage:
    EIDOLA_OCT=0 python tools/perf_events.py [--grid 16] [--size 512 288]
    EIDOLA_OCT=1 python tools/perf_events.py ...
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS", "").lower() in ("", "cpu"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("EIDOLA_CHUNK", "256")

import jax

if os.environ["JAX_PLATFORMS"] == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from eidola_tpu.utils.platform import enable_compile_cache

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=16)
    ap.add_argument("--size", type=int, nargs=2, default=[512, 288])
    ap.add_argument("--scene", default="stress")
    ap.add_argument("--which", default="all", help="all | prim | occl | bounce")
    args = ap.parse_args()

    from eidola_tpu.models.scenes import load_scene, stress_grid
    from eidola_tpu.ops import rng as erng
    from eidola_tpu.ops.bvh import any_hit_stats, closest_hit_stats
    from eidola_tpu.ops.packets import ray_sort_keys, to_tiles
    from eidola_tpu.scene.camera import spawn_rays

    w, h = args.size
    scene, cam = (load_scene("bistro_flat") if args.scene == "bistro"
                  else stress_grid(args.grid))
    n = w * h
    oct_on = scene.bvh.walk_oct is not None
    print(f"scene {int(scene.bvh.n_tris)} tris, {n} rays, "
          f"leaf_size {scene.bvh.leaf_size}, octant={'on' if oct_on else 'off'}")
    st = erng.seed_pixels(h, w, jnp.uint32(7))
    _, o, d = spawn_rays(cam, h, w, st)
    tmin = jnp.full(n, 1e-4)
    tmax = jnp.full(n, 1e8)

    def show(tag, s):
        print(f"{tag}: events {int(s['events']):8d}  chunks "
              f"{int(s['chunks']):5d}  steps {int(s['steps']):6d}")

    if args.which in ("all", "prim", "occl"):
        ot, dt = to_tiles(o, h, w), to_tiles(d, h, w)
        rec, s = jax.jit(
            lambda o, d: closest_hit_stats(scene.bvh, o, d, tmin, tmax)
        )(ot, dt)
        if args.which != "occl":
            show("prim  ", s)

    if args.which in ("all", "prim") and scene.bvh.slot_of_tri is not None:
        # primary_seed steady-state proxy: seed t_max with the ray's own
        # hit t (what a still camera reaches after one frame)
        seeded = jnp.where(
            rec.tri >= 0, rec.t * (1.0 + 1e-4) + 1e-6, tmax
        )
        _, s = jax.jit(
            lambda o, d, tm: closest_hit_stats(scene.bvh, o, d, tmin, tm)
        )(ot, dt, seeded)
        show("prim@s", s)

    if args.which in ("all", "occl"):
        hitp = ot + dt * jnp.where(
            rec.t > 1e20, 10.0, rec.t)[..., None] * 0.99
        rng = np.random.default_rng(3)
        lp = jnp.asarray(rng.uniform(-40, 40, (8, 3)).astype(np.float32)
                         + np.float32([0, 60, 0]))
        tgt = lp[jnp.asarray(rng.integers(0, 8, n))]
        sd = tgt - hitp
        dist = jnp.linalg.norm(sd, axis=-1, keepdims=True)
        sd = sd / jnp.maximum(dist, 1e-6)
        _, s = jax.jit(
            lambda o, d, tm: any_hit_stats(scene.bvh, o, d, tmin, tm)
        )(hitp, sd, dist[..., 0] * 0.999)
        show("occl  ", s)

    if args.which not in ("all", "bounce"):
        return
    rngb = np.random.default_rng(1)
    ob = np.asarray(o).reshape(-1, 3) + rngb.standard_normal(
        (n, 3)).astype(np.float32) * 0.5
    db = rngb.standard_normal((n, 3)).astype(np.float32)
    db /= np.linalg.norm(db, axis=-1, keepdims=True)
    keys = ray_sort_keys(scene.bvh, jnp.asarray(ob), jnp.asarray(db),
                         jnp.zeros(n, bool))
    perm = jnp.argsort(keys)
    _, s = jax.jit(
        lambda o, d: closest_hit_stats(scene.bvh, o, d, tmin, tmax)
    )(jnp.asarray(ob)[perm], jnp.asarray(db)[perm])
    show("bounce", s)


if __name__ == "__main__":
    main()
