"""Traversal microbenchmarks on the live device: primaries / shadow /
bounce-style rays at 1080p on the bench scene.  Used to drive the drain
optimization loop (VERDICT r2 item 1/3)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from eidola_tpu.utils.platform import enable_compile_cache

enable_compile_cache()  # A/B reruns skip multi-minute tunnel compiles


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
    ap.add_argument("--grid", type=int, default=16)
    ap.add_argument("--size", type=int, nargs=2, default=[1920, 1080])
    ap.add_argument("--which", default="all")
    ap.add_argument("--scene", default="stress",
                    help="stress | bistro_flat | bistro_standin (2.83M-tri honest bench scene)")
    args = ap.parse_args()

    from eidola_tpu.models.scenes import load_scene, stress_grid
    from eidola_tpu.ops import rng as erng
    from eidola_tpu.ops.packets import (
        any_hit_img, closest_hit_img, closest_hit_sorted,
    )
    from eidola_tpu.scene.camera import spawn_rays

    w, h = args.size
    if args.scene in ("bistro", "bistro_flat", "bistro_standin"):
        scene, cam = load_scene("bistro_flat" if args.scene == "bistro" else args.scene)
    else:
        scene, cam = stress_grid(args.grid)
    n_tris = int(scene.bvh.n_tris)
    n_rays = w * h
    n_nodes = scene.bvh.walk.shape[0]
    print(f"scene: {n_tris} tris, {n_rays} rays, "
          f"walk nodes {n_nodes}, "
          f"leaf rows {scene.bvh.leaf_blocks.shape}")

    st = erng.seed_pixels(h, w, jnp.uint32(7))
    _, o, d = spawn_rays(cam, h, w, st)
    tmin = jnp.full((h, w), 1e-4)
    tmax = jnp.full((h, w), 1e8)

    if args.which in ("all", "prim"):
        f = jax.jit(lambda o, d: closest_hit_img(scene.bvh, o, d, tmin, tmax))
        ms = timeit(f, o, d)
        print(f"primaries (tiled):  {ms:8.2f} ms   "
              f"{n_rays / ms / 1e3:.1f} Mrays/s")

    if args.which in ("all", "occl"):
        # DI-shadow-style occlusion: raster-coherent origins at primary hit
        # points, directions toward a handful of light positions
        f0 = jax.jit(lambda o, d: closest_hit_img(scene.bvh, o, d, tmin, tmax))
        rec = f0(o, d)
        hitp = o + d * jnp.where(rec.t > 1e20, 10.0, rec.t)[..., None] * 0.99
        rng = np.random.default_rng(3)
        lp = jnp.asarray(rng.uniform(-40, 40, (8, 3)).astype(np.float32) +
                         np.float32([0, 60, 0]))
        pick = jnp.asarray(rng.integers(0, 8, (h, w)))
        tgt = lp[pick]
        sd = tgt - hitp
        dist = jnp.linalg.norm(sd, axis=-1, keepdims=True)
        sd = sd / jnp.maximum(dist, 1e-6)
        f = jax.jit(lambda o, d, tm: any_hit_img(scene.bvh, o, d, tmin, tm))
        ms = timeit(f, hitp, sd, dist[..., 0] * 0.999)
        print(f"occlusion (tiled):  {ms:8.2f} ms   "
              f"{n_rays / ms / 1e3:.1f} Mrays/s")

    if args.which in ("all", "bounce"):
        # incoherent rays: random origins on hit surfaces, cosine dirs
        rng = np.random.default_rng(1)
        ob = np.asarray(o).reshape(-1, 3) + rng.standard_normal(
            (n_rays, 3)).astype(np.float32) * 0.5
        db = rng.standard_normal((n_rays, 3)).astype(np.float32)
        db /= np.linalg.norm(db, axis=-1, keepdims=True)
        ob_j, db_j = jnp.asarray(ob), jnp.asarray(db)
        f = jax.jit(lambda o, d: closest_hit_sorted(
            scene.bvh, o, d, jnp.full(n_rays, 1e-4), jnp.full(n_rays, 1e8)))
        ms = timeit(f, ob_j, db_j)
        print(f"bounce (sorted):    {ms:8.2f} ms   "
              f"{n_rays / ms / 1e3:.1f} Mrays/s")


def step_stats(scene, o, d, t_min, t_max, max_steps=100000):
    """Per-packet walk step counts (slab walk, no drain pruning): how much
    does global lockstep waste?  mean vs max retire step over packets."""
    from eidola_tpu.ops.bvh import PACKET, _pad_to_packets

    bvh = scene.bvh
    R = o.shape[0]
    n_pkt = -(-R // PACKET)
    pad_r = n_pkt * PACKET - R
    o = _pad_to_packets(o.reshape(-1, 3), pad_r, 0.0)
    d = _pad_to_packets(d.reshape(-1, 3), pad_r, 1.0)
    t_min = _pad_to_packets(t_min.reshape(-1), pad_r, 0.0)
    t_max = _pad_to_packets(t_max.reshape(-1), pad_r, -1.0)

    comp = lambda a, k: a[:, k].reshape(n_pkt, PACKET)
    ox, oy, oz = comp(o, 0), comp(o, 1), comp(o, 2)
    dx, dy, dz = comp(d, 0), comp(d, 1), comp(d, 2)
    tmin = t_min.reshape(n_pkt, PACKET)
    tmax = t_max.reshape(n_pkt, PACKET)
    inv = lambda c: jnp.where(c >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(c), 1e-12)
    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    def body(c):
        node, steps, done_at = c
        live = node >= 0
        nid = jnp.maximum(node, 0)
        row = bvh.walk[nid]
        col = lambda i: row[:, i : i + 1]
        tx0 = (col(0) - ox) * ix; tx1 = (col(3) - ox) * ix
        ty0 = (col(1) - oy) * iy; ty1 = (col(4) - oy) * iy
        tz0 = (col(2) - oz) * iz; tz1 = (col(5) - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)), jnp.minimum(tz0, tz1))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)), jnp.maximum(tz0, tz1))
        hit = jnp.any((tn <= tf) & (tf >= tmin) & (tn <= tmax), axis=1) & live
        miss = jax.lax.bitcast_convert_type(row[:, 6], jnp.int32)
        leaf = jax.lax.bitcast_convert_type(row[:, 7], jnp.int32) >= 0
        nxt = jnp.where(hit & ~leaf, nid + 1, miss)
        node = jnp.where(live, nxt, node)
        steps = steps + 1
        done_at = jnp.where(live & (node < 0), steps, done_at)
        return node, steps, done_at

    node0 = jnp.zeros(n_pkt, jnp.int32)
    out = jax.lax.while_loop(
        lambda c: jnp.any(c[0] >= 0) & (c[1] < max_steps), body,
        (node0, jnp.int32(0), jnp.zeros(n_pkt, jnp.int32)),
    )
    done = np.asarray(out[2])
    print(f"walk steps: mean={done.mean():.0f} p50={np.percentile(done,50):.0f} "
          f"p90={np.percentile(done,90):.0f} p99={np.percentile(done,99):.0f} "
          f"max={done.max()}  lockstep waste={done.max()/max(done.mean(),1):.1f}x")


def stats_main():
    from eidola_tpu.models.scenes import stress_grid
    from eidola_tpu.ops import rng as erng
    from eidola_tpu.ops.packets import ray_sort_keys, to_tiles
    from eidola_tpu.scene.camera import spawn_rays

    w, h = 1920, 1080
    scene, cam = stress_grid(16)
    st = erng.seed_pixels(h, w, jnp.uint32(7))
    _, o, d = spawn_rays(cam, h, w, st)
    n = w * h
    tmin = jnp.full(n, 1e-4); tmax = jnp.full(n, 1e8)
    print("primaries (tiled):")
    step_stats(scene, to_tiles(o, h, w), to_tiles(d, h, w), tmin, tmax)

    rng = np.random.default_rng(1)
    ob = np.asarray(o).reshape(-1, 3) + rng.standard_normal((n, 3)).astype(np.float32) * 0.5
    db = rng.standard_normal((n, 3)).astype(np.float32)
    db /= np.linalg.norm(db, axis=-1, keepdims=True)
    keys = ray_sort_keys(scene.bvh, jnp.asarray(ob), jnp.asarray(db), jnp.zeros(n, bool))
    perm = jnp.argsort(keys)
    print("bounce (sorted):")
    step_stats(scene, jnp.asarray(ob)[perm], jnp.asarray(db)[perm], tmin, tmax)


if __name__ == "__main__":
    if os.environ.get("EIDOLA_STATS"):
        stats_main()
    else:
        main()
