"""Roofline attribution of the traversal drain vs v5e machine peaks
(VERDICT r3 item 1): for each bench workload (primaries / DI-shadow
occlusion / GI bounce) this measures wall time on the live chip, counts
the actual leaf events/chunks/steps with the in-graph counters
(ops/bvh.closest_hit_stats), and converts the fused-drain cost model
into achieved-vs-peak HBM bandwidth and MXU throughput.

The point: split the frame gap into (a) kernel headroom (measured time
vs the model's light-speed time on this machine), (b) algorithmic ray /
event count (events x per-event light-speed cost), and (c) machine limit
(the light-speed cost itself).

Usage (TPU):
    python tools/roofline.py [--scene bistro_standin] [--size 1920 1080]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from eidola_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

# ---- v5e (TPU v5 lite) peaks -------------------------------------------
HBM_GBPS = 819.0        # HBM bandwidth
MXU_TFLOPS_BF16 = 197.0  # bf16 systolic peak (f32 accumulate)
# VPU: 8x128 lanes x 4 ALUs x 0.94 GHz ~ 3.85 T f32 elementwise ops/s
VPU_TOPS = 3.85


def drain_model(events: int, leaf: int, cm_bytes: int, closest: bool):
    """Per-workload fused-drain cost model (ops/bvh_fused.py kernel).

    Returns dict of modeled totals.  Components per EVENT:
      - cmat DMA: KDIM x 4n x dtype (the static coefficient block)
      - kernel VMEM I/O in HBM terms: 8 input rows + out rows x 128 lanes
        x 4 B (inputs are built by XLA gathers: read source + write block
        + kernel read -> 3x; outputs written once)
      - MXU: 2 x K(16) x 4n x 128 MACs issued (10/16 K-rows useful)
      - VPU epilogue: ~34 elementwise ops on (n,128) quarters (closest:
        inv/t/u/v muls, 8-term hit mask, min-reduce, one-hot selects;
        occlusion: ~14 ops, no divides)
    """
    lanes = 128
    n4 = 4 * leaf
    cmat = events * 16 * n4 * cm_bytes
    n_in = 8
    n_out = 4 if closest else 1
    io = events * lanes * 4 * (3 * n_in + n_out)
    mxu = events * 2 * 16 * n4 * lanes
    vpu = events * (34 if closest else 14) * leaf * lanes
    bytes_total = cmat + io
    t_hbm = bytes_total / (HBM_GBPS * 1e9)
    t_mxu = mxu / (MXU_TFLOPS_BF16 * 1e12)
    t_vpu = vpu / (VPU_TOPS * 1e12)
    return {
        "bytes": bytes_total, "mxu_macs": mxu, "vpu_ops": vpu,
        "t_hbm_ms": t_hbm * 1e3, "t_mxu_ms": t_mxu * 1e3,
        "t_vpu_ms": t_vpu * 1e3,
        "t_light_ms": max(t_hbm, t_mxu, t_vpu) * 1e3,
    }


def walk_model(steps: int, rounds: int, n_pkt: int):
    """Megavector walk cost.  The dominant term is NOT the slab math: the
    while-loop body re-streams the full (n_pkt, 128) ray SoA from HBM on
    EVERY step — 8 arrays read (o, inv-d, t_min, t_best) + the
    (n_sp, QUEUE) queue state read+written — regardless of how many
    packets are still alive.  Each drain ROUND additionally re-reads and
    re-writes the four best-hit planes + queue bookkeeping."""
    lane_bytes = n_pkt * 128 * 4
    per_step = 8 * lane_bytes + 2 * n_pkt * 32 * 4
    per_round = 10 * lane_bytes
    bytes_total = steps * per_step + rounds * per_round
    vpu = steps * n_pkt * 30 * 128
    return {
        "bytes": bytes_total,
        "t_hbm_ms": bytes_total / (HBM_GBPS * 1e9) * 1e3,
        "t_vpu_ms": vpu / (VPU_TOPS * 1e12) * 1e3,
    }


def timeit(f, *args, iters=4, warmup=2):
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
    ap.add_argument("--scene", default="bistro_standin")
    ap.add_argument("--size", type=int, nargs=2, default=[1920, 1080])
    args = ap.parse_args()

    from eidola_tpu.models.scenes import load_scene
    from eidola_tpu.ops import rng as erng
    from eidola_tpu.ops.bvh import any_hit_stats, closest_hit_stats
    from eidola_tpu.ops.bvh_fused import _cm_dtype
    from eidola_tpu.ops.packets import ray_sort_keys, to_tiles
    from eidola_tpu.scene.camera import spawn_rays

    w, h = args.size
    scene, cam = load_scene(args.scene)
    bvh = scene.bvh
    inst = bvh.inst_index if hasattr(bvh, "leaf_mesh_row") else None
    leaf = bvh.leaf_size
    cm_bytes = 2 if _cm_dtype() == jnp.bfloat16 else 4
    n = w * h
    n_pkt = n // 128
    print(f"scene {args.scene}: {int(bvh.n_tris)} tris, leaf {leaf}, "
          f"cm dtype bytes {cm_bytes}, {n} rays, "
          f"{jax.devices()[0].device_kind}")

    st = erng.seed_pixels(h, w, jnp.uint32(7))
    _, o, d = spawn_rays(cam, h, w, st)
    tmin = jnp.full(n, 1e-4)
    tmax = jnp.full(n, 1e8)
    ot, dt = to_tiles(o, h, w), to_tiles(d, h, w)

    from eidola_tpu.ops.packets import any_hit as p_any
    from eidola_tpu.ops.packets import closest_hit as p_closest

    ch = jax.jit(lambda o, d, tm: closest_hit_stats(
        bvh, o, d, tmin, tm, inst=inst))
    ah = jax.jit(lambda o, d, tm: any_hit_stats(
        bvh, o, d, tmin, tm, inst=inst))
    # timed WITHOUT the stats counters (they add their own work)
    ch_t = jax.jit(lambda o, d, tm: p_closest(bvh, o, d, tmin, tm))
    ah_t = jax.jit(lambda o, d, tm: p_any(bvh, o, d, tmin, tm))

    rows = []

    def run(tag, fn, o_, d_, tm, closest):
        timed = ch_t if closest else ah_t
        ms = timeit(lambda: timed(o_, d_, tm))
        _, s = fn(o_, d_, tm)
        ev = int(s["events"])
        steps = int(s["steps"])
        rounds = int(s.get("rounds", 0))
        live = int(s.get("live_steps", 0))
        m = drain_model(ev, leaf, cm_bytes, closest)
        wk = walk_model(steps, rounds, n_pkt)
        t_light = m["t_light_ms"] + max(wk["t_hbm_ms"], wk["t_vpu_ms"])
        rows.append((tag, ms, ev, int(s["chunks"]), steps, m, wk, t_light))
        dense = steps * n_pkt
        print(f"{tag}: {ms:8.1f} ms  events {ev:8d} chunks "
              f"{int(s['chunks']):5d} steps {steps:6d} rounds {rounds:4d}  "
              f"live-steps {live} / dense {dense} "
              f"(compaction headroom x{dense / max(live, 1):.1f})")
        print(f"   model: drain bytes {m['bytes']/1e9:6.2f} GB "
              f"(t_hbm {m['t_hbm_ms']:6.1f} ms)  "
              f"mxu {m['mxu_macs']*2/1e12:6.2f} TFLOP "
              f"(t_mxu {m['t_mxu_ms']:6.1f})  "
              f"vpu {m['vpu_ops']/1e12:6.3f} Tops "
              f"(t_vpu {m['t_vpu_ms']:6.1f})  "
              f"walk/loop bytes {wk['bytes']/1e9:6.1f} GB "
              f"(t {max(wk['t_hbm_ms'], wk['t_vpu_ms']):5.1f})")
        print(f"   light-speed {t_light:7.1f} ms -> headroom x"
              f"{ms / max(t_light, 1e-9):.2f}   achieved "
              f"{m['bytes']/ms/1e6:6.1f} GB/s "
              f"({m['bytes']/ms/1e6/HBM_GBPS*100:4.1f}% HBM)  "
              f"{m['mxu_macs']*2/ms/1e9:6.1f} GFLOP/ms "
              f"({m['mxu_macs']*2/ms/1e9/MXU_TFLOPS_BF16/10*1000:4.1f}% MXU)")

    if os.environ.get("EIDOLA_ROOFLINE_WALK"):
        # walk-only ablation: drop queued events without intersecting
        # (wrong results; isolates the loop's streaming cost)
        import eidola_tpu.ops.bvh as B

        old = B.DRAIN
        B.DRAIN = "skip"
        try:
            ch_w = jax.jit(lambda o, d, tm: p_closest(bvh, o, d, tmin, tm))
            rngb = np.random.default_rng(1)
            ob = np.asarray(o).reshape(-1, 3) + rngb.standard_normal(
                (n, 3)).astype(np.float32) * 0.5
            db = rngb.standard_normal((n, 3)).astype(np.float32)
            db /= np.linalg.norm(db, axis=-1, keepdims=True)
            keys = ray_sort_keys(bvh, jnp.asarray(ob), jnp.asarray(db),
                                 jnp.zeros(n, bool))
            perm = jnp.argsort(keys)
            ms = timeit(lambda: ch_w(jnp.asarray(ob)[perm],
                                     jnp.asarray(db)[perm], tmax))
            print(f"walk-only bounce: {ms:8.1f} ms")
        finally:
            B.DRAIN = old

    run("prim  ", ch, ot, dt, tmax, True)

    # DI-shadow-style occlusion from the primary hits toward the sun
    rec, _ = ch(ot, dt, tmax)
    hitp = ot + dt * jnp.where(rec.t > 1e20, 10.0, rec.t)[..., None] * 0.99
    sd = jnp.broadcast_to(
        jnp.asarray(np.float32([0.35, 0.8, 0.25])
                    / np.linalg.norm([0.35, 0.8, 0.25])), hitp.shape
    )
    run("occl  ", ah, hitp, sd, jnp.full(n, 1e7), False)

    # GI-style incoherent bounce, wavefront sorted
    rngb = np.random.default_rng(1)
    ob = np.asarray(o).reshape(-1, 3) + rngb.standard_normal(
        (n, 3)).astype(np.float32) * 0.5
    db = rngb.standard_normal((n, 3)).astype(np.float32)
    db /= np.linalg.norm(db, axis=-1, keepdims=True)
    keys = ray_sort_keys(bvh, jnp.asarray(ob), jnp.asarray(db),
                         jnp.zeros(n, bool))
    perm = jnp.argsort(keys)
    run("bounce", ch, jnp.asarray(ob)[perm], jnp.asarray(db)[perm], tmax,
        True)


if __name__ == "__main__":
    main()
