"""Frame-level primary_seed A/B at reference scale (VERDICT r4 weak #3).

primary_seed seeds the primary ray's t_max from last frame's hit triangle
(render/direct.py, the TPU analog of rayQuery committed-t pruning,
traceray_rq.glsl:108-147 economics).  Trace-level counters measured
-33%/-49% primary LEAF EVENTS (PERF_NOTES round 3), but no frame-level
A/B ever ran, so the knob stayed opt-in.  This measures the real frame
delta on the opaque, instanced+textured, and alpha bench configs so the
default can be flipped or the knob deleted.

Run on the TPU:  python tools/seed_ab.py [scene ...]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from eidola_tpu.utils.platform import enable_compile_cache

enable_compile_cache()


def time_cfg(scene, cam, cfg, iters=4, warmup=2):
    from eidola_tpu.render.config import default_params, default_tonemap
    from eidola_tpu.render.frame import init_frame_state, render_frame

    params, tm = default_params(), default_tonemap()
    state = init_frame_state(cfg, cam)
    step = jax.jit(lambda sc, c, p, t, st: render_frame(cfg, sc, c, p, t, st))
    for _ in range(warmup):
        state, out = step(scene, cam, params, tm, state)
    jax.block_until_ready(out["image"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, out = step(scene, cam, params, tm, state)
    jax.block_until_ready(out["image"])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import numpy as np

    from eidola_tpu.models.scenes import load_scene
    from eidola_tpu.render.config import RenderConfig

    scenes = sys.argv[1:] or ["bistro_flat", "bistro_standin"]
    W, H = 1920, 1080
    for name in scenes:
        scene, cam = load_scene(name)
        has_alpha = bool(
            (np.asarray(scene.materials.alpha_mode) != 0).any()
        )
        base = RenderConfig(width=W, height=H, max_depth=4,
                            env_mode="sunsky", alpha_geometry=has_alpha)
        print(f"=== {name}: {int(scene.bvh.n_tris)} tris, "
              f"alpha={has_alpha} ===", flush=True)
        for seed in (False, True):
            cfg = dataclasses.replace(base, primary_seed=seed)
            ms = time_cfg(scene, cam, cfg)
            print(f"primary_seed={seed}: {ms:9.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
