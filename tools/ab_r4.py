"""Round-4 frame-level A/Bs at reference scale (VERDICT r3 next #2):
flip-or-delete evidence for the pending knobs, measured on the honest
textured+alpha+instanced bench scene (and SBVH on the flattened variant,
where one big overlap-heavy BVH is built).

Run on the TPU (takes ~30-60 min of tunnel compiles; results cached):
  python tools/ab_r4.py [--scene bistro_standin] [--iters 5]

Prints one JSON line per case: {"case", "ms"}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from eidola_tpu.utils.platform import enable_compile_cache

enable_compile_cache()


def measure(cfg, scene, cam, iters: int, tries: int = 2) -> float:
    from eidola_tpu.render.config import default_params, default_tonemap
    from eidola_tpu.render.frame import init_frame_state, render_frame

    params, tm = default_params(), default_tonemap()
    state = init_frame_state(cfg, cam)
    step = jax.jit(lambda sc, c, p, t, st: render_frame(cfg, sc, c, p, t, st))
    for attempt in range(tries):   # remote-compile failover retry (bench.py)
        try:
            state, out = step(scene, cam, params, tm, state)
            break
        except Exception:
            if attempt + 1 == tries:
                raise
    state, out = step(scene, cam, params, tm, state)
    jax.block_until_ready(out["image"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, out = step(scene, cam, params, tm, state)
    jax.block_until_ready(out["image"])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import dataclasses

    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="bistro_standin")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--skip-sbvh", action="store_true")
    ap.add_argument("--base-only", action="store_true")
    args = ap.parse_args()

    from eidola_tpu.models.scenes import load_scene
    from eidola_tpu.render.config import RenderConfig

    scene, cam = load_scene(args.scene)
    has_alpha = bool((np.asarray(scene.materials.alpha_mode) != 0).any())
    base = RenderConfig(width=1920, height=1080, max_depth=4,
                        env_mode="sunsky", alpha_geometry=has_alpha)

    if args.base_only:
        tag = "sbvh" if os.environ.get("EIDOLA_SBVH") == "1" else "base"
        ms = measure(base, scene, cam, args.iters)
        print(json.dumps({"case": f"{args.scene}/{tag}", "ms": round(ms, 2)}),
              flush=True)
        return

    cases = [
        ("base", base),
        ("primary_seed", dataclasses.replace(base, primary_seed=True)),
        ("shadow_cadence4", dataclasses.replace(base, shadow_cadence=4)),
        ("seed+cadence4", dataclasses.replace(
            base, primary_seed=True, shadow_cadence=4)),
    ]
    for name, cfg in cases:
        ms = measure(cfg, scene, cam, args.iters)
        print(json.dumps({"case": f"{args.scene}/{name}", "ms": round(ms, 2)}),
              flush=True)

    if not args.skip_sbvh:
        # SBVH on the flattened city (one big overlap-heavy BVH): the env
        # default is frozen at import, so run it in a fresh interpreter
        import subprocess

        env = dict(os.environ, EIDOLA_SBVH="1")
        subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--scene", "bistro_flat", "--base-only",
             "--iters", str(args.iters)],
            env=env, check=False,
        )


if __name__ == "__main__":
    main()
