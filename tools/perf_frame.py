"""Full-frame stage breakdown by ablation on the live device (1080p bench
config).  Differences between configs give per-stage cost."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


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
    from eidola_tpu.models.scenes import stress_grid
    from eidola_tpu.render.config import RESTIR_NONE, RenderConfig

    scene, cam = stress_grid(16)
    print(f"tris={int(scene.bvh.n_tris)}")
    W, H = 1920, 1080
    base = dict(width=W, height=H, max_depth=4, env_mode="sunsky")

    cases = {
        "full": RenderConfig(**base),
        "no_denoise": RenderConfig(**base, denoise=False),
        "no_indirect": RenderConfig(**base, indirect_enabled=False),
        "no_indirect_no_denoise": RenderConfig(
            **base, indirect_enabled=False, denoise=False
        ),
        "di_none_no_ind_no_dn": RenderConfig(
            **base, indirect_enabled=False, denoise=False,
            restir_mode=RESTIR_NONE,
        ),
        "depth1_indirect": RenderConfig(**{**base, "max_depth": 1}),
        "no_tiled_mb": RenderConfig(**base, tiled_multibounce=False),
    }
    which = sys.argv[1:] or list(cases)
    for name in which:
        ms = time_cfg(scene, cam, cases[name])
        print(f"{name:26s} {ms:9.2f} ms")


if __name__ == "__main__":
    main()
