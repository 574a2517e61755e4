"""Full-frame stage breakdown by ablation on the live device (1080p bench
config).  Differences between configs give per-stage cost."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from eidola_tpu.utils.platform import enable_compile_cache

enable_compile_cache()  # A/B reruns skip multi-minute tunnel compiles


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
    from eidola_tpu.models.scenes import load_scene, stress_grid
    from eidola_tpu.render.config import RESTIR_NONE, RenderConfig

    bs = os.environ.get("EIDOLA_BENCH_SCENE")
    if bs in ("bistro", "bistro_flat", "bistro_standin"):
        scene, cam = load_scene("bistro_flat" if bs == "bistro" else bs)
    else:
        scene, cam = stress_grid(16)
    print(f"tris={int(scene.bvh.n_tris)}")
    W, H = 1920, 1080
    import numpy as np
    has_alpha = bool((np.asarray(scene.materials.alpha_mode) != 0).any())
    base = dict(width=W, height=H, max_depth=4, env_mode="sunsky",
                alpha_geometry=has_alpha)

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
        "primary_seed": RenderConfig(**base, primary_seed=True),
        "no_mips": RenderConfig(**base, texture_mips=False),
        "di_restir_none": RenderConfig(
            **base, indirect_enabled=False, denoise=False,
            restir_mode=RESTIR_NONE, ris_sample_num=1,
        ),
    }
    which = sys.argv[1:] or list(cases)
    for name in which:
        ms = time_cfg(scene, cam, cases[name])
        print(f"{name:26s} {ms:9.2f} ms")


def attribution():
    """A/B the round-2 feature costs: texture mips, sky weight."""
    import jax.numpy as jnp
    from eidola_tpu.models.scenes import stress_grid
    from eidola_tpu.render.config import RenderConfig
    from eidola_tpu.render.pathtrace import env_radiance
    from eidola_tpu.render.config import default_params

    scene, cam = stress_grid(16)
    W, H = 1920, 1080
    base = dict(width=W, height=H, max_depth=4, env_mode="sunsky",
                indirect_enabled=False, denoise=False)
    for name, kw in [
        ("di_mips_on", {}),
        ("di_mips_off", {"texture_mips": False}),
        ("di_restir_none", {"restir_mode": 0}),
    ]:
        ms = time_cfg(scene, cam, RenderConfig(**base, **kw))
        print(f"{name:18s} {ms:9.2f} ms")

    # sky eval alone at 2M directions
    import numpy as np
    rng = np.random.default_rng(0)
    d = rng.standard_normal((W * H, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dj = jnp.asarray(d)
    cfg = RenderConfig(**base)
    params = default_params()
    f = jax.jit(lambda dd: env_radiance(cfg, scene, params, dd).sum())
    import time as _t
    for _ in range(2):
        out = f(dj)
    jax.block_until_ready(out)
    t0 = _t.perf_counter()
    for _ in range(5):
        out = f(dj)
    jax.block_until_ready(out)
    print(f"sky eval 2M dirs   {( _t.perf_counter()-t0)/5*1e3:9.2f} ms")


if __name__ == "__main__":
    if os.environ.get("EIDOLA_ATTR"):
        attribution()
    else:
        main()
