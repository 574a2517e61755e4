"""Generate the CPU-f32 reference image for the TPU statistical golden
(tests/test_tpu_golden.py, VERDICT r4 weak #5: the shipped TPU default is
the bf16 MXU drain, but no image-level bound had ever run on the hardware
path — a Mosaic/precision regression on TPU would ship silently).

The reference is the exact-f32 cols-drain CPU render of the same config/
seed; the TPU test asserts statistical bounds (mean luminance, RMSE)
rather than bit equality because the bf16 drain has documented ~0.2%
hit-t error and rare tie flips (PERF_NOTES "MT dot precision").

Run: JAX_PLATFORMS=cpu python tools/tpu_golden_ref.py
Writes tests/goldens/tpu_stat_cornell.npz.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# generating the reference forces CPU; the TPU test (EIDOLA_TEST_TPU=1)
# imports render() below and must keep the hardware platform
if os.environ.get("EIDOLA_TEST_TPU") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("EIDOLA_CHUNK", "256")

import jax

if os.environ.get("EIDOLA_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np


# shared config — the TPU test imports these so both sides stay in lockstep
W = H = 96
FRAMES = 4
SCENE = "cornell"
MAX_DEPTH = 2


def render(frames: int = FRAMES):
    import jax.numpy as jnp

    from eidola_tpu.models.scenes import load_scene
    from eidola_tpu.render.config import (
        RenderConfig, default_params, default_tonemap,
    )
    from eidola_tpu.render.frame import init_frame_state, render_frame

    cfg = RenderConfig(width=W, height=H, max_depth=MAX_DEPTH,
                       env_mode="sunsky", traversal_max_steps=2048)
    scene, cam = load_scene(SCENE)
    params, tm = default_params(), default_tonemap()
    state = init_frame_state(cfg, cam)
    step = jax.jit(lambda sc, c, p, t, st: render_frame(cfg, sc, c, p, t, st))
    out = None
    for i in range(frames):
        p = params._replace(time_word=jnp.asarray(i, jnp.uint32))
        state, out = step(scene, cam, p, tm, state)
    return np.asarray(out["image"])


def main():
    img = render()
    path = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                        "tpu_stat_cornell.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, image=img.astype(np.float32))
    print(f"wrote {path}  mean={img.mean():.5f}")


if __name__ == "__main__":
    main()
