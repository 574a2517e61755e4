"""Render the per-stage fidelity captures for docs/FIDELITY.md (VERDICT r3
next #5): the same stage set the reference publishes for Bistro
(/root/reference/images: dir.jpg raw direct, ind.jpg raw indirect, com.jpg
raw composed, dir_d/ind_d/com_d denoised, gbuffer.jpg channels) rendered
from the honest bistro_standin scene.  The scene is built once; each
capture is one cfg variant (stage compiles share the cache).

Run on the TPU:  python tools/fidelity_captures.py [--size 960 544]
Writes docs/fidelity/*.png.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

from eidola_tpu.utils.platform import enable_compile_cache

enable_compile_cache()


def render(cfg, scene, cam, frames: int):
    from eidola_tpu.render.config import default_params, default_tonemap
    from eidola_tpu.render.frame import init_frame_state, render_frame

    params, tm = default_params(), default_tonemap()
    state = init_frame_state(cfg, cam)
    step = jax.jit(lambda sc, c, p, t, st: render_frame(cfg, sc, c, p, t, st))
    out = None
    for i in range(frames):
        p = params._replace(time_word=np.uint32(i))
        state, out = step(scene, cam, p, tm, state)
    return np.asarray(out["image"])


def save(path: str, img01: np.ndarray):
    from PIL import Image

    Image.fromarray(
        (np.clip(img01, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    ).save(path)
    print(f"wrote {path}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=[960, 544])
    ap.add_argument("--scene", default="bistro_standin")
    ap.add_argument("--frames", type=int, default=1,
                    help="frames for the raw captures (ref images are 1spp)")
    args = ap.parse_args()

    from eidola_tpu.models.scenes import load_scene
    from eidola_tpu.render.config import (
        DEBUG_BASE_COLOR, DEBUG_DEPTH, DEBUG_DIRECT, DEBUG_INDIRECT,
        DEBUG_NORMAL, RenderConfig,
    )

    t0 = time.perf_counter()
    scene, cam = load_scene(args.scene)
    has_alpha = bool((np.asarray(scene.materials.alpha_mode) != 0).any())
    print(f"scene build {time.perf_counter() - t0:.1f}s "
          f"({int(scene.bvh.n_tris)} tris)", flush=True)

    w, h = args.size
    base = RenderConfig(width=w, height=h, max_depth=4, env_mode="sunsky",
                        alpha_geometry=has_alpha)
    outdir = os.path.join(os.path.dirname(__file__), "..", "docs", "fidelity")
    os.makedirs(outdir, exist_ok=True)

    # capture set mirroring the reference's published images
    caps = [
        # (name, cfg, frames)   raw = 1 frame, no denoise (ref dir/ind/com)
        ("dir_raw", dataclasses.replace(
            base, denoise=False, debug_mode=DEBUG_DIRECT), args.frames),
        ("ind_raw", dataclasses.replace(
            base, denoise=False, debug_mode=DEBUG_INDIRECT), args.frames),
        ("com_raw", dataclasses.replace(base, denoise=False), args.frames),
        # denoised single-frame (ref dir_d/ind_d/com_d)
        ("dir_denoised", dataclasses.replace(
            base, debug_mode=DEBUG_DIRECT), args.frames),
        ("ind_denoised", dataclasses.replace(
            base, debug_mode=DEBUG_INDIRECT), args.frames),
        ("com_denoised", dataclasses.replace(base), args.frames),
        # G-buffer channels (ref gbuffer.jpg montage)
        ("gbuf_basecolor", dataclasses.replace(
            base, debug_mode=DEBUG_BASE_COLOR, denoise=False), 1),
        ("gbuf_normal", dataclasses.replace(
            base, debug_mode=DEBUG_NORMAL, denoise=False), 1),
        ("gbuf_depth", dataclasses.replace(
            base, debug_mode=DEBUG_DEPTH, denoise=False), 1),
        # converged accumulation (ref teaser)
        ("com_accum64", dataclasses.replace(base), 64),
    ]
    for name, cfg, frames in caps:
        t0 = time.perf_counter()
        img = render(cfg, scene, cam, frames)
        save(os.path.join(outdir, f"{name}.png"), img)
        print(f"  {name}: {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
