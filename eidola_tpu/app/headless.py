"""Headless render driver: the main()/SampleExample analog
(ref src/main.cpp:50-264, src/sample_example.cpp renderScene loop) without a
swapchain — frames go to PNG/NPY on disk.

Usage:
    python -m eidola_tpu.app.headless --scene cornell --size 256 --frames 8 \
        --out /tmp/frame.png

Flags mirror the reference CLI (-f scene, -e hdr, main.cpp:52-54) plus the
RtxState/GUI switches (SURVEY §5.6): debug channel, ReSTIR mode, denoise
toggle, max depth, orbit animation, checkpoint save/resume.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

from ..utils.platform import honor_platform_env

honor_platform_env()

import jax  # noqa: E402

from ..models.scenes import load_scene
from ..render.config import RenderConfig, default_params, default_tonemap
from ..render.frame import init_frame_state, make_step
from ..scene.camera import CameraManipulator
from ..utils.checkpoint import load_pytree, save_pytree
from ..utils.monitor import DeviceMonitor
from ..utils.profiler import MilliTimer, Profiler

DEBUG_MODES = {
    "none": 0, "direct": 1, "indirect": 2, "basecolor": 3, "normal": 4,
    "depth": 5, "metallic": 6, "emissive": 7, "roughness": 8, "texcoord": 9,
}
RESTIR_MODES = {"none": 0, "ris": 1, "spatial": 2, "temporal": 3,
                "spatiotemporal": 4}


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="eidola_tpu.app.headless",
        description="EIDOLA-TPU headless path tracer",
    )
    p.add_argument("-f", "--scene", default="cornell",
                   help="registry scene name or .gltf/.glb path")
    p.add_argument("-e", "--env", default=None,
                   help=".hdr environment map (default: procedural sun&sky)")
    p.add_argument("--size", type=int, nargs="+", default=[512],
                   help="WIDTH [HEIGHT] render extent")
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--out", default="/tmp/eidola_frame.png")
    p.add_argument("--hdr-out", default=None, help="also dump linear .npy")
    p.add_argument("--max-depth", type=int, default=4)
    p.add_argument("--debug", choices=sorted(DEBUG_MODES), default="none")
    p.add_argument("--restir", choices=sorted(RESTIR_MODES),
                   default="temporal")
    p.add_argument("--no-denoise", action="store_true")
    p.add_argument("--no-indirect", action="store_true")
    p.add_argument("--orbit", type=float, default=0.0,
                   help="radians/frame camera orbit (exercises temporal reuse)")
    p.add_argument("--descale", type=int, default=1,
                   help="divide render extent by N (interactive-descaling "
                        "analog, ref sample_example.cpp:396-399; output is "
                        "upscaled back)")
    p.add_argument("--save-state", default=None,
                   help="write FrameState checkpoint npz after the run")
    p.add_argument("--load-state", default=None,
                   help="resume FrameState from a checkpoint npz")
    p.add_argument("--profile-trace", default=None,
                   help="directory for a jax.profiler trace of one frame")
    p.add_argument("--tonemap", choices=["uncharted2", "hejl", "aces"],
                   default="uncharted2")
    p.add_argument("--auto-exposure", type=int, default=0,
                   help="bitfield: 1 = auto key, +2 = local mip-pyramid "
                        "variant (ref post.frag:133-152)")
    p.add_argument("--exposure", type=float, default=1.0)
    p.add_argument("--no-texture-mips", action="store_true")
    p.add_argument("--shadow-cadence", type=int, default=1,
                   help="DI shadow visibility-reuse cadence (1 = validate "
                        "every frame; N = 1/N of tiles per frame)")
    p.add_argument("--primary-seed", action="store_true",
                   help="seed primary t_max by re-testing last frame's hit "
                        "triangle per pixel (exact; flattened scenes only)")
    p.add_argument("--quiet", action="store_true")
    return p


def run(argv=None) -> dict:
    args = build_argparser().parse_args(argv)
    w = args.size[0]
    h = args.size[1] if len(args.size) > 1 else args.size[0]
    if args.descale > 1:
        # static shapes: each descale level is its own compiled step, like
        # the reference's render-extent division while dragging
        w = max(w // args.descale // 32 * 32, 32)
        h = max(h // args.descale // 32 * 32, 32)

    timer = MilliTimer("load ")
    scene, cam = load_scene(args.scene)
    if args.env:
        from ..scene.data import attach_env
        from ..scene.hdr import build_env_map, load_hdr

        scene = attach_env(scene, build_env_map(load_hdr(args.env)))
        env_mode = "hdr"
    else:
        env_mode = "hdr" if scene.env is not None else "sunsky"
    timer.print("scene+BVH")

    cfg = RenderConfig(
        width=w, height=h,
        max_depth=args.max_depth,
        restir_mode=RESTIR_MODES[args.restir],
        denoise=not args.no_denoise,
        indirect_enabled=not args.no_indirect,
        debug_mode=DEBUG_MODES[args.debug],
        env_mode=env_mode,
        # alpha-tested traversal only when the scene needs it (static switch)
        alpha_geometry=bool(
            (np.asarray(scene.materials.alpha_mode) != 0).any()
        ),
        tonemap_kind={"uncharted2": 0, "hejl": 1, "aces": 2}[args.tonemap],
        texture_mips=not args.no_texture_mips,
        shadow_cadence=args.shadow_cadence,
        primary_seed=args.primary_seed,
    )
    params, tm = default_params(), default_tonemap()
    if scene.env is not None:
        # firefly clamp = 4 x env integral (ref sample_example.cpp:104)
        from ..scene.data import env_params

        params = env_params(params, scene.env)
    import jax.numpy as jnp

    tm = tm._replace(
        auto_exposure=jnp.asarray(args.auto_exposure, jnp.int32),
        exposure=jnp.asarray(args.exposure, jnp.float32),
    )
    manip = CameraManipulator(
        np.asarray(cam.pos), _pivot_from_cam(cam), aspect=w / h,
    )
    manip._cam = cam._replace()  # keep scene's framing
    state = init_frame_state(cfg, cam)
    if args.load_state:
        state = load_pytree(args.load_state, state)

    prof = Profiler(enabled=True)
    mon = DeviceMonitor()
    step = make_step(cfg)

    t0 = time.perf_counter()
    with prof.scope("Compile+first"):
        state, outputs = step(scene, cam, params, tm, state)
        jax.block_until_ready(outputs["image"])
    if not args.quiet:
        print(f"first frame (incl. compile): "
              f"{time.perf_counter() - t0:.1f}s")

    for i in range(1, args.frames):
        cam = manip.orbit(args.orbit, 0.0) if args.orbit else manip.hold()
        state, outputs = prof.timeit(
            "Render", step, scene, cam, params, tm, state
        )
        mon.refresh()
    jax.block_until_ready(outputs["image"])

    if args.profile_trace:
        from ..utils.profiler import trace

        with trace(args.profile_trace):
            state, outputs = step(scene, cam, params, tm, state)
            jax.block_until_ready(outputs["image"])

    if args.descale > 1:
        # on-device bilinear upscale back to the requested extent — the
        # render-extent division stays inside the compiled pipeline like the
        # reference's descaling (sample_example.cpp:396-399; post samples
        # the smaller region, post.frag uvCoords scaling)
        full_w = args.size[0]
        full_h = args.size[1] if len(args.size) > 1 else args.size[0]
        up = jax.jit(
            lambda im: jax.image.resize(
                im, (full_h, full_w, 3), method="bilinear"
            )
        )
        img = np.asarray(up(outputs["image"]))
    else:
        img = np.asarray(outputs["image"])
    _write_png(args.out, img)
    if args.hdr_out:
        np.save(args.hdr_out, np.asarray(outputs["hdr"]))
    if args.save_state:
        save_pytree(args.save_state, state)

    if not args.quiet:
        print(prof.summary())
        print(mon.summary())
        print(f"wrote {args.out}  mean={img.mean():.4f}")
    return {"image_mean": float(img.mean()), "frames": args.frames,
            "out": args.out}


def _pivot_from_cam(cam) -> np.ndarray:
    """Recover a look-at pivot ~3 units along the view axis."""
    view_inv = np.asarray(cam.view_inv)
    fwd = -view_inv[:3, 2]
    return np.asarray(cam.pos) + fwd * 3.0


def _write_png(path: str, img01: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(
        (np.clip(img01, 0.0, 1.0) * 255).astype(np.uint8)
    ).save(path)


if __name__ == "__main__":
    out = run()
    print(json.dumps(out))
