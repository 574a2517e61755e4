"""Headline benchmark: full ReSTIR DI+GI+denoise frame at 1080p at
REFERENCE SCALE (>= 2.8M triangles).

Mirrors the reference's published benchmark (BASELINE.md: Bistro Exterior,
2.83M tris, 1920x1080, ReSTIR DI+GI + a-trous denoise, 18.2 ms/frame total
on an RTX 3070 Ti Laptop).  Offline environment has no Bistro asset, so
the triangle load/depth complexity is a procedural stand-in city at the
same triangle count (eidola_tpu/models/scenes.py: bistro_standin; set
EIDOLA_BENCH_SCENE=stress for the small 64.5k-tri scene).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = reference_ms / our_ms (>1 means faster than the reference).
"""
from __future__ import annotations

import json
import os
import time

import jax

from eidola_tpu.utils.platform import enable_compile_cache

enable_compile_cache()  # repeat bench runs reuse multi-minute TPU compiles

BASELINE_MS = 18.2  # reference total frame, Bistro Exterior 1080p (BASELINE.md)
W, H = 1920, 1080
WARMUP = 2
ITERS = 5


def _probe_device(timeout_s: float = 240.0):
    """The axon tunnel can die outright (jax.devices() then hangs
    indefinitely — observed 2026-08-17).  Probe it on a daemon thread so a
    dead tunnel yields an honest JSON artifact instead of a driver kill."""
    import threading

    out = {}

    def probe():
        try:
            import jax.numpy as jnp

            out["devices"] = jax.devices()
            x = jnp.ones((256, 256))
            (x @ x).block_until_ready()
            out["ok"] = True
        except Exception as e:  # pragma: no cover - infra failure path
            out["err"] = repr(e)

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    return out.get("ok", False), out.get("err", "device probe timed out")


def main():
    ok, err = _probe_device()
    if not ok:
        print(json.dumps({
            "metric": "restir_di_gi_denoise_1080p_ms",
            "value": -1,
            "unit": "ms/frame",
            "vs_baseline": 0.0,
            "error": f"TPU unreachable, no measurement: {err}",
        }))
        return

    import numpy as np

    from eidola_tpu.models.scenes import load_scene
    from eidola_tpu.render.config import (
        RenderConfig,
        default_params,
        default_tonemap,
    )
    from eidola_tpu.render.frame import init_frame_state, render_frame

    # bistro_standin (default) is the HONEST headline scene: textured
    # (base color + normal maps), alpha-MASK foliage, instanced trees —
    # the workload classes the reference pays for on Bistro Exterior.
    # bistro_flat keeps the round-2/3 untextured flattened variant;
    # stress is the small 64.5k scene.
    name = os.environ.get("EIDOLA_BENCH_SCENE", "bistro_standin")
    scene, cam = load_scene(name) if name != "stress" else load_scene(
        "stress", n=16
    )
    n_tris = int(scene.bvh.n_tris)
    has_alpha = bool((np.asarray(scene.materials.alpha_mode) != 0).any())

    # Reference config: maxDepth 4, RIS M=4, temporal reuse, 4/5 denoise
    # levels (BASELINE.md "algorithm constants").  bistro_hdr matches the
    # reference's actual benchmark lighting (HDR env + alias-table
    # sampling, hdr_sampling.cpp:107-242) instead of the sun&sky model.
    env_mode = "hdr" if scene.env is not None else "sunsky"
    cfg = RenderConfig(width=W, height=H, max_depth=4, env_mode=env_mode,
                       alpha_geometry=has_alpha)
    params, tm = default_params(), default_tonemap()

    def measure(cfg, tries: int = 2):
        state = init_frame_state(cfg, cam)
        step = jax.jit(
            lambda sc, c, p, t, st: render_frame(cfg, sc, c, p, t, st)
        )
        # the axon remote-compile path occasionally fails over to a
        # chipless AOT helper whose Mosaic build rejects valid kernels
        # (observed 2026-08-19: "Bad lhs type" on the fused drain's bf16
        # dot); a retry re-routes to the healthy on-device compiler
        for attempt in range(tries):
            try:
                state, out = step(scene, cam, params, tm, state)
                break
            except Exception:
                if attempt + 1 == tries:
                    raise
        for _ in range(WARMUP - 1):
            state, out = step(scene, cam, params, tm, state)
        jax.block_until_ready(out["image"])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, out = step(scene, cam, params, tm, state)
        jax.block_until_ready(out["image"])
        return (time.perf_counter() - t0) / ITERS * 1e3

    ms = measure(cfg)

    # rays issued per frame: MODELED from the config by default (1 primary
    # + 1 DI shadow per pixel; GI at quarter pixel count traces 1 bsdf +
    # per-bounce NEE shadow + continuation, plus deep tiles).  With
    # EIDOLA_BENCH_RAYCOUNT=1 the count is MEASURED by live-lane counters
    # inserted at every traversal front door (ops/packets.py RAY_LEDGER) —
    # one extra compile of the frame with host callbacks.
    n_pix = W * H
    n_half = n_pix // 4
    deep = (n_half // 4) * 2 * max(cfg.max_depth - 1, 0)
    rays = n_pix * 2 + n_half * 3 + deep
    method = "modeled"
    if os.environ.get("EIDOLA_BENCH_RAYCOUNT", "1") == "1":
        from eidola_tpu.ops import packets as _pk

        os.environ["EIDOLA_COUNT_RAYS"] = "1"
        try:
            state = init_frame_state(cfg, cam)
            step_c = jax.jit(
                lambda sc, c, p, t, st: render_frame(cfg, sc, c, p, t, st)
            )
            st2, out = step_c(scene, cam, params, tm, state)
            jax.block_until_ready(out["image"])
            # count a steady-state frame (the first resets accumulation)
            _pk.RAY_LEDGER.clear()
            st2, out = step_c(scene, cam, params, tm, st2)
            jax.block_until_ready(out["image"])
            jax.effects_barrier()
            rays = sum(_pk.RAY_LEDGER)
            method = "measured: live-lane traversal counters"
        except Exception:
            # counting is best-effort: host callbacks ride the axon
            # tunnel — if the extra compile or callback path fails the
            # headline still ships with the modeled count
            pass
        finally:
            os.environ.pop("EIDOLA_COUNT_RAYS", None)
    result = {
        "metric": f"restir_di_gi_denoise_1080p_ms ({n_tris} tris, "
                  f"{jax.devices()[0].device_kind})",
        "value": round(ms, 2),
        "unit": "ms/frame",
        "vs_baseline": round(BASELINE_MS / ms, 4),
        "mrays_per_s": round(rays / ms / 1e3, 2),
        "mrays_method": method,
    }
    if os.environ.get("EIDOLA_BENCH_BREAKDOWN"):
        # per-stage attribution by ablation (extra full compiles — not run
        # by the driver; set EIDOLA_BENCH_BREAKDOWN=1 locally).  Print the
        # headline line FIRST so a breakdown failure can't lose it.
        print(json.dumps(result))
        import dataclasses

        no_dn = measure(dataclasses.replace(cfg, denoise=False))
        di_only = measure(
            dataclasses.replace(cfg, denoise=False, indirect_enabled=False)
        )
        result["breakdown_ms"] = {
            "direct": round(di_only, 2),
            "indirect": round(no_dn - di_only, 2),
            "denoise_compose": round(ms - no_dn, 2),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
