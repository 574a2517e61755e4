"""Inventory the collectives XLA's SPMD partitioner inserts into the
sharded frame step (VERDICT r3 weak #4: "communication volume is never
measured").

Compiles `make_sharded_step` on the virtual 8-device CPU mesh, walks the
compiled (post-partitioning) HLO text, and prints every collective with
its byte size, then totals per collective kind.  The structural question
— does the temporal motion-vector gather become a full-image all-gather,
or does XLA keep it halo-bounded? — is shape-independent, so a modest
extent answers it for 1080p too; the per-frame byte total is then scaled
by (1080p pixels / test pixels) for the production estimate.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/spmd_hlo.py [--height 128] [--width 64]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from eidola_tpu.utils.platform import honor_platform_env

honor_platform_env()

import jax

from eidola_tpu.parallel.hlo_audit import collective_inventory, shape_bytes


def compile_and_inventory(width: int, height: int, n_devices: int = 8):
    from eidola_tpu.models.scenes import cornell_box
    from eidola_tpu.parallel.sharding import (
        make_mesh, make_sharded_step, shard_pytree,
    )
    from eidola_tpu.render.config import (
        RenderConfig, default_params, default_tonemap,
    )
    from eidola_tpu.render.frame import init_frame_state

    devices = jax.devices()[:n_devices]
    mesh = make_mesh(devices)
    cfg = RenderConfig(
        width=width, height=height, max_depth=2, env_mode="sunsky",
        traversal_max_steps=128,
        denoise_direct_levels=2, denoise_indirect_levels=2,
    )
    scene, cam = cornell_box()
    params, tm = default_params(), default_tonemap()
    state = shard_pytree(mesh, init_frame_state(cfg, cam), cfg)
    step = make_sharded_step(cfg, mesh)
    compiled = step.lower(scene, cam, params, tm, state).compile()
    return cfg, compiled, collective_inventory(compiled.as_text())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=64)
    args = ap.parse_args()

    cfg, compiled, inv = compile_and_inventory(args.width, args.height)
    px = cfg.width * cfg.height

    by_kind: dict[str, list[int]] = {}
    for op, nbytes, line in sorted(inv, key=lambda t: -t[1])[:24]:
        print(f"{nbytes / 1e6:10.3f} MB  {line[:160]}")
    for op, nbytes, _ in inv:
        by_kind.setdefault(op, []).append(nbytes)
    total = 0
    print("\nper kind:")
    for op, sizes in sorted(by_kind.items()):
        print(f"  {op:22s} n={len(sizes):3d}  {sum(sizes) / 1e6:10.3f} MB")
        total += sum(sizes)
    scale = (1920 * 1088) / px
    print(f"\ntotal collective payload: {total / 1e6:.2f} MB "
          f"at {cfg.width}x{cfg.height} "
          f"(~{total * scale / 1e6:.0f} MB extrapolated to 1080p "
          f"IF volume scales with pixels)")
    full_img = cfg.height * cfg.width * 4  # one f32 plane, full image
    big = [t for t in inv if t[1] >= full_img]
    print(f"collectives >= one full-image f32 plane ({full_img / 1e6:.2f} MB): "
          f"{len(big)}")
    return inv


if __name__ == "__main__":
    main()
