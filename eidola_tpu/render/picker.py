"""Pixel picking: cast one ray under a pixel and report what it hit
(ref SampleExample::screenPicking via nvvk::RayPickerKHR,
sample_example.cpp:456-497 — logs instance/primitive/world pos, and
re-centers the camera on the picked point).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops.packets import closest_hit
from ..scene.camera import Camera
from ..scene.data import SceneData, shade_row


@dataclass
class PickResult:
    hit: bool
    tri_id: int = -1
    material_id: int = -1
    t: float = 0.0
    world_pos: tuple = (0.0, 0.0, 0.0)
    barycentrics: tuple = (0.0, 0.0)


def pick(scene: SceneData, cam: Camera, height: int, width: int,
         pixel_y: float, pixel_x: float) -> PickResult:
    """Trace the center ray of (pixel_y, pixel_x) and decode the hit."""
    ndc_x = (pixel_x + 0.5) / width * 2.0 - 1.0
    ndc_y = 1.0 - (pixel_y + 0.5) / height * 2.0
    t4 = jnp.asarray([ndc_x, ndc_y, 1.0, 1.0], jnp.float32)
    cam_dir = cam.proj_inv @ t4
    cam_dir = cam_dir[:3] / jnp.where(
        jnp.abs(cam_dir[3]) > 1e-20, cam_dir[3], 1.0
    )
    world_dir = cam.view_inv[:3, :3] @ cam_dir
    d = world_dir / jnp.linalg.norm(world_dir)

    o1 = jnp.broadcast_to(cam.pos, (1, 3))
    d1 = d[None]
    tn, tx = jnp.full(1, 1e-4), jnp.full(1, 1e8)
    rec = closest_hit(scene.bvh, o1, d1, tn, tx)
    if scene.bvh_alpha is not None:
        # split scenes keep alpha-tested geometry (foliage) in a second
        # BVH — without this merge a foliage double-click reports a miss
        # or the surface behind it
        rec_a = closest_hit(scene.bvh_alpha, o1, d1, tn, tx)
        take_a = (rec_a.tri[0] >= 0) & (
            (rec.tri[0] < 0) | (rec_a.t[0] < rec.t[0])
        )
        rec = type(rec)(*[jnp.where(take_a, b, a) for a, b in zip(rec, rec_a)])
    tri = int(rec.tri[0])
    if tri < 0:
        return PickResult(hit=False)
    t = float(rec.t[0])
    pos = np.asarray(cam.pos) + np.asarray(d) * t
    # instanced scenes report VIRTUAL global tri ids; tri_mat is indexed by
    # the shared pool row, resolved through shade_row like the shading path
    pool_row, _ = shade_row(scene, jnp.asarray(tri))
    return PickResult(
        hit=True,
        tri_id=tri,
        material_id=int(scene.tri_mat[int(pool_row)]),
        t=t,
        world_pos=tuple(float(x) for x in pos),
        barycentrics=(float(rec.u[0]), float(rec.v[0])),
    )
