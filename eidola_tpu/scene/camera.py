"""Camera state + jittered pinhole ray generation
(ref src/scene.cpp:777-826 updateCamera; shaders/pathtrace.glsl:260-270
raySpawn; SceneCamera with last* matrices for reprojection,
host_device.h:153-165).

The camera is a small pytree of matrices so the jitted frame function can
take this-frame and last-frame cameras without recompiling.  Matrix
convention: right-handed, view = world->camera, proj maps camera->clip with
z in [0, 1] after perspective divide (Vulkan-style, matching the reference's
reprojection math).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops import rng as erng
from ..ops.math import normalize


class Camera(NamedTuple):
    view: jnp.ndarray        # (4,4) f32 world -> camera
    proj: jnp.ndarray        # (4,4) f32 camera -> clip
    view_inv: jnp.ndarray    # (4,4) f32
    proj_inv: jnp.ndarray    # (4,4) f32
    pos: jnp.ndarray         # (3,) f32 eye position
    # previous frame, for motion vectors / temporal reuse
    last_view: jnp.ndarray
    last_proj_view: jnp.ndarray
    last_pos: jnp.ndarray


def look_at(eye, center, up=(0.0, 1.0, 0.0)) -> np.ndarray:
    eye = np.asarray(eye, np.float64)
    center = np.asarray(center, np.float64)
    up = np.asarray(up, np.float64)
    f = center - eye
    f /= np.linalg.norm(f)
    s = np.cross(f, up)
    s /= np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -s @ eye
    m[1, 3] = -u @ eye
    m[2, 3] = f @ eye
    return m.astype(np.float32)


def perspective(fovy_deg: float, aspect: float, znear: float = 0.01, zfar: float = 1000.0) -> np.ndarray:
    """Vulkan-style projection: y down in clip space is NOT applied here (we
    handle image-row orientation at rasterization of rays), z in [0,1]."""
    f = 1.0 / np.tan(np.radians(fovy_deg) / 2.0)
    m = np.zeros((4, 4), np.float64)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = zfar / (znear - zfar)
    m[2, 3] = zfar * znear / (znear - zfar)
    m[3, 2] = -1.0
    return m.astype(np.float32)


def make_camera(
    eye,
    center,
    up=(0.0, 1.0, 0.0),
    fovy_deg: float = 60.0,
    aspect: float = 1.0,
    last: "Camera | None" = None,
) -> Camera:
    view = look_at(eye, center, up)
    proj = perspective(fovy_deg, aspect)
    view_inv = np.linalg.inv(view.astype(np.float64)).astype(np.float32)
    proj_inv = np.linalg.inv(proj.astype(np.float64)).astype(np.float32)
    pos = np.asarray(eye, np.float32)
    if last is None:
        last_view, last_pv, last_pos = view, proj @ view, pos
    else:
        last_view = np.asarray(last.view)
        last_pv = np.asarray(last.proj) @ np.asarray(last.view)
        last_pos = np.asarray(last.pos)
    return Camera(
        view=jnp.asarray(view),
        proj=jnp.asarray(proj),
        view_inv=jnp.asarray(view_inv),
        proj_inv=jnp.asarray(proj_inv),
        pos=jnp.asarray(pos),
        last_view=jnp.asarray(last_view),
        last_proj_view=jnp.asarray(last_pv),
        last_pos=jnp.asarray(last_pos),
    )


def advance(cam: Camera) -> Camera:
    """Roll this frame's matrices into the last-frame slots
    (ref scene.cpp:777-826 saving lastView/lastProjView)."""
    return cam._replace(
        last_view=cam.view,
        last_proj_view=cam.proj @ cam.view,
        last_pos=cam.pos,
    )


def spawn_rays(cam: Camera, height: int, width: int, seed_state):
    """Jittered pinhole rays for every pixel (ref pathtrace.glsl:260-270;
    +-0.5 px jitter ref scene.cpp:777-826).

    seed_state: (H, W) u32 RNG state; returns (state, origins (H,W,3),
    dirs (H,W,3)).
    """
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]
    seed_state, jx = erng.rand(seed_state)
    seed_state, jy = erng.rand(seed_state)
    px = xs + jx  # jitter in [0,1) ~ +-0.5 around pixel center
    py = ys + jy
    ndc_x = px / width * 2.0 - 1.0
    ndc_y = 1.0 - py / height * 2.0  # flip: row 0 = top of image
    target = jnp.stack(
        [ndc_x * jnp.ones_like(py), ndc_y * jnp.ones_like(px), jnp.ones_like(px * py)],
        axis=-1,
    )
    # unproject through proj_inv (w=1), then rotate into world
    t4 = jnp.concatenate([target, jnp.ones_like(target[..., :1])], axis=-1)
    cam_dir = t4 @ cam.proj_inv.T
    cam_dir = cam_dir[..., :3] / jnp.where(
        jnp.abs(cam_dir[..., 3:4]) > 1e-20, cam_dir[..., 3:4], 1.0
    )
    world_dir = cam_dir @ cam.view_inv[:3, :3].T
    d = normalize(world_dir)
    o = jnp.broadcast_to(cam.pos, d.shape)
    return seed_state, o, d


def project_to_pixel(proj_view, p, height: int, width: int):
    """World position -> (pixel_y, pixel_x, valid) under a proj*view matrix.
    Used for motion vectors (ref direct_stage.comp:131-139)."""
    p4 = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    clip = p4 @ proj_view.T
    w = clip[..., 3]
    valid = w > 1e-6
    inv_w = jnp.where(valid, 1.0 / jnp.maximum(w, 1e-6), 0.0)
    ndc_x = clip[..., 0] * inv_w
    ndc_y = clip[..., 1] * inv_w
    px = (ndc_x * 0.5 + 0.5) * width
    py = (0.5 - ndc_y * 0.5) * height
    inside = valid & (px >= 0) & (px < width) & (py >= 0) & (py < height)
    return py, px, inside


class CameraManipulator:
    """Orbit/dolly/pan camera controller (subset of nvpro_core's
    CameraManip used by the reference: ref main.cpp:66-68 setLookat, GUI
    orbit interaction).  Produces a new Camera per change, threading the
    previous matrices into the last* slots so motion vectors stay correct.
    """

    def __init__(self, eye, center, up=(0.0, 1.0, 0.0), fovy_deg=60.0,
                 aspect=1.0):
        self.eye = np.asarray(eye, np.float64)
        self.center = np.asarray(center, np.float64)
        self.up = np.asarray(up, np.float64)
        self.fovy_deg = float(fovy_deg)
        self.aspect = float(aspect)
        self._cam = make_camera(self.eye, self.center, self.up,
                                self.fovy_deg, self.aspect)

    @property
    def camera(self) -> Camera:
        return self._cam

    def _refresh(self) -> Camera:
        self._cam = make_camera(
            self.eye, self.center, self.up, self.fovy_deg, self.aspect,
            last=self._cam,
        )
        return self._cam

    def orbit(self, d_azimuth_rad: float, d_elevation_rad: float) -> Camera:
        """Rotate the eye around the pivot (center)."""
        off = self.eye - self.center
        r = np.linalg.norm(off)
        az = np.arctan2(off[0], off[2]) + d_azimuth_rad
        el = np.arcsin(np.clip(off[1] / max(r, 1e-9), -1, 1)) + d_elevation_rad
        el = np.clip(el, -1.55, 1.55)
        self.eye = self.center + r * np.asarray(
            [np.cos(el) * np.sin(az), np.sin(el), np.cos(el) * np.cos(az)]
        )
        return self._refresh()

    def dolly(self, factor: float) -> Camera:
        """Move eye toward (factor < 1) / away from the pivot."""
        self.eye = self.center + (self.eye - self.center) * factor
        return self._refresh()

    def pan(self, dx: float, dy: float) -> Camera:
        """Translate eye and pivot in the view plane."""
        f = self.center - self.eye
        f /= np.linalg.norm(f)
        s = np.cross(f, self.up)
        s /= np.linalg.norm(s)
        u = np.cross(s, f)
        delta = s * dx + u * dy
        self.eye = self.eye + delta
        self.center = self.center + delta
        return self._refresh()

    def recenter(self, center) -> Camera:
        """Move the orbit pivot to a picked world position, keeping the eye
        (ref sample_example.cpp:456-497 screenPicking -> CameraManip
        setLookat(eye, worldPos, up) on double-click)."""
        self.center = np.asarray(center, np.float64)
        return self._refresh()

    def hold(self) -> Camera:
        """No movement this frame: roll matrices forward (ref
        scene.cpp:777-826 last* update)."""
        self._cam = advance(self._cam)
        return self._cam
