"""Alpha-tested geometry in traversal (ref traceray_rq.glsl:32-102 HitTest:
MASK cutoff and stochastic BLEND, both for closest-hit and shadow rays)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eidola_tpu.models.scenes import box_tris, quad_tris
from eidola_tpu.ops import rng as erng
from eidola_tpu.render.config import RenderConfig
from eidola_tpu.render.tracer import trace_closest, trace_occlusion
from eidola_tpu.scene.data import ALPHA_MASK, SceneData, upload_scene


def _scene_with_mask_quad(alpha: float):
    """A box behind a MASK quad whose base alpha = `alpha` (cutoff 0.5)."""
    quad = quad_tris([-2, -2, 1.0], [2, -2, 1.0], [2, 2, 1.0], [-2, 2, 1.0])
    box = box_tris([0, 0, -1.0], [0.5, 0.5, 0.5])
    tris = np.concatenate([quad, box])
    mats = np.concatenate([
        np.zeros(quad.shape[0], np.int32),
        np.ones(box.shape[0], np.int32),
    ])
    return upload_scene(
        tris[:, 0], tris[:, 1], tris[:, 2],
        mat_ids=mats,
        materials=[
            {"base_color": [1, 1, 1, alpha], "alpha_mode": ALPHA_MASK,
             "alpha_cutoff": 0.5},
            {"base_color": [0.5, 0.2, 0.2, 1.0]},
        ],
    )


def _rays(n=64):
    o = np.tile([0.0, 0.0, 4.0], (n, 1)).astype(np.float32)
    d = np.tile([0.0, 0.0, -1.0], (n, 1)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


class TestAlphaTraversal:
    def test_transparent_mask_is_skipped(self):
        scene = _scene_with_mask_quad(alpha=0.0)   # below cutoff: invisible
        cfg = RenderConfig(width=8, height=8, alpha_geometry=True,
                           traversal_max_steps=512)
        o, d = _rays()
        rng = erng.seed_pixels(1, 64, jnp.uint32(1))[0]
        f = jax.jit(lambda o, d, r: trace_closest(
            cfg, scene, o, d, jnp.full(64, 1e-4), jnp.full(64, 1e8), r))
        _, rec = f(o, d, rng)
        # ray passes the quad (z=1) and hits the box front face (z=-0.5)
        t = np.asarray(rec.t)
        assert (np.abs(t - 4.5) < 1e-3).all(), t[:4]

    def test_opaque_mask_is_hit(self):
        scene = _scene_with_mask_quad(alpha=1.0)   # above cutoff: solid
        cfg = RenderConfig(width=8, height=8, alpha_geometry=True,
                           traversal_max_steps=512)
        o, d = _rays()
        rng = erng.seed_pixels(1, 64, jnp.uint32(1))[0]
        _, rec = jax.jit(lambda o, d, r: trace_closest(
            cfg, scene, o, d, jnp.full(64, 1e-4), jnp.full(64, 1e8), r))(o, d, rng)
        t = np.asarray(rec.t)
        assert (np.abs(t - 3.0) < 1e-3).all(), t[:4]  # quad at z=1

    def test_shadow_through_transparent_mask(self):
        scene = _scene_with_mask_quad(alpha=0.0)
        cfg = RenderConfig(width=8, height=8, alpha_geometry=True,
                           traversal_max_steps=512)
        o, d = _rays()
        rng = erng.seed_pixels(1, 64, jnp.uint32(3))[0]
        # shadow ray stops short of the box: only the quad is in range
        _, occ = jax.jit(lambda o, d, r: trace_occlusion(
            cfg, scene, o, d, jnp.full(64, 1e-4), jnp.full(64, 4.0), r))(o, d, rng)
        assert not np.asarray(occ).any()
        # solid quad does occlude
        scene2 = _scene_with_mask_quad(alpha=1.0)
        _, occ2 = jax.jit(lambda o, d, r: trace_occlusion(
            cfg, scene2, o, d, jnp.full(64, 1e-4), jnp.full(64, 4.0), r))(o, d, rng)
        assert np.asarray(occ2).all()

    def test_alpha_off_is_unchanged(self):
        """With alpha_geometry=False the wrappers are the plain queries and
        consume no RNG."""
        scene = _scene_with_mask_quad(alpha=0.0)
        cfg = RenderConfig(width=8, height=8, alpha_geometry=False,
                           traversal_max_steps=512)
        o, d = _rays()
        rng = erng.seed_pixels(1, 64, jnp.uint32(1))[0]
        rng_out, rec = trace_closest(
            cfg, scene, o, d, jnp.full(64, 1e-4), jnp.full(64, 1e8), rng)
        assert rng_out is rng
        # quad is hit regardless of its alpha (treated opaque)
        assert (np.abs(np.asarray(rec.t) - 3.0) < 1e-3).all()
