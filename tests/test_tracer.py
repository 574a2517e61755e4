"""Estimator-level tests for the path tracer core (SURVEY §4 designed
strategy: white furnace, estimator cross-validation, debug invariants)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eidola_tpu.models.scenes import cornell_box, uv_sphere
from eidola_tpu.ops import rng as erng
from eidola_tpu.render.config import RenderConfig, default_params
from eidola_tpu.render.tracer import trace_radiance
from eidola_tpu.scene.camera import make_camera, spawn_rays
from eidola_tpu.scene.data import upload_scene
from eidola_tpu.scene.hdr import build_env_map


def _render(scene, cam, cfg, params, spp, seed0=1):
    def one(seed):
        st = erng.seed_pixels(cfg.height, cfg.width, seed)
        st, o, d = spawn_rays(cam, cfg.height, cfg.width, st)
        _, rad, _ = trace_radiance(cfg, scene, params, o, d, st)
        return rad

    f = jax.jit(one)
    acc = np.zeros((cfg.height, cfg.width, 3), np.float32)
    for s in range(spp):
        acc += np.asarray(f(jnp.uint32(seed0 + s * 7919)))
    return acc / spp


class TestFurnace:
    @pytest.mark.slow
    def test_white_furnace(self):
        """Diffuse albedo-1 sphere in a constant L=1 environment must render
        ~1 (energy conservation of BSDF + MIS + NEE; SURVEY §4)."""
        tris = uv_sphere([0, 0, 0], 1.0, n_lat=12, n_lon=18)
        env = build_env_map(np.ones((8, 16, 3), np.float32))
        scene = upload_scene(
            tris[:, 0], tris[:, 1], tris[:, 2],
            materials=[{"base_color": [1, 1, 1, 1], "roughness": 1.0}],
            env=env,
        )
        cam = make_camera(eye=[0, 0, 3.2], center=[0, 0, 0], fovy_deg=40.0)
        cfg = RenderConfig(
            width=24, height=24, max_depth=6, env_mode="hdr",
            russian_roulette=False, traversal_max_steps=2048,
        )
        img = _render(scene, cam, cfg, default_params(), spp=24)
        # centre pixels are on the sphere
        patch = img[8:16, 8:16].mean(axis=-1)
        # glTF metallic-workflow adds a small specular on top of full lambert,
        # so the furnace sits slightly above 1 (same bias as the reference)
        assert 0.9 < patch.mean() < 1.35, patch.mean()
        assert np.isfinite(img).all()

    def test_miss_shows_env(self):
        tris = uv_sphere([0, 0, 0], 0.3, n_lat=6, n_lon=8)
        env = build_env_map(np.full((8, 16, 3), 0.5, np.float32))
        scene = upload_scene(tris[:, 0], tris[:, 1], tris[:, 2], env=env)
        cam = make_camera(eye=[0, 0, 4], center=[0, 0, 0], fovy_deg=45.0)
        cfg = RenderConfig(width=16, height=16, max_depth=1, env_mode="hdr",
                           traversal_max_steps=512)
        img = _render(scene, cam, cfg, default_params(), spp=2)
        # corner pixel misses: must equal env radiance exactly
        np.testing.assert_allclose(img[0, 0], 0.5, rtol=1e-3)


class TestEstimatorConsistency:
    @pytest.mark.slow
    def test_nee_mis_matches_bsdf_only(self):
        """NEE+MIS and pure-BSDF-sampling are both unbiased for the cornell
        box -> their means must agree (cross-validation of light sampling,
        MIS weights and emitter-hit pdfs)."""
        scene, cam = cornell_box()
        params = default_params()
        base = dict(width=24, height=24, max_depth=2, env_mode="sunsky",
                    russian_roulette=False, traversal_max_steps=2048)
        cfg_a = RenderConfig(**base, use_nee=True, use_mis=True)
        cfg_b = RenderConfig(**base, use_nee=False)
        img_a = _render(scene, cam, cfg_a, params, spp=48)
        img_b = _render(scene, cam, cfg_b, params, spp=160, seed0=977)
        ma = float(img_a.mean())
        mb = float(img_b.mean())
        assert abs(ma - mb) / max(ma, mb) < 0.12, (ma, mb)

    @pytest.mark.slow
    def test_nee_only_matches_mis(self):
        """NEE-only (BSDF-found emitters dropped) is also unbiased for
        area-light direct lighting at depth 1."""
        scene, cam = cornell_box()
        params = default_params()
        base = dict(width=24, height=24, max_depth=1, env_mode="sunsky",
                    russian_roulette=False, traversal_max_steps=2048)
        cfg_a = RenderConfig(**base, use_nee=True, use_mis=True)
        cfg_b = RenderConfig(**base, use_nee=True, use_mis=False)
        img_a = _render(scene, cam, cfg_a, params, spp=32)
        img_b = _render(scene, cam, cfg_b, params, spp=32, seed0=31337)
        ma, mb = float(img_a.mean()), float(img_b.mean())
        assert abs(ma - mb) / max(ma, mb) < 0.12, (ma, mb)

    def test_deterministic_given_seed(self):
        scene, cam = cornell_box()
        cfg = RenderConfig(width=16, height=16, max_depth=1, env_mode="sunsky",
                           traversal_max_steps=1024)
        a = _render(scene, cam, cfg, default_params(), spp=1, seed0=5)
        b = _render(scene, cam, cfg, default_params(), spp=1, seed0=5)
        np.testing.assert_array_equal(a, b)

    def test_no_nans_with_rr(self):
        scene, cam = cornell_box()
        cfg = RenderConfig(width=16, height=16, max_depth=4, env_mode="sunsky",
                           russian_roulette=True, traversal_max_steps=2048)
        img = _render(scene, cam, cfg, default_params(), spp=4)
        assert np.isfinite(img).all()
