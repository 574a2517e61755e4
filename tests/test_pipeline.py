"""End-to-end frame pipeline tests: ReSTIR DI/GI correctness vs the
ground-truth path tracer, temporal behaviour, denoiser invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eidola_tpu.models.scenes import cornell_box
from eidola_tpu.ops import rng as erng
from eidola_tpu.ops.math import ldr_to_hdr
from eidola_tpu.render.config import (
    RESTIR_RIS,
    RESTIR_TEMPORAL,
    RenderConfig,
    default_params,
    default_tonemap,
)
from eidola_tpu.render.frame import init_frame_state, make_step, reset_accumulation
from eidola_tpu.render.tracer import trace_radiance
from eidola_tpu.scene.camera import make_camera, spawn_rays

W = H = 32


def _pipeline_mean_hdr(scene, cam, cfg, frames=8, time0=0):
    params, tm = default_params(), default_tonemap()
    state = init_frame_state(cfg, cam)
    step = make_step(cfg)
    acc = np.zeros((cfg.height, cfg.width, 3), np.float32)
    for i in range(frames):
        p = params._replace(time_word=jnp.asarray(time0 + i * 677, jnp.uint32))
        state, out = step(scene, cam, p, tm, state)
        acc += np.asarray(out["hdr"] if not cfg.accumulate else out["hdr"])
    return acc / frames, state


def _truth(scene, cam, cfg_tr, spp, seed0=90001):
    params = default_params()

    def one(seed):
        st = erng.seed_pixels(cfg_tr.height, cfg_tr.width, seed)
        st, o, d = spawn_rays(cam, cfg_tr.height, cfg_tr.width, st)
        _, rad, _ = trace_radiance(cfg_tr, scene, params, o, d, st)
        return rad

    f = jax.jit(one)
    acc = np.zeros((cfg_tr.height, cfg_tr.width, 3), np.float32)
    for s in range(spp):
        acc += np.asarray(f(jnp.uint32(seed0 + 7919 * s)))
    return acc / spp


class TestDirectStage:
    def test_restir_di_matches_direct_truth(self):
        """ReSTIR DI (RIS only, no temporal) must estimate the same direct
        illumination as the NEE-only ground truth (SURVEY §4 golden check)."""
        scene, cam = cornell_box()
        cfg = RenderConfig(
            width=W, height=H, max_depth=1, env_mode="sunsky",
            restir_mode=RESTIR_RIS, denoise=False, indirect_enabled=False,
            accumulate=False, traversal_max_steps=1024,
        )
        img, _ = _pipeline_mean_hdr(scene, cam, cfg, frames=20)
        cfg_tr = RenderConfig(
            width=W, height=H, max_depth=1, env_mode="sunsky",
            use_mis=False, use_nee=True, russian_roulette=False,
            traversal_max_steps=1024,
        )
        truth = _truth(scene, cam, cfg_tr, spp=20)
        m_p, m_t = float(img.mean()), float(truth.mean())
        assert abs(m_p - m_t) / max(m_p, m_t) < 0.12, (m_p, m_t)

    def test_temporal_reuse_accumulates_m(self):
        """Temporal merge must grow reservoir M across frames up to the clamp
        (ref direct_stage.comp:219-222)."""
        scene, cam = cornell_box()
        cfg = RenderConfig(
            width=W, height=H, max_depth=1, env_mode="sunsky",
            restir_mode=RESTIR_TEMPORAL, denoise=False, indirect_enabled=False,
            accumulate=False, traversal_max_steps=1024,
        )
        params, tm = default_params(), default_tonemap()
        state = init_frame_state(cfg, cam)
        step = make_step(cfg)
        nums = []
        for i in range(6):
            p = params._replace(time_word=jnp.asarray(i * 31, jnp.uint32))
            state, _ = step(scene, cam, p, tm, state)
            nums.append(float(jnp.mean(state.di_resv["num"])))
        assert nums[-1] > nums[0] * 2, nums
        clamp = cfg.ris_sample_num * float(params.reservoir_clamp)
        assert float(jnp.max(state.di_resv["num"])) <= clamp + 1e-3

    def test_variance_reduction_vs_ris(self):
        """Temporal ReSTIR must cut per-frame variance vs plain RIS
        (the whole point of the algorithm, ref README.md:109-111)."""
        scene, cam = cornell_box()
        params, tm = default_params(), default_tonemap()

        def frame_var(mode, warmup, n):
            cfg = RenderConfig(
                width=W, height=H, max_depth=1, env_mode="sunsky",
                restir_mode=mode, denoise=False, indirect_enabled=False,
                accumulate=False, traversal_max_steps=1024,
            )
            state = init_frame_state(cfg, cam)
            step = make_step(cfg)
            imgs = []
            for i in range(warmup + n):
                p = params._replace(time_word=jnp.asarray(i * 131, jnp.uint32))
                state, out = step(scene, cam, p, tm, state)
                if i >= warmup:
                    # measure the ReSTIR-shaded illumination itself, not the
                    # composed HDR: emissive-quad edge flicker from pixel
                    # jitter is mode-independent and would swamp the metric
                    imgs.append(np.asarray(out["direct_ldr"]))
            stack = np.stack(imgs)
            return stack.var(axis=0).mean()

        v_ris = frame_var(RESTIR_RIS, 0, 6)
        v_temporal = frame_var(RESTIR_TEMPORAL, 6, 6)
        assert v_temporal < v_ris * 0.6, (v_temporal, v_ris)


class TestFramePipeline:
    def test_full_pipeline_runs_finite(self):
        scene, cam = cornell_box()
        cfg = RenderConfig(
            width=W, height=H, max_depth=3, env_mode="sunsky",
            traversal_max_steps=1024,
        )
        params, tm = default_params(), default_tonemap()
        state = init_frame_state(cfg, cam)
        step = make_step(cfg)
        for i in range(3):
            p = params._replace(time_word=jnp.asarray(i, jnp.uint32))
            state, out = step(scene, cam, p, tm, state)
        img = np.asarray(out["image"])
        assert np.isfinite(img).all()
        assert img.min() >= 0.0 and img.max() <= 1.0
        assert float(state.accum_count) == 3.0

    def test_camera_move_resets_accumulation(self):
        scene, cam = cornell_box()
        cfg = RenderConfig(
            width=W, height=H, max_depth=1, env_mode="sunsky", denoise=False,
            indirect_enabled=False, traversal_max_steps=1024,
        )
        params, tm = default_params(), default_tonemap()
        state = init_frame_state(cfg, cam)
        step = make_step(cfg)
        for i in range(3):
            state, _ = step(scene, cam, params, tm, state)
        assert float(state.accum_count) == 3.0
        cam2 = make_camera(eye=[0.2, 1.0, 3.6], center=[0, 1.0, 0], fovy_deg=45.0,
                           last=cam)
        state, _ = step(scene, cam2, params, tm, state)
        assert float(state.accum_count) == 1.0

    def test_reset_accumulation_helper(self):
        scene, cam = cornell_box()
        cfg = RenderConfig(width=W, height=H, max_depth=1, env_mode="sunsky",
                           denoise=False, indirect_enabled=False,
                           traversal_max_steps=1024)
        params, tm = default_params(), default_tonemap()
        state = init_frame_state(cfg, cam)
        step = make_step(cfg)
        state, _ = step(scene, cam, params, tm, state)
        state = reset_accumulation(state)
        assert float(state.accum_count) == 0.0


class TestDenoiser:
    def test_constant_image_invariant(self):
        from eidola_tpu.render.denoise import atrous_denoise
        from eidola_tpu.render.gbuffer import GBufferView

        h = w = 32
        img = jnp.full((h, w, 3), 0.4)
        view = GBufferView(
            valid=jnp.ones((h, w), bool),
            depth=jnp.ones((h, w)),
            pos=jnp.zeros((h, w, 3)),
            nrm=jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (h, w, 1)),
            albedo=jnp.ones((h, w, 3)),
            mat_hash=jnp.zeros((h, w), jnp.uint32),
            metallic=jnp.zeros((h, w)),
            roughness=jnp.ones((h, w)),
        )
        out = atrous_denoise(img, view, 3, 4.0, 128.0, 2.0)
        np.testing.assert_allclose(np.asarray(out), 0.4, atol=1e-5)

    def test_noise_reduced_on_flat_region(self):
        from eidola_tpu.render.denoise import atrous_denoise
        from eidola_tpu.render.gbuffer import GBufferView

        h = w = 32
        r = np.random.default_rng(0)
        img = jnp.asarray(0.5 + 0.2 * r.standard_normal((h, w, 3)), jnp.float32)
        view = GBufferView(
            valid=jnp.ones((h, w), bool),
            depth=jnp.ones((h, w)),
            pos=jnp.zeros((h, w, 3)),
            nrm=jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (h, w, 1)),
            albedo=jnp.ones((h, w, 3)),
            mat_hash=jnp.zeros((h, w), jnp.uint32),
            metallic=jnp.zeros((h, w)),
            roughness=jnp.ones((h, w)),
        )
        out = np.asarray(atrous_denoise(img, view, 3, 50.0, 128.0, 2.0))
        assert out.var() < np.asarray(img).var() * 0.2

    def test_material_edge_preserved(self):
        """Hash gate must stop filtering across a material boundary."""
        from eidola_tpu.render.denoise import atrous_denoise
        from eidola_tpu.render.gbuffer import GBufferView

        h = w = 32
        img = jnp.concatenate(
            [jnp.zeros((h, w // 2, 3)), jnp.ones((h, w // 2, 3))], axis=1
        )
        mat = jnp.concatenate(
            [jnp.zeros((h, w // 2), jnp.uint32), jnp.ones((h, w // 2), jnp.uint32)],
            axis=1,
        )
        view = GBufferView(
            valid=jnp.ones((h, w), bool),
            depth=jnp.ones((h, w)),
            pos=jnp.zeros((h, w, 3)),
            nrm=jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (h, w, 1)),
            albedo=jnp.ones((h, w, 3)),
            mat_hash=mat,
            metallic=jnp.zeros((h, w)),
            roughness=jnp.ones((h, w)),
        )
        out = np.asarray(atrous_denoise(img, view, 3, 50.0, 128.0, 2.0))
        np.testing.assert_allclose(out[:, : w // 2], 0.0, atol=1e-6)
        np.testing.assert_allclose(out[:, w // 2:], 1.0, atol=1e-6)
