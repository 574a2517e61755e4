"""Auxiliary subsystems: HDR codec, env importance sampling, picker,
checkpoint/resume, profiler, monitor, camera manipulator (SURVEY §5)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestRadianceHdr:
    def test_roundtrip(self, tmp_path):
        from eidola_tpu.scene.hdr import load_hdr, write_hdr

        rng = np.random.default_rng(0)
        img = (rng.random((16, 32, 3)) ** 2 * 50).astype(np.float32)
        p = str(tmp_path / "t.hdr")
        write_hdr(p, img)
        back = load_hdr(p)
        assert back.shape == (16, 32, 3)
        # RGBE shares one exponent across channels: tolerance is relative
        # to the max channel of each texel (~1/256 mantissa steps)
        atol = img.max(-1, keepdims=True) / 128.0
        assert (np.abs(back - img) <= atol + 2e-2 * np.abs(img)).all()

    def test_env_map_sampling_matches_luminance(self, tmp_path):
        from eidola_tpu.scene.hdr import build_env_map, env_pdf, env_sample

        img = np.ones((8, 16, 3), np.float32) * 0.1
        img[2, 5] = [100.0, 100.0, 100.0]  # bright texel
        env = build_env_map(img)
        u = jax.random.uniform(jax.random.PRNGKey(0), (4, 20000))
        d, pdf, rad = env_sample(env, u[0], u[1], u[2], u[3])
        # most samples should land on the bright texel's direction
        bright = np.asarray(rad[..., 0] > 50).mean()
        assert bright > 0.5
        # pdf consistency: env_pdf(dir) == sample pdf for those dirs
        pdf2 = env_pdf(env, d)
        np.testing.assert_allclose(
            np.asarray(pdf2), np.asarray(pdf), rtol=2e-2
        )

    def test_env_integral_positive(self):
        from eidola_tpu.scene.hdr import build_env_map

        img = np.full((4, 8, 3), 2.0, np.float32)
        env = build_env_map(img)
        # uniform radiance 2 -> luminance 2 -> integral ~ 2*4pi
        assert float(env.integral) == pytest.approx(
            2.0 * 4.0 * np.pi, rel=0.05
        )

    def test_env_params_sets_firefly_clamp(self):
        """HDR (re)load derives fireflyClampThreshold = 4 x env integral
        (ref SampleExample::loadEnvironmentHdr, sample_example.cpp:104)."""
        from eidola_tpu.render.config import default_params
        from eidola_tpu.scene.data import env_params
        from eidola_tpu.scene.hdr import build_env_map

        img = np.full((4, 8, 3), 2.0, np.float32)
        env = build_env_map(img)
        p = env_params(default_params(), env)
        assert float(p.firefly_clamp) == pytest.approx(
            4.0 * float(env.integral), rel=1e-6
        )


class TestPicker:
    def test_pick_center_hits_scene(self):
        from eidola_tpu.models.scenes import cornell_box
        from eidola_tpu.render.picker import pick

        scene, cam = cornell_box()
        r = pick(scene, cam, 64, 64, 32, 32)
        assert r.hit
        assert r.material_id >= 0
        assert r.t > 0.5
        # center of cornell looks at the back wall (z ~ -1)
        assert r.world_pos[2] == pytest.approx(-1.0, abs=0.2)

    def test_pick_sky_misses(self):
        from eidola_tpu.models.scenes import boxes_sunsky
        from eidola_tpu.render.picker import pick

        scene, cam = boxes_sunsky()
        r = pick(scene, cam, 64, 64, 1, 32)  # top row: sky
        assert not r.hit


class TestCheckpoint:
    def test_frame_state_roundtrip(self, tmp_path):
        from eidola_tpu.render.config import RenderConfig
        from eidola_tpu.render.frame import init_frame_state
        from eidola_tpu.models.scenes import cornell_box
        from eidola_tpu.utils.checkpoint import load_pytree, save_pytree

        _, cam = cornell_box()
        cfg = RenderConfig(width=32, height=32)
        st = init_frame_state(cfg, cam)
        st = st._replace(frame_idx=jnp.asarray(7, jnp.int32),
                         accum_count=jnp.asarray(3.0, jnp.float32))
        p = str(tmp_path / "ckpt.npz")
        save_pytree(p, st)
        back = load_pytree(p, init_frame_state(cfg, cam))
        assert int(back.frame_idx) == 7
        assert float(back.accum_count) == 3.0
        assert back.gbuf.depth.shape == st.gbuf.depth.shape

    def test_shape_mismatch_rejected(self, tmp_path):
        from eidola_tpu.render.config import RenderConfig
        from eidola_tpu.render.frame import init_frame_state
        from eidola_tpu.models.scenes import cornell_box
        from eidola_tpu.utils.checkpoint import load_pytree, save_pytree

        _, cam = cornell_box()
        p = str(tmp_path / "ckpt.npz")
        save_pytree(p, init_frame_state(RenderConfig(width=32, height=32), cam))
        with pytest.raises(ValueError):
            load_pytree(p, init_frame_state(
                RenderConfig(width=64, height=64), cam
            ))


class TestProfilerMonitor:
    def test_profiler_scopes(self):
        from eidola_tpu.utils.profiler import Profiler

        prof = Profiler(enabled=True)
        with prof.scope("work"):
            x = jnp.ones((8, 8)).sum()
        out = prof.timeit("jit", jax.jit(lambda a: a * 2), x)
        jax.block_until_ready(out)
        s = prof.summary()
        assert "work" in s and "jit" in s

    def test_monitor_refresh(self):
        from eidola_tpu.utils.monitor import DeviceMonitor

        mon = DeviceMonitor(interval_s=0.0)
        mon.refresh()
        assert "host RSS" in mon.summary()


class TestCameraManipulator:
    def test_orbit_keeps_distance_and_history(self):
        from eidola_tpu.scene.camera import CameraManipulator

        m = CameraManipulator(eye=[0, 0, 5], center=[0, 0, 0])
        before = np.asarray(m.camera.view)
        cam = m.orbit(0.3, 0.1)
        assert np.linalg.norm(m.eye) == pytest.approx(5.0, rel=1e-5)
        # previous matrices threaded into last* slots
        np.testing.assert_allclose(np.asarray(cam.last_view), before)

    def test_dolly_and_pan(self):
        from eidola_tpu.scene.camera import CameraManipulator

        m = CameraManipulator(eye=[0, 0, 4], center=[0, 0, 0])
        m.dolly(0.5)
        assert np.linalg.norm(m.eye - m.center) == pytest.approx(2.0)
        m.pan(1.0, 0.0)
        assert np.linalg.norm(m.center) > 0.5

    def test_hold_rolls_history(self):
        from eidola_tpu.scene.camera import CameraManipulator

        m = CameraManipulator(eye=[0, 1, 5], center=[0, 0, 0])
        cam0 = m.orbit(0.2, 0.0)
        cam1 = m.hold()
        np.testing.assert_allclose(
            np.asarray(cam1.last_view), np.asarray(cam0.view)
        )


class TestAutoExposure:
    """Global + local (mip-pyramid) auto-exposure (ref post.frag:63-101,
    133-152; VERDICT r1 missing #8)."""

    def _img(self):
        import numpy as np
        img = np.full((32, 32, 3), 0.02, np.float32)
        img[:, 16:] = 4.0           # bright right half, dark left half
        return jnp.asarray(img)

    def test_global_auto_keys_average(self):
        from eidola_tpu.render.config import default_tonemap
        from eidola_tpu.render.post import post_process

        img = self._img()
        tm = default_tonemap()._replace(
            auto_exposure=jnp.asarray(1, jnp.int32),
            dither=jnp.asarray(0, jnp.int32),
        )
        out = np.asarray(post_process(img, tm))
        assert np.isfinite(out).all()
        assert 0.05 < out.mean() < 0.95

    def test_local_adapts_per_region(self):
        """The local variant (Reinhard TMO, Yd = Y/(1+La)) compresses the
        bright region toward ~1 while keeping the dark region near-linear;
        the global burning-white variant pushes brights far above 1."""
        from eidola_tpu.render.post import (
            tone_exposure, tone_local_exposure,
        )

        img = self._img()
        avg = jnp.asarray(0.3)
        g = np.asarray(tone_exposure(img, avg, 0.5, 0.5))
        l = np.asarray(tone_local_exposure(img, avg, 0.5, 0.5))
        assert np.isfinite(l).all()
        assert l[:, 20:].mean() < 1.5, l[:, 20:].mean()   # compressed
        assert g[:, 20:].mean() > 5.0, g[:, 20:].mean()   # burnt white
        # dark region stays within ~2x of the global treatment
        assert 0.3 < l[:, :12].mean() / g[:, :12].mean() < 3.0

    def test_manual_exposure_passthrough(self):
        from eidola_tpu.render.config import default_tonemap
        from eidola_tpu.render.post import post_process

        img = self._img()
        tm = default_tonemap()._replace(
            dither=jnp.asarray(0, jnp.int32),
            exposure=jnp.asarray(2.0, jnp.float32),
        )
        out = np.asarray(post_process(img, tm))
        assert np.isfinite(out).all()
