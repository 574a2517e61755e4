"""Golden-image regression (SURVEY §4: per-config golden renders replace the
reference's eyeball verification).  Goldens are CPU renders with fixed seeds;
loose tolerances absorb cross-version XLA FP drift — regressions in estimator
logic move the image far more than FP reassociation does."""
import os

import numpy as np

import jax

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


class TestGolden:
    def test_cornell_full_pipeline(self):
        from eidola_tpu.models.scenes import cornell_box
        from eidola_tpu.render.config import (
            RenderConfig, default_params, default_tonemap,
        )
        from eidola_tpu.render.frame import init_frame_state, render_frame

        cfg = RenderConfig(width=64, height=64, max_depth=2,
                           env_mode="sunsky", traversal_max_steps=1024)
        scene, cam = cornell_box()
        params, tm = default_params(), default_tonemap()
        state = init_frame_state(cfg, cam)
        step = jax.jit(
            lambda sc, c, p, t, st: render_frame(cfg, sc, c, p, t, st)
        )
        for _ in range(4):
            state, out = step(scene, cam, params, tm, state)
        img = np.asarray(out["hdr"])
        ref = np.load(os.path.join(GOLDEN, "cornell_64_d2_f4.npy"))
        err = np.abs(img - ref).mean()
        assert err < 0.02, f"golden drift: mean abs err {err:.4f}"
        # structure checks: colour bleeding walls (red left, green right)
        left = img[28:36, 2:8]
        right = img[28:36, 56:62]
        assert left[..., 0].mean() > 1.5 * left[..., 1].mean()
        assert right[..., 1].mean() > 1.5 * right[..., 0].mean()
