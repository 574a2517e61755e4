"""Golden-image regression matrix (SURVEY §4: per-config golden renders
replace the reference's eyeball verification; VERDICT r1 #10: cover every
light-sampling branch — sunsky, HDR-env, punctual, textured, alpha).

Goldens are CPU renders with fixed seeds; loose tolerances absorb
cross-version XLA FP drift — regressions in estimator logic move the image
far more than FP reassociation does.  Regenerate with
    python tests/golden/regen.py
"""
import os

import numpy as np
import pytest

import jax

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

# name -> (scene registry key, RenderConfig kwargs)
GOLDEN_CASES = {
    "cornell_64_d2_f4": ("cornell", dict(env_mode="sunsky")),
    "hdr_64_d2_f4": ("hdr", dict(env_mode="hdr")),
    "punctual_64_d2_f4": ("punctual", dict(env_mode="sunsky")),
    "textured_64_d2_f4": ("textured", dict(env_mode="sunsky")),
    "alpha_64_d2_f4": ("alpha", dict(env_mode="sunsky", alpha_geometry=True)),
}


def render_case(scene_key: str, cfg_kwargs: dict) -> np.ndarray:
    from eidola_tpu.models.scenes import load_scene
    from eidola_tpu.render.config import (
        RenderConfig, default_params, default_tonemap,
    )
    from eidola_tpu.render.frame import init_frame_state, render_frame

    cfg = RenderConfig(width=64, height=64, max_depth=2,
                       traversal_max_steps=1024, **cfg_kwargs)
    scene, cam = load_scene(scene_key)
    params, tm = default_params(), default_tonemap()
    state = init_frame_state(cfg, cam)
    step = jax.jit(lambda sc, c, p, t, st: render_frame(cfg, sc, c, p, t, st))
    for _ in range(4):
        state, out = step(scene, cam, params, tm, state)
    return np.asarray(out["hdr"])


class TestGolden:
    @pytest.mark.parametrize("name", sorted(GOLDEN_CASES))
    @pytest.mark.slow
    def test_golden(self, name):
        scene_key, cfg_kwargs = GOLDEN_CASES[name]
        path = os.path.join(GOLDEN, f"{name}.npy")
        if not os.path.exists(path):
            pytest.fail(f"missing golden {path}; run tests/golden/regen.py")
        img = render_case(scene_key, cfg_kwargs)
        ref = np.load(path)
        err = np.abs(img - ref).mean()
        assert err < 0.02, f"golden drift ({name}): mean abs err {err:.4f}"

    @pytest.mark.slow
    def test_cornell_structure(self):
        """Colour bleeding sanity independent of the stored golden:
        red left wall, green right wall."""
        img = render_case(*GOLDEN_CASES["cornell_64_d2_f4"])
        left = img[28:36, 2:8]
        right = img[28:36, 56:62]
        assert left[..., 0].mean() > 1.5 * left[..., 1].mean()
        assert right[..., 1].mean() > 1.5 * right[..., 0].mean()
