"""Interactive viewer: input/param plumbing (app/viewer.py; the render loop
itself is exercised by the headless pipeline tests — here we verify the
interaction layer the reference exposes through GLFW/ImGui,
ref main.cpp:200-264, sample_gui.cpp:119-206)."""
import json

import numpy as np

import jax.numpy as jnp

from eidola_tpu.app.viewer import ViewerState, make_handler
from eidola_tpu.models.scenes import cornell_box
from eidola_tpu.render.config import (
    RenderConfig, default_params, default_tonemap,
)
from eidola_tpu.scene.camera import CameraManipulator


def _vs():
    scene, cam = cornell_box()
    cfg = RenderConfig(width=32, height=32)
    manip = CameraManipulator(
        np.asarray(cam.pos), np.asarray([0.0, 1.0, 0.0]), aspect=1.0
    )
    manip._cam = cam._replace()
    vs = ViewerState(scene, cam, cfg, default_params(), default_tonemap(),
                     manip)
    vs.scene_name = "cornell"
    return vs


class TestViewerState:
    def test_orbit_moves_camera(self):
        vs = _vs()
        before = np.asarray(vs.cam.pos)
        vs.apply_input({"type": "orbit", "dx": 50, "dy": 10})
        after = np.asarray(vs.cam.pos)
        assert np.abs(after - before).max() > 1e-3

    def test_dolly_changes_distance(self):
        vs = _vs()
        pivot = np.asarray([0.0, 1.0, 0.0])
        d0 = np.linalg.norm(np.asarray(vs.cam.pos) - pivot)
        vs.apply_input({"type": "dolly", "f": 0.5})
        d1 = np.linalg.norm(np.asarray(vs.cam.pos) - pivot)
        assert d1 < d0

    def test_reset_flag(self):
        vs = _vs()
        vs.apply_input({"type": "reset"})
        assert vs.reset_requested

    def test_param_updates_tonemap_and_params(self):
        vs = _vs()
        vs.apply_param({"name": "exposure", "value": 2.0})
        assert float(vs.tm.exposure) == 2.0
        vs.apply_param({"name": "firefly_clamp", "value": 10.0})
        assert float(vs.params.firefly_clamp) == 10.0

    def test_unknown_param_ignored(self):
        vs = _vs()
        before = vs.tm
        vs.apply_param({"name": "nope", "value": 1.0})
        assert vs.tm == before

    def test_handler_class_builds(self):
        handler = make_handler(_vs())
        assert callable(handler)
