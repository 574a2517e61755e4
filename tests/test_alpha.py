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


class TestOpaqueAlphaSplit:
    """The opaque/alpha BVH split (scene/data.py SceneData.bvh_alpha) must
    be invisible to results: a split scene and the same geometry traversed
    through one monolithic BVH agree on every hit and occlusion query."""

    def _mono(self, scene: SceneData):
        """The same scene forced through ONE full BVH (the pre-split
        traversal semantics)."""
        from eidola_tpu.ops.bvh import build_bvh

        assert scene.bvh_alpha is not None, "expected a split scene"
        blocks = np.asarray(scene.bvh.leaf_blocks).reshape(-1, 12)
        pid = np.asarray(scene.bvh.prim_id)
        blocks_a = np.asarray(scene.bvh_alpha.leaf_blocks).reshape(-1, 12)
        pid_a = np.asarray(scene.bvh_alpha.prim_id)
        T = int(pid.max()) + 1 if pid.max() >= pid_a.max() else int(pid_a.max()) + 1
        v0 = np.zeros((T, 3), np.float32)
        v1 = np.zeros((T, 3), np.float32)
        v2 = np.zeros((T, 3), np.float32)
        for b, p in ((blocks, pid), (blocks_a, pid_a)):
            occ = p >= 0
            v0[p[occ]] = b[occ, 0:3]
            v1[p[occ]] = b[occ, 0:3] + b[occ, 3:6]
            v2[p[occ]] = b[occ, 0:3] + b[occ, 6:9]
        return scene._replace(
            bvh=build_bvh(v0, v1, v2), bvh_alpha=None
        )

    def test_split_matches_monolithic(self):
        for alpha in (0.0, 1.0):
            scene = _scene_with_mask_quad(alpha=alpha)
            assert scene.bvh_alpha is not None   # the split kicked in
            mono = self._mono(scene)
            o, d = _rays()
            rng = erng.seed_pixels(1, 64, jnp.uint32(5))[0]
            for ageom in (True, False):
                cfg = RenderConfig(width=8, height=8, alpha_geometry=ageom,
                                   traversal_max_steps=512)
                _, rec_s = trace_closest(
                    cfg, scene, o, d, jnp.full(64, 1e-4),
                    jnp.full(64, 1e8), rng)
                _, rec_m = trace_closest(
                    cfg, mono, o, d, jnp.full(64, 1e-4),
                    jnp.full(64, 1e8), rng)
                # rays on a shared edge may resolve the equal-t tie to
                # either coplanar triangle -> compare hit mask, t and
                # material (the physical outputs), not the tri id
                np.testing.assert_array_equal(
                    np.asarray(rec_s.tri) >= 0, np.asarray(rec_m.tri) >= 0)
                np.testing.assert_allclose(
                    np.asarray(rec_s.t), np.asarray(rec_m.t), rtol=1e-6)
                mats = np.asarray(scene.tri_mat)
                hit = np.asarray(rec_s.tri) >= 0
                np.testing.assert_array_equal(
                    mats[np.asarray(rec_s.tri)][hit],
                    mats[np.asarray(rec_m.tri)][hit])
                _, occ_s = trace_occlusion(
                    cfg, scene, o, d, jnp.full(64, 1e-4),
                    jnp.full(64, 4.0), rng)
                _, occ_m = trace_occlusion(
                    cfg, mono, o, d, jnp.full(64, 1e-4),
                    jnp.full(64, 4.0), rng)
                np.testing.assert_array_equal(
                    np.asarray(occ_s), np.asarray(occ_m))

    def test_split_global_ids_shade_consistently(self):
        """Hit ids from the split BVHs index the SAME attribute arrays."""
        scene = _scene_with_mask_quad(alpha=1.0)
        cfg = RenderConfig(width=8, height=8, alpha_geometry=True,
                           traversal_max_steps=512)
        o, d = _rays()
        rng = erng.seed_pixels(1, 64, jnp.uint32(1))[0]
        _, rec = trace_closest(
            cfg, scene, o, d, jnp.full(64, 1e-4), jnp.full(64, 1e8), rng)
        tri = int(np.asarray(rec.tri)[0])
        # the solid MASK quad (material 0) is the hit: global tri id must
        # resolve to the MASK material through tri_mat
        assert int(np.asarray(scene.tri_mat)[tri]) == 0


class TestQueueMarchEquivalence:
    """The compacted alpha-march queue (render/tracer.py _alpha_march)
    must agree with the lockstep hop loop wherever the result is
    deterministic: MASK materials consume no rng in the alpha test, so
    hit records and occlusion must match EXACTLY across the two modes
    (BLEND materials differ only in rng stream, covered statistically by
    the estimator suites)."""

    @pytest.mark.parametrize("alpha", [0.0, 1.0])
    def test_queue_matches_lockstep_mask(self, monkeypatch, alpha):
        import eidola_tpu.render.tracer as TR

        # stacked MASK quads so rays genuinely hop several times
        quads = []
        for k in range(3):
            z = 1.0 + 0.3 * k
            quads.append(quad_tris([-2, -2, z], [2, -2, z],
                                   [2, 2, z], [-2, 2, z]))
        box = box_tris([0, 0, -1.0], [0.5, 0.5, 0.5])
        tris = np.concatenate(quads + [box])
        nq = sum(q.shape[0] for q in quads)
        mats = np.concatenate([
            np.zeros(nq, np.int32), np.ones(box.shape[0], np.int32)])
        scene = upload_scene(
            tris[:, 0], tris[:, 1], tris[:, 2], mat_ids=mats,
            materials=[
                {"base_color": [1, 1, 1, alpha], "alpha_mode": ALPHA_MASK,
                 "alpha_cutoff": 0.5},
                {"base_color": [0.5, 0.2, 0.2, 1.0]},
            ],
        )
        o, d = _rays()
        rng = erng.seed_pixels(1, 64, jnp.uint32(5))[0]
        cfg = RenderConfig(width=8, height=8, alpha_geometry=True,
                           alpha_hops=4, traversal_max_steps=512)
        out = {}
        for mode in ("queue-nonzero", "queue-argsort", "lockstep"):
            march, _, sel = mode.partition("-")
            monkeypatch.setenv("EIDOLA_ALPHA_MARCH", march)
            monkeypatch.setenv("EIDOLA_MARCH_SEL", sel or "nonzero")
            _, rec = trace_closest(
                cfg, scene, o, d, jnp.full(64, 1e-4),
                jnp.full(64, 1e8), rng)
            _, occ = trace_occlusion(
                cfg, scene, o, d, jnp.full(64, 1e-4),
                jnp.full(64, 6.0), rng)
            out[mode] = (rec, occ)
        rl, ol = out["lockstep"]
        for qmode in ("queue-nonzero", "queue-argsort"):
            rq, oq = out[qmode]
            np.testing.assert_array_equal(
                np.asarray(rq.tri), np.asarray(rl.tri), err_msg=qmode)
            np.testing.assert_allclose(np.asarray(rq.t), np.asarray(rl.t),
                                       rtol=1e-6, err_msg=qmode)
            np.testing.assert_array_equal(
                np.asarray(oq), np.asarray(ol), err_msg=qmode)


class TestAlphaCull:
    """The pre-cull (render/tracer.py _reach_boxes over the frontier cover,
    EIDOLA_ALPHA_CULL) must be result-invisible: the cover contains all
    alpha geometry, so a culled ray is provably a miss, and reaching rays
    traverse identically (the dead-clustered sort is a permutation)."""

    def _scene(self, alpha):
        quads = []
        for k in range(3):
            z = 1.0 + 0.3 * k
            quads.append(quad_tris([-2, -2, z], [2, -2, z],
                                   [2, 2, z], [-2, 2, z]))
        box = box_tris([0, 0, -1.0], [4.5, 4.5, 0.5])
        tris = np.concatenate(quads + [box])
        nq = sum(q.shape[0] for q in quads)
        mats = np.concatenate([
            np.zeros(nq, np.int32), np.ones(box.shape[0], np.int32)])
        return upload_scene(
            tris[:, 0], tris[:, 1], tris[:, 2], mat_ids=mats,
            materials=[
                {"base_color": [1, 1, 1, alpha], "alpha_mode": ALPHA_MASK,
                 "alpha_cutoff": 0.5},
                {"base_color": [0.5, 0.2, 0.2, 1.0]},
            ],
        )

    def test_frontier_is_conservative(self):
        """Any ray with a real hit must be reached by the cover."""
        from eidola_tpu.ops.bvh import build_bvh, closest_hit
        from eidola_tpu.ops.bvh_build import collect_frontier
        from eidola_tpu.render.tracer import _reach_boxes

        rng = np.random.default_rng(11)
        c = rng.uniform(-5, 5, (400, 3)).astype(np.float32)
        v0 = c + rng.normal(0, 0.3, (400, 3)).astype(np.float32)
        v1 = c + rng.normal(0, 0.3, (400, 3)).astype(np.float32)
        v2 = c + rng.normal(0, 0.3, (400, 3)).astype(np.float32)
        bvh = build_bvh(v0, v1, v2)
        for k in (2, 8, 64):
            boxes = jnp.asarray(collect_frontier(np.asarray(bvh.walk), k))
            o = jnp.asarray(rng.uniform(-8, 8, (512, 3)).astype(np.float32))
            d = rng.normal(size=(512, 3)).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            d = jnp.asarray(d)
            tn, tx = jnp.full(512, 1e-4), jnp.full(512, 1e8)
            rec = closest_hit(bvh, o, d, tn, tx)
            reach = _reach_boxes(boxes, o, d, tn, tx)
            hit = np.asarray(rec.tri) >= 0
            assert (np.asarray(reach)[hit]).all(), f"false cull at K={k}"

    @pytest.mark.parametrize("alpha", [0.0, 1.0])
    def test_cull_is_result_invisible(self, monkeypatch, alpha):
        scene = self._scene(alpha)
        assert scene.bvh_alpha is not None
        # mix of rays through the quads and rays that miss them entirely
        rng_np = np.random.default_rng(3)
        o = np.tile([0.0, 0.0, 4.0], (128, 1)).astype(np.float32)
        o[:, 0:2] += rng_np.uniform(-6, 6, (128, 2)).astype(np.float32)
        d = np.tile([0.0, 0.0, -1.0], (128, 1)).astype(np.float32)
        o, d = jnp.asarray(o), jnp.asarray(d)
        rng = erng.seed_pixels(1, 128, jnp.uint32(5))[0]
        cfg = RenderConfig(width=8, height=16, alpha_geometry=True,
                           alpha_hops=4, traversal_max_steps=512)
        out = {}
        for cull in ("0", "1"):
            monkeypatch.setenv("EIDOLA_ALPHA_CULL", cull)
            _, rec = trace_closest(
                cfg, scene, o, d, jnp.full(128, 1e-4),
                jnp.full(128, 1e8), rng)
            _, occ = trace_occlusion(
                cfg, scene, o, d, jnp.full(128, 1e-4),
                jnp.full(128, 6.0), rng)
            out[cull] = (rec, occ)
        r0, o0 = out["0"]
        r1, o1 = out["1"]
        np.testing.assert_array_equal(np.asarray(r1.tri), np.asarray(r0.tri))
        np.testing.assert_allclose(np.asarray(r1.t), np.asarray(r0.t),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o0))


class TestBandedQueueMarch:
    """The round-5 band-local queue march must agree with the single-band
    queue march exactly on MASK scenes (per-band compaction is a
    permutation of the same per-ray hop sequences)."""

    def test_banded_matches_single(self, monkeypatch):
        from eidola_tpu.ops.halo import band_context

        quads = []
        for k in range(3):
            z = 1.0 + 0.3 * k
            quads.append(quad_tris([-2, -2, z], [2, -2, z],
                                   [2, 2, z], [-2, 2, z]))
        box = box_tris([0, 0, -1.0], [4.5, 4.5, 0.5])
        tris = np.concatenate(quads + [box])
        nq = sum(q.shape[0] for q in quads)
        mats = np.concatenate([
            np.zeros(nq, np.int32), np.ones(box.shape[0], np.int32)])
        scene = upload_scene(
            tris[:, 0], tris[:, 1], tris[:, 2], mat_ids=mats,
            materials=[
                {"base_color": [1, 1, 1, 0.0], "alpha_mode": ALPHA_MASK,
                 "alpha_cutoff": 0.5},
                {"base_color": [0.5, 0.2, 0.2, 1.0]},
            ],
        )
        R = 1024   # (R/B) % 128 == 0 at B=4 -> the banded path engages
        rng_np = np.random.default_rng(3)
        o = np.tile([0.0, 0.0, 4.0], (R, 1)).astype(np.float32)
        o[:, 0:2] += rng_np.uniform(-4, 4, (R, 2)).astype(np.float32)
        d = np.tile([0.0, 0.0, -1.0], (R, 1)).astype(np.float32)
        o, d = jnp.asarray(o), jnp.asarray(d)
        rng = erng.seed_pixels(1, R, jnp.uint32(5))[0]
        cfg = RenderConfig(width=8, height=16, alpha_geometry=True,
                           alpha_hops=4, traversal_max_steps=512)
        monkeypatch.setenv("EIDOLA_ALPHA_MARCH", "queue")
        _, rec1 = trace_closest(
            cfg, scene, o, d, jnp.full(R, 1e-4), jnp.full(R, 1e8), rng)
        _, occ1 = trace_occlusion(
            cfg, scene, o, d, jnp.full(R, 1e-4), jnp.full(R, 6.0), rng)
        with band_context(4):
            _, rec4 = trace_closest(
                cfg, scene, o, d, jnp.full(R, 1e-4), jnp.full(R, 1e8), rng)
            _, occ4 = trace_occlusion(
                cfg, scene, o, d, jnp.full(R, 1e-4), jnp.full(R, 6.0), rng)
        np.testing.assert_array_equal(np.asarray(rec4.tri),
                                      np.asarray(rec1.tri))
        np.testing.assert_allclose(np.asarray(rec4.t), np.asarray(rec1.t),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(occ4), np.asarray(occ1))
