"""4-ary (wide) BVH traversal vs brute-force oracle and the binary walk
(ops/bvh_wide.py; VERDICT r2 #2 — wide walk must be a drop-in equal)."""
import pytest

# measured-loss alternative walk; verified in the nightly full run
pytestmark = pytest.mark.slow

import jax.numpy as jnp
import numpy as np

from eidola_tpu.ops.bvh import build_bvh, closest_hit
from eidola_tpu.ops.bvh_wide import (
    any_hit_wide, build_bvh_wide, closest_hit_wide, collapse_to_wide,
    wide_from_bvh,
)
from eidola_tpu.ops.intersect import brute_force_closest

from test_bvh import _random_rays, _random_tris


class TestCollapse:
    def test_collapse_covers_all_leaves(self):
        """Every leaf id of the binary tree appears exactly once among the
        wide tree's leaf children."""
        a, b, c = _random_tris(500, seed=11)
        bvh = build_bvh(a, b, c, leaf_size=8)
        walk4, bound = collapse_to_wide(np.asarray(bvh.walk))
        refs = walk4[:, 24:28].view(np.int32)
        bounds_ok = walk4[:, 0:24].reshape(-1, 4, 6)
        present = bounds_ok[:, :, 0] <= bounds_ok[:, :, 3]  # non-inverted
        leaf_ids = (~refs[present & (refs < 0)]).ravel()
        n_leaves = int(np.asarray(bvh.leaf_blocks).shape[0])
        assert sorted(leaf_ids.tolist()) == list(range(n_leaves))
        assert bound >= 0

    def test_stack_bound_positive_pad(self):
        a, b, c = _random_tris(2000, seed=12)
        w = build_bvh_wide(a, b, c, leaf_size=8)
        assert w.stack_pad.shape[0] % 8 == 0
        assert w.stack_pad.shape[0] >= 8


class TestWideTraversal:
    def _check(self, ntris, nrays, seed):
        a, b, c = _random_tris(ntris, seed=seed)
        wide = build_bvh_wide(a, b, c)
        o, d = _random_rays(nrays, seed=seed + 1)
        tmin = jnp.zeros(nrays)
        tmax = jnp.full(nrays, 1e9)

        rec = closest_hit_wide(wide, o, d, tmin, tmax)
        otri, ot, ou, ov = brute_force_closest(
            o, d, jnp.asarray(a), jnp.asarray(b - a), jnp.asarray(c - a),
            tmin, tmax,
        )
        hits = np.asarray(otri) >= 0
        np.testing.assert_array_equal(np.asarray(rec.tri) >= 0, hits)
        np.testing.assert_allclose(
            np.asarray(rec.t)[hits], np.asarray(ot)[hits], rtol=1e-4
        )
        same = np.asarray(rec.tri)[hits] == np.asarray(otri)[hits]
        assert same.mean() > 0.99

    def test_small_scene(self):
        self._check(10, 256, seed=13)

    def test_medium_scene(self):
        self._check(500, 512, seed=14)

    def test_single_triangle(self):
        a = np.asarray([[-1.0, -1.0, 0.0]], np.float32)
        b = np.asarray([[1.0, -1.0, 0.0]], np.float32)
        c = np.asarray([[0.0, 1.0, 0.0]], np.float32)
        wide = build_bvh_wide(a, b, c)
        o = jnp.asarray([[0.0, 0.0, -2.0], [5.0, 5.0, -2.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        rec = closest_hit_wide(wide, o, d, jnp.zeros(2), jnp.full(2, 100.0))
        assert int(rec.tri[0]) == 0 and int(rec.tri[1]) == -1
        assert abs(float(rec.t[0]) - 2.0) < 1e-5

    def test_matches_binary_walk(self):
        """Same leaves, same MT layout: hit t must match the binary walk
        exactly; tri ids may differ only on exact-tie distances."""
        a, b, c = _random_tris(800, seed=15)
        bvh = build_bvh(a, b, c)
        wide = wide_from_bvh(bvh)
        o, d = _random_rays(640, seed=16)
        tmin = jnp.zeros(640)
        tmax = jnp.full(640, 1e9)
        r_bin = closest_hit(bvh, o, d, tmin, tmax)
        r_wide = closest_hit_wide(wide, o, d, tmin, tmax)
        np.testing.assert_array_equal(
            np.asarray(r_bin.tri) >= 0, np.asarray(r_wide.tri) >= 0
        )
        m = np.asarray(r_bin.tri) >= 0
        np.testing.assert_allclose(
            np.asarray(r_bin.t)[m], np.asarray(r_wide.t)[m], rtol=1e-6
        )

    def test_any_hit_occlusion(self):
        a, b, c = _random_tris(200, seed=17)
        wide = build_bvh_wide(a, b, c)
        o, d = _random_rays(256, seed=18)
        tmin = jnp.zeros(256)
        tmax = jnp.full(256, 1e9)
        occ = any_hit_wide(wide, o, d, tmin, tmax)
        rec = closest_hit_wide(wide, o, d, tmin, tmax)
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(rec.tri) >= 0)

    def test_tmax_respected(self):
        a = np.asarray([[-1.0, -1.0, 5.0]], np.float32)
        b = np.asarray([[1.0, -1.0, 5.0]], np.float32)
        c = np.asarray([[0.0, 1.0, 5.0]], np.float32)
        wide = build_bvh_wide(a, b, c)
        o = jnp.asarray([[0.0, 0.0, 0.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        near = closest_hit_wide(wide, o, d, jnp.zeros(1), jnp.asarray([2.0]))
        far = closest_hit_wide(wide, o, d, jnp.zeros(1), jnp.asarray([10.0]))
        assert int(near.tri[0]) == -1 and int(far.tri[0]) == 0

