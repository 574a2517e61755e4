"""BVH build + stackless traversal vs brute-force oracle
(SURVEY.md §7.2 step 3: validate against all-triangles oracle)."""
import jax
import jax.numpy as jnp
import numpy as np

from eidola_tpu.ops.bvh import BVH, build_bvh, closest_hit, any_hit
from eidola_tpu.ops.intersect import brute_force_closest, ray_triangle, safe_inv_dir, ray_aabb


def _random_tris(n, seed=0, spread=4.0, size=0.5):
    r = np.random.default_rng(seed)
    base = r.uniform(-spread, spread, size=(n, 1, 3))
    offs = r.uniform(-size, size, size=(n, 3, 3))
    tris = (base + offs).astype(np.float32)
    return tris[:, 0], tris[:, 1], tris[:, 2]


def _random_rays(n, seed=1, spread=6.0):
    r = np.random.default_rng(seed)
    o = r.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestIntersectPrims:
    def test_ray_triangle_basic(self):
        o = jnp.asarray([[0.0, 0.0, -1.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        v0 = jnp.asarray([[-1.0, -1.0, 0.0]])
        e1 = jnp.asarray([[2.0, 0.0, 0.0]])
        e2 = jnp.asarray([[0.0, 2.0, 0.0]])
        hit, t, u, v = ray_triangle(
            o, d, v0, e1, e2, jnp.asarray([0.0]), jnp.asarray([10.0])
        )
        assert bool(hit[0]) and abs(float(t[0]) - 1.0) < 1e-6

    def test_ray_triangle_backface_hits(self):
        # double-sided by default (ref accelstruct.cpp:150-156 cull disable)
        o = jnp.asarray([[0.0, 0.0, 1.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        v0 = jnp.asarray([[-1.0, -1.0, 0.0]])
        e1 = jnp.asarray([[2.0, 0.0, 0.0]])
        e2 = jnp.asarray([[0.0, 2.0, 0.0]])
        hit, *_ = ray_triangle(o, d, v0, e1, e2, jnp.asarray([0.0]), jnp.asarray([10.0]))
        assert bool(hit[0])

    def test_degenerate_triangle_never_hits(self):
        o = jnp.asarray([[0.0, 0.0, -1.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        z = jnp.zeros((1, 3))
        hit, *_ = ray_triangle(o, d, z, z, z, jnp.asarray([0.0]), jnp.asarray([10.0]))
        assert not bool(hit[0])

    def test_ray_aabb(self):
        o = jnp.asarray([[0.0, 0.0, -5.0], [0.0, 5.0, -5.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        hit, _ = ray_aabb(
            o,
            safe_inv_dir(d),
            jnp.zeros(2),
            jnp.full(2, 100.0),
            jnp.asarray([[-1.0, -1.0, -1.0]]),
            jnp.asarray([[1.0, 1.0, 1.0]]),
        )
        assert bool(hit[0]) and not bool(hit[1])

    def test_ray_inside_aabb(self):
        o = jnp.asarray([[0.0, 0.0, 0.0]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])
        hit, _ = ray_aabb(
            o, safe_inv_dir(d), jnp.zeros(1), jnp.full(1, 100.0),
            jnp.asarray([[-1.0, -1.0, -1.0]]), jnp.asarray([[1.0, 1.0, 1.0]]),
        )
        assert bool(hit[0])


class TestBVH:
    def _check_matches_oracle(self, ntris, nrays, seed):
        a, b, c = _random_tris(ntris, seed=seed)
        bvh = build_bvh(a, b, c)
        o, d = _random_rays(nrays, seed=seed + 1)
        tmin = jnp.zeros(nrays)
        tmax = jnp.full(nrays, 1e9)

        rec = closest_hit(bvh, o, d, tmin, tmax)
        v0 = jnp.asarray(a)
        e1 = jnp.asarray(b - a)
        e2 = jnp.asarray(c - a)
        otri, ot, ou, ov = brute_force_closest(o, d, v0, e1, e2, tmin, tmax)

        hits = np.asarray(otri) >= 0
        np.testing.assert_array_equal(np.asarray(rec.tri) >= 0, hits)
        # distances must agree everywhere (tri ids can differ only on exact ties)
        np.testing.assert_allclose(
            np.asarray(rec.t)[hits], np.asarray(ot)[hits], rtol=1e-4
        )
        same = np.asarray(rec.tri)[hits] == np.asarray(otri)[hits]
        assert same.mean() > 0.99

    def test_small_scene(self):
        self._check_matches_oracle(10, 256, seed=3)

    def test_medium_scene(self):
        self._check_matches_oracle(500, 512, seed=4)

    def test_non_pow2_padding(self):
        self._check_matches_oracle(37, 128, seed=5)

    def test_single_triangle(self):
        a = np.asarray([[-1.0, -1.0, 0.0]], np.float32)
        b = np.asarray([[1.0, -1.0, 0.0]], np.float32)
        c = np.asarray([[0.0, 1.0, 0.0]], np.float32)
        bvh = build_bvh(a, b, c)
        o = jnp.asarray([[0.0, 0.0, -2.0], [5.0, 5.0, -2.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        rec = closest_hit(bvh, o, d, jnp.zeros(2), jnp.full(2, 100.0))
        assert int(rec.tri[0]) == 0 and int(rec.tri[1]) == -1
        assert abs(float(rec.t[0]) - 2.0) < 1e-5

    def test_any_hit_occlusion(self):
        a, b, c = _random_tris(200, seed=7)
        bvh = build_bvh(a, b, c)
        o, d = _random_rays(256, seed=8)
        tmin = jnp.zeros(256)
        tmax = jnp.full(256, 1e9)
        occ = any_hit(bvh, o, d, tmin, tmax)
        rec = closest_hit(bvh, o, d, tmin, tmax)
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(rec.tri) >= 0)

    def test_tmax_respected(self):
        a = np.asarray([[-1.0, -1.0, 5.0]], np.float32)
        b = np.asarray([[1.0, -1.0, 5.0]], np.float32)
        c = np.asarray([[0.0, 1.0, 5.0]], np.float32)
        bvh = build_bvh(a, b, c)
        o = jnp.asarray([[0.0, 0.0, 0.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        near = closest_hit(bvh, o, d, jnp.zeros(1), jnp.asarray([2.0]))
        far = closest_hit(bvh, o, d, jnp.zeros(1), jnp.asarray([10.0]))
        assert int(near.tri[0]) == -1 and int(far.tri[0]) == 0

    def test_barycentrics_reconstruct_point(self):
        a, b, c = _random_tris(64, seed=9)
        bvh = build_bvh(a, b, c)
        o, d = _random_rays(128, seed=10)
        rec = closest_hit(bvh, o, d, jnp.zeros(128), jnp.full(128, 1e9))
        m = np.asarray(rec.tri) >= 0
        if m.sum() == 0:
            return
        tri = np.asarray(rec.tri)[m]
        u = np.asarray(rec.u)[m][:, None]
        v = np.asarray(rec.v)[m][:, None]
        p_tri = a[tri] * (1 - u - v) + b[tri] * u + c[tri] * v
        p_ray = np.asarray(o)[m] + np.asarray(d)[m] * np.asarray(rec.t)[m][:, None]
        np.testing.assert_allclose(p_tri, p_ray, atol=1e-3)


class TestOrderReuse:
    def test_reused_order_gives_identical_hits(self):
        """make_ray_order + order reuse must not change results — only the
        internal packet grouping (ops/packets.py order parameter)."""
        import numpy as np
        from eidola_tpu.models.scenes import cornell_box
        from eidola_tpu.ops.packets import (
            closest_hit_sorted, make_ray_order,
        )

        scene, _ = cornell_box()
        rng = np.random.default_rng(5)
        n = 512
        o = jnp.asarray(
            np.asarray([0, 1, 0], np.float32)
            + rng.standard_normal((n, 3)).astype(np.float32) * 0.4
        )
        d = rng.standard_normal((n, 3)).astype(np.float32)
        d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
        tmin = jnp.full(n, 1e-4)
        tmax = jnp.full(n, 1e8)
        a = closest_hit_sorted(scene.bvh, o, d, tmin, tmax, max_steps=4096)
        # an order built from DIFFERENT directions (same origins) — the
        # reuse scenario of NEE-shadow -> next-bounce
        d2 = rng.standard_normal((n, 3)).astype(np.float32)
        d2 = jnp.asarray(d2 / np.linalg.norm(d2, axis=-1, keepdims=True))
        order = make_ray_order(scene.bvh, o, d2, jnp.zeros(n, bool))
        b = closest_hit_sorted(
            scene.bvh, o, d, tmin, tmax, max_steps=4096, order=order
        )
        np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
        np.testing.assert_allclose(
            np.asarray(a.t)[np.asarray(a.tri) >= 0],
            np.asarray(b.t)[np.asarray(b.tri) >= 0], rtol=1e-6,
        )


class TestOctantOrder:
    """Octant-ordered walk tables (EIDOLA_OCT / build_bvh(octant=True),
    ops/bvh_oct.py): near-child-first descent must change only VISIT ORDER
    — hits identical to the build-order walk up to exact-t ties."""

    def test_octant_matches_default(self):
        from eidola_tpu.ops.bvh import closest_hit_stats

        a, b, c = _random_tris(600, seed=11)
        bvh = build_bvh(a, b, c, octant=False)
        bvho = build_bvh(a, b, c, octant=True)
        n_nodes = bvh.walk.shape[0]
        assert bvho.walk_oct.shape == (8 * n_nodes, 8)
        # octant 0 (all-positive) is the build order itself
        np.testing.assert_array_equal(
            np.asarray(bvho.walk_oct[:n_nodes]), np.asarray(bvh.walk)
        )

        o, d = _random_rays(1024, seed=12)
        tmin = jnp.zeros(1024)
        tmax = jnp.full(1024, 1e9)
        r0 = closest_hit(bvh, o, d, tmin, tmax)
        r1, stats = closest_hit_stats(bvho, o, d, tmin, tmax)
        hits = np.asarray(r0.tri) >= 0
        np.testing.assert_array_equal(np.asarray(r1.tri) >= 0, hits)
        np.testing.assert_allclose(
            np.asarray(r1.t)[hits], np.asarray(r0.t)[hits], rtol=1e-5
        )
        assert int(stats["events"]) > 0 and int(stats["steps"]) > 0

    def test_octant_tables_preserve_tree(self):
        """Every octant table must hold the same node multiset (same boxes
        and leaf ids, reordered) and in-range escape links."""
        from eidola_tpu.ops.bvh_oct import build_octant_tables

        a, b, c = _random_tris(300, seed=13)
        bvh = build_bvh(a, b, c, as_numpy=True)
        tabs = build_octant_tables(bvh.walk).reshape(8, -1, 8)
        n = bvh.walk.shape[0]
        base = np.sort(bvh.walk[:, 7].view(np.int32))
        for o in range(8):
            leaf = tabs[o, :, 7].view(np.int32)
            np.testing.assert_array_equal(np.sort(leaf), base)
            esc = tabs[o, :, 6].view(np.int32)
            assert ((esc >= -1) & (esc <= n)).all()

    def test_octant_any_hit_matches(self):
        a, b, c = _random_tris(400, seed=14)
        bvh = build_bvh(a, b, c, octant=False)
        bvho = build_bvh(a, b, c, octant=True)
        o, d = _random_rays(512, seed=15)
        tmin = jnp.zeros(512)
        tmax = jnp.full(512, 1e9)
        np.testing.assert_array_equal(
            np.asarray(any_hit(bvh, o, d, tmin, tmax)),
            np.asarray(any_hit(bvho, o, d, tmin, tmax)),
        )


class TestSeededTmax:
    """primary_seed's core invariant: a REAL intersection's t used as the
    traversal's t_max upper bound never changes the closest hit."""

    def test_seeded_tmax_identical_hits(self):
        from eidola_tpu.ops.intersect import ray_triangle

        a, b, c = _random_tris(500, seed=21)
        bvh = build_bvh(a, b, c)
        o, d = _random_rays(1024, seed=22)
        tmin = jnp.zeros(1024)
        tmax = jnp.full(1024, 1e9)
        rec = closest_hit(bvh, o, d, tmin, tmax)

        # predict with the hit's own triangle (the steady-state case)
        slot = bvh.slot_of_tri[jnp.maximum(rec.tri, 0)]
        row = bvh.leaf_blocks.reshape(-1, 12)[slot]
        p_hit, p_t, _, _ = ray_triangle(
            o, d, row[..., 0:3], row[..., 3:6], row[..., 6:9], tmin, tmax
        )
        seeded = jnp.where(
            (rec.tri >= 0) & p_hit, p_t * (1.0 + 1e-4) + 1e-6, tmax
        )
        rec2 = closest_hit(bvh, o, d, tmin, seeded)
        np.testing.assert_array_equal(
            np.asarray(rec.tri), np.asarray(rec2.tri)
        )
        np.testing.assert_allclose(
            np.asarray(rec.t), np.asarray(rec2.t), rtol=1e-6
        )

        # a WRONG prediction (random other triangle) must also be safe:
        # its re-test only hits if the ray truly intersects it
        rng = np.random.default_rng(23)
        wrong = jnp.asarray(rng.integers(0, 500, 1024).astype(np.int32))
        slot_w = bvh.slot_of_tri[wrong]
        row_w = bvh.leaf_blocks.reshape(-1, 12)[slot_w]
        w_hit, w_t, _, _ = ray_triangle(
            o, d, row_w[..., 0:3], row_w[..., 3:6], row_w[..., 6:9],
            tmin, tmax,
        )
        seeded_w = jnp.where(w_hit, w_t * (1.0 + 1e-4) + 1e-6, tmax)
        rec3 = closest_hit(bvh, o, d, tmin, seeded_w)
        np.testing.assert_array_equal(
            np.asarray(rec.tri), np.asarray(rec3.tri)
        )
        np.testing.assert_allclose(
            np.asarray(rec.t), np.asarray(rec3.t), rtol=1e-6
        )

    def test_seeded_tmax_instanced(self):
        """Instanced seeding: the global-tri -> (pool slot, instance)
        tables re-test last frame's hit in instance OBJECT space with the
        unnormalized transformed ray — the bound is a world-space t, and
        the seeded re-trace returns identical hits."""
        from eidola_tpu.ops.bvh_instanced import (
            build_instanced_bvh, closest_hit_instanced,
        )
        from eidola_tpu.ops.intersect import ray_triangle

        a, b, c = _random_tris(160, seed=51)
        rng = np.random.default_rng(52)
        mats = []
        for k in range(5):
            th = rng.uniform(0, 2 * np.pi)
            m = np.eye(4)
            m[:3, :3] = np.asarray([
                [np.cos(th), 0, np.sin(th)],
                [0, 1, 0],
                [-np.sin(th), 0, np.cos(th)],
            ]) * rng.uniform(0.6, 1.6)
            m[:3, 3] = rng.uniform(-3, 3, 3)
            mats.append(m)
        ib = build_instanced_bvh([(a, b, c)], [(0, m) for m in mats])
        assert ib.slot_of_tri is not None and ib.inst_of_tri is not None

        o, d = _random_rays(1024, seed=53)
        tmin = jnp.zeros(1024)
        tmax = jnp.full(1024, 1e9)
        rec = closest_hit_instanced(ib, o, d, tmin, tmax)

        ptc = jnp.maximum(rec.tri, 0)
        slot = ib.slot_of_tri[ptc]
        row = ib.leaf_blocks.reshape(-1, 12)[slot]
        xf = ib.inst_inv[ib.inst_of_tri[ptc]].reshape(-1, 3, 4)
        o_t = jnp.einsum("nij,nj->ni", xf[..., :3], o) + xf[..., 3]
        d_t = jnp.einsum("nij,nj->ni", xf[..., :3], d)
        p_hit, p_t, _, _ = ray_triangle(
            o_t, d_t, row[..., 0:3], row[..., 3:6], row[..., 6:9],
            tmin, tmax,
        )
        hits = np.asarray(rec.tri) >= 0
        assert hits.sum() > 100
        # the re-test must re-find the hit triangle at the same world t
        np.testing.assert_array_equal(
            np.asarray(p_hit)[hits], True
        )
        np.testing.assert_allclose(
            np.asarray(p_t)[hits], np.asarray(rec.t)[hits], rtol=2e-4
        )
        seeded = jnp.where(
            (rec.tri >= 0) & p_hit, p_t * (1.0 + 1e-4) + 1e-6, tmax
        )
        rec2 = closest_hit_instanced(ib, o, d, tmin, seeded)
        np.testing.assert_array_equal(
            np.asarray(rec.tri), np.asarray(rec2.tri)
        )


class TestStagedCompaction:
    """Staged live-packet compaction (EIDOLA_COMPACT): the walk gathers
    surviving packets into 4x-smaller problems as they retire.  Packets
    are independent, so results must match the single-stage walk."""

    def test_staged_matches_single_stage(self, monkeypatch):
        import eidola_tpu.ops.bvh as B
        from eidola_tpu.ops.bvh import any_hit

        a, b, c = _random_tris(500, seed=61)
        bvh = build_bvh(a, b, c)
        o, d = _random_rays(4096, seed=62)
        tmin = jnp.zeros(4096)
        tmax = jnp.full(4096, 1e9)

        monkeypatch.setenv("EIDOLA_COMPACT", "0")
        rec1 = jax.tree.map(np.asarray, closest_hit(bvh, o, d, tmin, tmax))
        occ1 = np.asarray(any_hit(bvh, o, d, tmin, tmax))
        monkeypatch.setenv("EIDOLA_COMPACT", "1")
        monkeypatch.setenv("EIDOLA_COMPACT_MIN", "2")
        rec2 = jax.tree.map(np.asarray, closest_hit(bvh, o, d, tmin, tmax))
        occ2 = np.asarray(any_hit(bvh, o, d, tmin, tmax))

        assert (rec1.tri >= 0).sum() > 200
        np.testing.assert_array_equal(rec1.tri, rec2.tri)
        np.testing.assert_allclose(rec1.t, rec2.t, rtol=1e-6)
        np.testing.assert_array_equal(occ1, occ2)


class TestSBVH:
    """Spatial-split build (build_bvh(spatial=True) / EIDOLA_SBVH=1):
    duplicated straddling references must not change any query result."""

    def test_sbvh_matches_oracle(self):
        from eidola_tpu.ops.intersect import brute_force_closest

        a, b, c = _random_tris(600, seed=31)
        bvh = build_bvh(a, b, c, spatial=True)
        assert int(bvh.n_tris) == 600
        o, d = _random_rays(1024, seed=32)
        tmin = jnp.zeros(1024)
        tmax = jnp.full(1024, 1e9)
        rec = closest_hit(bvh, o, d, tmin, tmax)
        otri, ot, _, _ = brute_force_closest(
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

    def test_sbvh_any_hit_matches_plain(self):
        a, b, c = _random_tris(400, seed=33)
        b0 = build_bvh(a, b, c, spatial=False)
        b1 = build_bvh(a, b, c, spatial=True)
        o, d = _random_rays(512, seed=34)
        tmin = jnp.zeros(512)
        tmax = jnp.full(512, 1e9)
        np.testing.assert_array_equal(
            np.asarray(any_hit(b0, o, d, tmin, tmax)),
            np.asarray(any_hit(b1, o, d, tmin, tmax)),
        )

    def test_sbvh_composes_with_octant(self):
        a, b, c = _random_tris(300, seed=35)
        b0 = build_bvh(a, b, c, spatial=True, octant=False)
        b1 = build_bvh(a, b, c, spatial=True, octant=True)
        o, d = _random_rays(512, seed=36)
        tmin = jnp.zeros(512)
        tmax = jnp.full(512, 1e9)
        r0 = closest_hit(b0, o, d, tmin, tmax)
        r1 = closest_hit(b1, o, d, tmin, tmax)
        np.testing.assert_allclose(
            np.asarray(r0.t), np.asarray(r1.t), rtol=1e-5
        )
