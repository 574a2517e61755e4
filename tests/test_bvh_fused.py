"""Fused table drain (EIDOLA_MT=fused, ops/bvh_fused.py): the Pallas
kernel runs in interpret mode on CPU, so its in-kernel segmented fold +
coefficient-table math is validated against the portable cols path and
the brute-force oracle without TPU hardware."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import eidola_tpu.ops.bvh as B
from eidola_tpu.ops.bvh import build_bvh, closest_hit


def _random_tris(n, seed, spread=2.0, size=0.15):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    v0 = c + rng.normal(0, size, (n, 3)).astype(np.float32)
    v1 = c + rng.normal(0, size, (n, 3)).astype(np.float32)
    v2 = c + rng.normal(0, size, (n, 3)).astype(np.float32)
    return v0, v1, v2


def _random_rays(n, seed, aim=1.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-aim, aim, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


@pytest.fixture
def fused_mode():
    old = B.MT_MODE
    B.MT_MODE = "fused"
    yield
    B.MT_MODE = old


class TestFusedDrain:
    def _cols_vs_fused(self, ntris, nrays, seed, spread=2.0, size=0.15):
        v0, v1, v2 = _random_tris(ntris, seed, spread=spread, size=size)
        o, d = _random_rays(nrays, seed + 1)

        old = B.MT_MODE
        try:
            B.MT_MODE = "cols"
            rec_c = closest_hit(build_bvh(v0, v1, v2), o, d, 1e-4, 1e30)
            rc = jax.tree.map(np.asarray, rec_c)
            B.MT_MODE = "fused"
            bvh = build_bvh(v0, v1, v2)
            assert bvh.leaf_cmat is not None and bvh.leaf_anchor is not None
            rec_f = closest_hit(bvh, o, d, 1e-4, 1e30)
            rf = jax.tree.map(np.asarray, rec_f)
        finally:
            B.MT_MODE = old

        np.testing.assert_array_equal(rc.tri >= 0, rf.tri >= 0)
        hits = rc.tri >= 0
        assert hits.sum() > 20, "degenerate test: almost no hits"
        # same winners (ties may differ only at float-ulp t differences)
        assert (rc.tri[hits] == rf.tri[hits]).mean() > 0.999
        np.testing.assert_allclose(rc.t[hits], rf.t[hits], rtol=1e-4)
        same = hits & (rc.tri == rf.tri)
        np.testing.assert_allclose(rc.u[same], rf.u[same], atol=1e-4)
        np.testing.assert_allclose(rc.v[same], rf.v[same], atol=1e-4)

    def test_matches_cols_small(self):
        self._cols_vs_fused(40, 256, seed=11, spread=0.8, size=0.5)

    def test_any_hit_matches_cols(self):
        from eidola_tpu.ops.bvh import any_hit

        v0, v1, v2 = _random_tris(60, seed=31, spread=0.8, size=0.5)
        o, d = _random_rays(256, seed=32)
        old = B.MT_MODE
        try:
            B.MT_MODE = "cols"
            occ_c = np.asarray(
                any_hit(build_bvh(v0, v1, v2), o, d, 1e-4, 1e30)
            )
            B.MT_MODE = "fused"
            occ_f = np.asarray(
                any_hit(build_bvh(v0, v1, v2), o, d, 1e-4, 1e30)
            )
        finally:
            B.MT_MODE = old
        assert occ_c.sum() > 20
        np.testing.assert_array_equal(occ_c, occ_f)

    @pytest.mark.slow
    def test_matches_cols_medium(self):
        self._cols_vs_fused(700, 1024, seed=12)

    @pytest.mark.slow
    def test_matches_cols_multichunk(self):
        # 4096 rays = 32 sub-packets x up to QUEUE events > CHUNK(256):
        # drains span multiple chunks, exercising the run-split-at-chunk-
        # boundary scatter merge and the kernel's per-call seg reset
        self._cols_vs_fused(900, 4096, seed=13)

    def test_bf16_table_close_to_cols(self, monkeypatch):
        """The shipped TPU numerics (EIDOLA_CMAT=auto -> bf16 table) are
        otherwise only exercised on hardware: CPU CI always picks the f32
        branch.  Force the bf16 table in interpret mode and bound its
        error against the f32 cols oracle — winners may flip on grazing
        tie-breaks, hit t of agreeing winners stays within bf16 rounding
        (~0.4% relative, PERF_NOTES 'MT dot precision')."""
        import eidola_tpu.ops.bvh_fused as BF

        monkeypatch.setattr(BF, "_CMAT", "bf16")
        v0, v1, v2 = _random_tris(400, seed=41)
        o, d = _random_rays(512, seed=42)
        old = B.MT_MODE
        try:
            B.MT_MODE = "cols"
            rec_c = jax.tree.map(
                np.asarray,
                closest_hit(build_bvh(v0, v1, v2), o, d, 1e-4, 1e30),
            )
            B.MT_MODE = "fused"
            bvh = build_bvh(v0, v1, v2)
            assert bvh.leaf_cmat.dtype == jnp.bfloat16
            rec_f = jax.tree.map(
                np.asarray, closest_hit(bvh, o, d, 1e-4, 1e30)
            )
        finally:
            B.MT_MODE = old
        hits = rec_c.tri >= 0
        assert hits.sum() > 50
        # miss/hit flips only on grazing rays; allow a small fraction
        assert (hits == (rec_f.tri >= 0)).mean() > 0.97
        both = hits & (rec_f.tri >= 0)
        same = both & (rec_c.tri == rec_f.tri)
        # winner flips concentrate where two hits are nearly tied in t, so
        # even flipped rays must stay close to the oracle's hit distance
        assert same.sum() / both.sum() > 0.95
        rel = np.abs(rec_f.t[both] - rec_c.t[both]) / rec_c.t[both]
        assert np.median(rel) < 5e-3, np.median(rel)
        assert np.quantile(rel, 0.95) < 5e-2, np.quantile(rel, 0.95)
        # flipped winners may land on a farther surface (grazing hit
        # rounds to a miss) — the max bound only makes sense same-winner
        rel_same = (np.abs(rec_f.t[same] - rec_c.t[same])
                    / rec_c.t[same])
        assert rel_same.max() < 0.1, rel_same.max()

    def test_instanced_matches_flat(self, fused_mode):
        from eidola_tpu.ops.bvh_instanced import (
            build_instanced_bvh, closest_hit_instanced,
        )

        v0, v1, v2 = _random_tris(120, seed=21, spread=0.8)
        mats = []
        rng = np.random.default_rng(22)
        for k in range(4):
            m = np.eye(4, dtype=np.float64)
            m[:3, 3] = rng.uniform(-3, 3, 3)
            m[:3, :3] *= rng.uniform(0.5, 1.5)
            mats.append(m)
        ib = build_instanced_bvh([(v0, v1, v2)], [(0, m) for m in mats])
        assert ib.leaf_cmat is not None

        # flattened ground truth: bake all instances
        parts = []
        for m in mats:
            r, t = m[:3, :3], m[:3, 3]
            parts.append(tuple((v @ r.T + t).astype(np.float32)
                               for v in (v0, v1, v2)))
        fa = np.concatenate([p[0] for p in parts])
        fb = np.concatenate([p[1] for p in parts])
        fc = np.concatenate([p[2] for p in parts])
        flat = build_bvh(fa, fb, fc)

        o, d = _random_rays(512, seed=23)
        rec_i = jax.tree.map(
            np.asarray, closest_hit_instanced(ib, o, d, 1e-4, 1e30)
        )
        rec_f = jax.tree.map(
            np.asarray, closest_hit(flat, o, d, 1e-4, 1e30)
        )
        np.testing.assert_array_equal(rec_i.tri >= 0, rec_f.tri >= 0)
        hits = rec_f.tri >= 0
        np.testing.assert_allclose(
            rec_i.t[hits], rec_f.t[hits], rtol=2e-4
        )
        assert (rec_i.tri[hits] == rec_f.tri[hits]).mean() > 0.99
