"""Native C++ builders vs the numpy oracles (SURVEY §4: unit tests per
component; the numpy implementations are the reference semantics)."""
import numpy as np
import pytest

from eidola_tpu.native import (
    build_alias_native,
    build_bvh_native,
    get_lib,
    oct_decode_native,
    oct_encode_native,
)

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native toolchain unavailable"
)


class TestNativeAlias:
    def test_matches_numpy(self):
        from eidola_tpu.ops.alias_table import build_alias_table_np

        rng = np.random.default_rng(0)
        w = rng.random(1000) ** 3
        na, nq, npdf, napdf, ntot = build_alias_native(w)
        pa, pq, ppdf, papdf, ptot = build_alias_table_np(w)
        assert ntot == pytest.approx(ptot)
        np.testing.assert_allclose(npdf, ppdf, rtol=1e-6)
        # alias layouts may differ (stack order); check sampling measure:
        # P(i) = q[i]/n + sum_j (1-q[j])/n [alias[j]==i]
        def measure(alias, q, n):
            p = q / n
            np.add.at(p, alias, (1.0 - q) / n)
            return p
        np.testing.assert_allclose(
            measure(na, nq.astype(np.float64), w.size),
            measure(pa, pq.astype(np.float64), w.size),
            atol=1e-6,
        )

    def test_sampling_distribution(self):
        w = np.asarray([1.0, 2.0, 3.0, 4.0])
        na, nq, npdf, _, tot = build_alias_native(w)
        assert tot == pytest.approx(10.0)
        rng = np.random.default_rng(1)
        u1 = rng.random(200_000)
        u2 = rng.random(200_000)
        idx = np.minimum((u1 * 4).astype(int), 3)
        take = u2 < nq[idx]
        out = np.where(take, idx, na[idx])
        freq = np.bincount(out, minlength=4) / out.size
        np.testing.assert_allclose(freq, w / 10.0, atol=5e-3)


class TestNativeBvh:
    def _tris(self, n=500, seed=0):
        rng = np.random.default_rng(seed)
        c = rng.random((n, 3)) * 10
        v0 = c + rng.normal(0, 0.2, (n, 3))
        v1 = c + rng.normal(0, 0.2, (n, 3))
        v2 = c + rng.normal(0, 0.2, (n, 3))
        return (v0.astype(np.float32), v1.astype(np.float32),
                v2.astype(np.float32))

    def test_structure_valid(self):
        v0, v1, v2 = self._tris()
        tb_min = np.minimum(np.minimum(v0, v1), v2)
        tb_max = np.maximum(np.maximum(v0, v1), v2)
        cent = (tb_min + tb_max) / 2
        bmin, bmax, escape, blk, leaves = build_bvh_native(
            tb_min, tb_max, cent, 8
        )
        n = bmin.shape[0]
        # every triangle appears exactly once across leaves
        all_tris = np.concatenate(leaves)
        assert sorted(all_tris.tolist()) == list(range(500))
        # escape links point forward (or -1) — preorder invariant
        assert ((escape > np.arange(n)) | (escape == -1)).all()
        # children contained in parents: preorder -> node i+1 inside node i
        for i in range(n):
            if blk[i] < 0:
                assert (bmin[i + 1] >= bmin[i] - 1e-5).all()
                assert (bmax[i + 1] <= bmax[i] + 1e-5).all()

    def test_same_hits_as_python_build(self):
        import jax.numpy as jnp

        from eidola_tpu.ops.bvh import build_bvh, closest_hit
        from eidola_tpu.ops.intersect import brute_force_closest

        v0, v1, v2 = self._tris(300, seed=2)
        bvh = build_bvh(v0, v1, v2, leaf_size=8)  # native path (if lib ok)

        rng = np.random.default_rng(3)
        R = 512
        o = jnp.asarray(rng.random((R, 3)) * 10, jnp.float32)
        d = rng.normal(size=(R, 3))
        d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                        jnp.float32)
        t_min = jnp.full(R, 1e-4)
        t_max = jnp.full(R, 1e8)
        rec = closest_hit(bvh, o, d, t_min, t_max)
        tri_o, t_o, _, _ = brute_force_closest(
            o, d, jnp.asarray(v0), jnp.asarray(v1 - v0), jnp.asarray(v2 - v0),
            t_min, t_max,
        )
        hit = np.asarray(tri_o) >= 0
        np.testing.assert_array_equal(np.asarray(rec.tri >= 0), hit)
        np.testing.assert_allclose(
            np.asarray(rec.t)[hit], np.asarray(t_o)[hit], rtol=1e-4
        )


class TestNativeOctCodec:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        n = rng.normal(size=(4096, 3))
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        packed = oct_encode_native(n.astype(np.float32))
        dec = oct_decode_native(packed)
        dots = (dec * n).sum(-1)
        assert dots.min() > 0.99999

    def test_matches_jnp_codec(self):
        import jax.numpy as jnp

        from eidola_tpu.ops.octahedral import decode_unit_u32, encode_unit_u32

        rng = np.random.default_rng(1)
        n = rng.normal(size=(512, 3))
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        native = oct_decode_native(oct_encode_native(n.astype(np.float32)))
        ours = np.asarray(
            decode_unit_u32(encode_unit_u32(jnp.asarray(n, jnp.float32)))
        )
        # both decodes should land within codec quantization of each other
        dots = (native * ours).sum(-1)
        assert dots.min() > 0.9999
