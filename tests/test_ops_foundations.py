"""Unit tests for foundation ops: codecs, RNG, tonemap, math, alias tables.

Mirrors SURVEY.md §4's designed test strategy (the reference has no tests;
these are the unit-level checks it performed by eyeball)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eidola_tpu.ops import math as emath
from eidola_tpu.ops import octahedral as oct
from eidola_tpu.ops import rng
from eidola_tpu.ops import tonemap
from eidola_tpu.ops.alias_table import make_alias_table, sample_alias


def _rand_dirs(n, seed=0):
    r = np.random.default_rng(seed)
    v = r.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


class TestOctahedral:
    def test_roundtrip_error(self):
        n = jnp.asarray(_rand_dirs(4096))
        dec = oct.decode_unit_u32(oct.encode_unit_u32(n))
        dots = jnp.sum(n * dec, axis=-1)
        # snorm16 quantization: worst-case angular error well under 0.1 deg
        assert float(jnp.min(dots)) > 0.9999993

    def test_axes_exact(self):
        axes = jnp.asarray(
            [[1, 0, 0], [0, 1, 0], [0, 0, 1], [-1, 0, 0], [0, -1, 0], [0, 0, -1]],
            jnp.float32,
        )
        dec = oct.decode_unit_u32(oct.encode_unit_u32(axes))
        np.testing.assert_allclose(np.asarray(dec), np.asarray(axes), atol=1e-4)

    def test_pack_unorm(self):
        v = jnp.asarray([[0.0, 0.25, 0.5, 1.0]])
        out = oct.unpack_unorm4x8(oct.pack_unorm4x8(v))
        np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=1 / 255.0)

    def test_albedo_hash_roundtrip(self):
        alb = jnp.asarray([[0.1, 0.6, 0.9]])
        h = jnp.asarray([173], jnp.uint32)
        a2, h2 = oct.unpack_albedo_hash(oct.pack_albedo_hash(alb, h))
        np.testing.assert_allclose(np.asarray(a2), np.asarray(alb), atol=1 / 255.0)
        assert int(h2[0]) == 173


class TestRng:
    def test_uniformity(self):
        state = rng.seed_pixels(64, 64, 7).reshape(-1)
        vals = []
        for _ in range(8):
            state, u = rng.rand(state)
            vals.append(np.asarray(u))
        u = np.concatenate(vals)
        assert u.min() >= 0.0 and u.max() < 1.0
        assert abs(u.mean() - 0.5) < 5e-3
        assert abs(u.var() - 1 / 12) < 5e-3
        # bins roughly uniform
        hist, _ = np.histogram(u, bins=16, range=(0, 1))
        expected = u.size / 16
        chi2 = ((hist - expected) ** 2 / expected).sum()
        assert chi2 < 50.0  # dof=15, very loose

    def test_decorrelated_pixels(self):
        s = rng.seed_pixels(32, 32, 3)
        assert np.unique(np.asarray(s)).size > 1000

    def test_tea_deterministic(self):
        a = rng.tea(jnp.uint32(5), jnp.uint32(9))
        b = rng.tea(jnp.uint32(5), jnp.uint32(9))
        assert int(a) == int(b)
        c = rng.tea(jnp.uint32(6), jnp.uint32(9))
        assert int(a) != int(c)

    def test_pcg3d_shape(self):
        v = jnp.ones((10, 3), jnp.uint32)
        assert rng.pcg3d(v).shape == (10, 3)


class TestTonemap:
    def test_srgb_roundtrip(self):
        c = jnp.linspace(0.0, 1.0, 256)
        back = tonemap.srgb_to_linear(tonemap.linear_to_srgb(c))
        np.testing.assert_allclose(np.asarray(back), np.asarray(c), atol=1e-5)

    def test_monotone_and_bounded(self):
        x = jnp.linspace(0.0, 20.0, 512)[:, None].repeat(3, 1)
        for kind in (0, 1, 2):
            y = tonemap.apply_tonemap(x, kind)
            y0 = np.asarray(y[:, 0])
            assert np.all(np.diff(y0) >= -1e-5), f"kind {kind} not monotone"
            assert y0.min() >= -1e-5 and y0.max() <= 1.0 + 1e-5


class TestMath:
    def test_frame_orthonormal(self):
        n = jnp.asarray(_rand_dirs(512, seed=1))
        t, b = emath.make_frame(n)
        for a, c in [(t, b), (t, n), (b, n)]:
            assert float(jnp.max(jnp.abs(emath.dot3(a, c)))) < 1e-5
        assert float(jnp.max(jnp.abs(emath.length(t) - 1))) < 1e-5

    def test_to_world_local_roundtrip(self):
        n = jnp.asarray(_rand_dirs(128, seed=2))
        t, b = emath.make_frame(n)
        v = jnp.asarray(_rand_dirs(128, seed=3))
        v2 = emath.to_world(t, b, n, emath.to_local(t, b, n, v))
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-5)

    def test_hdr_ldr_roundtrip(self):
        x = jnp.asarray([[0.0, 0.5, 10.0]])
        np.testing.assert_allclose(
            np.asarray(emath.ldr_to_hdr(emath.hdr_to_ldr(x))), np.asarray(x), rtol=1e-3
        )

    def test_power_heuristic_range(self):
        f = jnp.asarray([1.0, 0.0, 5.0])
        g = jnp.asarray([1.0, 0.0, 1.0])
        w = emath.power_heuristic(f, g)
        assert float(w[0]) == pytest.approx(0.5)
        assert float(w[1]) == 0.0
        assert 0.0 <= float(w[2]) <= 1.0

    def test_clamp_radiance(self):
        c = jnp.asarray([[100.0, 50.0, 1.0]])
        out = emath.clamp_radiance(c, 4.0)
        assert float(jnp.max(out)) == pytest.approx(4.0)
        # hue preserved
        np.testing.assert_allclose(
            np.asarray(out[0] / out[0, 0]), np.asarray(c[0] / c[0, 0]), rtol=1e-5
        )

    def test_cosine_hemisphere_distribution(self):
        state = rng.seed_pixels(128, 128, 0).reshape(-1)
        state, u1, u2 = rng.rand2(state)
        d = emath.cosine_sample_hemisphere(u1, u2)
        z = np.asarray(d[..., 2])
        assert np.all(z >= -1e-6)
        # E[cos theta] = 2/3 for pdf = cos/pi
        assert abs(z.mean() - 2 / 3) < 5e-3

    def test_offset_ray_moves_off_surface(self):
        p = jnp.asarray([[1.0, -2.0, 1e-6]])
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        q = emath.offset_ray(p, n)
        assert float(q[0, 2]) > float(p[0, 2])


class TestAliasTable:
    def test_distribution_chi2(self):
        w = np.asarray([1.0, 2.0, 3.0, 4.0, 0.5, 10.0], np.float64)
        table, total = make_alias_table(w)
        assert total == pytest.approx(w.sum())
        n = 200_000
        state = rng.seed_pixels(500, 400, 11).reshape(-1)
        state, u1, u2 = rng.rand2(state)
        idx, pmf = sample_alias(table, u1, u2)
        counts = np.bincount(np.asarray(idx), minlength=w.size)
        expected = w / w.sum() * n
        chi2 = ((counts - expected) ** 2 / expected).sum()
        assert chi2 < 30.0, (counts, expected)
        # returned pmf matches the true pmf of each drawn index
        true_pmf = (w / w.sum())[np.asarray(idx)]
        np.testing.assert_allclose(np.asarray(pmf), true_pmf, rtol=1e-4)

    def test_single_and_degenerate(self):
        table, total = make_alias_table(np.asarray([5.0]))
        idx, pmf = sample_alias(table, jnp.asarray([0.7]), jnp.asarray([0.3]))
        assert int(idx[0]) == 0 and float(pmf[0]) == pytest.approx(1.0)

    def test_pmf_sums_to_one(self):
        w = np.random.default_rng(0).uniform(0.01, 5.0, size=257)
        table, _ = make_alias_table(w)
        np.testing.assert_allclose(float(jnp.sum(table.pdf)), 1.0, rtol=1e-4)
