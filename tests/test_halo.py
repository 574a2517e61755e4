"""Row-band locality ops (ops/halo.py) + the banded wavefront sort.

The contract under test: banding is a LAYOUT change, not an algorithm
change — banded gathers return the same values as the flat gather for
in-halo requests, and the band-vmapped traversal returns bit-identical
hit records (the sort is perf-only, any permutation is exact)."""
import numpy as np
import pytest

import jax.numpy as jnp

from eidola_tpu.ops.halo import band_context, get_bands, halo_gather, halo_gather_tree


def _ref_gather(a, ry, rx):
    return np.asarray(a)[np.asarray(ry), np.asarray(rx)]


class TestHaloGather:
    def test_in_halo_matches_flat(self):
        rng = np.random.default_rng(0)
        h, w = 32, 16
        a = rng.standard_normal((h, w, 3)).astype(np.float32)
        own = np.arange(h)[:, None]
        dy = rng.integers(-4, 5, size=(h, w))
        ry = np.clip(own + dy, 0, h - 1).astype(np.int32)
        rx = rng.integers(0, w, size=(h, w)).astype(np.int32)
        want = _ref_gather(a, ry, rx)
        for bands in (1, 2, 4, 8):
            out, in_halo = halo_gather(
                jnp.asarray(a), jnp.asarray(ry), jnp.asarray(rx),
                halo=4, bands=bands,
            )
            assert bool(jnp.all(in_halo))
            np.testing.assert_array_equal(np.asarray(out), want)

    def test_out_of_halo_clamped_and_masked(self):
        h, w = 16, 8
        a = jnp.arange(h * w, dtype=jnp.float32).reshape(h, w)
        ry = jnp.zeros((h, w), jnp.int32)          # everyone asks for row 0
        rx = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32), (h, w))
        out, in_halo = halo_gather(a, ry, rx, halo=2, bands=4)
        own = np.arange(h)[:, None]
        want_mask = np.broadcast_to(own <= 2, (h, w))   # |0 - r| <= 2
        np.testing.assert_array_equal(np.asarray(in_halo), want_mask)
        # clamped row = max(r - 2, 0)
        want_row = np.maximum(own - 2, 0)
        want = np.asarray(a)[want_row, np.asarray(rx)]
        np.testing.assert_array_equal(np.asarray(out), want)

    def test_strided_fullres_source(self):
        """Half-res output gathering a full-res source (indirect temporal)."""
        rng = np.random.default_rng(1)
        hf, wf = 32, 8
        h2, w2 = 16, 4
        a = rng.standard_normal((hf, wf)).astype(np.float32)
        own = np.arange(h2)[:, None] * 2
        dy = rng.integers(-3, 4, size=(h2, w2))
        ry = np.clip(own + dy, 0, hf - 1).astype(np.int32)
        rx = rng.integers(0, wf, size=(h2, w2)).astype(np.int32)
        want = _ref_gather(a, ry, rx)
        for bands in (1, 4):
            out, in_halo = halo_gather(
                jnp.asarray(a), jnp.asarray(ry), jnp.asarray(rx),
                halo=3, stride=2, bands=bands,
            )
            assert bool(jnp.all(in_halo))
            np.testing.assert_array_equal(np.asarray(out), want)

    def test_non_divisible_falls_back(self):
        """Band counts that don't divide the height still return exact
        values (flat fallback)."""
        rng = np.random.default_rng(2)
        h, w = 30, 4                                # 30 % 8 != 0
        a = rng.standard_normal((h, w)).astype(np.float32)
        own = np.arange(h)[:, None]
        ry = np.broadcast_to(
            np.clip(own + 1, 0, h - 1), (h, w)
        ).astype(np.int32)
        rx = np.broadcast_to(np.arange(w, dtype=np.int32), (h, w))
        out, _ = halo_gather(
            jnp.asarray(a), jnp.asarray(ry), jnp.asarray(rx),
            halo=2, bands=8,
        )
        np.testing.assert_array_equal(np.asarray(out), _ref_gather(a, ry, rx))

    def test_tree_shares_mask(self):
        h, w = 16, 4
        tree = {"a": jnp.ones((h, w)), "b": jnp.zeros((h, w, 3))}
        ry = jnp.zeros((h, w), jnp.int32)
        rx = jnp.zeros((h, w), jnp.int32)
        out, mask = halo_gather_tree(tree, ry, rx, halo=1)
        assert out["a"].shape == (h, w)
        assert out["b"].shape == (h, w, 3)
        assert mask.shape == (h, w)

    def test_band_context(self):
        assert get_bands() == 1
        with band_context(8):
            assert get_bands() == 8
            with band_context(2):
                assert get_bands() == 2
            assert get_bands() == 8
        assert get_bands() == 1


class TestBandedTraversal:
    def test_banded_sorted_traverse_exact(self):
        """Band-vmapped sorted traversal returns bit-identical hits."""
        from eidola_tpu.models.scenes import stress_grid
        from eidola_tpu.ops.packets import closest_hit_sorted, any_hit_sorted

        scene, cam = stress_grid(2)
        rng = np.random.default_rng(3)
        R = 512                                    # 4 bands x 128-ray packets
        o = jnp.asarray(
            rng.uniform(-2, 2, size=(R, 3)).astype(np.float32)
        )
        d_np = rng.standard_normal((R, 3)).astype(np.float32)
        d = jnp.asarray(d_np / np.linalg.norm(d_np, axis=1, keepdims=True))
        t_min = jnp.full((R,), 1e-4)
        t_max = jnp.full((R,), 1e8)

        base = closest_hit_sorted(scene.bvh, o, d, t_min, t_max)
        with band_context(4):
            banded = closest_hit_sorted(scene.bvh, o, d, t_min, t_max)
        for a, b in zip(base, banded):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        occ = any_hit_sorted(scene.bvh, o, d, t_min, t_max)
        with band_context(4):
            occ_b = any_hit_sorted(scene.bvh, o, d, t_min, t_max)
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_b))

    def test_banded_img_traverse_exact(self):
        from eidola_tpu.models.scenes import cornell_box
        from eidola_tpu.ops.packets import closest_hit_img
        from eidola_tpu.scene.camera import spawn_rays

        scene, cam = cornell_box()
        h, w = 32, 16
        _, o, d = spawn_rays(cam, h, w, jnp.full((h, w), 7, jnp.uint32))
        t_min = jnp.full((h, w), 1e-4)
        t_max = jnp.full((h, w), 1e8)
        base = closest_hit_img(scene.bvh, o, d, t_min, t_max)
        with band_context(4):
            banded = closest_hit_img(scene.bvh, o, d, t_min, t_max)
        for a, b in zip(base, banded):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
