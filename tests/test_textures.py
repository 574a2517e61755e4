"""Texture stack: wrap modes, mip atlas, ray-cone lod selection
(ref scene.cpp:554-646 sampler translation + mip chains; VERDICT r1 #7)."""
import numpy as np
import pytest

import jax.numpy as jnp

from eidola_tpu.scene.data import (
    WRAP_CLAMP, WRAP_MIRROR, WRAP_REPEAT, make_tex_stack,
)
from eidola_tpu.scene.textures import sample_texture


def _grad_tex(n=16):
    """Horizontal gradient: texel x has red = x/(n-1)."""
    t = np.zeros((n, n, 4), np.float32)
    t[..., 0] = np.linspace(0, 1, n)[None, :]
    t[..., 3] = 1.0
    return t


class TestWrapModes:
    def test_repeat_vs_clamp(self):
        stack = make_tex_stack([
            {"image": _grad_tex(), "wrap_s": WRAP_REPEAT},
            {"image": _grad_tex(), "wrap_s": WRAP_CLAMP},
        ])
        # just past the right edge: repeat wraps to the left (dark),
        # clamp sticks to the right edge (bright)
        uv = jnp.asarray([[1.2, 0.5]])
        rep = sample_texture(stack, jnp.asarray([0]), uv)
        cla = sample_texture(stack, jnp.asarray([1]), uv)
        assert float(rep[0, 0]) < 0.35, float(rep[0, 0])
        assert float(cla[0, 0]) > 0.9, float(cla[0, 0])

    def test_mirror(self):
        stack = make_tex_stack([
            {"image": _grad_tex(), "wrap_s": WRAP_MIRROR},
        ])
        # u = 1.25 mirrors to ~0.75
        uv_m = jnp.asarray([[1.25, 0.5]])
        uv_d = jnp.asarray([[0.75, 0.5]])
        a = sample_texture(stack, jnp.asarray([0]), uv_m)
        b = sample_texture(stack, jnp.asarray([0]), uv_d)
        assert abs(float(a[0, 0]) - float(b[0, 0])) < 0.08

    def test_no_texture_returns_white(self):
        stack = make_tex_stack([_grad_tex()])
        c = sample_texture(stack, jnp.asarray([-1]), jnp.asarray([[0.5, 0.5]]))
        np.testing.assert_allclose(np.asarray(c[0]), 1.0)


class TestMips:
    def test_highest_level_is_average(self):
        """Sampling at a huge footprint must return ~the texture mean."""
        check = np.zeros((32, 32, 4), np.float32)
        yy, xx = np.mgrid[0:32, 0:32]
        check[..., :3] = ((yy // 4 + xx // 4) % 2).astype(np.float32)[..., None]
        check[..., 3] = 1.0
        stack = make_tex_stack([check])
        c = sample_texture(
            stack, jnp.asarray([0]), jnp.asarray([[0.37, 0.61]]),
            footprint=jnp.asarray([100.0]),
        )
        assert abs(float(c[0, 0]) - 0.5) < 0.05, float(c[0, 0])

    def test_level0_matches_plain_bilinear(self):
        stack = make_tex_stack([_grad_tex()])
        uv = jnp.asarray([[0.31, 0.77]])
        a = sample_texture(stack, jnp.asarray([0]), uv)
        b = sample_texture(stack, jnp.asarray([0]), uv,
                           footprint=jnp.asarray([0.0]))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_mixed_size_stack_small_texture_not_black(self):
        """Regression (ADVICE r2 high): a small uniform texture stacked with
        a large one must NOT sample black past its own deepest mip level."""
        small = np.full((4, 4, 4), 0.8, np.float32)
        big = _grad_tex(64)
        stack = make_tex_stack([small, big])
        for fp in (1.0, 8.0, 100.0):
            c = sample_texture(
                stack, jnp.asarray([0]), jnp.asarray([[0.5, 0.5]]),
                footprint=jnp.asarray([fp]),
            )
            np.testing.assert_allclose(np.asarray(c[0, :3]), 0.8, atol=1e-5)

    def test_npot_mip_extents_uniform(self):
        """Regression (ADVICE r2 low): NPOT textures must sample stored mip
        extents (ceil halving), not shifted/cropped sub-regions — a uniform
        NPOT texture stays uniform at every lod."""
        t = np.full((6, 10, 4), 0.4, np.float32)
        stack = make_tex_stack([t, _grad_tex(64)])
        uv = jnp.asarray([[0.9, 0.9], [0.1, 0.55]])
        tid = jnp.zeros(2, jnp.int32)
        for lod in (1.0, 2.0, 3.0):
            c = sample_texture(stack, tid, uv, lod=jnp.full(2, lod))
            np.testing.assert_allclose(np.asarray(c[:, :3]), 0.4, atol=1e-5)

    def test_lod_monotonic_blur(self):
        """Variance of samples over a stripe texture must fall as the
        footprint grows (anti-shimmer at grazing angles)."""
        stripes = np.zeros((64, 64, 4), np.float32)
        stripes[..., :3] = (np.arange(64) % 2).astype(np.float32)[None, :, None]
        stripes[..., 3] = 1.0
        stack = make_tex_stack([stripes])
        us = jnp.linspace(0.0, 1.0, 97)
        uv = jnp.stack([us, jnp.full_like(us, 0.5)], -1)
        tid = jnp.zeros(97, jnp.int32)

        def var_at(fp):
            c = sample_texture(stack, tid, uv,
                               footprint=jnp.full(97, fp))
            return float(jnp.var(c[..., 0]))

        v0, v1, v2 = var_at(0.0), var_at(0.05), var_at(0.5)
        assert v1 < v0 * 0.2, (v0, v1)
        assert v2 <= v1 + 1e-9, (v1, v2)
