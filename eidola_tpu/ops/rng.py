"""Stateless counter-based RNG (ref shaders/random.glsl:34-102).

The reference seeds each pixel with tea(pixelIndex, frameTime) and advances a
single uint32 state with a PCG step per `rand()` call.  We keep the same
construction because hash-based integer RNG is far cheaper on the TPU VPU than
threefry (jax.random), and reproducibility against a scalar seed matters for
golden tests.  All functions are vectorized over arbitrary shapes.

State convention: a uint32 array, one lane per pixel/ray.  `rand(state)`
returns (new_state, float32 in [0, 1)).
"""
from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def tea(val0, val1, rounds: int = 16):
    """TEA hash seed mixer (ref random.glsl:34-48)."""
    v0 = jnp.asarray(val0, _U32)
    v1 = jnp.asarray(val1, _U32)
    s = jnp.broadcast_to(jnp.uint32(0), jnp.broadcast_shapes(v0.shape, v1.shape))
    v0 = jnp.broadcast_to(v0, s.shape)
    v1 = jnp.broadcast_to(v1, s.shape)
    delta = _U32(0x9E3779B9)
    k = (_U32(0xA341316C), _U32(0xC8013EA4), _U32(0xAD90777D), _U32(0x7E95761E))
    for _ in range(rounds):
        s = s + delta
        v0 = v0 + (((v1 << _U32(4)) + k[0]) ^ (v1 + s) ^ ((v1 >> _U32(5)) + k[1]))
        v1 = v1 + (((v0 << _U32(4)) + k[2]) ^ (v0 + s) ^ ((v0 >> _U32(5)) + k[3]))
    return v0


def pcg(state):
    """PCG-RXS-M-XS single-word advance (ref random.glsl:59-66). Returns the
    new state; use `_to_float01` on its output word."""
    state = state.astype(_U32)
    word = ((state >> ((state >> _U32(28)) + _U32(4))) ^ state) * _U32(277803737)
    return (word >> _U32(22)) ^ word


def pcg_advance(state):
    """LCG advance + output permutation (split so the stream keeps moving)."""
    state = state.astype(_U32) * _U32(747796405) + _U32(2891336453)
    word = ((state >> ((state >> _U32(28)) + _U32(4))) ^ state) * _U32(277803737)
    return state, (word >> _U32(22)) ^ word


def pcg2d(v):
    """pcg2d hash (Jarzynski & Olano; ref random.glsl:70-78). v: (..., 2) u32."""
    v = v.astype(_U32)
    x = v[..., 0] * _U32(1664525) + _U32(1013904223)
    y = v[..., 1] * _U32(1664525) + _U32(1013904223)
    x = x + y * _U32(1664525)
    y = y + x * _U32(1664525)
    x = x ^ (x >> _U32(16))
    y = y ^ (y >> _U32(16))
    x = x + y * _U32(1664525)
    y = y + x * _U32(1664525)
    x = x ^ (x >> _U32(16))
    y = y ^ (y >> _U32(16))
    return jnp.stack([x, y], axis=-1)


def pcg3d(v):
    """pcg3d hash (ref random.glsl:82-92). v: (..., 3) u32."""
    v = v.astype(_U32) * _U32(1664525) + _U32(1013904223)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    x = x + y * z
    y = y + z * x
    z = z + x * y
    x = x ^ (x >> _U32(16))
    y = y ^ (y >> _U32(16))
    z = z ^ (z >> _U32(16))
    x = x + y * z
    y = y + z * x
    z = z + x * y
    return jnp.stack([x, y, z], axis=-1)


def _to_float01(bits):
    """uint32 -> float32 in [0, 1) using the mantissa trick."""
    mant = (bits.astype(_U32) >> _U32(9)) | _U32(0x3F800000)
    return mant.view(jnp.float32) - 1.0


def rand(state):
    """Advance state, return (new_state, float32 uniform [0,1))
    (ref random.glsl:98-102)."""
    new_state, word = pcg_advance(state)
    return new_state, _to_float01(word)


def rand2(state):
    state, u1 = rand(state)
    state, u2 = rand(state)
    return state, u1, u2


def rand3(state):
    state, u1 = rand(state)
    state, u2 = rand(state)
    state, u3 = rand(state)
    return state, u1, u2, u3


def seed_pixels(h: int, w: int, frame_word):
    """Per-pixel seeds for one frame: tea(pixelIndex, frame_word)
    (ref direct_stage.comp:279)."""
    idx = jnp.arange(h * w, dtype=jnp.uint32).reshape(h, w)
    return tea(idx, jnp.asarray(frame_word, _U32))
