"""Two-level instanced BVH (ops/bvh_instanced.py) vs the brute-force oracle
on the flattened triangle soup (VERDICT r2 #4: N instances of one mesh must
load at ~1x mesh memory and render identically to baking every instance to
world space; ref src/accelstruct.cpp:132-162 TLAS-over-BLAS).

Compile budget: the oracle is a tiny vmapped graph (no BVH compile), so the
module costs TWO traversal compiles total (closest + any_hit).
"""
import jax.numpy as jnp
import numpy as np

from eidola_tpu.ops.bvh import build_bvh
from eidola_tpu.ops.bvh_instanced import (
    any_hit_instanced, build_instanced_bvh, closest_hit_instanced,
)
from eidola_tpu.ops.intersect import brute_force_closest

from test_bvh import _random_rays, _random_tris


def _xform(seed, scale=1.0):
    """Random rigid+scale 3x4 object->world transform."""
    r = np.random.default_rng(seed)
    q, _ = np.linalg.qr(r.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    m = np.zeros((3, 4), np.float64)
    m[:3, :3] = q * scale
    m[:3, 3] = r.uniform(-6, 6, size=3)
    return m


def _flatten(meshes, instances):
    """Bake every instance's triangles to world space (the round-2 path).
    Concatenation order (instance-major) matches the instanced path's
    global ids: tri = inst_tri_base[inst] + mesh-local id."""
    a_parts, b_parts, c_parts = [], [], []
    for mi, m in instances:
        v0, v1, v2 = meshes[mi]
        m = np.asarray(m, np.float64)
        r, t = m[:3, :3], m[:3, 3]
        a_parts.append((v0 @ r.T + t).astype(np.float32))
        b_parts.append((v1 @ r.T + t).astype(np.float32))
        c_parts.append((v2 @ r.T + t).astype(np.float32))
    return (np.concatenate(a_parts), np.concatenate(b_parts),
            np.concatenate(c_parts))


def _scene():
    """Two meshes, five instances (incl. non-unit scales + a mirror-free
    rotation), one shared compile for the module."""
    m0 = _random_tris(150, seed=25, spread=1.0)
    m1 = _random_tris(90, seed=26, spread=1.0)
    meshes = [m0, m1]
    instances = [(0, _xform(200)), (1, _xform(201)),
                 (0, _xform(202, scale=2.0)), (1, _xform(203, scale=0.5)),
                 (0, _xform(204))]
    return meshes, instances


class TestInstancedParity:
    def test_closest_matches_oracle_and_ids(self):
        meshes, instances = _scene()
        inst_bvh = build_instanced_bvh(meshes, instances, leaf_size=8)
        fa, fb, fc = _flatten(meshes, instances)

        o, d = _random_rays(768, seed=24)
        tmin = jnp.zeros(768)
        tmax = jnp.full(768, 1e9)

        ri = closest_hit_instanced(inst_bvh, o, d, tmin, tmax)
        otri, ot, ou, ov = brute_force_closest(
            o, d, jnp.asarray(fa), jnp.asarray(fb - fa), jnp.asarray(fc - fa),
            tmin, tmax,
        )
        hits = np.asarray(otri) >= 0
        assert hits.any()
        np.testing.assert_array_equal(np.asarray(ri.tri) >= 0, hits)
        np.testing.assert_allclose(
            np.asarray(ri.t)[hits], np.asarray(ot)[hits], rtol=2e-4
        )
        # oracle ids over the instance-major flattened soup ARE the
        # instanced convention inst_tri_base + local: exact match away
        # from distance ties proves per-instance material resolution works
        same = np.asarray(ri.tri)[hits] == np.asarray(otri)[hits]
        assert same.mean() > 0.98, same.mean()

        # memory bar: the shared object-space leaf pool is ~1x the two
        # meshes, NOT 5x (what flattening would store)
        flat_bvh = build_bvh(fa, fb, fc, leaf_size=8, as_numpy=True)
        assert (inst_bvh.leaf_blocks.shape[0]
                < flat_bvh.leaf_blocks.shape[0] / 2)

    def test_any_hit(self):
        meshes, instances = _scene()
        inst_bvh = build_instanced_bvh(meshes, instances, leaf_size=8)
        fa, fb, fc = _flatten(meshes, instances)
        o, d = _random_rays(768, seed=29)
        tmin = jnp.zeros(768)
        tmax = jnp.full(768, 1e9)
        occ = any_hit_instanced(inst_bvh, o, d, tmin, tmax)
        otri, *_ = brute_force_closest(
            o, d, jnp.asarray(fa), jnp.asarray(fb - fa), jnp.asarray(fc - fa),
            tmin, tmax,
        )
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(otri) >= 0)
