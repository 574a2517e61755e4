"""Scene-level instancing (scene/data.py upload_scene_instanced +
shade_state row resolution): an instanced scene must shade identically to
the same geometry baked to world space (VERDICT r2 #4; ref
src/accelstruct.cpp:132-162, shade_state.glsl:63-90 instance chase).

Compile budget: ONE jitted trace+shade graph per scene variant (2 total);
all other checks are host-side.
"""
import base64
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eidola_tpu.ops.packets import closest_hit
from eidola_tpu.render.shade_state import get_state
from eidola_tpu.scene.data import upload_scene, upload_scene_instanced


def _mesh(n=60, seed=5):
    """Object-space mesh with full attributes (normals/uvs/tangents/colors)."""
    r = np.random.default_rng(seed)
    base = r.uniform(-1, 1, (n, 1, 3))
    tris = (base + r.uniform(-0.4, 0.4, (n, 3, 3))).astype(np.float32)
    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    gn = np.cross(v1 - v0, v2 - v0)
    gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
    # smooth-ish normals: tilt the geometric normal per vertex
    tilt = r.normal(size=(n, 3, 3)).astype(np.float32) * 0.1
    normals = gn[:, None] + tilt
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    uvs = r.uniform(0, 1, (n, 3, 2)).astype(np.float32)
    t = np.cross(normals, [0.3, 0.9, 0.1])
    t /= np.maximum(np.linalg.norm(t, axis=-1, keepdims=True), 1e-20)
    tangents = np.concatenate([t, np.ones((n, 3, 1), np.float32)], -1)
    colors = r.uniform(0.2, 1, (n, 3, 4)).astype(np.float32)
    mat_ids = (np.arange(n) % 2).astype(np.int32)
    return dict(v0=v0, v1=v1, v2=v2, normals=normals, uvs=uvs,
                tangents=tangents, colors=colors, mat_ids=mat_ids)


def _xform(seed, scale=1.0):
    r = np.random.default_rng(seed)
    q, _ = np.linalg.qr(r.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    m = np.eye(4)
    m[:3, :3] = q * scale
    m[:3, 3] = r.uniform(-3, 3, size=3)
    return m


MATERIALS = [
    {"base_color": [0.8, 0.6, 0.4, 1.0], "metallic": 0.2, "roughness": 0.6},
    {"base_color": [0.3, 0.5, 0.9, 1.0], "emissive": [3.0, 2.0, 1.0]},
]


def _bake(mesh, world):
    """Flatten one instance the way the round-2 loader did (world-space
    verts, inverse-transpose normals, rotated unit tangents)."""
    r, t = world[:3, :3], world[:3, 3]
    nrm_mat = np.linalg.inv(r).T
    n = mesh["normals"] @ nrm_mat.T
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    tx = mesh["tangents"][..., :3] @ r.T
    tx /= np.maximum(np.linalg.norm(tx, axis=-1, keepdims=True), 1e-20)
    return dict(
        v0=mesh["v0"] @ r.T + t, v1=mesh["v1"] @ r.T + t,
        v2=mesh["v2"] @ r.T + t,
        normals=n.astype(np.float32),
        uvs=mesh["uvs"],
        tangents=np.concatenate(
            [tx, mesh["tangents"][..., 3:]], -1
        ).astype(np.float32),
        colors=mesh["colors"], mat_ids=mesh["mat_ids"],
    )


@pytest.fixture(scope="module")
def scenes():
    mesh = _mesh()
    instances = [(0, _xform(40)), (0, _xform(41, scale=1.7)),
                 (0, _xform(42, scale=0.6))]
    inst_scene = upload_scene_instanced(
        [mesh], instances, materials=MATERIALS
    )
    baked = [_bake(mesh, m) for _, m in instances]
    flat = {
        k: np.concatenate([b[k] for b in baked]) for k in baked[0]
    }
    flat_scene = upload_scene(
        flat["v0"].astype(np.float32), flat["v1"].astype(np.float32),
        flat["v2"].astype(np.float32),
        normals=flat["normals"], uvs=flat["uvs"], tangents=flat["tangents"],
        colors=flat["colors"], mat_ids=flat["mat_ids"], materials=MATERIALS,
    )
    return inst_scene, flat_scene


def _trace_shade(scene, o, d):
    R = o.shape[0]

    def f(scene, o, d):
        rec = closest_hit(scene.bvh, o, d, jnp.zeros(R), jnp.full(R, 1e9))
        st = get_state(scene, o, d, rec.tri, rec.t, rec.u, rec.v)
        return rec, st

    return jax.jit(f)(scene, o, d)


class TestInstancedShadingParity:
    def test_state_matches_flattened(self, scenes):
        inst_scene, flat_scene = scenes
        r = np.random.default_rng(50)
        o = jnp.asarray(r.uniform(-5, 5, (512, 3)).astype(np.float32))
        d = r.normal(size=(512, 3)).astype(np.float32)
        d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

        ri, si = _trace_shade(inst_scene, o, d)
        rf, sf = _trace_shade(flat_scene, o, d)

        hit = np.asarray(rf.tri) >= 0
        assert hit.any()
        np.testing.assert_array_equal(np.asarray(ri.tri) >= 0, hit)
        # exclude rare distance ties where the two walks pick different tris
        same = hit & (np.asarray(ri.tri) == np.asarray(rf.tri))
        assert same.mean() > 0.9 * hit.mean()

        for name in ("pos", "nrm", "geo_nrm", "uv", "albedo", "emission"):
            a = np.asarray(getattr(si, name))[same]
            b = np.asarray(getattr(sf, name))[same]
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3, err_msg=name)
        np.testing.assert_allclose(
            np.asarray(si.roughness)[same], np.asarray(sf.roughness)[same],
            atol=1e-4,
        )

    def test_light_pmf_matches_flattened(self, scenes):
        """pool weight x inst.pmf_scale must equal the flattened scene's
        world alias pmf for every emissive instanced triangle."""
        inst_scene, flat_scene = scenes
        inst = inst_scene.inst
        pool_w = np.asarray(inst_scene.tri_light_pmf)
        flat_pmf = np.asarray(flat_scene.tri_light_pmf)
        Tm = pool_w.shape[0]
        for k in range(np.asarray(inst.tri_base).shape[0]):
            got = pool_w * np.asarray(inst.pmf_scale)[k]
            want = flat_pmf[k * Tm: (k + 1) * Tm]
            np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-9)

    def test_mirrored_instance_tbn_matches_flattened(self):
        """A mirrored (negative-determinant) instance must shade normal-
        mapped geometry exactly like the same geometry baked to world:
        the world-space cross(n_w, t_w) carries the mirror's sign itself
        (PARITY r3 known gap #3 — no extra hand_flip factor)."""
        mesh = _mesh(n=40, seed=8)
        m = _xform(43)
        m[:3, 0] *= -1.0            # mirror across x
        assert np.linalg.det(m[:3, :3]) < 0
        # a non-flat normal map so a TBN sign error changes the output
        r = np.random.default_rng(9)
        nm = np.zeros((8, 8, 4), np.float32)
        v = r.normal(size=(8, 8, 3)).astype(np.float32) * 0.4
        v[..., 2] = 1.0
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        nm[..., :3] = v * 0.5 + 0.5
        nm[..., 3] = 1.0
        mats = [dict(MATERIALS[0], normal_tex=0), MATERIALS[1]]

        inst_scene = upload_scene_instanced(
            [mesh], [(0, m)], materials=mats, textures=[nm]
        )
        flat = _bake(mesh, m)
        flat_scene = upload_scene(
            flat["v0"].astype(np.float32), flat["v1"].astype(np.float32),
            flat["v2"].astype(np.float32),
            normals=flat["normals"], uvs=flat["uvs"],
            tangents=flat["tangents"], colors=flat["colors"],
            mat_ids=flat["mat_ids"], materials=mats, textures=[nm],
        )
        rr = np.random.default_rng(51)
        o = rr.uniform(-6, 6, (256, 3)).astype(np.float32)
        # aim at the instance (a single small mesh: undirected rays miss)
        tgt = (m[:3, 3] + rr.uniform(-1, 1, (256, 3))).astype(np.float32)
        d = tgt - o
        d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
        o = jnp.asarray(o)
        ri, si = _trace_shade(inst_scene, o, d)
        rf, sf = _trace_shade(flat_scene, o, d)
        hit = np.asarray(rf.tri) >= 0
        same = hit & (np.asarray(ri.tri) == np.asarray(rf.tri))
        assert same.sum() > 20
        np.testing.assert_allclose(
            np.asarray(si.nrm)[same], np.asarray(sf.nrm)[same],
            rtol=2e-3, atol=2e-3,
        )

    def test_memory_is_shared(self, scenes):
        inst_scene, flat_scene = scenes
        assert inst_scene.tri_mat.shape[0] * 3 == flat_scene.tri_mat.shape[0]
        assert (inst_scene.bvh.leaf_blocks.shape[0]
                < np.asarray(flat_scene.bvh.leaf_blocks).shape[0])


class TestGltfInstanced:
    def test_shared_mesh_nodes_instance(self, tmp_path):
        """A glTF whose nodes reuse one mesh must load through the
        instanced path at ~1x mesh memory (host-side only, no compile)."""
        pos = np.asarray(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
        )
        idx = np.asarray([0, 1, 2, 1, 3, 2], np.uint16)
        raw = pos.tobytes() + idx.tobytes()
        gltf = {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0, 1, 2]}],
            "nodes": [
                {"mesh": 0},
                {"mesh": 0, "translation": [3, 0, 0]},
                {"mesh": 0, "translation": [0, 3, 0], "scale": [2, 2, 2]},
            ],
            "meshes": [{"primitives": [
                {"attributes": {"POSITION": 0}, "indices": 1}
            ]}],
            "buffers": [{
                "uri": "data:application/octet-stream;base64,"
                       + base64.b64encode(raw).decode(),
                "byteLength": len(raw),
            }],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": pos.nbytes},
                {"buffer": 0, "byteOffset": pos.nbytes,
                 "byteLength": idx.nbytes},
            ],
            "accessors": [
                {"bufferView": 0, "componentType": 5126, "count": 4,
                 "type": "VEC3"},
                {"bufferView": 1, "componentType": 5123, "count": 6,
                 "type": "SCALAR"},
            ],
        }
        from eidola_tpu.scene.gltf import load_gltf_scene

        p = tmp_path / "inst.gltf"
        p.write_text(json.dumps(gltf))
        scene, _ = load_gltf_scene(str(p))
        assert scene.inst is not None
        assert int(scene.bvh.n_tris) == 6          # 3 instances x 2 tris
        assert scene.tri_mat.shape[0] == 2         # shared pool: 2 tris
        base = np.asarray(scene.inst.tri_base)
        np.testing.assert_array_equal(base, [0, 2, 4])
        np.testing.assert_allclose(
            np.asarray(scene.inst.area_scale), [1.0, 1.0, 4.0], rtol=1e-5
        )


class TestInstancedSplit:
    """Opaque/alpha split on INSTANCED scenes: mixed-material meshes are
    partitioned per triangle into two instanced BVHs that report ids in
    the same virtual numbering (scene/data.py upload_scene_instanced)."""

    def _scenes(self):
        from eidola_tpu.scene.data import ALPHA_MASK

        mats = [
            {"base_color": [0.8, 0.6, 0.4, 1.0]},
            {"base_color": [1, 1, 1, 0.0], "alpha_mode": ALPHA_MASK,
             "alpha_cutoff": 0.5},       # fully transparent MASK
        ]
        m = _mesh(n=40, seed=9)          # mat_ids alternate 0/1
        instances = [(0, _xform(1)), (0, _xform(2, scale=0.5))]
        split = upload_scene_instanced([m], instances, materials=mats)
        return split, m, instances, mats

    def test_split_structures(self):
        split, m, instances, mats = self._scenes()
        assert split.bvh_alpha is not None
        # virtual tri numbering covers both instances' full meshes
        n_virtual = 2 * m["v0"].shape[0]
        assert int(split.bvh.n_tris) == n_virtual
        # the alpha half may be the FLAT world-space BVH (default,
        # EIDOLA_ALPHA_FLAT): physical tri count = flattened alpha set,
        # ids still reported in the shared virtual numbering via
        # slot_of_tri sized n_virtual.  The subset-instanced variant
        # keeps the full virtual count.
        n_alpha_flat = 2 * int((np.asarray(m["mat_ids"]) == 1).sum())
        assert int(split.bvh_alpha.n_tris) in (n_alpha_flat, n_virtual)
        s_op = np.asarray(split.bvh.slot_of_tri)
        s_al = np.asarray(split.bvh_alpha.slot_of_tri)
        assert s_op.shape[0] == n_virtual and s_al.shape[0] == n_virtual
        # every virtual tri is owned by exactly one half
        own_op = s_op >= 0
        own_al = s_al >= 0
        assert (own_op ^ own_al).all()
        # ownership matches material alpha-ness (mat_ids alternate 0/1,
        # and the mesh repeats per instance)
        alpha_local = np.asarray(m["mat_ids"]) == 1
        want_alpha = np.concatenate([alpha_local, alpha_local])
        np.testing.assert_array_equal(own_al, want_alpha)

    def test_split_rays_see_through_alpha(self):
        from eidola_tpu.ops import rng as erng
        from eidola_tpu.render.config import RenderConfig
        from eidola_tpu.render.tracer import trace_closest

        split, m, instances, mats = self._scenes()
        cfg = RenderConfig(width=8, height=8, alpha_geometry=True,
                           traversal_max_steps=2048)
        r = np.random.default_rng(3)
        n = 64
        o = jnp.asarray(r.uniform(-4, 4, (n, 3)).astype(np.float32))
        dn = r.normal(size=(n, 3)).astype(np.float32)
        d = jnp.asarray(dn / np.linalg.norm(dn, axis=1, keepdims=True))
        rng = erng.seed_pixels(1, n, jnp.uint32(2))[0]
        _, rec = trace_closest(
            cfg, split, o, d, jnp.full(n, 1e-4), jnp.full(n, 1e8), rng)
        tri = np.asarray(rec.tri)
        hit = tri >= 0
        # the transparent MASK half must never be the final hit
        from eidola_tpu.scene.data import shade_row

        rows, _ = shade_row(split, jnp.maximum(rec.tri, 0))
        mat = np.asarray(split.tri_mat)[np.asarray(rows)]
        assert (mat[hit] == 0).all()
