"""Iso-surface extraction (ops/marching.py) — geometric correctness.

The reference's extract_geometry is dead upstream (defined
general_utils.py:38-65, never called), so there is no oracle to
transplant against; correctness is checked geometrically: a sphere SDF
must mesh to a sphere (vertex radii, watertightness), and the
world-space mapping must match the reference's affine (:44-47).
"""
import numpy as np

from splatfields_tpu.ops.marching import (
    extract_fields,
    extract_geometry,
    marching_tetrahedra,
    write_mesh_ply,
)


def _sphere_grid(res, r=0.6, lo=-1.0, hi=1.0):
    ax = np.linspace(lo, hi, res, dtype=np.float32)
    xx, yy, zz = np.meshgrid(ax, ax, ax, indexing="ij")
    return r - np.sqrt(xx ** 2 + yy ** 2 + zz ** 2)  # >0 inside


class TestMarchingTetrahedra:
    def test_sphere_radii_and_closedness(self):
        res, r = 33, 0.6
        u = _sphere_grid(res, r)
        verts, tris = marching_tetrahedra(u, 0.0)
        assert len(verts) > 100 and len(tris) > 100
        # voxel -> world for the radius check
        world = verts / (res - 1.0) * 2.0 - 1.0
        radii = np.linalg.norm(world, axis=1)
        # vertices sit on the iso-surface to within a voxel's linearization
        voxel = 2.0 / (res - 1)
        assert abs(radii.mean() - r) < voxel
        assert np.all(np.abs(radii - r) < 2 * voxel)
        # watertight: every undirected edge is shared by exactly 2 faces
        edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]],
                                tris[:, [2, 0]]])
        edges = np.sort(edges, axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).all()

    def test_empty_and_full_fields(self):
        verts, tris = marching_tetrahedra(
            np.full((8, 8, 8), -1.0, np.float32), 0.0)
        assert len(verts) == 0 and len(tris) == 0
        verts, tris = marching_tetrahedra(
            np.full((8, 8, 8), 1.0, np.float32), 0.0)
        assert len(verts) == 0 and len(tris) == 0

    def test_extract_geometry_world_mapping(self):
        """Reference affine (general_utils.py:44-47): voxel/(res-1) *
        (bmax-bmin) + bmin. An off-center sphere lands at its center."""
        res, r = 33, 0.25
        center = np.array([0.3, -0.2, 0.1], np.float32)
        bmin, bmax = np.full(3, -1.0), np.full(3, 1.0)

        def query(pts):
            return r - np.linalg.norm(pts - center, axis=-1)

        verts, tris = extract_geometry(bmin, bmax, res, 0.0, query)
        assert len(verts) > 0
        radii = np.linalg.norm(verts - center, axis=1)
        assert abs(radii.mean() - r) < 2.0 / (res - 1)

    def test_extract_fields_matches_dense(self):
        res = 9

        def query(pts):
            return pts[:, 0] + 2 * pts[:, 1] - pts[:, 2]

        u = extract_fields(np.zeros(3), np.ones(3), res, query, chunk=57)
        ax = np.linspace(0, 1, res, dtype=np.float32)
        xx, yy, zz = np.meshgrid(ax, ax, ax, indexing="ij")
        np.testing.assert_allclose(u, xx + 2 * yy - zz, atol=1e-6)

    def test_ply_roundtrip(self, tmp_path):
        u = _sphere_grid(17, 0.5)
        verts, tris = marching_tetrahedra(u, 0.0)
        p = tmp_path / "mesh.ply"
        write_mesh_ply(p, verts, tris)
        raw = p.read_bytes()
        head, body = raw.split(b"end_header\n", 1)
        assert f"element vertex {len(verts)}".encode() in head
        assert f"element face {len(tris)}".encode() in head
        got = np.frombuffer(
            body[:len(verts) * 12], np.float32).reshape(-1, 3)
        np.testing.assert_allclose(got, verts)


class TestSplatDensityQuery:
    """extract_geo.splat_density_query — incl. the deform branch (ADVICE r4
    medium: field scale deltas are ADDITIVE in activated space, matching
    train_lib.py:67, not multiplicative in log space)."""

    def _store(self, n=50, seed=0):
        import numpy as np
        from splatfields_tpu.models import splats as splats_lib
        rng = np.random.RandomState(seed)
        pts = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
        return splats_lib.create_from_pcd(pts, np.abs(pts), 0, capacity=n)

    def test_static_density_positive_at_centers(self):
        import numpy as np
        from splatfields_tpu.extract_geo import splat_density_query
        params, stats = self._store()
        q = splat_density_query(params, stats, deform=None, n_frames=0)
        d = q(np.asarray(params.xyz))
        assert d.shape == (params.capacity,)
        assert (d > 0).all()
        far = q(np.full((4, 3), 50.0, np.float32))
        assert (far < 1e-6).all()

    def test_deform_branch_additive_scales(self):
        import dataclasses
        import numpy as np
        import jax.numpy as jnp
        from splatfields_tpu.extract_geo import splat_density_query
        from splatfields_tpu.models import splats as splats_lib

        params, stats = self._store(n=20)
        # pin the base scales tiny relative to inter-splat spacing so the
        # k=1 probe below provably hits splat 0
        params = dataclasses.replace(
            params, scaling=jnp.full_like(params.scaling, np.log(0.02)))
        base_scales = np.asarray(splats_lib.get_scaling(params))
        delta = 0.05

        class StubNet:
            def apply(self, variables, xyz, t=None):
                n = xyz.shape[0]
                return {
                    "means3D": xyz + 0.1,
                    "scales": jnp.full((n, 3), delta, jnp.float32),
                    "opacity": jnp.full((n, 1), 0.7, jnp.float32),
                }

        class StubDeform:
            net = StubNet()
            variables = {}

        q = splat_density_query(params, stats, StubDeform(), n_frames=0,
                                n_neighbors=1)
        # density at a deformed center with k=1: opac * exp(0) = 0.7 when
        # the nearest splat is itself; sigma must be mean(base + delta)
        center = np.asarray(params.xyz)[:1] + 0.1
        d0 = float(q(center)[0])
        np.testing.assert_allclose(d0, 0.7, atol=1e-5)
        # probe at one-sigma offset: recovers sigma, proving ADDITIVE
        # composition (multiplicative-in-log would give base*exp(delta))
        sig_add = float(np.maximum(base_scales[0] + delta, 1e-9).mean())
        probe = center + np.array([[sig_add, 0, 0]], np.float32)
        d1 = float(q(probe)[0])
        np.testing.assert_allclose(d1, 0.7 * np.exp(-0.5), rtol=1e-4)
