"""Moran's-I geometry analysis CLI — ``python -m splatfields_tpu.extract_geo``.

Parity target: reference ``extract_geo.py:145-197``: reload a trained
model, compute Moran's I spatial autocorrelation of the per-splat
attributes (scales, rotations, opacity, color), and write
``MoransI_iteration_N.yaml`` into the model dir.
"""
from __future__ import annotations

import os
import sys

import jax.numpy as jnp
import numpy as np
import yaml

from splatfields_tpu import config as cfg_lib
from splatfields_tpu.models import splats as splats_lib
from splatfields_tpu.models.deform_model import DeformModel
from splatfields_tpu.ops import knn as knn_ops
from splatfields_tpu.scene import Scene


def morans_report(params, stats, deform, n_frames, fid=0.0):
    valid = np.asarray(stats.valid)
    xyz = jnp.asarray(np.asarray(params.xyz)[valid])
    if deform is not None:
        scaling = jnp.asarray(
            np.asarray(splats_lib.get_scaling(params))[valid])
        t = None
        if n_frames > 0:
            t = jnp.full((xyz.shape[0], 1), fid)
        ret = deform.net.apply(deform.variables, xyz, t)
        attrs = {
            "scale": np.asarray(ret["scales"] + scaling),
            "rotation": np.asarray(ret["rotations"]),
            "opacity": np.asarray(ret["opacity"]),
            "means": np.asarray(ret["means3D"]),
        }
        if "rgb" in ret:
            attrs["rgb"] = np.asarray(ret["rgb"])
        pts = jnp.asarray(attrs["means"])
    else:
        attrs = {
            "scale": np.asarray(splats_lib.get_scaling(params))[valid],
            "rotation": np.asarray(splats_lib.get_rotation(params))[valid],
            "opacity": np.asarray(splats_lib.get_opacity(params))[valid],
            "rgb": np.asarray(
                splats_lib.get_features(params))[valid].reshape(
                    valid.sum(), -1),
        }
        pts = xyz

    w, nn_ix = knn_ops.query_nn(pts, n_neighbors=5)
    out = {}
    for key in ("scale", "rotation", "opacity", "rgb"):
        if key not in attrs:
            continue
        feats = jnp.asarray(attrs[key].reshape(attrs[key].shape[0], -1))
        out[f"moran_{key}"] = float(knn_ops.morans_measure(w, feats[nn_ix]))
    return out


def splat_density_query(params, stats, deform, n_frames, fid=0.0,
                        n_neighbors=8):
    """Density field for iso-surface extraction: opacity-weighted
    isotropic gaussian mixture over the (possibly field-deformed) splats,
    evaluated via exact KNN (only the nearest splats contribute
    non-negligibly). Returns query_func([N, 3]) -> [N]."""
    valid = np.asarray(stats.valid)
    xyz = np.asarray(params.xyz)[valid]
    scales = np.asarray(splats_lib.get_scaling(params))[valid]
    opac = np.asarray(splats_lib.get_opacity(params))[valid].reshape(-1)
    if deform is not None:
        t = (jnp.full((xyz.shape[0], 1), fid) if n_frames > 0 else None)
        ret = deform.net.apply(deform.variables, jnp.asarray(xyz), t)
        xyz = np.asarray(ret["means3D"])
        # Field scale deltas are ADDITIVE in activated space, matching the
        # render path (train_lib.py:67 "ret['scales'] + scaling").
        scales = np.maximum(scales + np.asarray(ret["scales"]), 1e-9)
        opac = np.asarray(ret["opacity"]).reshape(-1)
    sigma = np.maximum(scales.mean(axis=-1), 1e-6)  # isotropic approx
    centers = jnp.asarray(xyz)

    def query(pts):
        d2, ix = knn_ops.knn_points(
            jnp.asarray(pts, jnp.float32), centers,
            k=min(n_neighbors, centers.shape[0]))
        s = jnp.asarray(sigma)[ix]                 # [N, K]
        o = jnp.asarray(opac)[ix]
        return np.asarray(
            jnp.sum(o * jnp.exp(-0.5 * d2 / (s * s)), axis=-1))

    return query


def main(argv=None):
    from splatfields_tpu.utils.system import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    parser = cfg_lib.build_parser("SplatFields-TPU Moran analysis", sentinel=True)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument(
        "--mesh_resolution", default=0, type=int,
        help="if > 0, also extract a density iso-surface mesh at this "
             "grid resolution (marching tetrahedra, ops/marching.py; the "
             "reference's extract_geometry is defined but never wired, "
             "general_utils.py:38-65) and write mesh_iteration_N.ply")
    parser.add_argument("--mesh_threshold", default=0.5, type=float)
    args = cfg_lib.get_combined_args(parser, argv if argv is not None
                                     else sys.argv[1:])
    model_cfg, pipe_cfg, hidden_cfg, _ = cfg_lib.extract_configs(args)
    n_frames = model_cfg.load_time_step if model_cfg.load_time_step > 1 else 0
    hidden_cfg.n_frames = n_frames

    scene = Scene(model_cfg, load_iteration=args.iteration, shuffle=False)
    deform = None
    if not model_cfg.is_static:
        deform = DeformModel(hidden_cfg, radius=scene.cameras_extent)
        deform.load_weights(model_cfg.model_path, args.iteration)
    report = morans_report(scene.splats, scene.splat_stats, deform, n_frames)
    dst = os.path.join(model_cfg.model_path,
                       f"MoransI_iteration_{scene.loaded_iter}.yaml")
    with open(dst, "w") as f:
        yaml.safe_dump(report, f)
    print("Saved", dst)
    for k, v in report.items():
        print(k, "=", v)

    if args.mesh_resolution > 0:
        from splatfields_tpu.ops.marching import (
            extract_geometry, write_mesh_ply)
        valid = np.asarray(scene.splat_stats.valid)
        xyz = np.asarray(scene.splats.xyz)[valid]
        pad = 0.05 * (xyz.max(0) - xyz.min(0) + 1e-6)
        query = splat_density_query(
            scene.splats, scene.splat_stats, deform, n_frames)
        verts, tris = extract_geometry(
            xyz.min(0) - pad, xyz.max(0) + pad, args.mesh_resolution,
            args.mesh_threshold, query)
        mesh_dst = os.path.join(
            model_cfg.model_path,
            f"mesh_iteration_{scene.loaded_iter}.ply")
        write_mesh_ply(mesh_dst, verts, tris)
        print(f"Saved {mesh_dst} ({len(verts)} verts, {len(tris)} faces)")


if __name__ == "__main__":
    main()
