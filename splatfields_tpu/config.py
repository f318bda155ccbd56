"""Typed configuration mirroring the reference's flag surface.

Parity: reference ``arguments/__init__.py`` — the four ParamGroups
(ModelParams, PipelineParams, ModelHiddenParams, OptimizationParams) with
identical flag names and defaults so the published run scripts
(``run_blender.sh`` / ``run_dtu.sh`` / ``run_owlii.sh``) translate 1:1.
Differences by design:
- dataclasses + argparse reflection instead of attribute reflection;
- ``cfg_args`` round-trips through ``ast.literal_eval`` of a dict repr, not
  ``eval`` of a Namespace repr (the reference's eval() hazard,
  ``arguments/__init__.py:187``);
- vestigial flags the reference declares but never consumes are kept for
  CLI compatibility and documented as inert (SURVEY 2.4).
"""
from __future__ import annotations

import ast
import dataclasses
import os
from argparse import ArgumentParser
from typing import List


def _add_group(parser: ArgumentParser, cls, shorthand=(), sentinel=False):
    """``sentinel=True`` registers every flag with default None so only
    explicitly-passed values survive — required for render/analysis CLIs
    where the stored cfg_args must win over parser defaults (the
    reference's ``ModelParams(parser, sentinel=True)`` mechanism,
    ``arguments/__init__.py:22,55``)."""
    group = parser.add_argument_group(cls.__name__)
    for f in dataclasses.fields(cls):
        name = f.name
        default = f.default if f.default is not dataclasses.MISSING else (
            f.default_factory())
        if isinstance(default, dict):
            continue  # dict-valued (encoder_args): config-file only
        flags = [f"--{name}"]
        if name in shorthand:
            flags.append(f"-{name[0]}")
        reg_default = None if sentinel else default
        if f.type in ("bool", bool):
            group.add_argument(*flags, default=reg_default,
                               action="store_true")
        elif isinstance(default, list):
            group.add_argument(*flags, default=reg_default, nargs="+")
        else:
            group.add_argument(*flags, default=reg_default,
                               type=type(default))
    return group


def _extract(cls, args):
    fields = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in vars(args).items()
                  if k in fields and v is not None})


@dataclasses.dataclass
class ModelConfig:
    """reference ``ModelParams`` (:54-85)."""
    sh_degree: int = 3
    bg_path: str = ""
    is_static: bool = False
    vis_geometric: bool = False
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    data_device: str = "tpu"
    eval: bool = False
    load_time_step: int = 100
    load_every_nth: int = 1
    pc_path: str = ""
    max_num_pts: int = -1
    n_views: int = 6
    num_pts: int = 100_000
    pts_samples: str = "depth"
    train_cam_names: List[str] = dataclasses.field(default_factory=lambda: [
        f"cam_train_{i}" for i in range(10)])
    test_cam_names: List[str] = dataclasses.field(
        default_factory=lambda: ["cam_test"])
    pred_cam_names: List[str] = dataclasses.field(
        default_factory=lambda: ["cam_test"])
    load2gpu_on_the_fly: bool = False
    is_6dof: bool = False

    SHORTHAND = ("source_path", "model_path", "images", "resolution",
                 "white_background")


@dataclasses.dataclass
class PipelineConfig:
    """reference ``PipelineParams`` (:88-93)."""
    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False
    # TPU-specific knobs (new):
    tile_size: int = 16
    tile_cap: int = 1024
    k_chunk: int = 128
    # static duplicated-instance budget = dup_factor * N. Binning sort and
    # the sorted-pack gather cost scale linearly with it (measured: the
    # default 8N spent ~45% of ~15 ms on padding at 100k splats); the train
    # loop grows it 1.5x and re-jits whenever instances are dropped.
    dup_factor: int = 5
    # per-block instance keep budget for the ring-exchange sharded path
    # (parallel/ring.py); None = 4x the uniform per-shard share of the
    # block's dup budget
    ring_keep: int | None = None


@dataclasses.dataclass
class HiddenConfig:
    """reference ``ModelHiddenParams`` (:95-134). Flags marked inert are
    declared-but-unconsumed upstream (SURVEY 2.4) and kept for CLI parity."""
    use_isotropic: bool = False
    contract_pts: bool = False        # inert
    rgb_w: int = 128
    deform_weight: float = 1.0
    D: int = 8                        # inert upstream (net reads *_d keys)
    W: int = 256                      # inert upstream (net reads *_w keys)
    input_ch: int = 3                 # inert
    multires: int = 10                # inert
    num_basis: int = 4
    encoder_type: str = ""
    flow_model: str = "offset"
    layer_strategy: str = "none"
    log2_hashmap_size: int = 20
    n_levels: int = 16
    contract_ngp: bool = False
    color_model: str = "linear"       # inert
    opacity_model: str = "nerf"       # inert
    opacity_ones: bool = False
    opt_pts: bool = False             # inert
    opt_pts_per_frame: bool = False   # inert
    encoder_query_scale: float = 1.0
    use_mlp_encoder: bool = False     # inert
    cat_points: bool = False          # inert
    dont_cat_time: bool = False       # inert
    composition_rank: int = 10
    compression: str = "vm"
    geo_model_disable_pts: bool = False
    use_view_dep_rgb: bool = False
    dct_basis: int = 4
    encoder_args: dict = dataclasses.field(default_factory=dict)
    # populated at runtime from load_time_step (reference train.py:104-105)
    n_frames: int = 0


@dataclasses.dataclass
class OptimizationConfig:
    """reference ``OptimizationParams`` (:136-170)."""
    n_splats: int = -1
    all_training: bool = False
    disable_gaussian_opt: bool = False
    iterations: int = 40_000
    num_views: int = 10
    warm_up: int = -1
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    deform_lr_max_steps: int = 40_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.001
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 45_000
    densify_grad_threshold: float = 0.0002
    overwrite_loc: bool = False
    lambda_mask: float = 0.1
    lambda_norm: float = 0.0
    lambda_corr: float = 0.0
    lambda_corr_color: float = 0.0
    # Moran-loss cadence: apply the corr terms every k-th step, scaled by k
    # (expected gradient unchanged). The reference runs its KNN+Moran every
    # step (train.py:203-215) — measured 271 ms/step at 100k splats on v5e
    # (CLAUDE.md), 5x the whole step. Default 1 = reference-exact.
    corr_interval: int = 1
    lambda_norm_mean: float = 0.0
    lambda_depth: float = 0.0
    lambda_opacity: float = 0.0
    lambda_depthl1: float = 0.0
    lambda_gradient: float = 0.0


def build_parser(description="SplatFields-TPU", sentinel=False):
    parser = ArgumentParser(description=description)
    _add_group(parser, ModelConfig, shorthand=ModelConfig.SHORTHAND,
               sentinel=sentinel)
    _add_group(parser, PipelineConfig, sentinel=sentinel)
    _add_group(parser, HiddenConfig, sentinel=sentinel)
    _add_group(parser, OptimizationConfig, sentinel=sentinel)
    return parser


def extract_configs(args):
    model = _extract(ModelConfig, args)
    model.source_path = os.path.abspath(model.source_path) if model.source_path else ""
    return (model, _extract(PipelineConfig, args), _extract(HiddenConfig, args),
            _extract(OptimizationConfig, args))


def save_cfg_args(model_path: str, args):
    """Persist the run config (reference ``train.py:338-339``) as a dict
    repr readable with ast.literal_eval."""
    os.makedirs(model_path, exist_ok=True)
    with open(os.path.join(model_path, "cfg_args"), "w") as f:
        f.write(repr(vars(args)))


def load_cfg_args(model_path: str) -> dict:
    path = os.path.join(model_path, "cfg_args")
    with open(path) as f:
        txt = f.read()
    if txt.startswith("Namespace("):
        # reference-written cfg_args: parse the Namespace repr safely
        txt = txt[len("Namespace("):-1]
        out = {}
        # split on top-level commas
        depth = 0
        cur = ""
        parts = []
        for ch in txt:
            if ch in "([{":
                depth += 1
            elif ch in ")]}":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append(cur)
                cur = ""
            else:
                cur += ch
        if cur.strip():
            parts.append(cur)
        for p in parts:
            k, _, v = p.partition("=")
            try:
                out[k.strip()] = ast.literal_eval(v.strip())
            except (ValueError, SyntaxError):
                out[k.strip()] = v.strip()
        return out
    return ast.literal_eval(txt)


def get_combined_args(parser: ArgumentParser, argv=None):
    """Merge CLI with the stored run config (reference
    ``get_combined_args``, :173-193) without eval()."""
    args_cmdline = parser.parse_args(argv)
    merged = {}
    try:
        merged = load_cfg_args(args_cmdline.model_path)
        print("Config file found in", args_cmdline.model_path)
    except (FileNotFoundError, TypeError):
        print("Config file not found")
    for k, v in vars(args_cmdline).items():
        if v is not None:
            merged[k] = v
    import argparse
    return argparse.Namespace(**merged)


def merge_yaml_config(args, config_path: str):
    """Optional config-file merge keyed by group names (reference
    ``utils/params_utils.py`` with mmcv.Config -> YAML here)."""
    import yaml
    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    groups = ["ModelParams", "ModelHiddenParams", "OptimizationParams",
              "PipelineParams", "ModelConfig", "HiddenConfig",
              "OptimizationConfig", "PipelineConfig"]
    for g in groups:
        if g in cfg:
            for k, v in cfg[g].items():
                setattr(args, k, v)
    return args
