"""Dump the optimized HLO of the bench train step and report the biggest
fusions by matching the trace op names (fusion.NN)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math
import re

import numpy as np

from splatfields_tpu.utils.system import enable_persistent_compile_cache
enable_persistent_compile_cache()

import jax
import jax.numpy as jnp

from splatfields_tpu import config as cfg_lib
from splatfields_tpu import train_lib
from splatfields_tpu.models import splats as splats_lib
from splatfields_tpu.models.deform_model import DeformModel
from splatfields_tpu.utils import camera_math as cm

import argparse
_ap = argparse.ArgumentParser()
_ap.add_argument("--variant", choices=("field", "owlii4d", "ngp"),
                 default="field")
_args, _rest = _ap.parse_known_args()

width = height = 800
n = 100_000
rng = np.random.RandomState(0)
R = np.eye(3, dtype=np.float32)
t = np.array([0, 0, 4.0], np.float32)
w2v = cm.get_world2view(R, t).T
fov = 0.8
proj = cm.get_projection_matrix(0.01, 100.0, fov, fov).T
full = (w2v @ proj).astype(np.float32)
campos = np.linalg.inv(w2v.T)[:3, 3].astype(np.float32)
tanfov = math.tan(fov / 2)

pts = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
cols = rng.rand(n, 3).astype(np.float32)
params, stats = splats_lib.create_from_pcd(pts, cols, 0, capacity=n)
splat_opt = splats_lib.adam_init(params)
if _args.variant == "owlii4d":
    hidden = cfg_lib.HiddenConfig(
        encoder_type="VarTriPlaneEncoder", composition_rank=40,
        n_frames=100, flow_model="offset")
    n_frames = 100
elif _args.variant == "ngp":
    hidden = cfg_lib.HiddenConfig(
        encoder_type="NGPMLP", composition_rank=0, n_frames=0)
    n_frames = 0
else:
    hidden = cfg_lib.HiddenConfig(
        encoder_type="VarTriPlaneEncoder", composition_rank=0, n_frames=0)
    n_frames = 0
deform = DeformModel(hidden, radius=1.0)
opt_cfg = cfg_lib.OptimizationConfig(lambda_mask=0.0, lambda_norm=0.01)
pipe_cfg = cfg_lib.PipelineConfig(tile_size=16, tile_cap=1024, k_chunk=128)
step = train_lib.make_train_step(
    deform.net, opt_cfg, pipe_cfg, width, height, num_views=1,
    field_mode=True, n_frames=n_frames, sh_degree=0)
batch = {
    "viewmatrix": jnp.asarray(w2v)[None],
    "projmatrix": jnp.asarray(full)[None],
    "campos": jnp.asarray(campos)[None],
    "tanfovx": jnp.full((1,), tanfov, jnp.float32),
    "tanfovy": jnp.full((1,), tanfov, jnp.float32),
    "fid": jnp.asarray(0.37, jnp.float32),
    "image": jnp.asarray(rng.rand(1, 3, height, width).astype(np.float32)),
    "mask": jnp.zeros((1, 1, 1, 1), jnp.float32),
    "depth": jnp.zeros((1, 1, 1), jnp.float32),
    "bg": jnp.ones(3, jnp.float32),
}
lrs = splats_lib.splat_lr_tree(1.6e-4, 2.5e-3, 0.05, 1e-3, 1e-3)
key = jax.random.PRNGKey(0)
fv = deform.variables
fo = deform.opt_state

lowered = jax.jit(step, donate_argnums=(0, 2, 4)).lower(
    params, stats, splat_opt, fv, fo, batch, lrs,
    jnp.asarray(1e-3, jnp.float32), key)
compiled = lowered.compile()
txt = compiled.as_text()
path = "/tmp/step_hlo.txt" if _args.variant == "field" else f"/tmp/step_hlo_{_args.variant}.txt"
with open(path, "w") as f:
    f.write(txt)
print("HLO chars:", len(txt), "->", path)

wanted = _rest or ["fusion.22", "fusion.27", "fusion.20",
                          "fusion.18", "fusion.19", "fusion.21",
                          "fusion.4", "fusion.5", "slice.632",
                          "pad.1958", "while.15", "fusion.4983"]
for w in wanted:
    pat = re.compile(rf"^\s*%?{re.escape(w)} = .*$", re.M)
    m = pat.search(txt)
    print("\n====", w, "====")
    print(m.group(0)[:600] if m else "NOT FOUND")
