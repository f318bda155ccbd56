#!/bin/bash
# DTU sparse-view protocol (3 views) — mirrors the reference run_dtu.sh
# flag-for-flag on the TPU framework (/root/reference/run_dtu.sh:6-13):
# mask loss 0.1, half resolution (-r 2), deform_weight 0 (front-facing DTU),
# SplatFields init from the 1k-iteration 3DGS point cloud.
set -x
DATASET_ROOT=${DATASET_ROOT:-/data/DTU}
SCENE=${SCENE:-scan114}  # scan24 37 40 55 63 65 69 83 97 105 106 110 114 118 122
N_VIEWS=${N_VIEWS:-3}
OUT=${OUT:-./output_rep/dtu}
# smoke-test overrides (defaults = the reference protocol)
ITERS=${ITERS:-30000}
PC_ITER=${PC_ITER:-1000}
MAX_PTS=${MAX_PTS:-300000}
PY="python -m splatfields_tpu"

# vanilla 3DGS baseline
$PY.train -s $DATASET_ROOT/$SCENE -m $OUT/$SCENE/${N_VIEWS}views/3DGS \
  --white_background --lambda_mask 0.1 -r 2 --is_static \
  --n_views $N_VIEWS --iterations $ITERS
$PY.render -s $DATASET_ROOT/$SCENE -m $OUT/$SCENE/${N_VIEWS}views/3DGS \
  --white_background --lambda_mask 0.1 -r 2 --is_static \
  --n_views $N_VIEWS --iterations $ITERS

# SplatFields3D (triplane CNN field, no deformation head contribution)
$PY.train -s $DATASET_ROOT/$SCENE \
  -m $OUT/$SCENE/${N_VIEWS}views/SplatFields3D \
  --pc_path $OUT/$SCENE/${N_VIEWS}views/3DGS/point_cloud/iteration_$PC_ITER/point_cloud.ply \
  --deform_weight 0 --white_background --lambda_mask 0.1 \
  --n_views $N_VIEWS --lambda_norm 0.01 --encoder_type VarTriPlaneEncoder \
  --W 128 --iterations $ITERS --max_num_pts $MAX_PTS -r 2 \
  --load_time_step 0 --composition_rank 0
$PY.render -s $DATASET_ROOT/$SCENE \
  -m $OUT/$SCENE/${N_VIEWS}views/SplatFields3D \
  --pc_path $OUT/$SCENE/${N_VIEWS}views/3DGS/point_cloud/iteration_$PC_ITER/point_cloud.ply \
  --deform_weight 0 --white_background --lambda_mask 0.1 \
  --n_views $N_VIEWS --lambda_norm 0.01 --encoder_type VarTriPlaneEncoder \
  --W 128 --iterations $ITERS --max_num_pts $MAX_PTS -r 2 \
  --load_time_step 0 --composition_rank 0
