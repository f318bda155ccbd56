#!/bin/bash
# Blender reproduction protocol (paper Tab. 2/3; supp C1/C2) — mirrors the
# reference run_blender.sh flag-for-flag on the TPU framework.
set -x
SCENE=${SCENE:-lego}        # any Blender scene
N_VIEWS=${N_VIEWS:-10}      # in {4 6 8 10 12}
DATASET_ROOT=${DATASET_ROOT:-/data/nerf_synthetic}
OUT=${OUT:-./output_rep/Blender}
PY="python -m splatfields_tpu"

# 3DGS baseline (static mode, hull init)
$PY.train -s ${DATASET_ROOT}/${SCENE} --white_background --eval \
  -m $OUT/$SCENE/${N_VIEWS}views/3DGS --is_static --n_views $N_VIEWS \
  --iterations 40000 --pts_samples hull --max_num_pts 300000 \
  --load_time_step 0 --composition_rank 0
$PY.render -s ${DATASET_ROOT}/${SCENE} --white_background --eval \
  -m $OUT/$SCENE/${N_VIEWS}views/3DGS --is_static --n_views $N_VIEWS \
  --load_time_step 0

# SplatFields3D (triplane CNN + L2 norm, init from the 3DGS point cloud)
$PY.train -s ${DATASET_ROOT}/${SCENE} --white_background --eval \
  -m $OUT/${SCENE}/${N_VIEWS}views/SplatFields \
  --encoder_type VarTriPlaneEncoder --lambda_norm 0.01 \
  --test_iterations -1 --n_views ${N_VIEWS} --iterations 40000 \
  --pts_samples load --max_num_pts 100000 \
  --pc_path $OUT/${SCENE}/${N_VIEWS}views/3DGS/point_cloud/iteration_40000/point_cloud.ply \
  --load_time_step 0 --composition_rank 0
$PY.render -s ${DATASET_ROOT}/${SCENE} --white_background --eval \
  -m $OUT/${SCENE}/${N_VIEWS}views/SplatFields --load_time_step 0

# 3DGS + Moran regularizer ablation
$PY.train -s ${DATASET_ROOT}/${SCENE} --white_background --eval \
  -m $OUT/$SCENE/${N_VIEWS}views/3DGS_Lmoran --is_static \
  --n_views ${N_VIEWS} --iterations 40000 --pts_samples hull \
  --max_num_pts 300000 --lambda_corr 0.01 --load_time_step 0 \
  --composition_rank 0

# Ablations (Tab. 3): MLP-only / +L2 / +CNN / full
for VARIANT in "MLP --encoder_type none" \
               "MLP_norm0.01 --encoder_type none --lambda_norm 0.01" \
               "MLP_CNN --encoder_type VarTriPlaneEncoder" \
               "MLP_norm0.01_CNN --encoder_type VarTriPlaneEncoder --lambda_norm 0.01"; do
  NAME=$(echo $VARIANT | cut -d' ' -f1)
  FLAGS=$(echo $VARIANT | cut -d' ' -f2-)
  $PY.train -s ${DATASET_ROOT}/${SCENE} --white_background --eval \
    -m $OUT/${SCENE}/${N_VIEWS}views/$NAME $FLAGS --test_iterations -1 \
    --n_views $N_VIEWS --iterations 40000 --pts_samples load \
    --max_num_pts 300000 \
    --pc_path $OUT/${SCENE}/${N_VIEWS}views/3DGS/point_cloud/iteration_40000/point_cloud.ply \
    --load_time_step 0 --composition_rank 0
done
