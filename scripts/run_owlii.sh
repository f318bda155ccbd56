#!/bin/bash
# Owlii 4D reconstruction protocol — mirrors the reference run_owlii.sh
# flag-for-flag on the TPU framework (/root/reference/run_owlii.sh:4-8):
# 100 frames, offset flow model, ResField rank 40, 10 train cameras,
# 5 same-frame views per iteration, 200k iterations.
set -x
DATASET_ROOT=${DATASET_ROOT:-./DATA_OWLII}
SCENE=${SCENE:-dancer}   # exercise model basketball
N_VIEWS=${N_VIEWS:-8}    # 10 8 6 4
OUT=${OUT:-./output_rep/Owlii}
# smoke-test overrides (defaults = the reference protocol)
ITERS=${ITERS:-200000}
TIME_STEP=${TIME_STEP:-100}
NUM_PTS=${NUM_PTS:-100000}
NUM_VIEWS=${NUM_VIEWS:-5}
RANK=${RANK:-40}
PY="python -m splatfields_tpu"

$PY.train -s $DATASET_ROOT/$SCENE --white_background --eval \
  --load_time_step $TIME_STEP -m $OUT/${N_VIEWS}views/$SCENE/SplatFields4D \
  --flow_model offset --all_training \
  --train_cam_names cam_train_0 cam_train_1 cam_train_2 cam_train_3 \
    cam_train_4 cam_train_5 cam_train_6 cam_train_7 cam_train_8 cam_train_9 \
  --pts_samples hull --iterations $ITERS \
  --encoder_type VarTriPlaneEncoder --num_pts $NUM_PTS --num_views $NUM_VIEWS \
  --composition_rank $RANK
$PY.render -s $DATASET_ROOT/$SCENE --white_background --eval \
  --load_time_step $TIME_STEP -m $OUT/${N_VIEWS}views/$SCENE/SplatFields4D \
  --flow_model offset --all_training \
  --train_cam_names cam_train_0 cam_train_1 cam_train_2 cam_train_3 \
    cam_train_4 cam_train_5 cam_train_6 cam_train_7 cam_train_8 cam_train_9 \
  --pts_samples hull --iterations $ITERS \
  --encoder_type VarTriPlaneEncoder --num_pts $NUM_PTS --num_views $NUM_VIEWS \
  --composition_rank $RANK
