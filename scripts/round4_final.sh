#!/bin/bash
# Round-4 final phase: regenerate all sample artifacts from the 20k-step
# checkpoint, re-run quality gates and the eval sweep, then the perf pass.
set -x
cd "$(dirname "$0")/.."
export WANDB_MODE=disabled
LOG=/tmp/round4_stages.log
COMMON="--data=Matterport3D --data.data_dir=data/SyntheticRooms \
  --data.pano_height=256 --data.pers_resolution=128 --data.cam_sampler=horizon \
  --data.num_workers=4 --model=PanFusion --model.preset=demo --model.num_views=8"
echo "=== round4_final start $(date)" >> $LOG

# stale step-10k outputs must go: test/predict skip samples idempotently
rm -rf logs/synpano_diff/test logs/synpano_diff/predict

python scripts/probe_guidance.py --ckpt logs/synpano_diff/checkpoints/last \
  --out logs/synpano_diff/guidance_sweep_20k --scales 1,2,3,5,9 || true

WANDB_RUN_ID=synpano_diff python -m panfusion_tpu.cli predict $COMMON \
  --data.batch_size=1 --data.repeat_predict=1 --data.predict_limit=6 \
  --model.diff_timestep=50 \
  --ckpt_path=logs/synpano_diff/checkpoints/last \
  && echo "predict@20k OK $(date)" >> $LOG

WANDB_RUN_ID=synpano_diff python -m panfusion_tpu.cli test $COMMON \
  --data.batch_size=1 --model.diff_timestep=50 \
  --ckpt_path=logs/synpano_diff/checkpoints/last \
  && echo "testgen@20k OK $(date)" >> $LOG

WANDB_RUN_ID=synpano_diff python -m panfusion_tpu.cli test --model=EvalPanoGen \
  --data=Matterport3D --data.data_dir=data/SyntheticRooms --data.num_workers=4 \
  --data.pano_height=256 --data.pers_resolution=128 --data.cam_sampler=horizon \
  && echo "evalsweep@20k OK $(date)" >> $LOG

python tools/faed_distance.py \
  --gt_glob 'data/SyntheticRooms/*/matterport_stitched_images/*.png' \
  --gen_glob 'logs/synpano_diff/predict/*/pano.jpg' \
  --ckpt weights/faed --height 256 --noise_floor \
  --out logs/synpano_diff/faed_gate.json \
  && echo "faed_gate(predict)@20k OK $(date)" >> $LOG
python tools/faed_distance.py \
  --gt_glob 'data/SyntheticRooms/*/matterport_stitched_images/*.png' \
  --gen_glob 'logs/synpano_diff/test/*/pano.png' \
  --ckpt weights/faed --height 256 --noise_floor \
  --out logs/synpano_diff/faed_gate_test20.json \
  && echo "faed_gate(test20)@20k OK $(date)" >> $LOG

python scripts/probe_layout_cond.py --ckpt logs/synpano_cn/checkpoints/last \
  --out logs/synpano_cn/contrast \
  --rooms room0200_v0,room0201_v0,room0202_v0,room0203_v0 \
  && echo "probe4rooms OK $(date)" >> $LOG

echo "=== round4_final done $(date)" >> $LOG
