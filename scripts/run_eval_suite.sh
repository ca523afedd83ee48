#!/bin/bash
# Milestone config 5 (BASELINE.md): the full eval sweep over ACTUAL
# generations with TRAINED eval models (VERDICT round 2, Next #3).
#
#   1. fit FAED on synthetic rooms        -> weights/faed/last
#   2. fit HorizonNet on synthetic rooms  -> weights/horizonnet/last
#   3. held-out layout IoU (horizon_infer + horizon_eval, the reference's
#      eval_general.py contract)          -> logs/synhorizon_eval/summary.json
#   4. PanFusion test-split generations   -> logs/synpano_diff/test/
#   5. EvalPanoGen 18-metric sweep        -> logs/synpano_diff/summary +
#      noise-floor contrast (the FAED sample-quality gate's evidence)
#
# Run on the real chip AFTER scripts/run_synth_pipeline.sh.
set -e
cd "$(dirname "$0")/.."
export WANDB_MODE=disabled

DATA="--data=Matterport3D --data.data_dir=data/SyntheticRooms --data.num_workers=4"
FAED_EPOCHS=${FAED_EPOCHS:-40}
HN_EPOCHS=${HN_EPOCHS:-40}

echo "=== 1. FAED fit ($FAED_EPOCHS epochs) ==="
WANDB_RUN_ID=synfaed python -m panfusion_tpu.cli fit --model=FAED $DATA \
  --data.pano_height=256 --data.batch_size=4 \
  --model.pano_height=256 --model.max_epochs=$FAED_EPOCHS
mkdir -p weights/faed && rm -rf weights/faed/last
cp -r logs/synfaed/checkpoints/last weights/faed/last

echo "=== 2. HorizonNet fit ($HN_EPOCHS epochs) ==="
WANDB_RUN_ID=synhorizon python -m panfusion_tpu.cli fit --model=HorizonNet $DATA \
  --data.layout_anno_dir=data/SyntheticRooms/annotations \
  --data.pano_height=512 --data.batch_size=4 \
  --data.horizon_layout=true --data.rand_rot_img=true \
  --model.max_epochs=$HN_EPOCHS
mkdir -p weights/horizonnet && rm -rf weights/horizonnet/last
cp -r logs/synhorizon/checkpoints/last weights/horizonnet/last

echo "=== 3. held-out layout IoU ==="
mkdir -p logs/synhorizon_eval/gt logs/synhorizon_eval/dt
# GT corner txts (1024x512 pixel pairs, ceil/floor interleaved — the
# reference eval_general.py GT contract) from the synthetic label JSONs
python - <<'EOF'
import os
from panfusion_tpu.data.layout import Layout
rooms = [l.strip() for l in open("data/SyntheticRooms/lo_test.txt") if l.strip()]
for name in rooms:
    scene, view = name.rsplit("_", 1)
    lay = Layout.from_json(
        f"data/SyntheticRooms/annotations/label_data/{scene}_{view}_label.json")
    cor = lay.to_layout_coords().reshape(-1, 2) * [1024, 512]
    with open(f"logs/synhorizon_eval/gt/{scene}_{view}.txt", "w") as f:
        f.writelines(f"{x:.2f} {y:.2f}\n" for x, y in cor)
print(f"wrote {len(rooms)} GT corner files")
EOF
for name in $(cat data/SyntheticRooms/lo_test.txt); do
  scene=${name%_*}; view=${name##*_}
  src=data/SyntheticRooms/$scene/matterport_aligned_images/$view.png
  cp "$src" "logs/synhorizon_eval/dt/${scene}_${view}.png"
done
python tools/horizon_infer.py \
  --img_glob 'logs/synhorizon_eval/dt/*.png' \
  --output_dir logs/synhorizon_eval/dt --ckpt weights/horizonnet
rm logs/synhorizon_eval/dt/*.png
python tools/horizon_eval.py \
  --dt_glob 'logs/synhorizon_eval/dt/*.json' \
  --gt_glob 'logs/synhorizon_eval/gt/*.txt' --mode general \
  --summary_json logs/synhorizon_eval/summary.json \
  | tee logs/synhorizon_eval/eval.txt

echo "=== 4. PanFusion generations over the test split ==="
WANDB_RUN_ID=synpano_diff python -m panfusion_tpu.cli test \
  $DATA --data.pano_height=256 --data.pers_resolution=128 \
  --data.cam_sampler=horizon --data.batch_size=1 --model=PanFusion \
  --model.preset=demo --model.num_views=8 --model.diff_timestep=50 \
  --ckpt_path=logs/synpano_diff/checkpoints/last

echo "=== 5. EvalPanoGen sweep over the generations ==="
WANDB_RUN_ID=synpano_diff python -m panfusion_tpu.cli test --model=EvalPanoGen \
  $DATA --data.pano_height=256 --data.pers_resolution=128 \
  --data.cam_sampler=horizon

echo "=== 6. FAED sample-quality gate (vs gaussian-noise floor) ==="
python tools/faed_distance.py \
  --gt_glob 'data/SyntheticRooms/*/matterport_stitched_images/*.png' \
  --gen_glob 'logs/synpano_diff/predict/*/pano.jpg' \
  --ckpt weights/faed --height 256 --noise_floor \
  --out logs/synpano_diff/faed_gate.json

echo "=== eval suite done ==="
