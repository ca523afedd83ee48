#!/bin/bash
# Train the flagship (reference scripts/train.sh parity); resumes from last.
python -m panfusion_tpu.cli fit --data=Matterport3D --model=PanFusion --ckpt_path=last "$@"
