#!/bin/bash
# Generate on the test split with the trained checkpoint (reference scripts/test.sh).
python -m panfusion_tpu.cli test --data=Matterport3D --model=PanFusion --ckpt_path=last "$@"
