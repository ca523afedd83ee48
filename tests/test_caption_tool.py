"""Output-contract test for the captioning tool (VERDICT r1, Next #8):
tools/caption_mp3d.py must write `<scene>/blip3_stitched/<view>.txt` for
every stitched pano, strip the prompt prefix the generator echoes, and be
idempotent on re-runs (reference scripts/caption_mp3d.py:33-60)."""
import os
import sys
import pathlib

import numpy as np
from PIL import Image

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))

import caption_mp3d  # noqa: E402


def _tree(root, scenes=("sceneA", "sceneB")):
    for s in scenes:
        d = root / s / "matterport_stitched_images"
        d.mkdir(parents=True)
        img = np.full((8, 16, 3), 128, np.uint8)
        Image.fromarray(img).save(d / "v0.png")


def test_caption_contract(tmp_path):
    _tree(tmp_path)
    todo, total = caption_mp3d.scan_todo(str(tmp_path))
    assert total == 2 and len(todo) == 2

    prompt = "a 360 - degree view of"
    n = caption_mp3d.run_captioner(
        todo, lambda src: f"{prompt} a cozy stub room", prompt)
    assert n == 2
    for s in ("sceneA", "sceneB"):
        out = tmp_path / s / "blip3_stitched" / "v0.txt"
        assert out.read_text() == "a cozy stub room\n"  # prefix stripped

    # idempotent: second scan finds nothing to do
    todo2, total2 = caption_mp3d.scan_todo(str(tmp_path))
    assert total2 == 2 and todo2 == []
