"""The TinyCaptioner demonstration artifacts are checked evidence.

tools/train_captioner.py trains a real autoregressive captioner from
scratch on synthetic rooms and tools/caption_mp3d.py --captioner=tiny
serves it; the committed held-out metrics (logs/syncaption/summary.json)
must show genuine captioning quality, and the servable checkpoint
(weights/captioner) must load and caption an image. The reference's
captioning component is offline BLIP-2 (scripts/caption_mp3d.py:22-60).
"""
import json
import os

import numpy as np
import pytest

ROOT = os.path.join(os.path.dirname(__file__), os.pardir)
SUMMARY = os.path.join(ROOT, "logs", "syncaption", "summary.json")
WEIGHTS = os.path.join(ROOT, "weights", "captioner")


class TestCaptionerEvidence:
    def test_heldout_quality_committed(self):
        # committed in round 3 — absence is a regression, not a skip
        assert os.path.isfile(SUMMARY), "captioner evidence missing"
        s = json.load(open(SUMMARY))
        assert s["n_test"] >= 10
        assert s["exact_match"] >= 0.5, s
        assert s["color_word_accuracy"] >= 0.8, s

    def test_checkpoint_serves(self, tmp_path):
        if not os.path.isdir(WEIGHTS):
            pytest.skip("captioner weights not committed")
        from PIL import Image

        from panfusion_tpu.models.captioner import load_captioner

        caption = load_captioner(WEIGHTS)
        img = tmp_path / "x.png"
        Image.fromarray(
            np.full((64, 128, 3), (200, 70, 60), np.uint8)
        ).save(img)
        text = caption(str(img))
        # a real decoded sentence, not ids or empty output
        assert isinstance(text, str) and len(text.split()) >= 4, text
        assert "<unk>" not in text


class TestCaptionerUnit:
    def test_vocab_roundtrip(self):
        from panfusion_tpu.models.captioner import (build_vocab, decode_ids,
                                                    encode_caption)

        caps = ["a synthetic room with red walls, one blue wall",
                "a checkered teal floor"]
        vocab = build_vocab(caps)
        for c in caps:
            ids = encode_caption(vocab, c, 24)
            assert decode_ids(vocab, ids) == c
