"""CLIP tokenizer: pure-Python BPE with an offline fallback.

The reference uses transformers' CLIPTokenizer pulled from the hub
(models/pano/PanoGenerator.py:117-118). This environment has no network, so:

* if vocab/merges files are available (e.g. converted alongside a torch
  checkpoint via tools/convert_ckpt.py), ``CLIPTokenizer`` runs a
  from-scratch byte-level BPE with CLIP's text cleanup and special tokens —
  drop-in id parity with the upstream tokenizer;
* otherwise ``HashTokenizer`` provides deterministic, stable ids so the
  full pipeline (and tests) run end to end; outputs are marked
  non-pretrained-compatible.

Both return fixed-length (77) id sequences padded with the end token, the
contract encode_text depends on (reference PanoGenerator.py:197-211).
"""
from __future__ import annotations

import gzip
import html
import json
import os
import re
from functools import lru_cache
from typing import List, Sequence

MAX_LEN = 77
BOS_ID = 49406
EOS_ID = 49407
VOCAB_SIZE = 49408


@lru_cache()
def _bytes_to_unicode():
    """GPT-2/CLIP reversible byte<->unicode table."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


try:
    # CLIP's pattern uses \p{L}/\p{N} unicode classes, which stdlib `re`
    # does not support — the `regex` module (present in this image) gives
    # id parity for non-ASCII prompts; the ASCII fallback only differs on
    # accented/non-Latin text
    import regex as _regex

    _PAT = _regex.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
        _regex.IGNORECASE,
    )
except ImportError:  # pragma: no cover - regex is in this image
    _PAT = re.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""",
        re.IGNORECASE,
    )


def _clean_text(text: str) -> str:
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text.strip())
    return text.lower()


class CLIPTokenizer:
    """Byte-level BPE with CLIP end-of-word markers.

    vocab: token -> id json; merges: one merge pair per line (may be .gz).
    """

    def __init__(self, vocab_path: str, merges_path: str):
        with open(vocab_path) as f:
            self.encoder = json.load(f)
        opener = gzip.open if merges_path.endswith(".gz") else open
        with opener(merges_path, "rt") as f:
            lines = f.read().split("\n")
        lines = [l for l in lines if l and not l.startswith("#version")]
        self.bpe_ranks = {tuple(l.split()): i for i, l in enumerate(lines)}
        self.byte_encoder = _bytes_to_unicode()
        self._cache = {}

    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            merged, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and (word[i], word[i + 1]) == best:
                    merged.append(word[i] + word[i + 1])
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        self._cache[token] = list(word)
        return list(word)

    def encode(self, text: str) -> List[int]:
        ids = []
        for tok in _PAT.findall(_clean_text(text)):
            btok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            for piece in self._bpe(btok):
                ids.append(self.encoder.get(piece, self.encoder.get("</w>", 0)))
        return ids

    def __call__(self, texts: Sequence[str] | str) -> List[List[int]]:
        if isinstance(texts, str):
            texts = [texts]
        out = []
        for t in texts:
            ids = [BOS_ID] + self.encode(t)[: MAX_LEN - 2] + [EOS_ID]
            ids = ids + [EOS_ID] * (MAX_LEN - len(ids))
            out.append(ids)
        return out


class HashTokenizer:
    """Deterministic fallback tokenizer (no vocab files needed).

    Maps each whitespace/punct token to a stable id in the CLIP vocab range
    via FNV-1a. NOT compatible with pretrained text encoders — exists so the
    framework runs offline end to end.
    """

    pretrained_compatible = False

    def encode(self, text: str) -> List[int]:
        ids = []
        for tok in _PAT.findall(_clean_text(text)):
            h = 2166136261
            for ch in tok.encode("utf-8"):
                h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
            ids.append(h % (BOS_ID - 1) + 1)  # stay clear of specials and 0
        return ids

    def __call__(self, texts: Sequence[str] | str) -> List[List[int]]:
        if isinstance(texts, str):
            texts = [texts]
        out = []
        for t in texts:
            ids = [BOS_ID] + self.encode(t)[: MAX_LEN - 2] + [EOS_ID]
            ids = ids + [EOS_ID] * (MAX_LEN - len(ids))
            out.append(ids)
        return out


def load_tokenizer(vocab_dir: str | None = None):
    """Return a CLIPTokenizer if vocab files are present, else HashTokenizer.

    Looks for vocab.json + merges.txt(.gz) in ``vocab_dir`` (or
    $PANFUSION_CLIP_VOCAB).
    """
    vocab_dir = vocab_dir or os.environ.get("PANFUSION_CLIP_VOCAB", "weights/clip")
    vocab = os.path.join(vocab_dir, "vocab.json")
    for merges in ("merges.txt", "merges.txt.gz"):
        mp = os.path.join(vocab_dir, merges)
        if os.path.exists(vocab) and os.path.exists(mp):
            return CLIPTokenizer(vocab, mp)
    return HashTokenizer()
