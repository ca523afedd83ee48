"""FID / Inception Score / CLIP-Score — the torchmetrics trio of the
reference eval harness (models/pano/EvalPanoGen.py:30-49), TPU-native.

All three share the streaming-state pattern: `update()` runs the jitted
feature extractor on device and accumulates small host-side states that are
sum-reducible across data-parallel workers; `compute()` finishes on host.

Feature extractors are process-wide singletons (one compile each); metric
instances are cheap, so the harness can hold 17 of them like the reference's
ModuleDict.
"""
from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .frechet import StreamingFrechet
from .inception import (
    inception_preprocess,
    load_inception_variables,
    make_inception,
)


class FeatureExtractor:
    """The FID/IS feature slot: preprocess + jitted (features, class-probs).

    kind is one of 'inception' (real pretrained weights), 'roomnet'
    (trained synthetic-rooms stand-in — see metrics/roomnet.py), or
    'inception-random' (seeded random fallback; pipeline-valid, values
    informationless)."""

    def __init__(self, run, preprocess, feat_dim: int, kind: str):
        self.run = run
        self.preprocess = preprocess
        self.feat_dim = feat_dim
        self.kind = kind

    def __call__(self, imgs_uint8: np.ndarray):
        return self.run(jnp.asarray(self.preprocess(imgs_uint8)))


@functools.lru_cache(maxsize=1)
def _feature_extractor() -> FeatureExtractor:
    """Auto-switch (same precedent as the trained FAED / TinyCaptioner):
    real Inception weights when present > trained RoomNet stand-in >
    random Inception (load_inception_variables warns)."""
    import os

    from .inception import WEIGHTS_PATH as INCEPTION_WEIGHTS
    from .roomnet import WEIGHTS_PATH as ROOMNET_WEIGHTS

    if (not os.path.exists(INCEPTION_WEIGHTS)
            and os.path.exists(ROOMNET_WEIGHTS)):
        from .roomnet import (FEAT_DIM, RoomNet, load_roomnet,
                              roomnet_preprocess, split_logits)

        net = RoomNet()
        variables = load_roomnet(ROOMNET_WEIGHTS)

        @jax.jit
        def run_room(v, x):
            feats, logits = net.apply(v, x)
            wall, _, _, _ = split_logits(logits)
            return feats, jax.nn.softmax(wall, axis=-1)

        print("FID/IS feature slot: trained RoomNet stand-in "
              f"({ROOMNET_WEIGHTS})")
        return FeatureExtractor(
            functools.partial(run_room, variables), roomnet_preprocess,
            FEAT_DIM, "roomnet",
        )

    net = make_inception()
    variables = load_inception_variables(net)

    # params as jit ARGS, not closure constants: closed-over weights get
    # baked into the HLO (100 MB+), which remote-compile relays reject
    @jax.jit
    def run(v, x):
        feats, logits = net.apply(v, x)
        return feats, jax.nn.softmax(logits, axis=-1)

    kind = ("inception" if os.path.exists(INCEPTION_WEIGHTS)
            else "inception-random")
    return FeatureExtractor(
        functools.partial(run, variables), inception_preprocess, 2048, kind
    )


@functools.lru_cache(maxsize=1)
def _clip_slot_kind() -> str:
    """Which towers the CLIP-Score slot runs: real converted CLIP weights >
    trained TinyCLIP stand-in (metrics/tinyclip.py) > random CLIP. The
    image and text fns MUST agree (they share one joint embedding space),
    so both consult this single decision."""
    import os

    from .tinyclip import WEIGHTS_PATH as TINYCLIP_WEIGHTS

    if (os.path.exists(os.path.join("weights", "clip_vision.npz"))
            and os.path.exists(os.path.join("weights", "clip_text.npz"))):
        return "clip"
    if os.path.exists(TINYCLIP_WEIGHTS):
        print(f"CLIP-Score slot: trained TinyCLIP stand-in "
              f"({TINYCLIP_WEIGHTS})")
        return "tinyclip"
    return "clip-random"


@functools.lru_cache(maxsize=1)
def _tinyclip():
    from .tinyclip import (TinyCLIPImage, TinyCLIPText, load_tinyclip)

    img_vars, txt_vars, _ = load_tinyclip()
    img_net, txt_net = TinyCLIPImage(), TinyCLIPText()
    run_img = jax.jit(lambda v, x: img_net.apply(v, x))
    run_txt = jax.jit(lambda v, ids: txt_net.apply(v, ids))
    return (functools.partial(run_img, img_vars),
            functools.partial(run_txt, txt_vars))


@functools.lru_cache(maxsize=1)
def _clip_fns():
    """image_embed_fn for CLIP-Score; weights from weights/clip_vision.npz
    when present (tools/convert_ckpt.py), else the trained TinyCLIP
    stand-in, else seeded random."""
    import os

    from ..nn.clip import CLIPVisionModel, clip_image_preprocess  # noqa: F401
    from .inception import _unflatten_into

    if _clip_slot_kind() == "tinyclip":
        from .tinyclip import tinyclip_image_preprocess

        run = _tinyclip()[0]
        return lambda imgs_uint8: run(
            jnp.asarray(tinyclip_image_preprocess(np.asarray(imgs_uint8))))

    # ViT-B/16 — the tower of the reference's CLIPScore model id
    # 'openai/clip-vit-base-patch16' (EvalPanoGen.py:33)
    net = CLIPVisionModel(
        patch_size=16, hidden_size=768, intermediate_size=3072,
        num_layers=12, num_heads=12, projection_dim=512,
    )
    variables = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    path = os.path.join("weights", "clip_vision.npz")
    if os.path.exists(path):
        variables = _unflatten_into(variables, dict(np.load(path)))
    run = jax.jit(lambda v, x: net.apply(v, x))
    # uint8-in contract: each tower owns its preprocessing (224 for CLIP,
    # 128 for TinyCLIP) so ClipScore needn't know which is loaded
    return lambda imgs_uint8: run(
        variables, jnp.asarray(clip_image_preprocess(imgs_uint8)))


@functools.lru_cache(maxsize=1)
def default_text_embed_fn():
    """List[str] -> (n, d) pooled+projected CLIP text embeddings.

    Pools the hidden state at the EOS token and applies text_projection —
    the joint-space embedding torchmetrics CLIPScore compares against.
    Weights from weights/clip_text.npz when present, else seeded random.
    """
    import os

    from ..nn.clip import CLIPTextModel
    from ..nn.tokenizer import load_tokenizer
    from .inception import _unflatten_into

    if _clip_slot_kind() == "tinyclip":
        from .tinyclip import hash_words

        run = _tinyclip()[1]
        return lambda texts: run(jnp.asarray(hash_words(list(texts))))

    # openai/clip-vit-base-patch16 text tower: 512 hidden, 12 layers, 8 heads
    net = CLIPTextModel(
        hidden_size=512, intermediate_size=2048, num_layers=12, num_heads=8
    )
    tokenizer = load_tokenizer()
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    proj = jax.random.normal(
        jax.random.PRNGKey(1), (net.hidden_size, 512), jnp.float32
    ) / np.sqrt(net.hidden_size)
    path = os.path.join("weights", "clip_text.npz")
    if os.path.exists(path):
        flat = dict(np.load(path))
        proj = jnp.asarray(flat.pop("text_projection", proj))
        variables = _unflatten_into(variables, flat)

    @jax.jit
    def run(v, pr, ids):
        hidden = net.apply(v, ids)  # (n, 77, d)
        eos_pos = jnp.argmax(ids == 49407, axis=-1)
        pooled = hidden[jnp.arange(ids.shape[0]), eos_pos]
        return pooled @ pr

    def embed(texts):
        ids = jnp.asarray(tokenizer(list(texts)), jnp.int32)
        return run(variables, proj, ids)

    return embed


class FrechetInceptionDistance:
    """FID over Inception pool3 features (reference: torchmetrics FID,
    EvalPanoGen.py:33 et al)."""

    higher_is_better = False

    def __init__(self):
        # sized lazily to the active extractor's feat_dim (2048 Inception /
        # 256 RoomNet) — constructing the extractor here would compile the
        # tower once per metric instance at harness build time
        self._frechet: Optional[StreamingFrechet] = None
        self.update_called = False

    def reset(self):
        if self._frechet is not None:
            self._frechet.reset()
        self.update_called = False

    def update(self, imgs_uint8: np.ndarray, real: bool):
        feats, _ = _feature_extractor()(imgs_uint8)
        if self._frechet is None:
            self._frechet = StreamingFrechet(int(feats.shape[-1]))
        self._frechet.update(np.asarray(feats), real)
        self.update_called = True

    def merge_state(self, other):
        if other._frechet is not None:
            if self._frechet is None:
                self._frechet = StreamingFrechet(other._frechet.num_features)
            self._frechet.merge_state(other._frechet)
        self.update_called = self.update_called or other.update_called

    def compute(self) -> float:
        if self._frechet is None:
            self._frechet = StreamingFrechet(_feature_extractor().feat_dim)
        return self._frechet.compute()


class InceptionScore:
    """IS = exp(E_x KL(p(y|x) || p(y))) over generated images only
    (torchmetrics InceptionScore contract: update(imgs) — no real set)."""

    higher_is_better = True

    def __init__(self):
        self.reset()

    def reset(self):
        self._probs: List[np.ndarray] = []
        self.update_called = False

    def update(self, imgs_uint8: np.ndarray):
        _, probs = _feature_extractor()(imgs_uint8)
        self._probs.append(np.asarray(probs, np.float64))
        self.update_called = True

    def merge_state(self, other):
        self._probs.extend(other._probs)
        self.update_called = self.update_called or other.update_called

    def compute(self, splits: int = 10):
        """(mean, std) over `splits` chunks (torchmetrics contract — the
        reference unpacks both, EvalPanoGen.py:181-182). Features are
        permuted before chunking like torchmetrics' randperm (fixed seed
        for reproducibility): dataset order is scene-correlated and would
        bias the per-chunk marginals."""
        p = np.concatenate(self._probs, axis=0)
        p = p[np.random.default_rng(42).permutation(len(p))]
        p = np.clip(p, 1e-16, 1.0)
        scores = []
        for chunk in np.array_split(p, splits):
            if len(chunk) == 0:
                continue
            marginal = chunk.mean(axis=0, keepdims=True)
            kl = (chunk * (np.log(chunk) - np.log(marginal))).sum(axis=1)
            scores.append(np.exp(kl.mean()))
        return float(np.mean(scores)), float(np.std(scores))


class ClipScore:
    """CLIP-Score: 100 * max(mean cos(img_emb, txt_emb), 0) — torchmetrics
    CLIPScore accumulates the raw per-sample similarities and clamps only
    the final mean (reference EvalPanoGen.py:85-169 feeds (images, prompts)
    pairs)."""

    higher_is_better = True

    def __init__(self, text_embed_fn=None):
        # text_embed_fn: List[str] -> (n, d) embeddings; bound by the
        # harness to the session CLIP text tower + projection.
        self.text_embed_fn = text_embed_fn
        self.reset()

    def reset(self):
        self._score_sum = 0.0
        self._n = 0
        self.update_called = False

    def update(self, imgs_uint8: np.ndarray, prompts: List[str]):
        img_emb = np.asarray(_clip_fns()(imgs_uint8))
        if self.text_embed_fn is None:
            self.text_embed_fn = default_text_embed_fn()
        txt_emb = np.asarray(self.text_embed_fn(list(prompts)))
        img_emb = img_emb / np.linalg.norm(img_emb, axis=-1, keepdims=True)
        txt_emb = txt_emb / np.linalg.norm(txt_emb, axis=-1, keepdims=True)
        sims = (img_emb * txt_emb).sum(axis=-1) * 100.0
        self._score_sum += float(sims.sum())
        self._n += len(sims)
        self.update_called = True

    def merge_state(self, other):
        self._score_sum += other._score_sum
        self._n += other._n
        self.update_called = self.update_called or other.update_called

    def compute(self) -> float:
        return max(self._score_sum / max(self._n, 1), 0.0)


class MeanMetric:
    """Scalar running mean (psum-able sum/count states)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._sum = 0.0
        self._n = 0
        self.update_called = False

    def update(self, value: float, n: int = 1):
        self._sum += float(value) * n
        self._n += n
        self.update_called = True

    def merge_state(self, other):
        self._sum += other._sum
        self._n += other._n
        self.update_called = self.update_called or other.update_called

    def compute(self) -> float:
        return self._sum / max(self._n, 1)
