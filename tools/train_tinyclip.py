#!/usr/bin/env python
"""Train TinyCLIP — the synthetic-rooms CLIP-Score stand-in.

InfoNCE over (pano, caption) pairs from the procedural generator
(tools/gen_synthetic_rooms.py caption grammar). Writes
``weights/tinyclip.npz``; metrics/image_metrics.py then scores CLIP-Score
with it (reference analog: torchmetrics CLIPScore on
openai/clip-vit-base-patch16, EvalPanoGen.py:33).

Usage: python tools/train_tinyclip.py --steps 1200
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def caption_of(names: dict) -> str:
    # the write_scene grammar (tools/gen_synthetic_rooms.py:139-141)
    return (f"a synthetic room with {names['wall']} walls, one "
            f"{names['accent']} wall and a checkered {names['floor']} floor")


def render_pool(n: int, h: int, seed0: int):
    from gen_synthetic_rooms import make_layout, render_room

    panos, captions = [], []
    for i in range(n):
        rng = np.random.default_rng(seed0 + i)
        layout = make_layout(rng)
        pano, names = render_room(layout, rng, h, 2 * h)
        panos.append(pano)
        captions.append(caption_of(names))
    return np.stack(panos), captions


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--pool", type=int, default=400)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--n_test", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log_dir", default=os.path.join("logs", "tinyclip"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import panfusion_tpu

    panfusion_tpu.force_cpu()
    panfusion_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from panfusion_tpu.metrics.tinyclip import (TinyCLIPImage, TinyCLIPText,
                                                hash_words, save_tinyclip,
                                                tinyclip_image_preprocess)

    os.makedirs(args.log_dir, exist_ok=True)
    t0 = time.time()
    panos, captions = render_pool(args.pool, args.height,
                                  args.seed * 99991 + 1)
    ids_all = hash_words(captions)
    print(f"pool of {args.pool} pairs in {time.time() - t0:.1f}s")

    img_net, txt_net = TinyCLIPImage(), TinyCLIPText()
    vi = img_net.init(jax.random.PRNGKey(args.seed),
                      jnp.zeros((1, 128, 128, 3), jnp.float32))
    vt = txt_net.init(jax.random.PRNGKey(args.seed + 1),
                      jnp.zeros((1, 24), jnp.int32))
    params = {"img": vi, "txt": vt,
              "logit_scale": jnp.asarray(np.log(10.0), jnp.float32)}
    opt = optax.adam(optax.cosine_decay_schedule(args.lr, args.steps))
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, x, ids):
        def loss_fn(p):
            ie = img_net.apply(p["img"], x)
            te = txt_net.apply(p["txt"], ids)
            ie = ie / jnp.linalg.norm(ie, axis=-1, keepdims=True)
            te = te / jnp.linalg.norm(te, axis=-1, keepdims=True)
            logits = (ie @ te.T) * jnp.exp(p["logit_scale"])
            labels = jnp.arange(len(x))
            ce = optax.softmax_cross_entropy_with_integer_labels
            loss = (ce(logits, labels).mean()
                    + ce(logits.T, labels).mean()) / 2
            acc = (logits.argmax(1) == labels).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    rng = np.random.default_rng(args.seed + 3)
    jsonl = open(os.path.join(args.log_dir, "metrics.jsonl"), "a")
    for step in range(1, args.steps + 1):
        idx = rng.choice(args.pool, size=args.batch, replace=False)
        imgs = np.stack([
            np.roll(panos[i], rng.integers(0, panos[i].shape[1]), axis=1)
            for i in idx
        ])
        x = jnp.asarray(tinyclip_image_preprocess(imgs))
        params, opt_state, loss, acc = train_step(
            params, opt_state, x, jnp.asarray(ids_all[idx]))
        if step % 25 == 0 or step == 1:
            row = {"step": step, "loss": float(loss),
                   "retrieval_acc": float(acc),
                   "elapsed_s": round(time.time() - t0, 1)}
            print(row)
            jsonl.write(json.dumps(row) + "\n")
            jsonl.flush()

    # held-out: retrieval + the CLIP-Score contract (matched > shuffled)
    tp, tc = render_pool(args.n_test, args.height,
                         args.seed * 99991 + 5_000_011)
    x = jnp.asarray(tinyclip_image_preprocess(tp))
    ids = jnp.asarray(hash_words(tc))
    ie = np.asarray(img_net.apply(params["img"], x))
    te = np.asarray(txt_net.apply(params["txt"], ids))
    ie = ie / np.linalg.norm(ie, axis=-1, keepdims=True)
    te = te / np.linalg.norm(te, axis=-1, keepdims=True)
    sims = ie @ te.T
    matched = float(np.mean(np.diag(sims))) * 100
    shuffled = float(np.mean(np.diag(sims[:, ::-1]))) * 100
    acc = float((sims.argmax(1) == np.arange(len(tp))).mean())
    summary = {
        "held_out_retrieval_acc": acc,
        "cs_matched": matched, "cs_shuffled": shuffled,
        "separation": matched - shuffled,
        "steps": args.steps,
        "train_minutes": round((time.time() - t0) / 60, 1),
    }
    print(json.dumps(summary, indent=2))
    with open(os.path.join(args.log_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    out = args.out
    if out is None:
        from panfusion_tpu.metrics.tinyclip import WEIGHTS_PATH
        out = WEIGHTS_PATH
    save_tinyclip(params["img"], params["txt"], params["logit_scale"], out)
    print(f"saved {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
