#!/usr/bin/env python
"""Train RoomNet — the synthetic-rooms FID/IS feature stand-in.

The reference's FID / Inception-Score run on a pretrained InceptionV3
(reference models/pano/EvalPanoGen.py:30-49); with no network egress this
environment cannot have those weights, and random features make the FID
family informationless (round-4 sweep: FID 3e-6, IS 1.0). This trains the
small multi-task classifier of panfusion_tpu/metrics/roomnet.py on the
procedural room generator (tools/gen_synthetic_rooms.py) — wall/floor
color, room shape, and corruption-type heads — and writes
``weights/roomnet.npz``, which metrics/image_metrics.py auto-loads into
the Inception slot.

CPU-sized on purpose (same budget class as tools/train_captioner.py):
rooms render procedurally, no dataset needed.

Usage:
  python tools/train_roomnet.py --steps 1500 --out weights/roomnet.npz
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


def render_pool(n: int, h: int, seed0: int):
    """n procedural rooms + labels. Returns (uint8 panos, label dict)."""
    from gen_synthetic_rooms import make_layout, render_room

    from panfusion_tpu.metrics.roomnet import (FLOOR_CLASSES, WALL_CLASSES)

    panos, wall, floor, shape = [], [], [], []
    for i in range(n):
        rng = np.random.default_rng(seed0 + i)
        layout = make_layout(rng)
        pano, names = render_room(layout, rng, h, 2 * h)
        panos.append(pano)
        wall.append(WALL_CLASSES.index(names["wall"]))
        floor.append(FLOOR_CLASSES.index(names["floor"]))
        shape.append(int(len(layout.corners_xz) > 4))
    return (np.stack(panos), np.asarray(wall), np.asarray(floor),
            np.asarray(shape))


def corrupt(img: np.ndarray, kind: int, rng: np.random.Generator):
    """kind: 0 clean, 1 blur, 2 noise, 3 seam (CORRUPT_CLASSES order)."""
    if kind == 1:
        import cv2

        k = int(rng.choice([5, 9, 15]))
        return cv2.blur(img, (k, k))
    if kind == 2:
        sigma = float(rng.choice([20, 40, 80]))
        return np.clip(
            img.astype(np.float64) + rng.normal(0, sigma, img.shape), 0, 255
        ).astype(np.uint8)
    if kind == 3:
        out = img.copy()
        w = img.shape[1]
        out[:, w // 2:] = np.roll(img[:, w // 2:], img.shape[0] // 3, 0)
        return out
    return img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--pool", type=int, default=400,
                    help="pre-rendered room pool size")
    ap.add_argument("--height", type=int, default=128,
                    help="render height of pool panos (w = 2h)")
    ap.add_argument("--n_test", type=int, default=120)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None,
                    help="default: panfusion_tpu.metrics.roomnet.WEIGHTS_PATH")
    ap.add_argument("--log_dir", default=os.path.join("logs", "roomnet"))
    args = ap.parse_args()

    import panfusion_tpu

    panfusion_tpu.force_cpu()  # CPU-sized; leave the chip free for fits
    panfusion_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from panfusion_tpu.metrics.roomnet import (CORRUPT_CLASSES, RoomNet,
                                               roomnet_preprocess,
                                               save_roomnet, split_logits)

    out_path = args.out
    os.makedirs(args.log_dir, exist_ok=True)
    t0 = time.time()
    print(f"rendering pool of {args.pool} rooms ...")
    panos, wall, floor, shape = render_pool(args.pool, args.height,
                                            seed0=args.seed * 100003 + 1)
    print(f"pool ready in {time.time() - t0:.1f}s")

    net = RoomNet()
    params = net.init(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, 160, 160, 3), jnp.float32),
    )
    sched = optax.cosine_decay_schedule(args.lr, args.steps)
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, x, yw, yf, ys, yc):
        def loss_fn(p):
            _, logits = net.apply(p, x)
            lw, lf, lsh, lc = split_logits(logits)
            ce = optax.softmax_cross_entropy_with_integer_labels
            loss = (ce(lw, yw).mean() + ce(lf, yf).mean()
                    + ce(lsh, ys).mean() + ce(lc, yc).mean())
            accs = jnp.stack([
                (lw.argmax(-1) == yw).mean(), (lf.argmax(-1) == yf).mean(),
                (lsh.argmax(-1) == ys).mean(), (lc.argmax(-1) == yc).mean(),
            ])
            return loss, accs

        (loss, accs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, accs

    rng = np.random.default_rng(args.seed + 7)
    jsonl = open(os.path.join(args.log_dir, "metrics.jsonl"), "a")
    for step in range(1, args.steps + 1):
        idx = rng.integers(0, args.pool, size=args.batch)
        kinds = rng.integers(0, len(CORRUPT_CLASSES), size=args.batch)
        imgs = []
        for i, k in zip(idx, kinds):
            im = np.roll(panos[i], rng.integers(0, panos[i].shape[1]), axis=1)
            imgs.append(corrupt(im, int(k), rng))
        x = jnp.asarray(roomnet_preprocess(np.stack(imgs)))
        params, opt_state, loss, accs = train_step(
            params, opt_state, x,
            jnp.asarray(wall[idx]), jnp.asarray(floor[idx]),
            jnp.asarray(shape[idx]), jnp.asarray(kinds),
        )
        if step % 25 == 0 or step == 1:
            row = {"step": step, "loss": float(loss),
                   "acc_wall": float(accs[0]), "acc_floor": float(accs[1]),
                   "acc_shape": float(accs[2]), "acc_corrupt": float(accs[3]),
                   "elapsed_s": round(time.time() - t0, 1)}
            print(row)
            jsonl.write(json.dumps(row) + "\n")
            jsonl.flush()

    # ---- held-out evaluation on FRESH rooms (disjoint seed range)
    tp, tw, tf, ts = render_pool(args.n_test, args.height,
                                 seed0=args.seed * 100003 + 10_000_019)
    kinds = rng.integers(0, len(CORRUPT_CLASSES), size=args.n_test)
    timgs = np.stack([corrupt(tp[i], int(k), rng)
                      for i, k in enumerate(kinds)])
    feats, logits = jax.jit(net.apply)(
        params, jnp.asarray(roomnet_preprocess(timgs)))
    lw, lf, lsh, lc = split_logits(logits)
    held = {
        "acc_wall": float((np.asarray(lw).argmax(-1) == tw).mean()),
        "acc_floor": float((np.asarray(lf).argmax(-1) == tf).mean()),
        "acc_shape": float((np.asarray(lsh).argmax(-1) == ts).mean()),
        "acc_corrupt": float((np.asarray(lc).argmax(-1) == kinds).mean()),
    }

    # ---- FID discriminative-power probe with the trained features:
    # clean-vs-clean (different rooms) must score far below clean-vs-blur
    from panfusion_tpu.metrics.frechet import StreamingFrechet

    def fid_between(a_u8, b_u8):
        sf = StreamingFrechet(feats.shape[-1])
        fa, _ = jax.jit(net.apply)(params,
                                   jnp.asarray(roomnet_preprocess(a_u8)))
        fb, _ = jax.jit(net.apply)(params,
                                   jnp.asarray(roomnet_preprocess(b_u8)))
        sf.update(np.asarray(fa), real=True)
        sf.update(np.asarray(fb), real=False)
        return sf.compute()

    half = args.n_test // 2
    fid_self = fid_between(tp[:half], tp[half:])
    blur = np.stack([corrupt(im, 1, rng) for im in tp[half:]])
    noise = np.stack([corrupt(im, 2, rng) for im in tp[half:]])
    mush = np.stack([
        np.clip(np.asarray(
            __import__("cv2").blur(im, (im.shape[1] // 4, im.shape[1] // 4)),
            np.float64), 0, 255).astype(np.uint8)
        for im in tp[half:]
    ])  # extreme blur ~ the r3 diffusion-mush failure mode
    probes = {
        "fid_clean_vs_clean": fid_self,
        "fid_clean_vs_blur": fid_between(tp[:half], blur),
        "fid_clean_vs_noise": fid_between(tp[:half], noise),
        "fid_clean_vs_mush": fid_between(tp[:half], mush),
    }
    summary = {**held, **probes,
               "steps": args.steps, "pool": args.pool,
               "train_minutes": round((time.time() - t0) / 60, 1)}
    print(json.dumps(summary, indent=2))
    with open(os.path.join(args.log_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)

    if out_path is None:
        from panfusion_tpu.metrics.roomnet import WEIGHTS_PATH
        out_path = WEIGHTS_PATH
    save_roomnet(params, out_path)
    print(f"saved {out_path}")
    ratio = probes["fid_clean_vs_blur"] / max(fid_self, 1e-9)
    print(f"discriminative ratio blur/self = {ratio:.1f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
