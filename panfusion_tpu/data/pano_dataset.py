"""Panorama dataset pipeline (host-side numpy, NHWC).

Behavior parity with the reference PanoDataset/PanoDataModule
(dataset/PanoDataset.py:34-273): per-item camera sampling, perspective
crops, augmentation, uncond-prompt dropping, layout conditioning and result
loading for evaluation — producing the same batch-dict contract (keys:
pano, images, cameras{height,width,FoV,theta,phi,R,K}, pano_prompt, prompt,
pano_id, height, width, optional pano_layout_cond / images_layout_cond /
horizon_layout / manhattan_layout / pano_pred / images_pred), in NHWC.

Deliberate divergence: the reference's results-intersection crashes on dict
items (`set(self.data) & set(results)` with unhashable dicts,
dataset/PanoDataset.py:48-55 — SURVEY.md §2.3 known quirk); here results are
keyed on (scene_id, view_id) tuples as the rebuild note prescribes.
"""
from __future__ import annotations

import os
import random
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import cv2
import numpy as np

from ..geometry.cubemap import Equirectangular
from ..geometry.sampling import (
    horizon_sample_camera,
    icosahedron_sample_camera,
    random_sample_camera,
)
from ..geometry.host_grids import get_K_R_np


@dataclass
class DataConfig:
    """Defaults parity: dataset/PanoDataset.py:218-239."""

    data_dir: Optional[str] = None
    fov: int = 90
    cam_sampler: str = "icosahedron"  # 'horizon' | 'icosahedron'
    pers_resolution: int = 256
    pano_height: int = 512
    uncond_ratio: float = 0.2
    batch_size: int = 1
    num_workers: int = 8
    result_dir: Optional[str] = None
    rand_rot_img: bool = False
    rand_flip: bool = True
    gt_as_result: bool = False
    horizon_layout: bool = False
    manhattan_layout: bool = False
    layout_cond_type: Optional[str] = None
    repeat_predict: int = 10
    # cap the predict split at the first N prompts (0 = all). The reference
    # always predicts the full scan (dataset/PanoDataset.py:42-46); demo
    # panels from a big data_dir shouldn't require generating every scene.
    predict_limit: int = 0
    layout_anno_dir: Optional[str] = None
    load_layout: bool = False
    # skip the m perspective view crops (the loader's dominant cost) for
    # models that train on the pano alone — FAED / HorizonNet set this in
    # fit(); the reference always crops (PanoDataset.py:133-148) and
    # simply wastes the work
    load_images: bool = True


class PanoDataset:
    """Abstract per-item pipeline; subclasses provide load_split /
    scan_results / get_data."""

    def __init__(self, config: DataConfig, mode: str = "train"):
        self.mode = mode
        self.config = config
        self.data_dir = config.data_dir
        self.result_dir = config.result_dir

        self.data = self.load_split(mode)
        if mode == "predict":
            if config.predict_limit > 0:
                self.data = self.data[: config.predict_limit]
            expanded = []
            for d in self.data:
                for i in range(config.repeat_predict):
                    dd = dict(d)
                    if config.repeat_predict > 1:
                        dd["repeat_id"] = len(expanded) % config.repeat_predict
                    expanded.append(dd)
            self.data = expanded

        if not config.gt_as_result and self.result_dir is not None:
            results = set(self.scan_results(self.result_dir))
            assert results, f"No results found in {self.result_dir}"
            # filter (keeping repeat_predict-expanded duplicates and load
            # order) instead of dict-collapsing on (scene, view) — the
            # reference crashes here outright (SURVEY.md §2.3 quirk)
            keys = [(d.get("scene_id"), d.get("view_id")) for d in self.data]
            kept = [d for d, k in zip(self.data, keys) if k in results]
            n_missing = len({k for k in keys if k not in results})
            if n_missing:
                print(
                    f"WARNING: {n_missing} views missing in "
                    f"results folder {self.result_dir} for {self.mode} set."
                )
            self.data = kept

    # -- subclass hooks -------------------------------------------------
    def load_split(self, mode) -> List[Dict]:
        raise NotImplementedError

    def scan_results(self, result_dir) -> List:
        raise NotImplementedError

    def get_data(self, idx) -> Dict:
        raise NotImplementedError

    # -------------------------------------------------------------------
    def __len__(self):
        return len(self.data)

    @staticmethod
    def load_prompt(path):
        with open(path) as f:
            return f.readlines()[0].strip()

    def _sample_cameras(self, data: Dict):
        cfg = self.config
        if cfg.cam_sampler == "horizon":
            theta, phi = horizon_sample_camera(8)
            if self.mode == "train":
                cam_rot = random.random() * 360
                theta = (np.rad2deg(theta) + cam_rot) % 360
                theta = np.deg2rad(theta)
                if "prompt" in data:
                    shift = round(cam_rot / 45)
                    data["prompt"] = data["prompt"][shift:] + data["prompt"][:shift]
        elif cfg.cam_sampler == "icosahedron":
            if self.mode == "train":
                theta, phi = random_sample_camera(20)
            else:
                theta, phi = icosahedron_sample_camera()
        else:
            raise NotImplementedError(cfg.cam_sampler)
        return np.rad2deg(theta), np.rad2deg(phi)

    def __getitem__(self, idx) -> Dict:
        cfg = self.config
        data = self.get_data(idx)

        if "layout" in data:
            layout = data.pop("layout")
            image_size = (cfg.pano_height * 2, cfg.pano_height)
            if cfg.manhattan_layout:
                data["manhattan_layout"] = layout.to_layout_pos(image_size).reshape(-1, 2)
            if cfg.horizon_layout:
                data["horizon_layout"] = layout.to_horizonnet(image_size)

        theta, phi = self._sample_cameras(data)
        Ks, Rs = [], []
        for t, p in zip(theta, phi):
            # numpy twin of rotations.get_K_R: keep the input pipeline off
            # the device (no per-item jax dispatches in loader threads)
            K, R = get_K_R_np(
                cfg.fov, t, p, cfg.pers_resolution, cfg.pers_resolution
            )
            Ks.append(K)
            Rs.append(R)
        cameras = {
            "height": np.full_like(theta, cfg.pers_resolution, dtype=int),
            "width": np.full_like(theta, cfg.pers_resolution, dtype=int),
            "FoV": np.full_like(theta, cfg.fov, dtype=int),
            "theta": theta.astype(np.float32),
            "phi": phi.astype(np.float32),
            "R": np.stack(Rs).astype(np.float32),
            "K": np.stack(Ks).astype(np.float32),
        }
        data["cameras"] = cameras
        data["height"] = cfg.pano_height
        data["width"] = cfg.pano_height * 2

        rotation = (
            random.random() * 360
            if self.mode == "train" and cfg.rand_rot_img
            else 0
        )
        flip = cfg.rand_flip and self.mode == "train" and random.random() < 0.5

        def process_equi(equi: Equirectangular, normalize: bool):
            equi.rotate(rotation)
            equi.flip(flip)
            pano = cv2.resize(
                np.ascontiguousarray(equi.equirectangular),
                (data["width"], data["height"]),
                interpolation=cv2.INTER_AREA,
            ).reshape(data["height"], data["width"], -1)
            if self.result_dir is None and normalize:
                pano = pano.astype(np.float32) / 127.5 - 1
            if not cfg.load_images:
                return pano[None], None
            images = np.stack([
                equi.to_perspective(
                    (cfg.fov, cfg.fov), t, p,
                    (cfg.pers_resolution, cfg.pers_resolution),
                )
                for t, p in zip(theta, phi)
            ])
            if self.result_dir is None and normalize:
                images = images.astype(np.float32) / 127.5 - 1
            return pano[None], images  # (1, H, W, C), (m, h, w, C)

        if "pano_path" in data:
            equi = Equirectangular.from_file(data["pano_path"])
            data["pano"], images = process_equi(equi, True)
            if images is not None:
                data["images"] = images

        if "layout_cond_path" in data:
            equi = Equirectangular.from_file(data["layout_cond_path"])
            if cfg.layout_cond_type == "distance_map":
                # uint16 mm depth -> [-1, 1] (dataset/PanoDataset.py:155-166)
                d = equi.equirectangular.astype(np.float32)[..., None] / 1e3
                d = 2.0 * (d - d.min()) / max(d.max() - d.min(), 1e-9) - 1.0
                equi.equirectangular = np.repeat(d, 3, axis=-1)
                normalize = False
            else:
                normalize = True
            if equi.equirectangular.ndim == 2:
                equi.equirectangular = np.repeat(
                    equi.equirectangular[..., None], 3, axis=-1
                )
            data["pano_layout_cond"], cond_images = process_equi(
                equi, normalize
            )
            if cond_images is not None:
                data["images_layout_cond"] = cond_images

        if "horizon_layout" in data:
            rot_pix = int(rotation / 360 * data["width"])
            hl = {k: np.roll(v, rot_pix, -1) for k, v in data["horizon_layout"].items()}
            if flip:
                hl = {k: np.flip(v, -1).copy() for k, v in hl.items()}
            data["horizon_layout"] = hl

        if "pano_prompt" not in data:
            data["pano_prompt"] = self.load_prompt(data["pano_prompt_path"])

        if (
            self.mode == "train"
            and self.result_dir is None
            and random.random() < cfg.uncond_ratio
        ):
            data["pano_prompt"] = ""
            if "prompt" in data:
                data["prompt"] = [""] * len(data["prompt"])

        # results for evaluation
        if cfg.gt_as_result:
            data["pano_pred"] = data["pano"]
            data["images_pred"] = data["images"]
        elif self.result_dir is not None:
            from PIL import Image

            images_pred = []
            for i in range(len(data.get("images", []))):
                p = os.path.join(os.path.dirname(data["pano_pred_path"]), f"{i}.png")
                if not os.path.exists(p):
                    break
                im = np.array(Image.open(p).convert("RGB"))
                im = cv2.resize(im, (cfg.pers_resolution, cfg.pers_resolution))
                images_pred.append(im)
            if images_pred:
                data["images_pred"] = np.stack(images_pred)

            if os.path.exists(data["pano_pred_path"]):
                equi = Equirectangular.from_file(data["pano_pred_path"])
                pano = cv2.resize(
                    equi.equirectangular, (data["width"], data["height"])
                )
                data["pano_pred"] = pano[None]
            elif "images_pred" in data:
                # stitch per-view results (MVDiffusion outputs)
                from ..geometry.projection import mp2e
                import jax.numpy as jnp

                imgs = jnp.asarray(
                    np.moveaxis(data["images_pred"].astype(np.float32), -1, 1)
                )
                pano = mp2e(
                    imgs, cameras["FoV"].astype(np.float32), cameras["theta"],
                    cameras["phi"], (data["height"], data["width"]),
                )
                data["pano_pred"] = np.moveaxis(np.asarray(pano), 0, -1)[None]
        return data


def collate(items: List[Dict]) -> Dict:
    """Stack a list of item dicts into a batch dict (numpy), keeping
    string fields as lists (the reference relies on default torch collate;
    this is the numpy equivalent)."""
    out: Dict = {}
    keys = items[0].keys()
    for k in keys:
        v0 = items[0][k]
        if isinstance(v0, dict):
            out[k] = collate([it[k] for it in items])
        elif isinstance(v0, np.ndarray):
            out[k] = np.stack([it[k] for it in items])
        elif isinstance(v0, (int, float, np.integer, np.floating)):
            out[k] = np.asarray([it[k] for it in items])
        elif isinstance(v0, list) and v0 and isinstance(v0[0], str):
            # list-of-per-view prompts: transpose to per-view lists of
            # per-sample strings (torch default collate behavior the
            # reference's get_pers_prompt expects)
            out[k] = [list(col) for col in zip(*[it[k] for it in items])]
        else:
            out[k] = [it[k] for it in items]
    return out


class DataLoader:
    """Minimal multi-threaded prefetching loader (host-side).

    The reference uses torch DataLoader with 8 workers
    (dataset/PanoDataset.py:255-273); image decode/resize here is
    cv2/PIL-bound C code that releases the GIL, so a thread pool gets the
    same overlap without process-spawn overhead, and keeps the framework
    torch-free.
    """

    def __init__(self, dataset, batch_size=1, shuffle=False, num_workers=8,
                 drop_last=False, seed=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor

        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
            self.epoch += 1
        batches = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        with ThreadPoolExecutor(self.num_workers) as pool:
            # prefetch up to num_workers batches ahead
            futures = []
            it = iter(batches)
            for _ in range(self.num_workers):
                b = next(it, None)
                if b is None:
                    break
                futures.append(pool.submit(self._load, b))
            while futures:
                fut = futures.pop(0)
                b = next(it, None)
                if b is not None:
                    futures.append(pool.submit(self._load, b))
                yield fut.result()

    def _load(self, batch_idx):
        return collate([self.dataset[int(i)] for i in batch_idx])


class PanoDataModule:
    """Datamodule: builds train/val/test/predict loaders
    (parity: dataset/PanoDataset.py:218-273)."""

    dataset_cls = PanoDataset

    def __init__(self, config: Optional[DataConfig] = None, **overrides):
        cfg = config or DataConfig()
        for k, v in overrides.items():
            setattr(cfg, k, v)
        self.hparams = cfg

    def prepare_data(self):
        pass

    def setup(self, stage=None):
        if stage in ("fit", None):
            self.train_dataset = self.dataset_cls(self.hparams, "train")
        if stage in ("fit", "validate", None):
            self.val_dataset = self.dataset_cls(self.hparams, "val")
        if stage in ("test", None):
            self.test_dataset = self.dataset_cls(self.hparams, "test")
        if stage in ("predict", None):
            self.predict_dataset = self.dataset_cls(self.hparams, "predict")

    def train_dataloader(self):
        return DataLoader(
            self.train_dataset, self.hparams.batch_size, True,
            self.hparams.num_workers, drop_last=True,
        )

    def val_dataloader(self):
        return DataLoader(
            self.val_dataset, self.hparams.batch_size, False,
            self.hparams.num_workers,
        )

    def test_dataloader(self):
        return DataLoader(
            self.test_dataset, self.hparams.batch_size, False,
            self.hparams.num_workers,
        )

    def predict_dataloader(self):
        return DataLoader(
            self.predict_dataset, self.hparams.batch_size, False,
            self.hparams.num_workers,
        )
