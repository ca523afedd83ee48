"""Matterport3D dataset (parity: dataset/Matterport3D.py:8-131)."""
from __future__ import annotations

import os
from glob import glob

import numpy as np

from .pano_dataset import DataConfig, PanoDataModule, PanoDataset


class Mp3dDataset(PanoDataset):
    def load_split(self, mode):
        cfg = self.config
        if cfg.load_layout:
            with open(os.path.join(self.data_dir, f"lo_{mode}.txt")) as f:
                lines = f.read().splitlines()
            return [
                {"scene_id": s, "view_id": v}
                for s, v in (l.split("_") for l in lines)
            ]
        split_file = "train.npy" if mode == "train" else "test.npy"
        split_path = os.path.join(self.data_dir, split_file)
        if os.path.exists(split_path):
            data = np.load(split_path)
            out = []
            for d in data:
                scene_id, _, view_id = d[0].split("/")
                out.append({"scene_id": scene_id, "view_id": view_id.split("_")[0]})
            return out
        if mode == "predict":
            print(f"Scanning {self.data_dir}...")
            prompts = glob(
                os.path.join(self.data_dir, "*", "blip3_stitched", "*.txt")
            )
            out = []
            for d in prompts:
                scene_id, _, view_id = d.split("/")[-3:]
                out.append({"scene_id": scene_id, "view_id": view_id.split(".")[0]})
            return out
        raise FileNotFoundError(f"Cannot find split file: {split_path}")

    def scan_results(self, result_dir):
        results = glob(os.path.join(result_dir, "*/"))
        return [tuple(r.split("/")[-2].split("_")[:2]) for r in results]

    def get_data(self, idx):
        cfg = self.config
        data = dict(self.data[idx])
        scene_id, view_id = data["scene_id"], data["view_id"]
        if self.mode == "predict" and cfg.repeat_predict > 1:
            data["pano_id"] = f"{scene_id}_{view_id}_{data['repeat_id']:06d}"
        else:
            data["pano_id"] = f"{scene_id}_{view_id}"

        if self.mode != "predict":
            folder = (
                "matterport_aligned_images" if cfg.load_layout
                else "matterport_stitched_images"
            )
            data["pano_path"] = os.path.join(
                self.data_dir, scene_id, folder, f"{view_id}.png"
            )

        if cfg.layout_cond_type:
            data["layout_cond_path"] = os.path.join(
                self.data_dir, scene_id, "layout", view_id,
                f"layout_{cfg.layout_cond_type}.png",
            )

        if self.mode != "predict":
            data["prompt"] = [
                self.load_prompt(
                    os.path.join(
                        self.data_dir, scene_id, "blip3", f"{view_id}_{i * 45}.txt"
                    )
                )
                for i in range(8)
            ]

        data["pano_prompt_path"] = os.path.join(
            self.data_dir, scene_id, "blip3_stitched", f"{view_id}.txt"
        )

        if cfg.horizon_layout or cfg.manhattan_layout:
            from .layout import Layout

            json_path = os.path.join(
                cfg.layout_anno_dir, "label_data", f"{scene_id}_{view_id}_label.json"
            )
            data["layout"] = Layout.from_json(json_path)

        if self.result_dir is not None:
            data["pano_pred_path"] = os.path.join(
                self.result_dir, data["pano_id"], "pano.png"
            )
        return data


class Matterport3D(PanoDataModule):
    dataset_cls = Mp3dDataset

    def __init__(
        self,
        data_dir: str = "data/Matterport3D/mp3d_skybox",
        layout_anno_dir: str = "data/Matterport3DLayoutAnnotation",
        **overrides,
    ):
        super().__init__(
            DataConfig(data_dir=data_dir, layout_anno_dir=layout_anno_dir),
            **overrides,
        )
        self.hparams.load_layout = bool(
            self.hparams.layout_cond_type
            or self.hparams.horizon_layout
            or self.hparams.manhattan_layout
        )

    def scan_layout_cond(self):
        """Build lo_<split>.txt lists of samples with rendered layouts
        (parity: dataset/Matterport3D.py:105-127)."""
        for split in ("train", "val", "test"):
            src = os.path.join(
                self.hparams.layout_anno_dir, "data_list", f"mp3d_{split}.txt"
            )
            dst = os.path.join(self.hparams.data_dir, f"lo_{split}.txt")
            if os.path.exists(dst):
                continue
            print(f"Scanning {split} split...")
            with open(src) as f:
                lines = f.read().splitlines()
            kept = []
            for line in lines:
                scene_id, view_id = line.split(" ")
                if self.hparams.layout_cond_type:
                    lp = os.path.join(
                        self.hparams.data_dir, scene_id, "layout", view_id,
                        f"layout_{self.hparams.layout_cond_type}.png",
                    )
                else:
                    # horizon/manhattan-layout runs without a conditioning
                    # map: the annotation json is the requirement
                    lp = os.path.join(
                        self.hparams.layout_anno_dir, "label_data",
                        f"{scene_id}_{view_id}_label.json",
                    )
                pp = os.path.join(
                    self.hparams.data_dir, scene_id,
                    "matterport_aligned_images", f"{view_id}.png",
                )
                if os.path.exists(lp) and os.path.exists(pp):
                    kept.append(f"{scene_id}_{view_id}")
            if not kept:
                # do not persist a poisoned empty list (the exists() guard
                # above would keep it forever)
                print(f"WARNING: no valid {split} samples found; "
                      f"not writing {dst}")
                continue
            print(f"Found {len(kept)}/{len(lines)} valid samples in {split}.")
            with open(dst, "w") as f:
                f.write("\n".join(kept))

    def prepare_data(self):
        if os.path.isdir(self.hparams.data_dir) and self.hparams.load_layout:
            self.scan_layout_cond()
