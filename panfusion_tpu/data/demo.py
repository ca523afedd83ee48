"""Demo dataset: one prompt per line (parity: dataset/Demo.py:4-26)."""
from __future__ import annotations

from .pano_dataset import DataConfig, PanoDataModule, PanoDataset


class DemoDataset(PanoDataset):
    def load_split(self, mode):
        with open(self.data_dir) as f:
            return [{"pano_prompt": line.strip()} for line in f.readlines()]

    def scan_results(self, result_dir):
        return []

    def get_data(self, idx):
        data = dict(self.data[idx])
        data["pano_id"] = f"{idx:06d}"
        return data


class Demo(PanoDataModule):
    dataset_cls = DemoDataset

    def __init__(self, data_dir: str = "data/demo.txt", **overrides):
        super().__init__(DataConfig(data_dir=data_dir), **overrides)
