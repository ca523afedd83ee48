from .demo import Demo, DemoDataset
from .matterport3d import Matterport3D, Mp3dDataset
from .pano_dataset import DataConfig, DataLoader, PanoDataModule, PanoDataset, collate

__all__ = [
    "Demo",
    "DemoDataset",
    "Matterport3D",
    "Mp3dDataset",
    "DataConfig",
    "DataLoader",
    "PanoDataModule",
    "PanoDataset",
    "collate",
]
