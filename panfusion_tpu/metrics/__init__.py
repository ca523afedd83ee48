from .frechet import StreamingFrechet, frechet_distance
from .image_metrics import (
    ClipScore,
    FrechetInceptionDistance,
    InceptionScore,
    MeanMetric,
)

__all__ = [
    "ClipScore",
    "FrechetInceptionDistance",
    "InceptionScore",
    "MeanMetric",
    "StreamingFrechet",
    "frechet_distance",
]
