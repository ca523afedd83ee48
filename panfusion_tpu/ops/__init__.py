from .resample import remap, remap_batched

__all__ = ["remap", "remap_batched"]
