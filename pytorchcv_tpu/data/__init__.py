"""Native input pipeline: device-side training augmentation + host->mesh
prefetch.

The reference delegates data loading to torch's DataLoader and torchvision
transforms (its training lives in the external imgclsmob repo — SURVEY.md
§0); a standalone TPU framework needs its own. Design is TPU-first: the
augmentation chain is one jitted batched program (per-sample randomness via
vmapped PRNG keys, static output shapes), and the loader overlaps the host
side (decode, batching, transfer) with device compute via a background
staging thread.
"""

from .augment import (random_crop_flip, train_augment)
from .loader import PrefetchLoader, prefetch_to_mesh

__all__ = ["random_crop_flip", "train_augment", "PrefetchLoader",
           "prefetch_to_mesh"]
