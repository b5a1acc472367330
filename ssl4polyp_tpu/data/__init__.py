"""Data engine: pack indices, host-side decode, device-side augmentation.

Split of responsibilities (TPU-first):

* **Host** (:mod:`.packs`, :mod:`.transforms`, :mod:`.loader`): manifest
  resolution, PIL decode + resize to the target resolution, deterministic
  per-row perturbation rendering (HMAC-seeded), batch assembly as uint8
  numpy arrays, per-host sharding and seeded epoch shuffling.
* **Device** (:mod:`.augment`): the training augmentation chain (color
  jitter, gaussian blur, flips, rotation) and ImageNet normalisation run
  *inside the jitted train step* on uint8 batches — 4× less host→device
  bandwidth than fp32 tensors and zero host CPU spent on augmentation.

The reference does all of this in torchvision transforms inside DataLoader
worker processes (``src/ssl4polyp/classification/data/``).
"""

from .packs import PackIndex, create_classification_datasets, resolve_pack_spec
from .loader import HostDataLoader
from .transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    DEFAULT_HMAC_KEY,
    PerRowPerturber,
    decode_frame,
)

__all__ = [
    "PackIndex",
    "create_classification_datasets",
    "resolve_pack_spec",
    "HostDataLoader",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "DEFAULT_HMAC_KEY",
    "PerRowPerturber",
    "decode_frame",
]
