#!/usr/bin/env python
"""Fetch-and-cache the AugReg i21k→i1k ViT-B/16 checkpoint (SUP-imnet).

The reference downloads this ``.npz`` on first use and caches it under the
torch hub dir (``src/ssl4polyp/models/models.py:52-55`` +
``_download_cached_file:225``).  TPU training hosts are frequently
egress-free, so this framework splits the workflow:

1. **On any internet-connected host** run this script — it downloads the
   big_vision AugReg export, verifies size/shape integrity by loading it
   with numpy, and drops it into the cache directory;
2. **Ship the cache** (scp/rsync/gcsfuse) to the TPU host;
3. Point the model config at it — ``config/model/*.yaml`` ``checkpoint:``,
   or pass ``pretrained_npz=...`` to
   ``ssl4polyp_tpu.models.factory.get_imagenet_or_random_vit``; the cache
   location below is the factory's conventional default search path.

Cache layout (mirrors the reference's ``<torch hub>/ssl4polyp/<name>``):
``$SSL4POLYP_TPU_CACHE`` (default ``~/.cache/ssl4polyp_tpu``) ``/ <name>``.

Usage::

    python scripts/fetch_augreg.py            # download + verify + cache
    python scripts/fetch_augreg.py --verify   # just verify an existing file
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request
from pathlib import Path

AUGREG_URL = (
    "https://storage.googleapis.com/vit_models/augreg/"
    "B_16-i21k-300ep-lr_0.001-aug_medium1-wd_0.1-do_0.0-sd_0.0--"
    "imagenet2012-steps_20k-lr_0.01-res_224.npz"
)

# Keys every big_vision ViT-B/16 export must contain (verification is
# structural: numpy loads the archive and the factory's mapping succeeds).
REQUIRED_KEYS = (
    "embedding/kernel",
    "embedding/bias",
    "cls",
    "Transformer/posembed_input/pos_embedding",
    "Transformer/encoder_norm/scale",
    "Transformer/encoderblock_0/LayerNorm_0/scale",
    "Transformer/encoderblock_11/MlpBlock_3/Dense_1/kernel",
)


def cache_dir() -> Path:
    root = os.environ.get("SSL4POLYP_TPU_CACHE")
    if root:
        return Path(root)
    return Path.home() / ".cache" / "ssl4polyp_tpu"


def default_path() -> Path:
    return cache_dir() / Path(AUGREG_URL).name


def verify(path: Path) -> None:
    import numpy as np

    archive = np.load(path)
    missing = [k for k in REQUIRED_KEYS if k not in archive]
    if missing:
        raise SystemExit(f"{path}: not an AugReg ViT-B/16 export; missing {missing}")
    kernel = archive["embedding/kernel"]
    if kernel.shape != (16, 16, 3, 768):
        raise SystemExit(f"{path}: unexpected patch-embed shape {kernel.shape}")
    print(f"OK: {path} verified ({len(archive.files)} arrays)")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--url", default=AUGREG_URL)
    parser.add_argument("--dest", default=None,
                        help="target file (default: the cache path)")
    parser.add_argument("--verify", action="store_true",
                        help="only verify an existing file, no download")
    args = parser.parse_args(argv)

    dest = Path(args.dest) if args.dest else default_path()
    if args.verify:
        if not dest.exists():
            raise SystemExit(f"{dest} does not exist")
        verify(dest)
        return
    if dest.exists():
        print(f"already cached: {dest}")
        verify(dest)
        return
    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.with_suffix(".part")
    print(f"downloading {args.url}\n  -> {dest}")
    try:
        urllib.request.urlretrieve(args.url, tmp)
    except OSError as exc:
        raise SystemExit(
            f"download failed ({exc}). This host may have no egress — run "
            f"this script on an internet-connected machine and ship "
            f"{dest.name} to {dest.parent}/ on the TPU host."
        )
    tmp.rename(dest)
    verify(dest)


if __name__ == "__main__":
    sys.exit(main())
