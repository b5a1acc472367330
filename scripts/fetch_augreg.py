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
import sys
import urllib.request
from pathlib import Path

try:
    # Canonical definitions live in the package (factory's "auto" path uses
    # the same module); the fallback keeps this script runnable standalone
    # on an internet host without installing the framework.
    from ssl4polyp_tpu.models.augreg_cache import (
        AUGREG_URL,
        cache_dir,
        default_path,
        verify,
    )
except ImportError:  # pragma: no cover - standalone fetch host
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from ssl4polyp_tpu.models.augreg_cache import (  # noqa: F401
        AUGREG_URL,
        cache_dir,
        default_path,
        verify,
    )


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
