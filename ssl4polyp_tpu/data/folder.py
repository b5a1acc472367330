"""Unlabeled image-folder dataset for MAE pretraining.

Replaces the reference's ``torchvision.datasets.ImageFolder`` + DataLoader
(``mae/main_pretrain.py:156-191``).  Recursively indexes image files and
yields fixed-shape uint8 batches after a host-side RandomResizedCrop +
deterministic per-(seed, epoch, index) parameterisation — so the exact data
stream is a pure function of (seed, epoch), and resume needs no RNG
snapshots.
"""

from __future__ import annotations

import math
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterator, List, Optional

import numpy as np

__all__ = [
    "ImageFolderIndex", "PretrainLoader", "random_resized_crop",
    "sample_crop_box",
]

_IMAGE_SUFFIXES = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


class ImageFolderIndex:
    """Recursive index of image files under a root (ignores class labels)."""

    def __init__(self, root: str | Path, no_train_dir: bool = False) -> None:
        self.root = Path(root)
        base = self.root
        if not no_train_dir and (base / "train").is_dir():
            base = base / "train"
        self.paths: List[str] = sorted(
            str(p) for p in base.rglob("*") if p.suffix.lower() in _IMAGE_SUFFIXES
        )
        if not self.paths:
            raise FileNotFoundError(f"No images found under {base}")

    def __len__(self) -> int:
        return len(self.paths)


def sample_crop_box(
    width: int,
    height: int,
    rng: np.random.Generator,
    scale: tuple[float, float] = (0.2, 1.0),
    ratio: tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> tuple[int, int, int, int]:
    """torchvision RandomResizedCrop box sampling (10 tries then center
    fallback) → ``(y0, x0, h, w)`` in pixels.

    Split from the resize so the PIL and native decode paths consume the
    SAME rng draws — the augmentation stream is identical whichever decoder
    produced the pixels."""
    area = width * height
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            x0 = int(rng.integers(0, width - w + 1))
            y0 = int(rng.integers(0, height - h + 1))
            return y0, x0, h, w
    # Fallback: center crop at the closest valid aspect
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w, h = width, int(round(width / ratio[0]))
    elif in_ratio > ratio[1]:
        w, h = int(round(height * ratio[1])), height
    else:
        w, h = width, height
    return (height - h) // 2, (width - w) // 2, h, w


def random_resized_crop(
    img,
    rng: np.random.Generator,
    out_size: int = 224,
    scale: tuple[float, float] = (0.2, 1.0),
    ratio: tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
):
    """torchvision RandomResizedCrop semantics (10 tries then center fallback),
    bicubic resize (reference ``main_pretrain.py:156-160``)."""
    from PIL import Image

    width, height = img.size
    y0, x0, h, w = sample_crop_box(width, height, rng, scale, ratio)
    crop = img.crop((x0, y0, x0 + w, y0 + h))
    return crop.resize((out_size, out_size), Image.BICUBIC)


class PretrainLoader:
    """Threaded loader yielding (B, S, S, 3) uint8 crops, deterministically."""

    def __init__(
        self,
        index: ImageFolderIndex,
        batch_size: int,
        *,
        image_size: int = 224,
        seed: int = 0,
        num_workers: int = 16,
        prefetch_batches: int = 4,
        process_index: int = 0,
        process_count: int = 1,
        drop_last: bool = True,
        use_native: Optional[bool] = None,
    ) -> None:
        self.index = index
        self.batch_size = batch_size
        self.image_size = image_size
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch_batches = prefetch_batches
        self.process_index = process_index
        self.process_count = process_count
        self.drop_last = drop_last
        self.epoch = 0
        # None → native when the C++ decoder is buildable (the GIL-free
        # crop+resize path); the PIL thread pool remains the fallback and
        # yields the same augmentation stream (sample_crop_box).
        self.use_native = use_native
        self._dims_cache: dict[int, tuple[int, int]] = {}

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def _order(self) -> np.ndarray:
        rng = np.random.default_rng(self.seed + self.epoch)
        order = rng.permutation(len(self.index))
        if self.process_count > 1:
            # Wrap-around padding (the DistributedSampler contract, same as
            # HostDataLoader._epoch_order): every process must yield the
            # SAME number of batches or multi-host SPMD dispatch desyncs —
            # the short process stops while the others enter a collective.
            per = (len(order) + self.process_count - 1) // self.process_count
            pad = per * self.process_count - len(order)
            if pad:
                order = np.concatenate([order, order[:pad]])
            start = self.process_index * per
            order = order[start : start + per]
        return order

    def __len__(self) -> int:
        n = len(self._order())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _rng(self, position: int) -> np.random.Generator:
        # Crop parameters are a pure function of (seed, epoch, sample).
        return np.random.default_rng(
            (self.seed * 1_000_003 + self.epoch * 7_919 + position) % (2 ** 63)
        )

    def _decode(self, position: int) -> np.ndarray:
        from PIL import Image

        rng = self._rng(position)
        with Image.open(self.index.paths[position]) as img:
            rgb = img.convert("RGB")
            width, height = rgb.size
            y0, x0, h, w = sample_crop_box(width, height, rng)
            crop = rgb.crop((x0, y0, x0 + w, y0 + h)).resize(
                (self.image_size, self.image_size), Image.BICUBIC
            )
            array = np.asarray(crop, dtype=np.uint8)
        if rng.random() < 0.5:  # horizontal flip
            array = array[:, ::-1]
        return np.ascontiguousarray(array)

    def _native_enabled(self) -> bool:
        if self.use_native is False:
            return False
        from ssl4polyp_tpu.native import native_available

        return native_available()

    def _dims(self, position: int) -> Optional[tuple[int, int]]:
        cached = self._dims_cache.get(position)
        if cached is None:
            from ssl4polyp_tpu.native import jpeg_dims

            cached = jpeg_dims(self.index.paths[position])
            if cached is not None:
                self._dims_cache[position] = cached
        return cached

    def _native_batch(self, chunk: List[int]) -> Optional[np.ndarray]:
        """Whole-batch decode through the C++ pool (no GIL on the hot path).

        Consumes the SAME rng stream as :meth:`_decode` — the augmentation
        is identical; only the resample arithmetic differs (the native
        cubic matches PIL's filter-scaled bicubic convention).  Any frame
        the native path cannot handle falls back to PIL individually.
        """
        from ssl4polyp_tpu.native import decode_crop_resize_batch_status

        n = len(chunk)
        # Frames with no JPEG header (PNG/BMP/…) go straight to PIL — sending
        # them through the native decoder would be a doomed decode attempt
        # per frame per epoch before the PIL retry overwrote the result.
        native_pos: List[int] = []
        pil_fallback: List[int] = []
        crops_list: List[tuple] = []
        flips_list: List[bool] = []
        paths: List[str] = []
        for j, position in enumerate(chunk):
            dims = self._dims(position)
            if dims is None:  # non-JPEG or unreadable header
                pil_fallback.append(j)
                continue
            width, height = dims
            rng = self._rng(position)
            y0, x0, h, w = sample_crop_box(width, height, rng)
            crops_list.append((y0 / height, x0 / width, h / height, w / width))
            flips_list.append(rng.random() < 0.5)
            paths.append(self.index.paths[position])
            native_pos.append(j)
        if not native_pos:
            return None  # whole batch is non-JPEG: plain PIL path
        result = decode_crop_resize_batch_status(
            paths, self.image_size, self.image_size,
            np.asarray(crops_list, dtype=np.float64),
            np.asarray(flips_list, dtype=np.uint8),
            n_threads=self.num_workers,
        )
        if result is None:
            return None
        sub_images, ok = result
        images = np.empty((n, self.image_size, self.image_size, 3), dtype=np.uint8)
        for k, j in enumerate(native_pos):
            images[j] = sub_images[k]
        retry = pil_fallback + [
            native_pos[k] for k in np.nonzero(~ok)[0].tolist()
        ]
        for j in sorted(retry):
            images[j] = self._decode(chunk[j])
        return images

    def __iter__(self) -> Iterator[np.ndarray]:
        order = self._order()
        n_batches = len(self)
        if n_batches == 0:
            return
        out_queue: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        native = self._native_enabled()

        failure: list = []

        def producer() -> None:
            # The sentinel (or the failure record) MUST reach the consumer
            # even when a decode raises — otherwise the consumer blocks on
            # out_queue.get() forever and pretraining hangs silently.
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for b in range(n_batches):
                        if stop.is_set():
                            break
                        chunk = [
                            int(p)
                            for p in order[b * self.batch_size : (b + 1) * self.batch_size]
                        ]
                        images = None
                        if native:
                            batch = self._native_batch(chunk)
                            if batch is not None:
                                images = list(batch)
                        if images is None:
                            images = list(pool.map(self._decode, chunk))
                        if len(images) < self.batch_size:
                            pad = self.batch_size - len(images)
                            images.extend([images[-1]] * pad)
                        out_queue.put(np.stack(images))
            except BaseException as exc:  # noqa: BLE001 - re-raised in consumer
                failure.append(exc)
            finally:
                out_queue.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_queue.get()
                if item is None:
                    if failure:
                        raise RuntimeError(
                            "PretrainLoader producer failed"
                        ) from failure[0]
                    break
                yield item
        finally:
            stop.set()
            while thread.is_alive():
                try:
                    out_queue.get_nowait()
                except queue.Empty:
                    thread.join(timeout=0.1)
