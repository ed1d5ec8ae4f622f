"""VPRDataset — the dataset protocol shared by every loader.

Mirrors the reference's abstract ``CustomDataset`` (AnyLoc utilities.py:25-74):
items are ordered [database..., queries...]; exposes ``database_num``,
``queries_num``, ``soft_positives_per_query`` (np object array / list of
index arrays), ``get_image_paths``, ``get_image_relpaths`` (cache IDs at
``_imgs_level`` path depth).

TPU-native difference: ``__getitem__`` returns channels-LAST float32 numpy
[H, W, 3] (normalized), and ``batches()`` yields fixed-shape stacked batches
(XLA static shapes) with background prefetch.
"""

from __future__ import annotations

import os
import re
import threading
import queue as _queue
from typing import Iterator, List, Optional, Sequence, Tuple, Union

import numpy as np


def _nat_key(s: str):
    return [int(t) if t.isdigit() else t.lower() for t in re.split(r"(\d+)", s)]


def natsorted(items: Sequence[str]) -> List[str]:
    """Natural sort (file2 < file10), matching the reference's use of the
    natsort package for directory listings."""
    return sorted(items, key=_nat_key)


def listdir_abs(root: str, sub: str) -> List[str]:
    """Natural-sorted absolute paths of a dataset subdirectory (the listing
    idiom every loader shares)."""
    d = os.path.join(root, sub)
    return [os.path.join(d, p) for p in natsorted(os.listdir(d))]


class VPRDataset:
    """Base class implementing the shared protocol over
    ``db_paths`` + ``query_paths`` absolute path lists."""

    _imgs_level = 2
    # Batch loading goes through the native C++ decode+resize+normalize
    # pipeline (native/imagepipe.cpp, float-exact vs transforms.load_image)
    # when it is available and the subclass keeps the standard __getitem__;
    # set False to force the per-image PIL path.
    use_native_loader = True

    def __init__(
        self,
        db_paths: Sequence[str],
        query_paths: Sequence[str],
        soft_positives_per_query=None,
        img_size: Optional[Tuple[int, int]] = (320, 320),
    ) -> None:
        self.db_paths = list(db_paths)
        self.query_paths = list(query_paths)
        self.images_paths = self.db_paths + self.query_paths
        self.database_num = len(self.db_paths)
        self.queries_num = len(self.query_paths)
        self.soft_positives_per_query = soft_positives_per_query
        self.img_size = img_size

    # -- protocol (reference API parity) ----------------------------------
    def get_image_paths(self) -> List[str]:
        return self.images_paths

    def get_positives(self):
        return self.soft_positives_per_query

    def get_image_relpaths(self, i: Union[int, List[int]]):
        indices = [i] if isinstance(i, (int, np.integer)) else i
        s = self._imgs_level
        rel = ["/".join(self.images_paths[k].split("/")[-s:]) for k in indices]
        return rel[0] if isinstance(i, (int, np.integer)) else rel

    def __len__(self) -> int:
        return len(self.images_paths)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, int]:
        from anyloc_tpu.data.transforms import load_image

        return load_image(self.images_paths[index], self.img_size), index

    # -- batched iteration -------------------------------------------------
    def indices(self, which: str = "all", sub_sample: int = 1) -> np.ndarray:
        if which == "db":
            idx = np.arange(0, self.database_num)
        elif which == "queries":
            idx = np.arange(self.database_num, len(self))
        else:
            idx = np.arange(len(self))
        return idx[::sub_sample]

    def batches(
        self,
        batch_size: int,
        which: str = "all",
        sub_sample: int = 1,
        prefetch: int = 2,
        drop_remainder: bool = False,
        output: str = "float32",
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield (images [B, H, W, 3], indices [B]) with background prefetch.
        The final short batch is padded by repeating its last item so every
        batch has the same static shape (callers slice via the index array,
        padded entries carry index -1).

        ``output``: "float32" = normalized f32 (default); "uint8" = resized
        raw uint8 — 1/4 the host->device bytes, normalization runs on-device
        (the extractors accept uint8 batches directly)."""
        assert output in ("float32", "uint8"), output
        if output == "uint8":
            # the uint8 path rebuilds items from raw files, so a subclass's
            # custom __getitem__ transform (e.g. BaseDataset query crop
            # ensembles) would be silently skipped — refuse instead
            if type(self).__getitem__ is not VPRDataset.__getitem__:
                raise ValueError(
                    "output='uint8' requires the standard loader; "
                    f"{type(self).__name__} overrides __getitem__ — use the "
                    "float32 output for custom item transforms"
                )
            if self.img_size is None:
                raise ValueError("output='uint8' requires a fixed img_size")
        idx = self.indices(which, sub_sample)
        if drop_remainder:
            idx = idx[: len(idx) - len(idx) % batch_size]

        native_ok = (
            self.use_native_loader
            and self.img_size is not None
            and type(self).__getitem__ is VPRDataset.__getitem__
        )
        if native_ok:
            from anyloc_tpu import native

            native_ok = native.imagepipe_available()

        def load_one_u8(i):
            from anyloc_tpu.data.transforms import load_image_u8

            return load_image_u8(self.images_paths[i], self.img_size)

        def load_batch(batch_idx):
            if native_ok:
                from anyloc_tpu import native
                from anyloc_tpu.data.transforms import (
                    IMAGENET_MEAN, IMAGENET_STD,
                )

                paths = [self.images_paths[i] for i in batch_idx]
                if output == "uint8":
                    imgs, ok = native.decode_batch_u8(
                        paths, tuple(self.img_size)
                    )
                else:
                    imgs, ok = native.decode_batch(
                        paths, tuple(self.img_size), IMAGENET_MEAN, IMAGENET_STD
                    )
                if not ok.all():
                    # formats the native pipe doesn't know (bmp/webp/...) or
                    # odd encodings: fall back to the per-image PIL path,
                    # which raises its own error for genuinely broken files
                    for pos in np.flatnonzero(~ok):
                        imgs[pos] = (load_one_u8(int(batch_idx[pos]))
                                     if output == "uint8"
                                     else self[int(batch_idx[pos])][0])
                return imgs, batch_idx
            if output == "uint8":
                imgs = np.stack([load_one_u8(int(i)) for i in batch_idx])
            else:
                imgs = np.stack([self[i][0] for i in batch_idx])
            return imgs, batch_idx

        def gen():
            for s in range(0, len(idx), batch_size):
                chunk = idx[s : s + batch_size]
                out_idx = np.full(batch_size, -1, np.int64)
                out_idx[: len(chunk)] = chunk
                if len(chunk) < batch_size:
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[-1:], batch_size - len(chunk))]
                    )
                imgs, _ = load_batch(chunk)
                yield imgs, out_idx

        return _prefetched(gen(), prefetch)


def _prefetched(it: Iterator, depth: int) -> Iterator:
    """Run an iterator in a daemon thread with a bounded queue — overlaps host
    image decode with device compute (the reference uses DataLoader workers;
    this box has 1 CPU, so one decode thread is the right amount)."""
    if depth <= 0:
        yield from it
        return
    q: _queue.Queue = _queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in it:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # propagate loader errors to the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item


def radius_positives(
    db_xy: np.ndarray, qu_xy: np.ndarray, radius: float
) -> List[np.ndarray]:
    """Soft positives by metric radius — the kNN-radius pattern every
    pose-based loader uses (sklearn NearestNeighbors.radius_neighbors in the
    reference; exact brute force here, datasets are <10k poses)."""
    d2 = ((qu_xy[:, None, :] - db_xy[None, :, :]) ** 2).sum(-1)
    r2 = radius * radius
    return [np.where(row <= r2)[0] for row in d2]
