"""Sharded patch-descriptor cache — the framework's "computation cache as
resumable state" (SURVEY.md §5 checkpoint row: the reference caches VLAD
residuals/labels per image as .pt files keyed by relpath; here whole
descriptor arrays store as npz shards keyed by the extraction config, so an
interrupted database extraction resumes at shard granularity)."""

from __future__ import annotations

import hashlib
import json
import os
from typing import Iterator, Optional, Tuple

import numpy as np


class DescriptorCache:
    def __init__(self, cache_dir: str, config: dict, shard_size: int = 512):
        """``config`` identifies the extraction (model/layer/facet/resize
        ...); its hash names the cache subdirectory."""
        key = hashlib.sha1(
            json.dumps(config, sort_keys=True).encode()
        ).hexdigest()[:12]
        self.dir = os.path.join(os.path.abspath(cache_dir), f"descs_{key}")
        os.makedirs(self.dir, exist_ok=True)
        meta = os.path.join(self.dir, "config.json")
        if not os.path.exists(meta):
            with open(meta, "w") as f:
                json.dump(config, f, indent=2, sort_keys=True)
        self.shard_size = shard_size

    def _shard_path(self, which: str, shard: int) -> str:
        return os.path.join(self.dir, f"{which}_{shard:05d}.npz")

    def has(self, which: str, n_items: int) -> bool:
        n_shards = -(-n_items // self.shard_size)
        if not all(
            os.path.exists(self._shard_path(which, s)) for s in range(n_shards)
        ):
            return False
        # the final shard must actually cover n_items (a grown dataset or an
        # interrupted write must trigger recompute, not a read crash)
        last = np.load(self._shard_path(which, n_shards - 1))["descs"]
        return (n_shards - 1) * self.shard_size + len(last) >= n_items

    def write(self, which: str, descs: np.ndarray) -> None:
        for s in range(0, len(descs), self.shard_size):
            np.savez(
                self._shard_path(which, s // self.shard_size),
                descs=descs[s : s + self.shard_size].astype(np.float32),
            )

    def read(self, which: str, n_items: int) -> np.ndarray:
        n_shards = -(-n_items // self.shard_size)
        parts = [
            np.load(self._shard_path(which, s))["descs"]
            for s in range(n_shards)
        ]
        out = np.concatenate(parts)
        assert len(out) >= n_items, (len(out), n_items)
        return out[:n_items]

    def get_or_compute(self, which: str, n_items: int, compute) -> np.ndarray:
        if self.has(which, n_items):
            return self.read(which, n_items)
        descs = compute()
        self.write(which, descs)
        return descs
