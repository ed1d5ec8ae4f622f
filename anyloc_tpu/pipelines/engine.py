"""DescriptorEngine — batched patch-descriptor extraction over a dataset.

Replaces the reference's per-image hot loop (extract_patch_descriptors in
every script, e.g. dino_v2_global_vocab_vlad.py:343-361: one CenterCrop +
one full ViT forward + one D2H copy *per image*) with: fixed-shape batches
from ``dataset.batches()`` (host prefetch thread), center-crop to a
patch-multiple once per batch, one jitted truncated forward per batch, and
optional data-parallel sharding over a device mesh.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from anyloc_tpu.data.transforms import center_crop_multiple
from anyloc_tpu.models.extractor import DinoV2ExtractFeatures, ViTFacetExtractor


class DescriptorEngine:
    def __init__(
        self,
        model_type: str = "dinov2_vits14",
        desc_layer: int = 11,
        desc_facet: str = "value",
        checkpoint: Optional[str] = None,
        dtype: str = "bfloat16",
        batch_size: int = 32,
        use_cls: bool = False,
        norm_descs: bool = True,
        mesh=None,
        extractor=None,
        cache_dir: Optional[str] = None,
        transfer_dtype: str = "float32",
        quant: Optional[str] = None,
    ) -> None:
        """``transfer_dtype``: "float32" ships normalized f32 images to the
        device; "uint8" ships raw resized bytes (1/4 the H2D traffic — the
        ingest bottleneck on bandwidth-limited links) and normalizes
        on-device inside the jitted forward. Descriptor deviation is bounded
        by the 8-bit rounding of resized pixels (<= 0.5/255 pre-norm).

        ``quant``: int8 trunk mode ('int8_full' = fastest frozen-trunk
        serving; DINOv2 family only). ``quant='int8_full'`` +
        ``transfer_dtype='uint8'`` is the production serving configuration."""
        assert transfer_dtype in ("float32", "uint8"), transfer_dtype
        self.transfer_dtype = transfer_dtype
        self.batch_size = batch_size
        self.mesh = mesh
        custom_extractor = extractor is not None
        if extractor is None:
            from anyloc_tpu.models.factory import make_extractor

            extractor = make_extractor(
                model_type, desc_layer, desc_facet,
                checkpoint=checkpoint,
                dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
                use_cls=use_cls, norm_descs=norm_descs, quant=quant,
            )
        self.extractor = extractor
        # optional sharded descriptor cache (resumable extraction): keyed by
        # the full extraction config so stale caches can't be confused —
        # including the CHECKPOINT (random-init vs real weights must never
        # share a cache) and, for caller-supplied extractors, the extractor
        # class (the constructor args do not describe it)
        self.desc_cache = None
        if cache_dir is not None:
            from anyloc_tpu.utils.desc_cache import DescriptorCache

            cfg = {"model": model_type, "layer": desc_layer,
                   "facet": desc_facet, "use_cls": use_cls,
                   "norm": norm_descs, "dtype": dtype,
                   "transfer": transfer_dtype, "quant": quant,
                   "checkpoint": checkpoint}
            if custom_extractor:
                cfg["custom_extractor"] = type(extractor).__name__
            self.desc_cache = DescriptorCache(cache_dir, cfg)
        if transfer_dtype == "uint8" and not getattr(
            extractor, "supports_uint8", False
        ):
            # other model families (MAE/CLIP/DINO-v1/SAM wrappers) have no
            # on-device normalization branch — raw 0..255 inputs would run
            # silently un-normalized
            raise ValueError(
                f"transfer_dtype='uint8' is not supported by "
                f"{type(extractor).__name__}; use 'float32'"
            )
        self.patch = getattr(extractor.cfg, "patch_size", 14)
        if mesh is not None and not hasattr(extractor, "_forward"):
            import warnings

            warnings.warn(
                f"mesh given but {type(extractor).__name__} has no "
                "sharded-forward hook (_forward) — extraction runs "
                "single-device", stacklevel=2)
        if mesh is not None and hasattr(extractor, "_forward"):
            from anyloc_tpu.parallel.distributed import sharded_extract_fn

            self._sharded = sharded_extract_fn(extractor._forward, mesh)
            # device-returning variant for the fused-aggregation path (the
            # patch tensor must not round-trip through the host)
            self._sharded_dev = sharded_extract_fn(
                extractor._forward, mesh, as_numpy=False
            )
        else:
            self._sharded = None
            self._sharded_dev = None

    def extract_batch(self, images: np.ndarray) -> np.ndarray:
        """[B, H, W, 3] -> [B, P, D] float32 (center-cropped to patch grid)."""
        images = np.stack([center_crop_multiple(im, self.patch) for im in images])
        if self._sharded is not None:
            return self._sharded(self.extractor.params, images)
        return np.asarray(self.extractor(jnp.asarray(images)))

    def extract_dataset(
        self,
        dataset,
        which: str = "all",
        sub_sample: int = 1,
        verbose: bool = True,
        keep_on_device: bool = False,
    ) -> np.ndarray:
        """-> [N, P, D] float32 patch descriptors for the selected items.
        ``keep_on_device`` returns a jax array with no D2H copy (bypasses
        the on-disk descriptor cache) — for results that feed directly into
        more device work, e.g. vocabulary k-means."""
        idx = dataset.indices(which, sub_sample)
        if len(idx) == 0:
            return np.zeros((0,), np.float32)
        if self.desc_cache is not None and not keep_on_device:
            key = self._cache_key(dataset, which, sub_sample, idx)
            return self.desc_cache.get_or_compute(
                key, len(idx),
                lambda: self._extract_dataset(dataset, which, sub_sample,
                                              verbose),
            )
        return self._extract_dataset(dataset, which, sub_sample, verbose,
                                     keep_on_device=keep_on_device)

    @staticmethod
    def _cache_key(dataset, which, sub_sample, idx) -> str:
        """Cache key carrying the DATASET IDENTITY, not just its class:
        many dataset names map to one class (every domain recipe is a
        GlobalVocabDataset; all Tartan_GNSS* are Aerial), and the class
        name alone made different datasets/resolutions cache-collide with
        identically-shaped, silently-wrong descriptors. The digest covers
        the selected image paths and the load resolution."""
        import hashlib

        h = hashlib.sha1()
        h.update(str(getattr(dataset, "img_size", None)).encode())
        for i in idx:
            h.update(str(dataset.images_paths[i]).encode())
            h.update(b"|")
        return (f"{type(dataset).__name__}_{which}_ss{sub_sample}_"
                f"{h.hexdigest()[:12]}")

    def extract_aggregated_dataset(
        self,
        dataset,
        aggregate,
        agg_key: str,
        which: str = "all",
        sub_sample: int = 1,
        verbose: bool = True,
    ) -> np.ndarray:
        """Extraction + an arbitrary device-side aggregation per dispatch:
        ``aggregate`` maps the [B, P, D] facet tensor to whatever comes home
        (GeM/GP pooled [B, D], VLAD [B, C*D], ...). The patch tensor stays
        in HBM. ``agg_key`` names the aggregation in the descriptor cache."""
        if self.desc_cache is not None:
            idx = dataset.indices(which, sub_sample)
            key = f"{agg_key}_{self._cache_key(dataset, which, sub_sample, idx)}"
            return self.desc_cache.get_or_compute(
                key, len(idx),
                lambda: self._extract_dataset(dataset, which, sub_sample,
                                              verbose, aggregate=aggregate),
            )
        return self._extract_dataset(
            dataset, which, sub_sample, verbose, aggregate=aggregate
        )

    def extract_vlads_dataset(
        self,
        dataset,
        vlad,
        which: str = "all",
        sub_sample: int = 1,
        verbose: bool = True,
    ) -> np.ndarray:
        """Extraction + VLAD aggregation fused per device dispatch:
        -> [N, C*D] float32 global descriptors.

        The [B, P, D] patch tensor never leaves HBM — only the (8x smaller
        at the SOTA shape) VLAD vectors cross the device->host link. This
        removes the reference's extract-on-GPU / aggregate-on-CPU boundary
        (utilities.py:359 ``ret.cpu()`` per image, SURVEY §3.1 hot loop 3).
        ``vlad`` must already be fitted (``vlad.c_centers`` set).
        """
        # cache key includes the vocabulary digest: a refit (different vocab
        # set, sub-sampling, or aggregation params) must never cache-hit on
        # descriptors computed with other centers
        return self.extract_aggregated_dataset(
            dataset, vlad.aggregate,
            f"vlad{vlad.num_clusters}_{vlad.vocab_key()}",
            which, sub_sample, verbose,
        )

    def _extract_dataset(self, dataset, which, sub_sample, verbose,
                         aggregate=None, keep_on_device=False):
        """Depth-1 software pipeline: batch i+1's host decode (prefetch
        thread) and H2D transfer + compute dispatch happen while batch i's
        result is still being fetched — JAX dispatch is async, so the only
        blocking point per step is the D2H of the *previous* batch. The
        reference serializes decode -> H2D -> compute -> D2H per image
        (extract_patch_descriptors hot loop).

        ``keep_on_device``: return a device (jax) array instead of numpy —
        no D2H at all; use when the result feeds directly into more device
        work (e.g. vocabulary k-means)."""
        idx = dataset.indices(which, sub_sample)
        out = None
        done = 0
        parts = []  # keep_on_device accumulation

        def dispatch(imgs):
            imgs = np.stack(
                [center_crop_multiple(im, self.patch) for im in imgs]
            )
            if self._sharded is not None:
                # always the device-array route: the as_numpy wrapper would
                # block on D2H inside this dispatch and defeat the depth-1
                # pipeline; drain() does the (masked) host conversion instead
                out, n_valid = self._sharded_dev(self.extractor.params, imgs)
                out = out[:n_valid]  # lazy: batches() pads, so a prefix slice
                # stays valid (the bidx mask in drain drops repeated-tail pads)
            else:
                out = self.extractor(jnp.asarray(imgs))  # async device value
            if aggregate is not None:
                out = aggregate(out)  # stays on device; patch tensor never
                # crosses the link
            return out

        def drain(pending):
            nonlocal out, done
            descs, bidx = pending
            valid = bidx >= 0
            nv = int(valid.sum())
            if keep_on_device:
                # padded entries are a suffix (batches() pads by repeating
                # the tail), so a static prefix slice keeps things lazy
                parts.append(jnp.asarray(descs)[:nv])
            else:
                descs = np.asarray(descs)             # blocks on this batch
                if out is None:
                    out = np.empty((len(idx),) + descs.shape[1:], np.float32)
                out[done : done + nv] = descs[valid]
            done += nv
            if verbose:
                print(f"\rExtracting [{which}]: {done}/{len(idx)}", end="",
                      flush=True)

        pending = None
        for imgs, bidx in dataset.batches(
            self.batch_size, which=which, sub_sample=sub_sample,
            output=self.transfer_dtype,
        ):
            cur = (dispatch(imgs), bidx)
            if pending is not None:
                drain(pending)
            pending = cur
        if pending is not None:
            drain(pending)
        if verbose:
            print()
        if keep_on_device:
            return jnp.concatenate(parts) if parts else None
        return out
