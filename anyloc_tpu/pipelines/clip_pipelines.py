"""CLIP pipelines.

  * ``run_clip_top_k`` — CLIP global image embeddings -> (optional PCA) ->
    top-k recall (reference scripts/clip_top_k_vpr.py:168-370);
  * ``run_patch_clip`` — the image unfolds into a grid of half-overlapping
    crops, each crop CLIP-encoded, the crop descriptors VLAD-aggregated
    (reference scripts/patch_clip.py:195-205 unfold with
    kernel = stride = 2*size/num_patches).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from anyloc_tpu.config import PipelineArgs
from anyloc_tpu.data.registry import get_dataset
from anyloc_tpu.ops.pca import reduce_pca
from anyloc_tpu.ops.retrieval import get_top_k_recall
from anyloc_tpu.ops.vlad import VLAD
from anyloc_tpu.pipelines.vlad_pipeline import build_results_dict


def _clip_model(largs: PipelineArgs):
    from anyloc_tpu.models.clip import ClipWrapper

    name = largs.extractor.model_type
    if name.startswith("clip_"):
        name = name[len("clip_"):]
    return ClipWrapper(
        ClipWrapper.IMPL_OPENAI, name, use_caching=False,
        checkpoint=largs.extractor.checkpoint,
    )


def _encode_dataset(m, dataset, which, sub_sample, batch_size):
    feats = []
    for imgs, bidx in dataset.batches(batch_size, which=which,
                                      sub_sample=sub_sample):
        f = np.asarray(m.encode_image(imgs, normalize=True))
        feats.append(f[bidx >= 0])
    return np.concatenate(feats)


def run_clip_top_k(largs: PipelineArgs, dataset=None, pca_dim: Optional[int] = None,
                   verbose: bool = True) -> Dict:
    if largs.extractor.quant or largs.extractor.transfer_dtype != "float32":
        # the serving flags only apply to the facet-extractor pipelines
        # (vlad / global-vocab-vlad / gem / gp); rejecting beats silently
        # running full-precision while the user believes otherwise
        raise ValueError(
            "extractor.quant / extractor.transfer_dtype are not supported "
            "by this pipeline"
        )
    ds_name = largs.prog.vg_dataset_name
    if dataset is None:
        dataset = get_dataset(
            ds_name, largs.prog.data_vg_dir, largs.data_split,
            img_size=tuple(largs.bd_args.resize),
        )
    m = _clip_model(largs)
    bs = largs.extractor.batch_size
    db = _encode_dataset(m, dataset, "db", largs.sub_sample_db, bs)
    qu = _encode_dataset(m, dataset, "queries", largs.sub_sample_qu, bs)
    if pca_dim is not None:
        db, qu = reduce_pca(db, qu, pca_dim)
    dists, indices, recalls = get_top_k_recall(
        largs.top_k_vals, db, qu, dataset.get_positives(),
        sub_sample_db=largs.sub_sample_db, sub_sample_qu=largs.sub_sample_qu,
    )
    results = build_results_dict(largs, db, qu, recalls, ds_name, agg="CLIP-global")
    results["Qual-Dists"], results["Qual-Indices"] = dists, indices
    return results


def unfold_crops(imgs: np.ndarray, num_patches: int) -> np.ndarray:
    """[B, H, W, 3] -> [B, num_crops, h, w, 3] half-overlap grid crops
    (patch_clip.py:196-201: kernel = stride = 2*dim/num_patches)."""
    b, h, w, c = imgs.shape
    kh = sh = max(1, int(h * 2 / num_patches))
    kw = sw = max(1, int(w * 2 / num_patches))
    crops = []
    for y0 in range(0, h - kh + 1, sh):
        for x0 in range(0, w - kw + 1, sw):
            crops.append(imgs[:, y0 : y0 + kh, x0 : x0 + kw])
    return np.stack(crops, axis=1)


def run_patch_clip(largs: PipelineArgs, dataset=None, num_patches: int = 4,
                   verbose: bool = True) -> Dict:
    if largs.extractor.quant or largs.extractor.transfer_dtype != "float32":
        # the serving flags only apply to the facet-extractor pipelines
        # (vlad / global-vocab-vlad / gem / gp); rejecting beats silently
        # running full-precision while the user believes otherwise
        raise ValueError(
            "extractor.quant / extractor.transfer_dtype are not supported "
            "by this pipeline"
        )
    ds_name = largs.prog.vg_dataset_name
    if dataset is None:
        dataset = get_dataset(
            ds_name, largs.prog.data_vg_dir, largs.data_split,
            img_size=tuple(largs.bd_args.resize),
        )
    m = _clip_model(largs)
    bs = max(1, largs.extractor.batch_size // num_patches)

    def crop_descs(which, sub_sample):
        out = []
        for imgs, bidx in dataset.batches(bs, which=which, sub_sample=sub_sample):
            crops = unfold_crops(imgs, num_patches)  # [B, n, h, w, 3]
            bsz, n = crops.shape[:2]
            flat = crops.reshape((-1,) + crops.shape[2:])
            f = np.asarray(m.encode_image(flat, normalize=True))
            f = f.reshape(bsz, n, -1)
            out.append(f[bidx >= 0])
        return np.concatenate(out)

    db_descs = crop_descs("db", largs.sub_sample_db)
    qu_descs = crop_descs("queries", largs.sub_sample_qu)
    vlad = VLAD(largs.vlad.num_clusters, vlad_mode=largs.vlad.vlad_assignment,
                cache_dir=largs.vlad.cache_dir)
    if vlad.can_use_cache_vlad():
        vlad.fit(None)
    else:
        vlad.fit(db_descs.reshape(-1, db_descs.shape[-1]))
    db_v = np.asarray(vlad.generate_multi(db_descs))
    qu_v = np.asarray(vlad.generate_multi(qu_descs))
    dists, indices, recalls = get_top_k_recall(
        largs.top_k_vals, db_v, qu_v, dataset.get_positives(),
        sub_sample_db=largs.sub_sample_db, sub_sample_qu=largs.sub_sample_qu,
    )
    results = build_results_dict(largs, db_v, qu_v, recalls, ds_name,
                                 agg="Patch-CLIP-VLAD")
    results["Qual-Dists"], results["Qual-Indices"] = dists, indices
    return results
