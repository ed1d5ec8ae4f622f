"""CLS-token global descriptor pipeline (reference scripts/dino_v2_global_vpr.py
extract_gd :119-131: the trunk's final CLS embedding as the global descriptor)."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from anyloc_tpu.config import PipelineArgs
from anyloc_tpu.data.registry import get_dataset
from anyloc_tpu.data.transforms import center_crop_multiple
from anyloc_tpu.models.dinov2 import convert_dinov2, dinov2_config
from anyloc_tpu.models.extractor import init_params
from anyloc_tpu.models.vit import ViT
from anyloc_tpu.ops.retrieval import get_top_k_recall
from anyloc_tpu.pipelines.vlad_pipeline import build_results_dict


class ClsEngine:
    """Full-trunk forward returning the final (post-norm) CLS embedding."""

    def __init__(self, model_type: str, checkpoint=None, dtype="bfloat16",
                 batch_size: int = 32):
        self.cfg = dinov2_config(
            model_type,
            dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
        )
        self.model = ViT(self.cfg)
        if checkpoint is not None:
            from anyloc_tpu.models.convert import load_torch_checkpoint

            self.params = convert_dinov2(load_torch_checkpoint(checkpoint), self.cfg)
        else:
            self.params = init_params(self.cfg)
        self.batch_size = batch_size

        @jax.jit
        def fwd(params, imgs):
            return self.model.apply(params, imgs)["cls"].astype(jnp.float32)

        self._fwd = fwd

    def extract_dataset(self, dataset, which="all", sub_sample=1, verbose=True):
        idx = dataset.indices(which, sub_sample)
        out = None
        done = 0
        for imgs, bidx in dataset.batches(self.batch_size, which=which,
                                          sub_sample=sub_sample):
            imgs = np.stack(
                [center_crop_multiple(im, self.cfg.patch_size) for im in imgs]
            )
            cls = np.asarray(self._fwd(self.params, jnp.asarray(imgs)))
            if out is None:
                out = np.empty((len(idx), cls.shape[-1]), np.float32)
            valid = bidx >= 0
            out[done : done + valid.sum()] = cls[valid]
            done += int(valid.sum())
        return out


def run_global_vpr(
    largs: PipelineArgs, dataset=None, engine: Optional[ClsEngine] = None,
    verbose: bool = True,
) -> Dict:
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
            dist_thresh=largs.bd_args.val_positive_dist_threshold,
        )
    if engine is None:
        engine = ClsEngine(
            largs.extractor.model_type, largs.extractor.checkpoint,
            largs.extractor.dtype, largs.extractor.batch_size,
        )
    db_g = engine.extract_dataset(dataset, "db", largs.sub_sample_db, verbose)
    qu_g = engine.extract_dataset(dataset, "queries", largs.sub_sample_qu, verbose)
    dists, indices, recalls = get_top_k_recall(
        largs.top_k_vals, db_g, qu_g, dataset.get_positives(),
        sub_sample_db=largs.sub_sample_db, sub_sample_qu=largs.sub_sample_qu,
    )
    results = build_results_dict(largs, db_g, qu_g, recalls, ds_name, agg="CLS")
    results["Qual-Dists"] = dists
    results["Qual-Indices"] = indices
    return results
