"""GeM pooling pipeline (reference scripts/dino_v2_gem.py): patch descriptors
-> GeM p-mean global descriptors -> recall. No vocabulary/caching."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from anyloc_tpu.config import PipelineArgs
from anyloc_tpu.data.registry import get_dataset
from anyloc_tpu.ops.gem import gem_pool
from anyloc_tpu.ops.retrieval import get_top_k_recall
from anyloc_tpu.pipelines.engine import DescriptorEngine
from anyloc_tpu.pipelines.vlad_pipeline import build_results_dict


def run_gem_pipeline(
    largs: PipelineArgs, dataset=None, engine: Optional[DescriptorEngine] = None,
    verbose: bool = True,
) -> Dict:
    ds_name = largs.prog.vg_dataset_name
    if dataset is None:
        dataset = get_dataset(
            ds_name, largs.prog.data_vg_dir, largs.data_split,
            img_size=tuple(largs.bd_args.resize),
            dist_thresh=largs.bd_args.val_positive_dist_threshold,
        )
    if engine is None:
        engine = DescriptorEngine(
            largs.extractor.model_type, largs.extractor.desc_layer,
            largs.extractor.desc_facet, largs.extractor.checkpoint,
            largs.extractor.dtype, largs.extractor.batch_size,
            quant=largs.extractor.quant,
            transfer_dtype=largs.extractor.transfer_dtype,
        )
    # pooled on-device inside the extraction dispatch (patch tensor stays
    # in HBM; GeM output is N x smaller than the patch descriptors)
    pool_fn = lambda d: gem_pool(d, p=largs.gem_p, use_abs=largs.gem_use_abs)
    agg_key = f"gem{largs.gem_p}{'_abs' if largs.gem_use_abs else ''}"
    db_g = np.asarray(engine.extract_aggregated_dataset(
        dataset, pool_fn, agg_key, "db", largs.sub_sample_db, verbose
    ))
    qu_g = np.asarray(engine.extract_aggregated_dataset(
        dataset, pool_fn, agg_key, "queries", largs.sub_sample_qu, verbose
    ))

    dists, indices, recalls = get_top_k_recall(
        largs.top_k_vals, db_g, qu_g, dataset.get_positives(),
        sub_sample_db=largs.sub_sample_db, sub_sample_qu=largs.sub_sample_qu,
    )
    results = build_results_dict(largs, db_g, qu_g, recalls, ds_name, agg="GeM")
    results["GeM-p"] = largs.gem_p
    results["Qual-Dists"] = dists
    results["Qual-Indices"] = indices
    if verbose:
        for k in largs.top_k_vals:
            print(f"R@{k}: {recalls[k]:.5f}")
    return results
