"""Global-pooling pipeline (reference scripts/dino_v2_gp.py / dino_gp.py):
patch descriptors -> global max or mean pooling -> recall."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from anyloc_tpu.config import PipelineArgs
from anyloc_tpu.data.registry import get_dataset
from anyloc_tpu.ops.pooling import global_avg_pool, global_max_pool
from anyloc_tpu.ops.retrieval import get_top_k_recall
from anyloc_tpu.pipelines.engine import DescriptorEngine
from anyloc_tpu.pipelines.vlad_pipeline import build_results_dict


def run_gp_pipeline(
    largs: PipelineArgs, dataset=None, engine: Optional[DescriptorEngine] = None,
    pooling: str = "max", verbose: bool = True,
) -> Dict:
    assert pooling in ("max", "avg"), pooling
    pool = global_max_pool if pooling == "max" else global_avg_pool
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
    # pooled on-device inside the extraction dispatch
    db = np.asarray(engine.extract_aggregated_dataset(
        dataset, pool, f"gp_{pooling}", "db", largs.sub_sample_db, verbose
    ))
    qu = np.asarray(engine.extract_aggregated_dataset(
        dataset, pool, f"gp_{pooling}", "queries", largs.sub_sample_qu, verbose
    ))
    dists, indices, recalls = get_top_k_recall(
        largs.top_k_vals, db, qu, dataset.get_positives(),
        sub_sample_db=largs.sub_sample_db, sub_sample_qu=largs.sub_sample_qu,
    )
    results = build_results_dict(largs, db, qu, recalls, ds_name,
                                 agg=f"GP-{pooling}")
    results["Qual-Dists"], results["Qual-Indices"] = dists, indices
    return results
