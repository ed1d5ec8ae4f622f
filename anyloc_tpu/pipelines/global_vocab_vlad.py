"""SOTA pipeline — AnyLoc-VLAD with a multi-dataset *domain* vocabulary
(reference scripts/dino_v2_global_vocab_vlad.py, SURVEY.md §3.1):
vocabulary k-means fit on the concatenated database images of the domain's
datasets (with per-dataset sub-sampling recipes), then VLAD + recall on the
target dataset; VPAir appends distractor VLADs to the database.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from anyloc_tpu.config import PipelineArgs
from anyloc_tpu.data.loaders.global_vocab import GlobalVocabDataset
from anyloc_tpu.data.registry import DOMAIN_RECIPES, get_dataset
from anyloc_tpu.ops.retrieval import get_top_k_recall
from anyloc_tpu.ops.vlad import VLAD
from anyloc_tpu.pipelines.engine import DescriptorEngine
from anyloc_tpu.pipelines.vlad_pipeline import build_results_dict


def run_global_vocab_vlad(
    largs: PipelineArgs,
    dataset=None,
    vocab_dataset=None,
    engine: Optional[DescriptorEngine] = None,
    verbose: bool = True,
) -> Dict:
    ds_name = largs.prog.vg_dataset_name
    if dataset is None:
        dataset = get_dataset(
            ds_name, largs.prog.data_vg_dir, largs.data_split,
            img_size=tuple(largs.bd_args.resize),
            dist_thresh=largs.bd_args.val_positive_dist_threshold,
        )
    if vocab_dataset is None:
        samples = largs.db_samples or DOMAIN_RECIPES[largs.global_vocab]
        vocab_dataset = GlobalVocabDataset(
            list(samples), largs.prog.data_vg_dir, largs.data_split,
            dict(samples), img_size=tuple(largs.bd_args.resize),
        )
    if engine is None:
        engine = DescriptorEngine(
            largs.extractor.model_type, largs.extractor.desc_layer,
            largs.extractor.desc_facet, largs.extractor.checkpoint,
            largs.extractor.dtype, largs.extractor.batch_size,
            quant=largs.extractor.quant,
            transfer_dtype=largs.extractor.transfer_dtype,
        )
    vlad = VLAD(
        largs.vlad.num_clusters,
        vlad_mode=largs.vlad.vlad_assignment,
        soft_temp=largs.vlad.vlad_soft_temp,
        cache_dir=largs.vlad.cache_dir,
    )
    if vlad.can_use_cache_vlad():
        vlad.fit(None)
    else:
        vocab_descs = engine.extract_dataset(
            vocab_dataset, "db", largs.sub_sample_db_vlad, verbose,
            keep_on_device=engine.desc_cache is None,
        )
        vlad.fit(vocab_descs.reshape(-1, vocab_descs.shape[-1]))

    # fused extract+aggregate: patch descriptors stay in HBM (see
    # DescriptorEngine.extract_vlads_dataset)
    db_vlads = np.asarray(engine.extract_vlads_dataset(
        dataset, vlad, "db", largs.sub_sample_db, verbose
    ))
    qu_vlads = np.asarray(engine.extract_vlads_dataset(
        dataset, vlad, "queries", largs.sub_sample_qu, verbose
    ))

    # VPAir: distractors extend the database only
    # (ref dino_v2_global_vocab_vlad.py:434-470)
    if largs.use_distractor and ds_name == "VPAir":
        distractor = get_dataset(
            "VPAir_distractor", largs.prog.data_vg_dir, largs.data_split,
            img_size=tuple(largs.bd_args.resize),
        )
        dis_vlads = np.asarray(engine.extract_vlads_dataset(
            distractor, vlad, "db", 1, verbose
        ))
        db_vlads = np.concatenate([db_vlads, dis_vlads])

    dists, indices, recalls = get_top_k_recall(
        largs.top_k_vals, db_vlads, qu_vlads, dataset.get_positives(),
        sub_sample_db=largs.sub_sample_db, sub_sample_qu=largs.sub_sample_qu,
    )
    results = build_results_dict(largs, db_vlads, qu_vlads, recalls, ds_name)
    results["Global-Vocab"] = str(largs.global_vocab or sorted(largs.db_samples))
    results["Qual-Dists"] = dists
    results["Qual-Indices"] = indices
    if verbose:
        for k in largs.top_k_vals:
            print(f"R@{k}: {recalls[k]:.5f}")
    return results
