"""dvgl-style evaluation (``dvgl_benchmark/test.py:122-294`` rebuilt):
extract database + query descriptors through a trained model, exact L2 top-k
on device, with the five-crops / nearest-crop / majority-voting query test
methods and optional PCA + distractor concatenation.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from anyloc_tpu.ops.retrieval import top_k_search, top_k_search_blocked


def extract_features(
    descriptor_fn: Callable[[np.ndarray], np.ndarray],
    dataset,
    test_method: str = "hard_resize",
    batch_size: int = 16,
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (database_features [Ndb, D], query_features [Nq(*5), D]).
    Crop-ensemble methods return 5 rows per query (nearest_crop/maj_voting)
    or the crop mean (five_crops), matching test.py:159-174."""
    db_feats = []
    for imgs, bidx in dataset.batches(batch_size, which="db"):
        f = np.asarray(descriptor_fn(imgs))
        db_feats.append(f[bidx >= 0])
    db = np.concatenate(db_feats) if db_feats else np.empty((0, 0), np.float32)

    qu_feats = []
    prev_method = getattr(dataset, "test_method", "hard_resize")
    dataset.test_method = test_method
    try:
        if test_method == "single_query":
            # queries may have varying sizes and can't be stacked — the
            # reference forces inference batch 1 here (test.py:30,153)
            for qi in range(dataset.database_num, len(dataset)):
                img = dataset[qi][0]
                qu_feats.append(np.asarray(descriptor_fn(img[None])))
        elif test_method in ("hard_resize", "central_crop"):
            # fixed-shape query transforms: same batched path as the
            # database — per-query batch-1 forwards would waste the
            # accelerator
            for imgs, bidx in dataset.batches(batch_size, which="queries"):
                f = np.asarray(descriptor_fn(imgs))
                qu_feats.append(f[bidx >= 0])
        else:
            # crop ensembles: batch whole queries (5 same-shape crops each)
            # into one [nq*5, H, W, 3] forward — the reference (and round 1)
            # ran batch-1 per query, wasting the accelerator at scale
            q_per_batch = max(1, batch_size // 5)
            q_indices = list(range(dataset.database_num, len(dataset)))
            for s in range(0, len(q_indices), q_per_batch):
                chunk = q_indices[s : s + q_per_batch]
                n_valid = len(chunk)
                # pad the tail chunk to the full batch shape (one compiled
                # program; ragged tails would recompile)
                padded = chunk + [chunk[-1]] * (q_per_batch - n_valid)
                crops = np.concatenate(
                    [dataset[qi][0] for qi in padded]
                )  # [q_per_batch*5, H, W, 3]
                f = np.asarray(descriptor_fn(crops)).reshape(
                    q_per_batch, 5, -1
                )[:n_valid]
                if test_method == "five_crops":
                    f = f.mean(axis=1)            # [nq, D]
                else:
                    f = f.reshape(len(chunk) * 5, -1)
                qu_feats.append(f)
    finally:
        dataset.test_method = prev_method
    qu = np.concatenate(qu_feats)
    return db, qu


def top_n_voting(topn: str, predictions, distances, maj_weight: float):
    """In-place distance discounting for repeated crop votes
    (test.py:277-294 verbatim semantics)."""
    n, selected = {"top1": (1, 0), "top5": (5, slice(0, 5)),
                   "top10": (10, slice(0, 10))}[topn]
    vals, counts = np.unique(predictions[:, selected], return_counts=True)
    for val, count in zip(vals[counts > 1], counts[counts > 1]):
        mask = predictions[:, selected] == val
        distances[:, selected][mask] -= maj_weight * count / n


def _dedup_keep_closest(preds: np.ndarray, dists: np.ndarray, k: int) -> np.ndarray:
    sort_idx = np.argsort(dists)
    preds = preds[sort_idx]
    _, unique_idx = np.unique(preds, return_index=True)
    return preds[np.sort(unique_idx)][:k]


def evaluate(
    descriptor_fn,
    dataset,
    test_method: str = "hard_resize",
    recall_values: Sequence[int] = (1, 5, 10, 20),
    batch_size: int = 16,
    pca=None,  # (mean, components, scale) triple from ops.pca.pca_fit
    distractor_dataset=None,
    majority_weight: float = 0.01,
    efficient_ram: bool = False,
    stream_dtype: str = "float32",
    save_descs: str = None,
) -> Tuple[np.ndarray, str]:
    """``efficient_ram`` is the dvgl ``test_efficient_ram_usage`` analogue
    (test.py:12-119) re-thought for TPU: the database streams through the
    device in shards instead of residing in one HBM buffer, so databases
    beyond device memory evaluate on a single chip. ``stream_dtype``
    ("float32" / "bfloat16" / "int8") trades score precision for stream
    bandwidth (see ops.retrieval.top_k_search_blocked)."""
    db, qu = extract_features(descriptor_fn, dataset, test_method, batch_size)
    if save_descs:
        # dvgl --save_descs (parser.py): dump all descriptors as one .npy,
        # database rows first then queries (the reference's layout)
        np.save(f"{save_descs}.npy", np.concatenate([db, qu]))
    if pca is not None:
        from anyloc_tpu.ops.pca import pca_transform

        db = np.asarray(pca_transform(db, *pca))
        qu = np.asarray(pca_transform(qu, *pca))
    if distractor_dataset is not None:  # VPAir concat (test.py:187-215)
        dis, _ = extract_features(
            descriptor_fn, distractor_dataset, "hard_resize", batch_size
        )
        if pca is not None:
            from anyloc_tpu.ops.pca import pca_transform

            dis = np.asarray(pca_transform(dis, *pca))
        db = np.concatenate([db, dis])

    max_k = min(max(recall_values), db.shape[0])
    if efficient_ram:
        distances, predictions = top_k_search_blocked(
            db, qu, max_k, method="l2", stream_dtype=stream_dtype
        )
    else:
        distances, predictions = top_k_search(db, qu, max_k, method="l2")
    # writable host copies (device buffers are read-only; voting mutates)
    distances, predictions = np.array(distances), np.array(predictions)

    nq = dataset.queries_num
    if test_method == "nearest_crop":
        distances = distances.reshape(nq, 5 * max_k)
        predictions = predictions.reshape(nq, 5 * max_k)
        out = np.empty((nq, max_k), np.int64)
        for q in range(nq):
            out[q] = _dedup_keep_closest(predictions[q], distances[q], max_k)
        predictions = out
    elif test_method == "maj_voting":
        distances = distances.reshape(nq, 5, max_k)
        predictions = predictions.reshape(nq, 5, max_k)
        out = np.empty((nq, max_k), np.int64)
        for q in range(nq):
            top_n_voting("top1", predictions[q], distances[q], majority_weight)
            top_n_voting("top5", predictions[q], distances[q], majority_weight)
            top_n_voting("top10", predictions[q], distances[q], majority_weight)
            out[q] = _dedup_keep_closest(
                predictions[q].flatten(), distances[q].flatten(), max_k
            )
        predictions = out

    positives = dataset.get_positives()
    recalls = np.zeros(len(recall_values))
    for qi, pred in enumerate(predictions):
        for i, n in enumerate(recall_values):
            if np.any(np.isin(pred[:n], positives[qi])):
                recalls[i:] += 1
                break
    recalls = recalls / nq * 100
    recalls_str = ", ".join(
        f"R@{v}: {r:.1f}" for v, r in zip(recall_values, recalls)
    )
    return recalls, recalls_str
