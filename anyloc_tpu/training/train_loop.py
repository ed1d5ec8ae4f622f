"""Triplet training loop — dvgl_benchmark/train.py:106-206 rebuilt:
per epoch, refresh mined triplets (cache refresh), run jitted train steps,
evaluate Recall@5 on the validation set, keep best/last checkpoints.
"""

from __future__ import annotations

import logging
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np
import optax

from anyloc_tpu.training.evaluate import evaluate
from anyloc_tpu.training.mining import TripletMiner
from anyloc_tpu.training.triplet import TripletTrainState, make_triplet_train_step
from anyloc_tpu.utils.checkpoint import save_checkpoint


def train_triplet(
    descriptor_fn: Callable,  # (params, images [B,H,W,3]) -> [B, D]
    init_params,
    train_ds,
    val_ds,
    epochs: int = 3,
    queries_per_epoch: int = 500,
    cache_refresh_every: int = 250,
    batch_size: int = 2,
    neg_num: int = 10,
    mining: str = "partial",
    criterion: str = "triplet",
    margin: float = 0.1,
    lr: float = 1e-5,
    output_dir: Optional[str] = None,
    recall_values=(1, 5, 10, 20),
    eval_batch_size: int = 16,
    seed: int = 42,
):
    """Returns (final_state, best_r5, history)."""
    import jax

    opt = optax.adam(lr)
    step = make_triplet_train_step(
        descriptor_fn, opt, neg_num=neg_num, margin=margin, criterion=criterion
    )
    state = step.init_state(init_params)
    miner = TripletMiner(train_ds, neg_num=neg_num, mining=mining, seed=seed)
    # One jitted inference fn for mining + eval (an unjitted model.apply would
    # dispatch op-by-op — catastrophic over the TPU tunnel).
    infer = jax.jit(descriptor_fn)
    best_r5 = 0.0
    history = []
    for epoch in range(epochs):
        losses = []
        done = 0
        while done < queries_per_epoch:
            n = min(cache_refresh_every, queries_per_epoch - done)
            triplets = miner.compute_triplets(
                lambda imgs: infer(state.params, jnp.asarray(imgs)),
                n_queries=n,
                batch_size=eval_batch_size,
            )
            for s in range(0, len(triplets), batch_size):
                idxs = range(s, min(s + batch_size, len(triplets)))
                tuples = miner.tuples_as_batch(triplets, idxs)
                if tuples.shape[0] < batch_size:
                    continue  # static shapes: drop the remainder
                state, loss = step(state, jnp.asarray(tuples))
                losses.append(float(loss))
            done += n
        recalls, recalls_str = evaluate(
            lambda imgs: infer(state.params, jnp.asarray(imgs)),
            val_ds,
            recall_values=recall_values,
            batch_size=eval_batch_size,
        )
        r5 = recalls[min(1, len(recalls) - 1)]
        is_best = r5 > best_r5
        best_r5 = max(best_r5, r5)
        history.append(
            {"epoch": epoch, "loss": float(np.mean(losses)) if losses else None,
             "recalls": recalls.tolist()}
        )
        logging.info(
            f"epoch {epoch}: loss={np.mean(losses) if losses else float('nan'):.4f} "
            f"{recalls_str}{' (best)' if is_best else ''}"
        )
        if output_dir is not None:
            save_checkpoint(
                output_dir,
                {"params": state.params, "epoch": epoch + 1, "best_r5": best_r5},
                is_best,
            )
    return state, best_r5, history
