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
    optim: str = "adam",
    patience: Optional[int] = None,
    trainable_mask=None,
    neg_samples_num: int = 1000,
    output_dir: Optional[str] = None,
    recall_values=(1, 5, 10, 20),
    eval_batch_size: int = 16,
    test_method: str = "hard_resize",
    efficient_ram: bool = False,
    augment_fn=None,
    seed: int = 42,
):
    """Returns (final_state, best_r5, history).

    ``optim``/``patience`` mirror the dvgl parser (adam|sgd; early stop after
    ``patience`` epochs without a best-R@5 improvement, train.py:183-206).
    ``augment_fn(rng_key, images [B,H,W,3]) -> images`` applies train-time
    augmentation to the QUERY image of each triplet on device — the
    reference's query_transform augments queries only, while positives and
    negatives get the plain resized transform (datasets_ws.py:287-298);
    see data/augment.py make_augment_fn.
    """
    import jax

    opt = optax.adam(lr) if optim == "adam" else optax.sgd(lr)
    if trainable_mask is not None:
        # dvgl --freeze_te: frozen params get ZERO updates (requires_grad
        # equivalent; network.make_freeze_te_mask builds the mask callable).
        # NOTE optax.masked would pass raw gradients through where masked
        # out — multi_transform + set_to_zero is the freezing construct.
        inner = opt

        def labels(params):
            import jax as _jax

            return _jax.tree_util.tree_map(
                lambda t: "train" if t else "freeze", trainable_mask(params)
            )

        opt = optax.multi_transform(
            {"train": inner, "freeze": optax.set_to_zero()}, labels
        )
    step = make_triplet_train_step(
        descriptor_fn, opt, neg_num=neg_num, margin=margin, criterion=criterion
    )
    state = step.init_state(init_params)
    miner = TripletMiner(train_ds, neg_num=neg_num, mining=mining, seed=seed,
                         neg_samples_num=neg_samples_num)
    aug_key = jax.random.PRNGKey(seed + 1)
    # One jitted inference fn for mining + eval (an unjitted model.apply would
    # dispatch op-by-op — catastrophic over the TPU tunnel).
    infer = jax.jit(descriptor_fn)
    best_r5 = 0.0
    epochs_since_best = 0
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
                tuples = jnp.asarray(tuples)
                if augment_fn is not None:
                    # queries only (tuple slot 0); positives/negatives stay
                    # un-augmented, matching the reference query_transform
                    aug_key, k = jax.random.split(aug_key)
                    tuples = tuples.at[:, 0].set(augment_fn(k, tuples[:, 0]))
                state, loss = step(state, tuples)
                losses.append(float(loss))
            done += n
        recalls, recalls_str = evaluate(
            lambda imgs: infer(state.params, jnp.asarray(imgs)),
            val_ds,
            test_method=test_method,
            recall_values=recall_values,
            batch_size=eval_batch_size,
            efficient_ram=efficient_ram,
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
        if is_best:
            epochs_since_best = 0
        else:
            epochs_since_best += 1
            if patience is not None and epochs_since_best >= patience:
                logging.info(
                    f"early stop: no R@5 improvement for {patience} epochs "
                    f"(train.py:183-206 patience semantics)"
                )
                break
    return state, best_r5, history
