"""Triplet training step — the dvgl_benchmark training loop's compute core
(train.py:132-169: query + positive + neg_num negatives per tuple, torch
TripletMarginLoss, Adam), rebuilt as one jitted, mesh-sharded step.

Parallelism (replaces DataParallel + sync-BN, dvgl train.py:55,100-103):
the tuple batch shards over the mesh 'data' axis; parameters replicate (or
tensor-shard over 'model' for big trunks); gradient all-reduce is inserted by
XLA from the sharding annotations — no explicit comms code.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class TripletTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def triplet_margin_loss(
    q: jnp.ndarray, p: jnp.ndarray, n: jnp.ndarray, margin: float = 0.1
) -> jnp.ndarray:
    """torch.nn.TripletMarginLoss semantics (margin 0.1 = dvgl parser.py
    default; L2 distance, mean reduction).

    q [B, D]; p [B, D]; n [B, NEG, D] — each negative forms one triplet.
    """
    d_qp = jnp.sqrt(jnp.sum((q - p) ** 2, axis=-1) + 1e-12)  # [B]
    d_qn = jnp.sqrt(jnp.sum((q[:, None] - n) ** 2, axis=-1) + 1e-12)  # [B, NEG]
    return jnp.mean(jnp.maximum(d_qp[:, None] - d_qn + margin, 0.0))


def sare_ind_loss(q, p, n):
    """SARE-independent (dvgl model/functional.py:6-16): per negative,
    -log sigmoid over (-d_qp + d_qn) contrast, summed."""
    d_qp = jnp.sum((q - p) ** 2, axis=-1)
    d_qn = jnp.sum((q[:, None] - n) ** 2, axis=-1)
    return jnp.mean(jax.nn.softplus(d_qp[:, None] - d_qn))


def sare_joint_loss(q, p, n):
    """SARE-joint (functional.py:19-27): softmax over the negative set.

    Reduction matches the reference's training loop (dvgl train.py:150-165):
    one joint term per query, but the batch sum is divided by B * NEG — so
    the per-query mean is further scaled by 1/NEG.
    """
    d_qp = jnp.sum((q - p) ** 2, axis=-1)  # [B]
    d_qn = jnp.sum((q[:, None] - n) ** 2, axis=-1)  # [B, NEG]
    logits = jnp.concatenate([-d_qp[:, None], -d_qn], axis=1)
    return jnp.mean(-jax.nn.log_softmax(logits, axis=1)[:, 0]) / n.shape[1]


_LOSSES = {
    "triplet": triplet_margin_loss,
    "sare_ind": lambda q, p, n, margin=None: sare_ind_loss(q, p, n),
    "sare_joint": lambda q, p, n, margin=None: sare_joint_loss(q, p, n),
}


def _split_trainable(variables):
    """Partition a variables pytree into (trainable, frozen) by path: any
    subtree under a 'batch_stats' collection is frozen. BatchNorm running
    statistics must never receive optimizer updates (they are not parameters;
    dvgl updates them from batch moments, never by gradient)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables)
    trainable = {k: v for k, v in flat.items() if "batch_stats" not in k}
    frozen = {k: v for k, v in flat.items() if "batch_stats" in k}
    return (
        traverse_util.unflatten_dict(trainable),
        traverse_util.unflatten_dict(frozen),
    )


def _merge(trainable, frozen):
    from flax import traverse_util

    flat = dict(traverse_util.flatten_dict(trainable))
    flat.update(traverse_util.flatten_dict(frozen))
    return traverse_util.unflatten_dict(flat)


def make_triplet_train_step(
    descriptor_fn: Callable,
    optimizer: optax.GradientTransformation,
    neg_num: int = 10,
    margin: float = 0.1,
    criterion: str = "triplet",
):
    """Build a jitted train step.

    ``descriptor_fn(variables, images [B*, H, W, 3]) -> [B*, D]`` — the full
    model (trunk + aggregation head). The step takes tuples
    [B, 1 + 1 + neg_num, H, W, 3] (query, positive, negatives — dvgl's
    12-image tuple with the default neg_num=10).

    BatchNorm handling: running statistics (any 'batch_stats' collection in
    the variables) are FROZEN — excluded from gradients and optimizer state,
    and the model runs BN in inference mode (descriptor_fn is called without
    train=True). This is the standard frozen-BN fine-tuning regime; dvgl's
    train-mode BN stat updates are intentionally not emulated here.
    """
    loss_fn = _LOSSES[criterion]

    def loss(trainable, frozen, tuples):
        b, t, h, w, c = tuples.shape
        flat = tuples.reshape(b * t, h, w, c)
        descs = descriptor_fn(_merge(trainable, frozen), flat)
        descs = descs.reshape(b, t, -1)
        q, p, n = descs[:, 0], descs[:, 1], descs[:, 2:]
        return loss_fn(q, p, n, margin)

    @jax.jit
    def train_step(state: TripletTrainState, tuples: jnp.ndarray):
        trainable, frozen = _split_trainable(state.params)
        l, grads = jax.value_and_grad(loss)(trainable, frozen, tuples)
        updates, opt_state = optimizer.update(grads, state.opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return (
            TripletTrainState(_merge(trainable, frozen), opt_state, state.step + 1),
            l,
        )

    def init_state(params) -> TripletTrainState:
        trainable, _ = _split_trainable(params)
        return TripletTrainState(
            params, optimizer.init(trainable), jnp.zeros((), jnp.int32)
        )

    train_step.init_state = init_state
    return train_step
