"""CosPlace classification training (reference ``CosPlace/train.py`` +
``cosface_loss.py`` + ``datasets/train_dataset.py``), TPU-native:

  * the database partitions into **UTM cell x heading classes**: cell size
    M=10 m, heading bucket alpha=30 deg, split into N*N*L groups (N=5, L=2)
    so nearby cells never share a group (train_dataset.py:20-80);
  * each group gets its own CosFace classifier (``MarginCosineProduct``,
    s=30, m=0.40 — cosface_loss.py:16-38) over the shared
    backbone+GeM+Linear descriptor net;
  * one jitted train step per group with the mesh-sharded batch; bf16
    matmuls replace the reference's AMP16 scaler.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from anyloc_tpu.ops.common import l2_normalize


# ---------------------------------------------------------------------------
# Class partitioning (UTM cells x heading, grouped)
# ---------------------------------------------------------------------------

def assign_classes(
    utm_east: np.ndarray,
    utm_north: np.ndarray,
    heading: Optional[np.ndarray] = None,
    M: float = 10.0,
    alpha: float = 30.0,
    N: int = 5,
    L: int = 2,
) -> Tuple[List[np.ndarray], List[Dict[Tuple, int]]]:
    """-> (per-group image-index arrays, per-group {class_key: class_id},
    per-image within-group class labels).

    class key = (east//M, north//M, heading//alpha); group id =
    ((east//M) % N, (north//M) % N, (heading//alpha) % L) flattened — the
    reference's spatial-separation trick so classifiers in one group never
    see adjacent cells.
    """
    if heading is None:
        heading = np.zeros_like(utm_east)
    ce = np.floor(utm_east / M).astype(int)
    cn = np.floor(utm_north / M).astype(int)
    ch = np.floor(heading / alpha).astype(int)
    group = (ce % N) * N * L + (cn % N) * L + (ch % L)
    n_groups = N * N * L
    group_indices: List[List[int]] = [[] for _ in range(n_groups)]
    group_classes: List[Dict[Tuple, int]] = [dict() for _ in range(n_groups)]
    labels = np.zeros(len(utm_east), int)
    for i in range(len(utm_east)):
        g = group[i]
        key = (ce[i], cn[i], ch[i])
        if key not in group_classes[g]:
            group_classes[g][key] = len(group_classes[g])
        labels[i] = group_classes[g][key]
        group_indices[g].append(i)
    return (
        [np.asarray(gi, int) for gi in group_indices],
        group_classes,
        labels,
    )


# ---------------------------------------------------------------------------
# CosFace margin product
# ---------------------------------------------------------------------------

class MarginCosineProduct(nn.Module):
    """cos(theta) - m margin head (CosPlace/cosface_loss.py:16-38)."""

    num_classes: int
    s: float = 30.0
    m: float = 0.40

    @nn.compact
    def __call__(self, feats: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "weight", nn.initializers.xavier_uniform(),
            (self.num_classes, feats.shape[-1]),
        )
        cos = l2_normalize(feats) @ l2_normalize(w).T  # [B, C]
        onehot = jax.nn.one_hot(labels, self.num_classes)
        return self.s * (cos - self.m * onehot)


def cosface_loss_fn(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------

class CosPlaceTrainState(NamedTuple):
    model_params: Dict
    classifier_params: Dict  # active group's head
    model_opt: optax.OptState
    cls_opt: optax.OptState
    step: jnp.ndarray


def make_cosplace_train_step(
    descriptor_fn,
    head: MarginCosineProduct,
    model_optimizer: optax.GradientTransformation,
    cls_optimizer: optax.GradientTransformation,
):
    """descriptor_fn(params, images) -> [B, D] L2-normalized descriptors."""

    def loss(mp, cp, images, labels):
        feats = descriptor_fn(mp, images)
        logits = head.apply(cp, feats, labels)
        return cosface_loss_fn(logits, labels)

    @jax.jit
    def train_step(state: CosPlaceTrainState, images, labels):
        l, (gm, gc) = jax.value_and_grad(loss, argnums=(0, 1))(
            state.model_params, state.classifier_params, images, labels
        )
        mu, mo = model_optimizer.update(gm, state.model_opt, state.model_params)
        cu, co = cls_optimizer.update(gc, state.cls_opt, state.classifier_params)
        return (
            CosPlaceTrainState(
                optax.apply_updates(state.model_params, mu),
                optax.apply_updates(state.classifier_params, cu),
                mo,
                co,
                state.step + 1,
            ),
            l,
        )

    def init_state(model_params, classifier_params) -> CosPlaceTrainState:
        return CosPlaceTrainState(
            model_params,
            classifier_params,
            model_optimizer.init(model_params),
            cls_optimizer.init(classifier_params),
            jnp.zeros((), jnp.int32),
        )

    train_step.init_state = init_state
    return train_step
