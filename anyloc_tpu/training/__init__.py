"""Trained-baseline slice: learned aggregators (NetVLAD / GeM / MixVPR /
CosPlace-head) and the triplet / cosface training loops — the TPU-native
counterpart of the reference's vendored dvgl_benchmark / CosPlace / MixVPR
(SURVEY.md §2.4-2.6). DataParallel + sync-BN is replaced by a device mesh:
batch shards over 'data', gradients psum automatically under jit."""

from anyloc_tpu.training.aggregators import NetVLAD, GeMHead, MixVPRHead
from anyloc_tpu.training.triplet import (
    TripletTrainState,
    make_triplet_train_step,
    triplet_margin_loss,
)

__all__ = [
    "NetVLAD",
    "GeMHead",
    "MixVPRHead",
    "TripletTrainState",
    "make_triplet_train_step",
    "triplet_margin_loss",
]
