"""Utilities: seeding, checkpointing, logging, profiling."""

from anyloc_tpu.utils.seeding import seed_everything
from anyloc_tpu.utils.checkpoint import save_checkpoint, resume_train
from anyloc_tpu.utils.logging_utils import setup_logging

__all__ = ["seed_everything", "save_checkpoint", "resume_train", "setup_logging"]
