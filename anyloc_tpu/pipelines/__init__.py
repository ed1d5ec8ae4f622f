"""Pipeline entry points (the reference's scripts/ surface, SURVEY.md §2.3)."""

from anyloc_tpu.pipelines.engine import DescriptorEngine
from anyloc_tpu.pipelines.vlad_pipeline import run_vlad_pipeline
from anyloc_tpu.pipelines.global_vocab_vlad import run_global_vocab_vlad
from anyloc_tpu.pipelines.gem_pipeline import run_gem_pipeline
from anyloc_tpu.pipelines.global_vpr import run_global_vpr

__all__ = [
    "DescriptorEngine",
    "run_vlad_pipeline",
    "run_global_vocab_vlad",
    "run_gem_pipeline",
    "run_global_vpr",
]
