"""Quickstart: the AnyLoc-VLAD flow end-to-end on synthetic data.

Run anywhere (TPU or CPU):  python examples/quickstart.py
With real data, point --data-dir at your datasets root and pick a dataset
from anyloc_tpu.data.dataset_names().
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default=None, help="datasets root (default: synthetic)")
    p.add_argument("--dataset", default="gardens")
    p.add_argument("--model", default="dinov2_vits14")
    p.add_argument("--layer", type=int, default=11)
    p.add_argument("--clusters", type=int, default=32)
    p.add_argument("--cpu", action="store_true",
                   help="pin the CPU backend (e.g. when the TPU tunnel is "
                        "unreachable — jax.devices() blocks on a dead one)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from anyloc_tpu.config import PipelineArgs
    from anyloc_tpu.pipelines import run_vlad_pipeline

    largs = PipelineArgs()
    if args.data_dir is None:
        from anyloc_tpu.data.synthetic import build_gardens

        args.data_dir = build_gardens(tempfile.mkdtemp(), n_db=12, n_q=6,
                                      size=(126, 126))
        largs.bd_args.resize = (126, 126)
        largs.extractor.desc_layer = min(args.layer, 5)
        largs.vlad.num_clusters = min(args.clusters, 8)
        largs.extractor.batch_size = 4
        print(f"(no --data-dir: synthetic gardens at {args.data_dir})")
    else:
        largs.extractor.desc_layer = args.layer
        largs.vlad.num_clusters = args.clusters
    largs.prog.data_vg_dir = args.data_dir
    largs.prog.vg_dataset_name = args.dataset
    largs.extractor.model_type = args.model
    largs.top_k_vals = [1, 5, 10]

    results = run_vlad_pipeline(largs)
    print({k: v for k, v in results.items() if k.startswith("R@")})


if __name__ == "__main__":
    main()
