"""Ablation sweep driver — replaces the reference's 15 bash sweep scripts
(scripts/*_ablations.sh, *_many.sh: nested for-loops over model x layer x
facet x clusters x dataset x vocab-domain with GPU pinning and run
bookkeeping, e.g. dino_v2_global_vocab_vlad_ablations.sh:12-44) with one
Python product-sweep that reuses compiled extractors across grid points and
writes a tidy CSV.

Example:
  python -m anyloc_tpu.sweeps --pipeline vlad \
      --prog.data-vg-dir /data/vpr \
      --grid.model-type dinov2_vits14 dinov2_vitb14 \
      --grid.desc-layer 9 11 --grid.desc-facet key value \
      --grid.num-clusters 8 32 --grid.dataset gardens baidu_datasets \
      --out sweep_results.csv
"""

from __future__ import annotations

import argparse
import csv
import itertools
import os
import sys
import traceback
from typing import Dict, List, Optional

from anyloc_tpu.config import PipelineArgs


def run_sweep(
    pipeline: str,
    grid: Dict[str, List],
    base: Optional[PipelineArgs] = None,
    out_csv: Optional[str] = None,
    verbose: bool = True,
) -> List[Dict]:
    """grid keys: model_type, desc_layer, desc_facet, num_clusters, dataset,
    domain (any subset; missing ones use the base config). The extractor is
    rebuilt only when (model_type, desc_layer, desc_facet) changes — the
    expensive trunk compile amortizes over clusters/dataset/domain points.
    Failures are caught per-point so sweeps continue (the reference's
    try/except traceback pattern, dino_v2_global_vocab_vlad.py:628-635).
    """
    from anyloc_tpu.pipelines import (
        DescriptorEngine,
        run_gem_pipeline,
        run_global_vocab_vlad,
        run_vlad_pipeline,
    )

    fns = {
        "vlad": run_vlad_pipeline,
        "global-vocab-vlad": run_global_vocab_vlad,
        "gem": run_gem_pipeline,
    }
    fn = fns[pipeline]
    base = base or PipelineArgs()
    keys = list(grid)
    rows: List[Dict] = []
    engine_key, engine = None, None
    for values in itertools.product(*(grid[k] for k in keys)):
        point = dict(zip(keys, values))
        import copy

        largs = copy.deepcopy(base)
        if "model_type" in point:
            largs.extractor.model_type = point["model_type"]
        if "desc_layer" in point:
            largs.extractor.desc_layer = int(point["desc_layer"])
        if "desc_facet" in point:
            largs.extractor.desc_facet = point["desc_facet"]
        if "num_clusters" in point:
            largs.vlad.num_clusters = int(point["num_clusters"])
        if "dataset" in point:
            largs.prog.vg_dataset_name = point["dataset"]
        if "domain" in point:
            largs.global_vocab = point["domain"]
        if largs.vlad.cache_dir:
            # one vocabulary cache per grid point — a shared dir would make
            # every later point silently reuse the first point's centers
            tag = "_".join(f"{k}-{v}" for k, v in point.items())
            largs.vlad.cache_dir = os.path.join(largs.vlad.cache_dir, tag)
        ek = (largs.extractor.model_type, largs.extractor.desc_layer,
              largs.extractor.desc_facet, largs.extractor.quant,
              largs.extractor.transfer_dtype)
        try:
            if ek != engine_key:
                engine = DescriptorEngine(
                    largs.extractor.model_type, largs.extractor.desc_layer,
                    largs.extractor.desc_facet, largs.extractor.checkpoint,
                    largs.extractor.dtype, largs.extractor.batch_size,
                    quant=largs.extractor.quant,
                    transfer_dtype=largs.extractor.transfer_dtype,
                )
                engine_key = ek
            results = fn(largs, engine=engine, verbose=False)
            row = dict(point)
            row.update({k: v for k, v in results.items()
                        if not k.startswith("Qual-")})
            # reference run-naming convention: the group is the domain (or
            # dataset) and the run name encodes the full config — this is
            # what makes the CSV line up with the reference's exported
            # ablation tables (*_ablations.sh:86-88, configs.py:80-91)
            from anyloc_tpu.utils.logging_utils import (MetricsLogger,
                                                         run_name_for)

            group = point.get("domain", largs.prog.vg_dataset_name)
            run_name = run_name_for(
                pipeline,
                largs.extractor.model_type,
                layer=largs.extractor.desc_layer,
                facet=largs.extractor.desc_facet,
                clusters=largs.vlad.num_clusters,
                dataset=largs.prog.vg_dataset_name,
                domain=point.get("domain"),
            )
            row["wandb_group"], row["run_name"] = group, run_name
            if largs.prog.use_wandb:
                ml = MetricsLogger(
                    use_wandb=True, project=largs.prog.wandb_proj,
                    entity=largs.prog.wandb_entity, group=group,
                    run_name=run_name, config=point)
                # per-k recall logged as steps (the reference's pattern,
                # dino_v2_global_vocab_vlad.py:596-599)
                for k in sorted(
                        int(c[2:]) for c in results if c.startswith("R@")):
                    ml.log({"Recall": results[f"R@{k}"]}, step=k)
                ml.finish()
            rows.append(row)
            if verbose:
                r1 = results.get("R@1")
                r1s = f"{r1:.4f}" if r1 is not None else "n/a"
                print(f"{point} -> R@1={r1s}")
        except Exception:
            traceback.print_exc()
            rows.append(dict(point, error=True))
    if out_csv and rows:
        fieldnames = sorted({k for r in rows for k in r})
        os.makedirs(os.path.dirname(os.path.abspath(out_csv)), exist_ok=True)
        with open(out_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fieldnames)
            w.writeheader()
            w.writerows(rows)
    return rows



# Named preset grids reproducing the reference's published ablation axes
# (the 15 scripts/*_ablations.sh drivers + paper_utils/data/ablations CSVs).
# Layers mirror the commented full ranges in
# dino_v2_global_vocab_vlad_ablations.sh:12-18; facet/cluster/domain values
# are the exact published grids. Combine with --grid.dataset to pick targets.
PRESETS = {
    # facet ordering table (facet/dinov2_*.csv: value > token >> query > key)
    "facets": {"model_type": ["dinov2_vitg14"], "desc_layer": [31],
               "desc_facet": ["query", "key", "value", "token"],
               "num_clusters": [32]},
    # layer ablation per model family (vit_and_layer/*.csv)
    "layers-g14": {"model_type": ["dinov2_vitg14"], "desc_facet": ["value"],
                   "desc_layer": list(range(39, -1, -1)), "num_clusters": [32]},
    "layers-l14": {"model_type": ["dinov2_vitl14"], "desc_facet": ["value"],
                   "desc_layer": list(range(23, -1, -1)), "num_clusters": [32]},
    "layers-b14": {"model_type": ["dinov2_vitb14"], "desc_facet": ["value"],
                   "desc_layer": list(range(11, -1, -1)), "num_clusters": [32]},
    "layers-s14": {"model_type": ["dinov2_vits14"], "desc_facet": ["value"],
                   "desc_layer": list(range(11, -1, -1)), "num_clusters": [32]},
    # vocabulary-size ablation
    "clusters": {"model_type": ["dinov2_vitg14"], "desc_layer": [31],
                 "desc_facet": ["value"], "num_clusters": [256, 128, 64, 32]},
    # domain-vocabulary ablation (global-vocab pipeline)
    "domains": {"model_type": ["dinov2_vitg14"], "desc_layer": [31],
                "desc_facet": ["value"], "num_clusters": [32],
                "domain": ["indoor", "urban", "aerial", "structured",
                           "unstructured", "both"]},
}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pipeline", default="vlad",
                   choices=["vlad", "global-vocab-vlad", "gem"])
    p.add_argument("--out", default="sweep_results.csv")
    p.add_argument("--grid.model-type", dest="g_model", nargs="*", default=[])
    p.add_argument("--grid.desc-layer", dest="g_layer", nargs="*", type=int,
                   default=[])
    p.add_argument("--grid.desc-facet", dest="g_facet", nargs="*", default=[])
    p.add_argument("--grid.num-clusters", dest="g_clusters", nargs="*",
                   type=int, default=[])
    p.add_argument("--grid.dataset", dest="g_dataset", nargs="*", default=[])
    p.add_argument("--grid.domain", dest="g_domain", nargs="*", default=[])
    p.add_argument("--preset", default=None, choices=sorted(PRESETS),
                   help="start from a published ablation grid "
                        "(reference *_ablations.sh axes); explicit --grid.* "
                        "values override its entries")
    p.add_argument("--plot", nargs="?", const="auto", default=None,
                   metavar="X_COL",
                   help="after the sweep, regenerate a paper_utils-style "
                        "ablation figure from the CSV (one command: sweep "
                        "-> CSV -> figure). Value = the swept column for "
                        "the x-axis; bare --plot picks the grid axis with "
                        "the most values. Output: <out>.png")
    args, rest = p.parse_known_args(argv)
    from anyloc_tpu.config import parse_args

    base = parse_args(PipelineArgs, rest)
    grid = dict(PRESETS[args.preset]) if args.preset else {}
    for key, vals in (("model_type", args.g_model), ("desc_layer", args.g_layer),
                      ("desc_facet", args.g_facet),
                      ("num_clusters", args.g_clusters),
                      ("dataset", args.g_dataset), ("domain", args.g_domain)):
        if vals:
            grid[key] = vals
    run_sweep(args.pipeline, grid, base, args.out)
    if args.plot:
        x_col = args.plot
        if x_col == "auto":
            multi = [k for k in grid if len(grid[k]) > 1] or list(grid)
            x_col = max(multi, key=lambda k: len(grid[k]))
        from anyloc_tpu.viz import ablation_plot

        png = os.path.splitext(args.out)[0] + ".png"
        ablation_plot({args.pipeline: args.out}, x_col=x_col,
                      output_path=png,
                      title=f"{args.pipeline} ablation: R@1 vs {x_col}")
        print(f"figure: {png}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
