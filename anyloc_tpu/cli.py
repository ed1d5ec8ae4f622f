"""Command-line surface: ``python -m anyloc_tpu <pipeline> [--args...]``.

Replaces the reference's 34 per-experiment scripts (scripts/*.py, each a tyro
LocalArgs + main()) with subcommands over the shared PipelineArgs config:

  global-vocab-vlad   SOTA AnyLoc-VLAD with domain vocabulary
  vlad                per-dataset-vocabulary VLAD
  gem                 GeM pooling
  global-vpr          CLS-token global descriptor
  gp                  global max/avg pooling
  clip-top-k          CLIP global-descriptor retrieval
  patch-clip          CLIP crops -> VLAD
  demo                demo/anyloc_vlad_generate.py equivalent
  serve               HTTP daemon: /describe + /search over a loaded vocab/db
  viz                 cluster-assignment overlays + GeM t-SNE domain projector
  train               dvgl-style triplet training (trained baselines)
  eval                checkpoint / off-the-shelf model evaluation
  sweep               ablation grids (the *_ablations.sh equivalent)

Serving fast path flags (vlad / global-vocab-vlad / gem / gp):
  --extractor.quant int8_full --extractor.transfer-dtype uint8
"""

from __future__ import annotations

import json
import os
import sys

from anyloc_tpu.config import PipelineArgs, parse_args


def _save(results, largs: PipelineArgs):
    if not largs.save_results:
        return
    out_dir = os.path.join(largs.prog.cache_dir, "experiments",
                           str(largs.exp_id or "default"))
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"results_{results['Timestamp']}.json")
    clean = {
        k: v for k, v in results.items() if not k.startswith("Qual-")
    }
    with open(path, "w") as f:
        json.dump(clean, f, indent=2, default=str)
    print(f"Saved results: {path}")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == "demo":
        from anyloc_tpu.pipelines.demo import main as demo_main

        return demo_main(rest)
    if cmd == "viz":
        from anyloc_tpu.pipelines.viz_cli import main as viz_main

        return viz_main(rest)
    if cmd == "serve":
        from anyloc_tpu.pipelines.serve_http import main as serve_main

        return serve_main(rest)
    if cmd == "train":
        from anyloc_tpu.training.train_cli import main as train_main

        return train_main(rest)
    if cmd == "eval":
        from anyloc_tpu.training.eval_cli import main as eval_main

        return eval_main(rest)
    if cmd == "sweep":
        from anyloc_tpu.sweeps import main as sweep_main

        return sweep_main(rest)
    largs = parse_args(PipelineArgs, rest)
    if cmd == "global-vocab-vlad":
        from anyloc_tpu.pipelines import run_global_vocab_vlad as fn
    elif cmd == "vlad":
        from anyloc_tpu.pipelines import run_vlad_pipeline as fn
    elif cmd == "gem":
        from anyloc_tpu.pipelines import run_gem_pipeline as fn
    elif cmd == "global-vpr":
        from anyloc_tpu.pipelines import run_global_vpr as fn
    elif cmd == "clip-top-k":
        from anyloc_tpu.pipelines.clip_pipelines import run_clip_top_k as fn
    elif cmd == "patch-clip":
        from anyloc_tpu.pipelines.clip_pipelines import run_patch_clip as fn
    elif cmd == "gp":
        from anyloc_tpu.pipelines.gp_pipeline import run_gp_pipeline as fn
    else:
        print(f"Unknown pipeline: {cmd}", file=sys.stderr)
        return 2
    results = fn(largs)
    _save(results, largs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
