"""Checkpoint evaluation — the dvgl ``eval.py`` analogue: load a trained
GeoLocalizationNet checkpoint (orbax, or a torch ``.pth`` via the converters)
and run the retrieval evaluation on a dataset; also evaluates off-the-shelf
GeM models (eval.py:70-79 loads radenovic/naver weights by URL — here any
local torch resnet+GeM checkpoint path).

``--model-family mixvpr|cosplace`` evaluates the other trained baselines
instead — the ``MixVPR/mixer_top_k_vpr.py`` and ``CosPlace/test.py`` script
surfaces — loading their published-release ``.pth`` layouts through
``convert_mixvpr_checkpoint`` / ``convert_cosplace_checkpoint``.

Usage:
  python -m anyloc_tpu.training.eval_cli --checkpoint ./ckpt/best_checkpoint \
      --backbone resnet18conv4 --aggregation netvlad \
      --dataset gardens --datasets-folder /data/vpr
  python -m anyloc_tpu.training.eval_cli --model-family mixvpr \
      --checkpoint resnet50_MixVPR_4096.ckpt --dataset gardens \
      --datasets-folder /data/vpr
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def load_model_params(args, model):
    if args.checkpoint is None:
        return model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, *args.resize, 3)))
    if args.checkpoint.endswith((".pth", ".pt")):
        from anyloc_tpu.models.convert import load_torch_checkpoint, strip_prefix
        from anyloc_tpu.models.resnet import (
            convert_torchvision_resnet, resnet18_config, resnet50_config,
            resnet101_config,
        )

        sd = strip_prefix(load_torch_checkpoint(args.checkpoint), "module.")
        sd = strip_prefix(sd, "backbone.")
        fac = {"resnet18": resnet18_config, "resnet50": resnet50_config,
               "resnet101": resnet101_config}[args.backbone.rstrip("conv45")]
        trunc = "conv4" if args.backbone.endswith("conv4") else "conv5"
        bb = convert_torchvision_resnet(sd, fac(truncate=trunc))
        # graft backbone into a fresh init (aggregation params stay random
        # unless present in the checkpoint)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, *args.resize, 3)))
        variables = jax.tree_util.tree_map(lambda x: x, variables)
        variables["params"]["backbone"] = bb["params"]
        variables["batch_stats"]["backbone"] = bb["batch_stats"]
        return variables
    from anyloc_tpu.utils.checkpoint import load_checkpoint

    state = load_checkpoint(args.checkpoint)
    return state["params"] if "params" in state else state


def _build_family_model(args):
    """mixvpr / cosplace: VPRModel composition + release-layout converters."""
    from anyloc_tpu.training.mixvpr import (
        VPRModel,
        convert_cosplace_checkpoint,
        convert_mixvpr_checkpoint,
        get_backbone,
    )

    backbone = args.backbone
    if backbone == "resnet18conv4":  # dvgl-flavored default doesn't apply
        backbone = "resnet50"
    if args.model_family == "mixvpr":
        model = VPRModel(
            backbone=backbone, agg_arch="mixvpr",
            agg_config={"out_channels": args.mix_out_channels,
                        "out_rows": args.mix_out_rows,
                        "mix_depth": args.mix_depth},
        )
        convert = convert_mixvpr_checkpoint
    else:  # cosplace
        _, ch = get_backbone(backbone, layers_to_crop=())
        model = VPRModel(
            backbone=backbone, layers_to_crop=(), agg_arch="cosplace",
            agg_config={"in_dim": ch, "out_dim": args.fc_output_dim},
        )
        convert = lambda sd: convert_cosplace_checkpoint(  # noqa: E731
            sd, backbone=backbone)

    if args.checkpoint is None:
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, *args.resize, 3)))
    elif args.checkpoint.endswith((".pth", ".pt", ".ckpt")):
        from anyloc_tpu.models.convert import load_torch_checkpoint

        variables = convert(load_torch_checkpoint(args.checkpoint))
    else:
        from anyloc_tpu.utils.checkpoint import load_checkpoint

        state = load_checkpoint(args.checkpoint)
        variables = state["params"] if "params" in state else state
    return model, variables


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--model-family", default="dvgl",
                   choices=["dvgl", "mixvpr", "cosplace"])
    p.add_argument("--backbone", default="resnet18conv4")
    p.add_argument("--aggregation", default="netvlad")
    p.add_argument("--netvlad-clusters", type=int, default=64)
    p.add_argument("--fc-output-dim", type=int, default=512,
                   help="cosplace descriptor dim (CosPlace --fc_output_dim)")
    p.add_argument("--mix-out-channels", type=int, default=1024)
    p.add_argument("--mix-out-rows", type=int, default=4)
    p.add_argument("--mix-depth", type=int, default=4)
    p.add_argument("--dataset", required=True)
    p.add_argument("--datasets-folder", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--resize", type=int, nargs=2, default=None,
                   help="default: 480 640 (dvgl), or 320 320 for "
                        "--model-family mixvpr (the release checkpoints' "
                        "training resolution — the mixer weights are "
                        "token-count-specific)")
    p.add_argument("--test-method", default="hard_resize")
    p.add_argument("--recall-values", type=int, nargs="*", default=[1, 5, 10, 20])
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--efficient-ram-testing", action="store_true")
    p.add_argument("--majority-weight", type=float, default=0.01)
    p.add_argument("--save-descs", default=None,
                   help="save all descriptors (db rows first, then queries) "
                        "as <path>.npy (dvgl --save_descs)")
    p.add_argument("--pca-dim", type=int, default=None)
    p.add_argument("--pca-dataset-folder", default=None,
                   help="image dir whose features fit the PCA "
                        "(dvgl --pca_dataset_folder)")
    args = p.parse_args(argv)
    if args.pca_dim is not None and args.pca_dataset_folder is None:
        p.error("specify --pca-dataset-folder when using --pca-dim "
                "(parser.py:135-136)")
    if args.resize is None:
        args.resize = (320, 320) if args.model_family == "mixvpr" \
            else (480, 640)
    args.resize = tuple(args.resize)

    from anyloc_tpu.data.registry import get_dataset
    from anyloc_tpu.training.evaluate import evaluate

    if args.model_family != "dvgl":
        model, variables = _build_family_model(args)
    else:
        from anyloc_tpu.training.network import GeoLocalizationNet

        model = GeoLocalizationNet(
            backbone=args.backbone, aggregation=args.aggregation,
            netvlad_clusters=args.netvlad_clusters,
        )
        variables = load_model_params(args, model)
    ds = get_dataset(args.dataset, args.datasets_folder, args.split,
                     img_size=args.resize)
    infer = jax.jit(lambda imgs: model.apply(variables, imgs))
    desc_fn = lambda imgs: infer(jnp.asarray(imgs, jnp.float32))  # noqa: E731
    pca = None
    if args.pca_dim is not None:
        # dvgl util.compute_pca: forward the PCA folder's images, fit PCA
        import glob as _glob
        import os as _os

        from anyloc_tpu.data.base import VPRDataset, natsorted
        from anyloc_tpu.ops.pca import pca_fit

        paths = natsorted([
            q for e in ("*.jpg", "*.jpeg", "*.png")
            for q in _glob.glob(_os.path.join(args.pca_dataset_folder, e))
        ])
        if not paths:
            raise FileNotFoundError(
                f"no images in {args.pca_dataset_folder}")
        pca_ds = VPRDataset(paths, [], img_size=args.resize)
        feats = []
        for imgs, bidx in pca_ds.batches(args.batch_size, which="db"):
            feats.append(np.asarray(desc_fn(imgs))[bidx >= 0])
        pca = pca_fit(np.concatenate(feats), args.pca_dim)
    recalls, recalls_str = evaluate(
        desc_fn, ds,
        test_method=args.test_method, recall_values=args.recall_values,
        batch_size=args.batch_size, pca=pca,
        majority_weight=args.majority_weight,
        efficient_ram=args.efficient_ram_testing,
        save_descs=args.save_descs,
    )
    print(recalls_str)
    print(json.dumps({f"R@{k}": float(r)
                      for k, r in zip(args.recall_values, recalls)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
