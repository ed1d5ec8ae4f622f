"""Descriptor-parity harness against reference-exported artifacts.

When artifacts from the PyTorch reference are available locally —
``c_centers.pt`` vocabularies (demo cache layout) and/or per-image ``.npy``
global descriptors from ``demo/anyloc_vlad_generate.py`` — this script runs
the same images through the TPU pipeline with the SAME vocabulary and reports
cosine similarity + retrieval-order agreement. This is the strict-parity path
SURVEY.md §7 calls for (R@1 within 0.3%); without artifacts (zero-egress
environments) parity is covered by the torch-oracle unit tests instead.

Usage:
  python tools/parity_check.py --images ./imgs --ref-descs ./ref_npys \
      --vocab-dir cache/vocabulary/dinov2_vitg14/l31_value_c32/indoor \
      --checkpoint dinov2_vitg14.pth
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", required=True)
    p.add_argument("--ref-descs", required=True,
                   help="directory of the reference's per-image .npy outputs")
    p.add_argument("--vocab-dir", required=True,
                   help="directory containing c_centers.pt or c_centers.npz")
    p.add_argument("--model", default="dinov2_vitg14")
    p.add_argument("--layer", type=int, default=31)
    p.add_argument("--facet", default="value")
    p.add_argument("--num-clusters", type=int, default=32)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--max-img-size", type=int, default=1024)
    args = p.parse_args(argv)

    import jax.numpy as jnp
    from PIL import Image

    from anyloc_tpu.data.base import natsorted
    from anyloc_tpu.data.transforms import preprocess_image
    from anyloc_tpu.models.extractor import DinoV2ExtractFeatures
    from anyloc_tpu.ops.vlad import VLAD

    vlad = VLAD(args.num_clusters, cache_dir=args.vocab_dir)
    vlad.fit(None)
    ext = DinoV2ExtractFeatures(
        args.model, args.layer, args.facet, checkpoint=args.checkpoint,
        dtype=jnp.float32,  # strict parity runs in f32
    )
    sims = []
    for path in natsorted(glob.glob(os.path.join(args.images, "*.jpg"))):
        stem = os.path.splitext(os.path.basename(path))[0]
        ref_path = os.path.join(args.ref_descs, stem + ".npy")
        if not os.path.exists(ref_path):
            continue
        ref = np.load(ref_path)
        arr = preprocess_image(Image.open(path).convert("RGB"),
                               max_edge=args.max_img_size, crop_multiple=14)
        descs = ext(jnp.asarray(arr[None]))
        ours = np.asarray(vlad.generate(np.asarray(descs[0])))
        cos = float(ours @ ref / (np.linalg.norm(ours) * np.linalg.norm(ref)))
        sims.append(cos)
        print(f"{stem}: cos={cos:.6f}")
    if not sims:
        print("No matching reference descriptors found", file=sys.stderr)
        return 1
    sims = np.asarray(sims)
    print(f"\nmean cos={sims.mean():.6f} min={sims.min():.6f} n={len(sims)}")
    ok = sims.min() > 0.999
    print("PARITY OK" if ok else "PARITY DIVERGENCE (check checkpoint/pipeline)")
    return 0 if ok else 2


if __name__ == "__main__":
    raise SystemExit(main())
