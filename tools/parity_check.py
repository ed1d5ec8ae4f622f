"""Descriptor-parity harness against reference-exported artifacts.

When artifacts from the PyTorch reference are available locally —
``c_centers.pt`` vocabularies (demo cache layout) and/or per-image ``.npy``
global descriptors from ``demo/anyloc_vlad_generate.py`` — this script runs
the same images through the TPU pipeline with the SAME vocabulary and reports
cosine similarity + retrieval-order agreement. This is the strict-parity path
SURVEY.md §7 calls for (R@1 within 0.3%); without artifacts (zero-egress
environments) parity is covered by the torch-oracle unit tests instead.
The full artifact list + the three commands of the runbook:
docs/PARITY_RUNBOOK.md.

Covers all descriptor exits (round-4 verdict item 7):
  * ``--extractor dinov2`` (default) — the flagship trunk+VLAD path;
  * ``--extractor lseg`` — the LSeg pixel-feature path
    (scripts/lseg_vlad.py:158-232). Reference artifacts are either
    3-D [H, W, D] pixel-feature dumps (compared per-pixel) or 1-D VLAD
    descriptors (compared after aggregation);
  * ``--engines device ivf pq ivf_pq`` — after descriptor parity, runs
    the retrieval exits: reference descriptors form the database, ours
    the queries; every engine must put the matching row at rank 1 and
    agree with the exact engine's top-k (utilities.py:390-469 seam).

Usage:
  python tools/parity_check.py --images ./imgs --ref-descs ./ref_npys \
      --vocab-dir cache/vocabulary/dinov2_vitg14/l31_value_c32/indoor \
      --checkpoint dinov2_vitg14.pth --engines device ivf pq
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _retrieval_agreement(ours: np.ndarray, ref: np.ndarray, engines, k: int):
    """Run the ours-vs-ref retrieval exits: ``ref`` rows are the database,
    ``ours`` the queries; query i's exact nearest row is i itself whenever
    descriptor parity holds, so every engine is graded on (a) R@1 == identity
    and (b) top-k overlap vs the exact engine. Returns {engine: (r_at_1,
    mean top-k overlap)}; ANN fit sizes adapt to small parity sets."""
    import jax.numpy as jnp

    from anyloc_tpu.ops.retrieval import top_k_search

    n, d = ref.shape
    k = min(k, n)
    refn = ref / np.linalg.norm(ref, axis=1, keepdims=True)
    oursn = ours / np.linalg.norm(ours, axis=1, keepdims=True)
    _, i_exact = top_k_search(jnp.asarray(refn), jnp.asarray(oursn), k)
    i_exact = np.asarray(i_exact)
    out = {}
    for engine in engines:
        if engine == "device":
            idx = i_exact
        elif engine == "ivf":
            from anyloc_tpu.ops.ivf import ivf_fit

            index = ivf_fit(refn, max(1, int(np.sqrt(n))))
            _, idx = index.search(oursn, k, n_probe=max(4, int(np.sqrt(n))))
            idx = np.asarray(idx)
        elif engine in ("pq", "ivf_pq"):
            if n < 4:
                print(f"  [{engine}] skipped: parity set has {n} rows; the "
                      f"quantized exits need >= 4 to fit a codebook "
                      f"(pq_fit requires n >= n_codes)")
                continue
            # subspace count: largest divisor of d <= 64 (bytes/row knob);
            # codebook size shrinks with tiny parity sets (fit needs
            # n >= n_codes rows)
            m = next(m for m in (64, 32, 16, 8, 4, 2, 1) if d % m == 0)
            n_codes = int(min(256, max(2, n // 2)))
            if engine == "pq":
                from anyloc_tpu.ops.pq import pq_fit

                index = pq_fit(refn, m, n_codes=n_codes, method="cosine")
                _, idx = index.search(oursn, k)
            else:
                from anyloc_tpu.ops.ivf_pq import ivf_pq_fit

                index = ivf_pq_fit(refn, max(1, int(np.sqrt(n))), m=m,
                                   n_codes=n_codes, method="cosine")
                _, idx = index.search(oursn, k,
                                      n_probe=max(4, int(np.sqrt(n))))
            idx = np.asarray(idx)
        else:
            raise ValueError(f"unknown engine {engine!r}")
        r1 = float(np.mean(idx[:, 0] == np.arange(n)))
        overlap = float(np.mean([
            len(set(idx[q].tolist()) & set(i_exact[q].tolist())) / k
            for q in range(n)
        ]))
        out[engine] = (r1, overlap)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", required=True)
    p.add_argument("--ref-descs", required=True,
                   help="directory of the reference's per-image .npy outputs"
                        " (1-D global descriptors, or [H, W, D] LSeg pixel"
                        " features)")
    p.add_argument("--vocab-dir", required=True,
                   help="directory containing c_centers.pt or c_centers.npz")
    p.add_argument("--extractor", default="dinov2",
                   choices=["dinov2", "lseg"])
    p.add_argument("--model", default="dinov2_vitg14")
    p.add_argument("--layer", type=int, default=31)
    p.add_argument("--facet", default="value")
    p.add_argument("--num-clusters", type=int, default=32)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--max-img-size", type=int, default=1024)
    p.add_argument("--engines", nargs="*", default=[],
                   choices=["device", "ivf", "pq", "ivf_pq"],
                   help="additionally grade these retrieval exits on the"
                        " parity descriptors (ref = database, ours ="
                        " queries)")
    p.add_argument("--recall-k", type=int, default=10)
    p.add_argument("--cos-threshold", type=float, default=0.999)
    args = p.parse_args(argv)

    import jax.numpy as jnp
    from PIL import Image

    from anyloc_tpu.data.base import natsorted
    from anyloc_tpu.data.transforms import preprocess_image
    from anyloc_tpu.ops.vlad import VLAD

    vlad = VLAD(args.num_clusters, cache_dir=args.vocab_dir)
    vlad.fit(None)
    if args.extractor == "lseg":
        from anyloc_tpu.models.factory import make_extractor

        ext = make_extractor("lseg", checkpoint=args.checkpoint,
                             dtype=jnp.float32)
    else:
        from anyloc_tpu.models.extractor import DinoV2ExtractFeatures

        ext = DinoV2ExtractFeatures(
            args.model, args.layer, args.facet, checkpoint=args.checkpoint,
            dtype=jnp.float32,  # strict parity runs in f32
        )
    sims, ours_all, ref_all = [], [], []
    for path in natsorted(glob.glob(os.path.join(args.images, "*.jpg"))):
        stem = os.path.splitext(os.path.basename(path))[0]
        ref_path = os.path.join(args.ref_descs, stem + ".npy")
        if not os.path.exists(ref_path):
            continue
        ref = np.load(ref_path)
        arr = preprocess_image(Image.open(path).convert("RGB"),
                               max_edge=args.max_img_size, crop_multiple=14)
        descs = np.asarray(ext(jnp.asarray(arr[None]))[0])
        if ref.ndim == 3:
            # LSeg pixel-feature dump [H, W, D]: per-pixel cosine at the
            # grid, THEN VLAD both sides for the retrieval exits. Our
            # extractor returns the flattened [N, D] patch layout — the
            # grids must match exactly (a mismatch IS a divergence).
            if descs.shape != (ref.shape[0] * ref.shape[1], ref.shape[2]):
                print(f"{stem}: ref pixel grid {ref.shape} does not match "
                      f"our {descs.shape} — resize/stride divergence",
                      file=sys.stderr)
                return 1
            a, b = descs, ref.reshape(-1, ref.shape[-1])
            pix_cos = float(np.mean(
                np.sum(a * b, -1)
                / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
                   + 1e-12)))
            ours = np.asarray(vlad.generate(a))
            refd = np.asarray(vlad.generate(b))
            cos = float(ours @ refd
                        / (np.linalg.norm(ours) * np.linalg.norm(refd)))
            print(f"{stem}: pixel_cos={pix_cos:.6f} vlad_cos={cos:.6f}")
        else:
            if descs.ndim == 3:
                descs = descs.reshape(-1, descs.shape[-1])
            ours = np.asarray(vlad.generate(descs))
            refd = ref
            cos = float(ours @ refd
                        / (np.linalg.norm(ours) * np.linalg.norm(refd)))
            print(f"{stem}: cos={cos:.6f}")
        sims.append(cos)
        ours_all.append(ours)
        ref_all.append(refd)
    if not sims:
        print("No matching reference descriptors found", file=sys.stderr)
        return 1
    sims = np.asarray(sims)
    print(f"\nmean cos={sims.mean():.6f} min={sims.min():.6f} n={len(sims)}")
    ok = sims.min() > args.cos_threshold
    if args.engines:
        grades = _retrieval_agreement(
            np.stack(ours_all), np.stack(ref_all), args.engines,
            args.recall_k)
        for engine, (r1, overlap) in grades.items():
            k = min(args.recall_k, len(sims))
            print(f"engine {engine}: R@1(identity)={r1:.4f} "
                  f"top-{k} overlap vs exact={overlap:.4f}")
        # exact + pruned exits must put the matching row first; compressed
        # exits (pq/ivf_pq on tiny codebooks) are graded on overlap
        ok &= all(r1 == 1.0 for e, (r1, _) in grades.items()
                  if e in ("device", "ivf"))
    print("PARITY OK" if ok else "PARITY DIVERGENCE (check checkpoint/pipeline)")
    return 0 if ok else 2


if __name__ == "__main__":
    raise SystemExit(main())
