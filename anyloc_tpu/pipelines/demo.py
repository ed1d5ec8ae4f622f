"""End-user demo — the reference's ``demo/anyloc_vlad_generate.py`` ported to
the TPU engine: load a cached domain vocabulary, extract DINOv2 facet
descriptors for a directory of images (longest edge capped, center-cropped to
the patch grid), aggregate with VLAD, write one ``.npy`` per image.

Vocabulary cache layout matches the reference
(demo/anyloc_vlad_generate.py:140-145):
``<cache>/vocabulary/<model>/l<layer>_<facet>_c<clusters>/<domain>/c_centers.*``
— ``.npz`` (ours) or ``.pt`` (reference-exported, loaded via torch).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from anyloc_tpu.data.base import natsorted


def vocab_dir(cache_dir: str, model: str, layer: int, facet: str,
              n_clusters: int, domain: str) -> str:
    return os.path.join(
        cache_dir, "vocabulary", model, f"l{layer}_{facet}_c{n_clusters}", domain
    )


def processed_shape(w: int, h: int, max_edge: int, multiple: int = 14):
    """Predict ``preprocess_image``'s output (H, W) from the source size
    alone (PIL reads the size from the header without decoding) — the key
    that buckets same-shape images into one batched trunk dispatch."""
    if max(w, h) > max_edge:
        scale = max_edge / max(w, h)
        w, h = int(round(w * scale)), int(round(h * scale))
    return (h // multiple) * multiple, (w // multiple) * multiple


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--in-dir", required=True, help="directory of images")
    p.add_argument("--out-dir", default=None, help="output dir (default: in-dir)")
    p.add_argument("--domain", default="indoor",
                   choices=["aerial", "indoor", "urban", "auto"],
                   help="'auto' routes each image to the GeM-nearest domain "
                        "among every cached vocabulary (the HF space's "
                        "domain projector made automatic, "
                        "hf_imgs_vlad_clusters.py:257-356); requires "
                        "<vocab-root>/gem_centroids.npz (build it once with "
                        "pipelines.demo.build_gem_centroids)")
    p.add_argument("--cache-dir", default="./cache")
    p.add_argument("--model", default="dinov2_vitg14")
    p.add_argument("--layer", type=int, default=31)
    p.add_argument("--facet", default="value")
    p.add_argument("--num-clusters", type=int, default=32)
    p.add_argument("--max-img-size", type=int, default=1024)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--quant", default=None,
                   choices=["int8", "int8_fused", "int8_full"],
                   help="int8 trunk mode; int8_fused is the measured optimum "
                        "at demo resolutions (docs/PERFORMANCE.md long-N)")
    p.add_argument("--first-n", type=int, default=None)
    p.add_argument("--batch", type=int, default=0,
                   help="images per trunk dispatch: same-shape images bucket "
                        "into one batched call (the reference demo loops "
                        "batch-1, anyloc_vlad_generate.py:160-188). 0 = "
                        "auto per bucket by token count — measured: +41%% "
                        "at 448 px (1.1k tokens, b4) but flat-to-negative "
                        "at the 1022 px long-N shape (5.3k tokens, one "
                        "image already saturates the MXU), docs/"
                        "PERFORMANCE.md demo-path numbers")
    args = p.parse_args(argv)

    import jax.numpy as jnp
    from PIL import Image

    from anyloc_tpu.data.transforms import preprocess_image
    from anyloc_tpu.models.extractor import DinoV2ExtractFeatures
    from anyloc_tpu.ops.vlad import VLAD

    if args.domain == "auto":
        root = os.path.dirname(vocab_dir(
            args.cache_dir, args.model, args.layer, args.facet,
            args.num_clusters, "x"))
        domains = sorted(
            d for d in (os.listdir(root) if os.path.isdir(root) else [])
            if glob.glob(os.path.join(root, d, "c_centers.*"))
        )
        if not domains:
            raise FileNotFoundError(f"no cached domain vocabularies in {root}")
        vlads = {}
        for d in domains:
            v = VLAD(args.num_clusters, cache_dir=os.path.join(root, d))
            v.fit(None)
            vlads[d] = v
        cents_path = os.path.join(root, "gem_centroids.npz")
        if not os.path.exists(cents_path):
            # routing compares GeM image descriptors; VLAD centers live in a
            # different statistic (signed, near-zero-mean) — there is no
            # honest fallback, so require the real centroid file
            raise FileNotFoundError(
                f"--domain auto needs {cents_path}; build it once from "
                "representative map images with "
                "anyloc_tpu.pipelines.demo.build_gem_centroids")
        z = np.load(cents_path)
        stale = [d for d in domains if d not in z.files]
        if stale:
            raise KeyError(
                f"gem_centroids.npz has no centroid for cached domain(s) "
                f"{stale}; rebuild it with build_gem_centroids")
        centroids = np.stack([z[d] for d in domains])
        dim = next(iter(vlads.values())).desc_dim
        if dim is not None and centroids.shape[1] != dim:
            raise ValueError(
                f"gem_centroids dim {centroids.shape[1]} != the "
                f"vocabulary's descriptor dim {dim} — built with a "
                "different trunk?")
        print(f"auto-domain over {domains}; centroids: {cents_path}")
    else:
        vdir = vocab_dir(args.cache_dir, args.model, args.layer, args.facet,
                         args.num_clusters, args.domain)
        vlad = VLAD(args.num_clusters, cache_dir=vdir)
        vlad.fit(None)  # load-only (raises if no cached vocabulary)
        print(f"Loaded vocabulary: {vdir}")

    extractor = DinoV2ExtractFeatures(
        args.model, args.layer, args.facet, checkpoint=args.checkpoint,
        quant=args.quant,
    )
    out_dir = args.out_dir or args.in_dir
    os.makedirs(out_dir, exist_ok=True)
    paths = natsorted(
        [p for ext in ("*.jpg", "*.jpeg", "*.png")
         for p in glob.glob(os.path.join(args.in_dir, ext))]
    )
    if args.first_n:
        paths = paths[: args.first_n]
    print(f"{len(paths)} images")

    # Bucket same-shape images (predicted from the header, no decode) so a
    # directory of uniform-resolution photos runs as batched dispatches —
    # batch-1 demo throughput is dispatch/bubble-bound (docs/PERFORMANCE.md
    # demo-path block: B2 is ~2x the B1 rate per image).
    buckets: dict = {}
    for path in paths:
        with Image.open(path) as im:
            w, h = im.size
        shape = processed_shape(w, h, args.max_img_size)
        if shape[0] < 14 or shape[1] < 14:
            print(f"{os.path.basename(path)}: skipped — {h}x{w} px "
                  f"preprocesses to {shape[0]}x{shape[1]} (< one 14-px "
                  f"patch; extreme aspect ratio or tiny source)")
            continue
        buckets.setdefault(shape, []).append(path)

    for shape, bpaths in buckets.items():
        if args.batch > 0:
            bsz = args.batch
        else:
            # auto: ~4k token-rows per dispatch — the measured crossover
            # (1.1k tokens: b4 is +41%; 5.3k tokens: batch-1 already
            # saturates and batching is flat-to-negative)
            tokens = max(1, (shape[0] // 14) * (shape[1] // 14))
            bsz = max(1, min(16, round(4096 / tokens)))
        for i in range(0, len(bpaths), bsz):
            chunk = bpaths[i: i + bsz]
            arrs = np.stack([
                preprocess_image(Image.open(p).convert("RGB"),
                                 max_edge=args.max_img_size, crop_multiple=14)
                for p in chunk
            ])
            descs = extractor(jnp.asarray(arrs))
            picked = [""] * len(chunk)
            if args.domain == "auto":
                from anyloc_tpu.parallel.ep import route_by_domain

                routes = np.asarray(
                    route_by_domain(descs, jnp.asarray(centroids)))
                gds = np.empty(
                    (len(chunk), args.num_clusters * descs.shape[-1]),
                    np.float32)
                for d_idx in np.unique(routes):
                    sel = np.nonzero(routes == d_idx)[0]
                    dname = domains[int(d_idx)]
                    gds[sel] = np.asarray(
                        vlads[dname].aggregate(descs[jnp.asarray(sel)]))
                    for s in sel:
                        picked[int(s)] = f" [{dname}]"
            else:
                # aggregate on device — at demo resolution the patch tensor
                # is ~33 MB/image (5.3k tokens x 1536 f32); only the
                # 49152-dim global descriptors cross the link
                gds = np.asarray(vlad.aggregate(descs))
            for j, path in enumerate(chunk):
                out = os.path.join(
                    out_dir,
                    os.path.splitext(os.path.basename(path))[0] + ".npy")
                np.save(out, gds[j])
                print(f"{os.path.basename(path)} -> {out} "
                      f"({gds[j].shape[0]}-dim){picked[j]}")
    return 0



def build_gem_centroids(extractor, domain_images, out_path: str,
                        max_edge: int = 448) -> dict:
    """Build ``gem_centroids.npz`` for ``--domain auto``: per domain, the
    mean GeM descriptor over representative (database/map) images — the
    functional analogue of the HF space's cached per-dataset GeM projections
    (hf_imgs_vlad_clusters.py:257-356).

    ``domain_images``: {domain: [image paths]}. Returns {domain: [D]}.
    """
    import jax.numpy as jnp
    from PIL import Image

    from anyloc_tpu.data.transforms import preprocess_image
    from anyloc_tpu.ops.gem import gem_pool

    cents = {}
    for domain, paths in domain_images.items():
        gems = []
        for path in paths:
            arr = preprocess_image(Image.open(path).convert("RGB"),
                                   max_edge=max_edge, crop_multiple=14)
            descs = extractor(jnp.asarray(arr[None]))
            gems.append(np.asarray(gem_pool(descs, use_abs=True))[0])
        cents[domain] = np.mean(gems, axis=0)
    np.savez(out_path, **cents)
    return cents


if __name__ == "__main__":
    raise SystemExit(main())
