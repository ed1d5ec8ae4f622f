"""Production serving walkthrough: disk -> descriptors -> retrieval at speed.

Wires the framework's fast path end-to-end and reports per-stage timing:

  1. native threaded JPEG decode straight to resized uint8
     (native/imagepipe.cpp decode_batch_u8 — no f32 blow-up on the host);
  2. uint8 host->device transfer (1/4 the bytes of an f32 pipeline) with
     on-device ImageNet normalization inside the jitted forward;
  3. int8_full DINOv2 trunk (frozen-trunk W8A8; the whole transformer block
     is two fused Pallas kernels) -> layer-31 value facet;
  4. fused-VLAD aggregation -> 49152-dim global descriptors;
  5. exact top-k retrieval on-device.

Run:  python examples/serving.py [--n-images 256] [--model dinov2_vitg14]
(defaults to a small trunk + synthetic JPEGs so it runs anywhere; weights
are random — swap in --checkpoint for converted real weights.)
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_jpegs(root: str, n: int, size=(240, 320)) -> list:
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        img = (rng.random((size[0], size[1], 3)) * 255).astype(np.uint8)
        p = os.path.join(root, f"img_{i:05d}.jpg")
        Image.fromarray(img).save(p, quality=90)
        paths.append(p)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=128)
    ap.add_argument("--model", default="dinov2_vits14")
    ap.add_argument("--layer", type=int, default=11)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--clusters", type=int, default=32)
    args = ap.parse_args()

    import jax.numpy as jnp

    from anyloc_tpu import VLAD, get_top_k_recall, native
    from anyloc_tpu.data.base import VPRDataset
    from anyloc_tpu.pipelines.engine import DescriptorEngine

    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        paths = make_jpegs(root, args.n_images)
        print(f"[setup] {args.n_images} synthetic JPEGs in "
              f"{time.perf_counter() - t0:.1f}s")

        ds = VPRDataset(paths, [], img_size=(args.img_size, args.img_size))
        engine = DescriptorEngine(
            args.model, args.layer, "value",
            checkpoint=args.checkpoint, batch_size=args.batch,
            quant="int8_full", transfer_dtype="uint8",
        )
        print(f"[engine] {args.model} l{args.layer} value, int8_full trunk, "
              f"uint8 transfer, native decode="
              f"{'yes' if native.imagepipe_available() else 'PIL fallback'}")

        # warm (compile) on one batch, then measure the steady-state pipeline
        first = next(iter(ds.batches(args.batch, which="db", output="uint8")))
        engine.extract_batch(first[0])
        t0 = time.perf_counter()
        descs = engine.extract_dataset(ds, which="db", verbose=False)
        dt = time.perf_counter() - t0
        print(f"[extract] {len(descs)} images -> patch descriptors "
              f"{descs.shape} in {dt:.2f}s  ({len(descs) / dt:.1f} img/s "
              f"disk->descriptor, single chip)")

        flat = descs.reshape(-1, descs.shape[-1])
        vlad = VLAD(num_clusters=args.clusters)
        t0 = time.perf_counter()
        db_vlads = vlad.fit_and_generate(descs)
        print(f"[vlad] vocabulary fit + {len(descs)} global descriptors "
              f"(dim {db_vlads.shape[1]}) in {time.perf_counter() - t0:.2f}s")

        qu_vlads = db_vlads[: min(16, len(db_vlads))]
        gt = [np.array([i]) for i in range(len(qu_vlads))]
        t0 = time.perf_counter()
        _, idx, recalls = get_top_k_recall([1, 5], db_vlads, qu_vlads, gt)
        print(f"[retrieve] top-5 over {len(db_vlads)} db in "
              f"{time.perf_counter() - t0:.2f}s; self-retrieval "
              f"R@1={recalls[1]:.2f} (expect 1.0)")
        assert recalls[1] == 1.0


if __name__ == "__main__":
    main()
