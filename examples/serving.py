"""Production serving walkthrough: disk -> descriptors -> retrieval at speed.

Wires the framework's fast path end-to-end and reports per-stage timing:

  1. native threaded JPEG decode straight to resized uint8
     (native/imagepipe.cpp decode_batch_u8 — no f32 blow-up on the host);
  2. uint8 host->device transfer (1/4 the bytes of an f32 pipeline) with
     on-device ImageNet normalization inside the jitted forward;
  3. int8_full DINOv2 trunk (frozen-trunk W8A8; the whole transformer block
     is two fused Pallas kernels) -> layer-31 value facet;
  4. fused-VLAD aggregation ON-DEVICE in the same dispatch (the [B, N, D]
     patch tensor never leaves HBM; only the global descriptors come home);
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

        # vocabulary: extract with keep_on_device (no D2H — the descriptor
        # set feeds straight into device k-means), fit the VLAD vocab
        t0 = time.perf_counter()
        vocab = engine.extract_dataset(
            ds, which="db", sub_sample=4, verbose=False, keep_on_device=True
        )
        vlad = VLAD(num_clusters=args.clusters)
        vlad.fit(vocab.reshape(-1, vocab.shape[-1]))
        print(f"[vocab] fit VLAD-{args.clusters} on {vocab.shape[0]} images' "
              f"descriptors (device-resident) in {time.perf_counter() - t0:.2f}s")

        # steady state: decode -> uint8 H2D -> int8 trunk -> fused VLAD,
        # all in one dispatch per batch; only [B, C*D] vectors come home
        np_ = np.asarray(engine.extract_vlads_dataset(
            ds, vlad, "db", verbose=False))  # warm/compile
        t0 = time.perf_counter()
        db_vlads = np.asarray(engine.extract_vlads_dataset(
            ds, vlad, "db", verbose=False))
        dt = time.perf_counter() - t0
        print(f"[serve] {len(db_vlads)} images disk->VLAD descriptors "
              f"(dim {db_vlads.shape[1]}) in {dt:.2f}s  "
              f"({len(db_vlads) / dt:.1f} img/s end-to-end, single chip)")

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
