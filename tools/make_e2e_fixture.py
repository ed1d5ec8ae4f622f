"""Generate the committed e2e golden fixture: real JPEG files with VPR
structure (queries are re-visits of database scenes under viewpoint /
illumination change).

No real photographs are reachable in this environment (zero egress), so the
scenes are procedurally synthesized — but they are saved as REAL JPEGs
(quality 88), so the fixture exercises the actual decode -> preprocess ->
trunk -> VLAD -> retrieval pipeline end-to-end, including JPEG compression
artifacts, exactly as the reference demo does with its CityCenter examples
(demo/anyloc_vlad_generate.py:160-188).

Layout (tests/fixtures/e2e/):
    db/000.jpg .. db/015.jpg        16 database scenes
    queries/000.jpg .. 007.jpg      8 queries; query j re-views db scene
                                    MATCHES[j] (small rotation-free affine
                                    crop + brightness/contrast + noise)
    gt.npy                          object array: positives per query

Deterministic (seeded); re-running reproduces the same bytes.
"""
import os
import pathlib
import sys

import numpy as np
from PIL import Image

H, W = 480, 640
N_DB, N_QU = 16, 8
MATCHES = [3, 11, 0, 6, 14, 5, 9, 12]   # db index each query re-visits
SEED = 20240817


def _texture(rng, h, w, scale):
    """Band-limited noise texture in [0, 1]."""
    small = rng.random((max(2, h // scale), max(2, w // scale)))
    img = np.asarray(
        Image.fromarray((small * 255).astype(np.uint8)).resize(
            (w, h), Image.BILINEAR
        ),
        np.float32,
    ) / 255.0
    return img


def make_scene(rng):
    """One 'place': sky gradient + textured ground + a skyline of textured
    blocks with windows + a few high-frequency details. [H+pad, W+pad, 3]
    float in [0,1] — generated oversized so queries can crop-shift."""
    ph, pw = H + 96, W + 128
    sky_top = rng.uniform(0.55, 0.9, 3)
    sky_bot = rng.uniform(0.35, 0.75, 3)
    t = np.linspace(0, 1, ph)[:, None, None]
    img = sky_top * (1 - t) + sky_bot * t
    img = np.broadcast_to(img, (ph, pw, 3)).copy()
    horizon = int(ph * rng.uniform(0.55, 0.75))
    ground = rng.uniform(0.15, 0.45, 3) * _texture(rng, ph - horizon, pw, 9)[..., None]
    img[horizon:] = 0.5 * img[horizon:] + 0.5 * ground
    # skyline blocks
    x = 0
    while x < pw - 40:
        bw = int(rng.uniform(60, 180))
        bh = int(rng.uniform(ph * 0.2, ph * 0.55))
        top = horizon - bh
        col = rng.uniform(0.2, 0.8, 3)
        tex = _texture(rng, bh, min(bw, pw - x), int(rng.uniform(4, 14)))
        img[top:horizon, x : x + bw] = (
            col * (0.6 + 0.4 * tex[..., None])
        )[: horizon - top, : pw - x]
        # windows
        if rng.random() < 0.8:
            wy = np.arange(top + 8, horizon - 8, int(rng.uniform(14, 26)))
            wx = np.arange(x + 6, min(x + bw, pw) - 6, int(rng.uniform(12, 22)))
            lit = rng.uniform(0.1, 1.0, (len(wy), len(wx)))
            for iy, yy in enumerate(wy):
                for ix, xx in enumerate(wx):
                    img[yy : yy + 6, xx : xx + 5] = lit[iy, ix]
        x += bw + int(rng.uniform(4, 30))
    # details: poles / markings
    for _ in range(int(rng.uniform(3, 9))):
        px = int(rng.uniform(0, pw - 4))
        top = int(rng.uniform(horizon - 60, horizon))
        img[top : horizon + 40, px : px + 3] = rng.uniform(0.05, 0.3)
    img += rng.normal(0, 0.012, img.shape)
    return np.clip(img, 0, 1)


def query_view(scene, rng):
    """Re-view of a scene: shifted crop, mild scale, brightness/contrast
    jitter, sensor noise — the day-to-day variation a VPR query has."""
    ph, pw, _ = scene.shape
    # shifts stay modest so a RANDOM-weight test trunk can still solve the
    # fixture (R@1 = 1.0) — the tests then detect any cross-stack or
    # quantization-induced ranking change as a hard failure
    cy, cx = (ph - H) // 2, (pw - W) // 2
    dy = int(np.clip(cy + rng.integers(-14, 15), 0, ph - H))
    dx = int(np.clip(cx + rng.integers(-18, 19), 0, pw - W))
    crop = scene[dy : dy + H, dx : dx + W]
    # photometric change stays small: a random-weight trunk has no learned
    # illumination invariance, and the fixture must stay solvable by it
    gain = rng.uniform(0.97, 1.03)
    bias = rng.uniform(-0.015, 0.015)
    out = np.clip(crop * gain + bias + rng.normal(0, 0.008, crop.shape), 0, 1)
    return out


def _oracle_vlad_fn():
    """The e2e test's torch oracle (same seed/config as
    tests/test_e2e_oracle.py), used to certify that every query view is
    solvable with a comfortable margin BEFORE it is committed — margins on
    the actual JPEG bytes keep the test robust to decoder differences."""
    repo = pathlib.Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "tests"))
    import torch
    from oracles import (TorchMiniDino, center_crop_multiple_t, hooked_facet,
                         preprocess_reference, vlad_reference)

    torch.manual_seed(7)
    tm = TorchMiniDino(img_size=56, patch=14, d=64, depth=4, heads=4).eval()
    with torch.no_grad():
        for p in tm.parameters():
            if p.ndim >= 2:
                p.add_(0.02 * torch.randn_like(p))

    state = {}

    def img_descs(pil):
        t = center_crop_multiple_t(preprocess_reference(pil, (160, 160)), 14)
        return hooked_facet(tm, t[None], 2, "value")[0]

    def vlad_of(pil):
        d = img_descs(pil)
        if "centers" not in state:
            raise RuntimeError("set centers first")
        return vlad_reference(d, state["centers"]).numpy()

    return img_descs, vlad_of, state


def _jpeg_roundtrip(arr):
    import io

    buf = io.BytesIO()
    Image.fromarray((arr * 255).astype(np.uint8)).save(
        buf, format="JPEG", quality=88
    )
    buf.seek(0)
    return Image.open(buf)


def main(out_dir=None):
    import torch

    root = pathlib.Path(out_dir or pathlib.Path(__file__).resolve().parent.parent
                        / "tests" / "fixtures" / "e2e")
    (root / "db").mkdir(parents=True, exist_ok=True)
    (root / "queries").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(SEED)
    scenes = [make_scene(rng) for _ in range(N_DB)]
    for i, sc in enumerate(scenes):
        center = sc[48 : 48 + H, 64 : 64 + W]
        Image.fromarray((center * 255).astype(np.uint8)).save(
            root / "db" / f"{i:03d}.jpg", quality=88
        )
    # certify query solvability under the test oracle (margin >= 0.04)
    img_descs, vlad_of, state = _oracle_vlad_fn()
    db_descs = [img_descs(Image.open(root / "db" / f"{i:03d}.jpg"))
                for i in range(N_DB)]
    state["centers"] = torch.stack(db_descs)[::2, 7, :][:8].clone()
    db_vlads = np.stack([vlad_of(Image.open(root / "db" / f"{i:03d}.jpg"))
                         for i in range(N_DB)])
    for j, m in enumerate(MATCHES):
        chosen = None
        for t in range(12):
            qrng = np.random.default_rng(SEED + 1000 + j + 100000 * t)
            qv = query_view(scenes[m], qrng)
            sims = vlad_of(_jpeg_roundtrip(qv)) @ db_vlads.T
            order = np.argsort(-sims)
            margin = sims[m] - max(s for i, s in enumerate(sims) if i != m)
            if order[0] == m and margin >= 0.04:
                chosen = qv
                break
        assert chosen is not None, f"no solvable view found for query {j}"
        Image.fromarray((chosen * 255).astype(np.uint8)).save(
            root / "queries" / f"{j:03d}.jpg", quality=88
        )
    gt = np.empty(N_QU, object)
    for j, m in enumerate(MATCHES):
        gt[j] = np.array([m])
    np.save(root / "gt.npy", gt, allow_pickle=True)
    print(f"fixture written to {root}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
