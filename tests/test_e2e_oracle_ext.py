"""E2E oracle coverage beyond VLAD: the GeM and CLS (global-VPR) pipelines
and the demo-path preprocessing (max-edge resize + patch-multiple crop),
each run end-to-end over the committed JPEG fixture on BOTH stacks.

Extends tests/test_e2e_oracle.py (which covers the SOTA VLAD route): same
torch reference oracle, different aggregation/preprocessing semantics —
GeM (dino_v2_gem.py:170-190 p-mean), CLS global descriptor
(dino_v2_global_vpr.py:119-131), and the demo resize chain
(demo/anyloc_vlad_generate.py:165-181).
"""
import pathlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as tF

from oracles import (
    TorchMiniDino,
    center_crop_multiple_t,
    hooked_facet,
    preprocess_reference,
    top_k_recall_reference,
)
from test_e2e_oracle import FIXTURE, RESIZE, LAYER, _cosine_rows, _model_pair

import jax.numpy as jnp

from anyloc_tpu.data.base import VPRDataset, listdir_abs
from anyloc_tpu.models.extractor import ViTFacetExtractor
from anyloc_tpu.ops.retrieval import get_top_k_recall


@pytest.fixture(scope="module")
def paths():
    db = listdir_abs(str(FIXTURE), "db")
    qu = listdir_abs(str(FIXTURE), "queries")
    gt = list(np.load(FIXTURE / "gt.npy", allow_pickle=True))
    return db, qu, gt


@pytest.fixture(scope="module")
def oracle_imgs(paths):
    from PIL import Image

    db, qu, _ = paths
    return torch.stack([
        center_crop_multiple_t(preprocess_reference(Image.open(p), RESIZE), 14)
        for p in db + qu
    ])


def test_e2e_gem_matches_oracle(paths, oracle_imgs):
    """GeM route: p-mean over patch descriptors + L2 (the reference's
    get_gem_descriptors), jointly through decode/preprocess/trunk."""
    from anyloc_tpu.ops.gem import gem_pool
    from anyloc_tpu.pipelines.engine import DescriptorEngine

    db, qu, gt = paths
    tm, cfg, params = _model_pair()
    descs = hooked_facet(tm, oracle_imgs, LAYER, "value")
    x = (descs ** 3).mean(dim=1)              # p=3 over the patch axis
    g = x.sign() * x.abs() ** (1 / 3)          # signed complex-pow variant
    want = tF.normalize(g, dim=-1).numpy()

    ds = VPRDataset(db, qu, soft_positives_per_query=gt, img_size=RESIZE)
    ext = ViTFacetExtractor(cfg, params, LAYER, "value")
    eng = DescriptorEngine(model_type="mini", desc_layer=LAYER,
                           desc_facet="value", batch_size=8, extractor=ext)
    got = eng.extract_aggregated_dataset(
        ds, lambda d: _l2(gem_pool(d, p=3.0)), "gem3", which="all",
        verbose=False,
    )
    cos = _cosine_rows(got, want)
    assert cos.min() > 0.999, cos.min()
    _, idx, recalls = get_top_k_recall([1], got[: len(db)], got[len(db):], gt)
    _, orec = top_k_recall_reference([1], want[: len(db)], want[len(db):], gt)
    assert recalls[1] == orec[1]


def _l2(x):
    import jax.numpy as jnp

    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, 1e-12)


def test_e2e_cls_global_vpr_matches_oracle(paths, oracle_imgs):
    """CLS-token global descriptor (dino_v2_global_vpr.py extract_gd):
    the trunk-final CLS, L2-normalized."""
    db, qu, gt = paths
    tm, cfg, params = _model_pair()
    with torch.no_grad():
        out = tm(oracle_imgs)                 # full forward + final norm
    want = tF.normalize(out[:, 0], dim=-1).numpy()

    from anyloc_tpu.models.vit import ViT

    model = ViT(cfg)
    got = []
    for p in db + qu:
        from PIL import Image

        from anyloc_tpu.data.transforms import (
            center_crop_multiple, load_image)

        arr = center_crop_multiple(load_image(p, RESIZE), 14)
        o = model.apply(params, jnp.asarray(arr[None]))
        got.append(np.asarray(_l2(o["cls"]))[0])
    got = np.stack(got)
    cos = _cosine_rows(got, want)
    assert cos.min() > 0.999, cos.min()


def test_e2e_demo_path_resize_matches_oracle(paths):
    """The demo preprocessing chain (max-edge cap -> CenterCrop(14k),
    demo/anyloc_vlad_generate.py:165-181) against the oracle's torch
    equivalent, through the trunk."""
    from PIL import Image

    from anyloc_tpu.data.transforms import preprocess_image

    db, _, _ = paths
    tm, cfg, params = _model_pair()
    path = db[0]                       # 640x480 -> capped to max edge 336
    pil = Image.open(path)

    # oracle: PIL bilinear max-edge resize (the demo resizes the PIL image,
    # not the tensor), then normalize + crop
    w, h = pil.size
    scale = 336 / max(w, h)
    pil_r = pil.resize((round(w * scale), round(h * scale)), Image.BILINEAR)
    arr = np.asarray(pil_r.convert("RGB"), np.float32) / 255.0
    arr = (arr - np.array([0.485, 0.456, 0.406], np.float32)) / np.array(
        [0.229, 0.224, 0.225], np.float32)
    t = torch.from_numpy(arr.transpose(2, 0, 1))[None]
    t = center_crop_multiple_t(t[0], 14)[None]
    want = hooked_facet(tm, t, LAYER, "value")[0].numpy()

    ours = preprocess_image(pil, max_edge=336, crop_multiple=14)
    assert ours.shape[:2] == tuple(t.shape[2:])
    ext = ViTFacetExtractor(cfg, params, LAYER, "value")
    got = np.asarray(ext(jnp.asarray(ours[None])))[0]
    cos = _cosine_rows(got, want)
    assert cos.min() > 0.999, cos.min()
