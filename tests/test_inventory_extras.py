"""Tests for the inventory long tail: CCT, eval CLI, downloaders registry,
viz CLI, ablation plots."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_cct_shapes(rng):
    from anyloc_tpu.models.cct import CCT, CCTConfig

    cfg = CCTConfig(img_size=64, embed_dim=32, n_conv_layers=2,
                    kernel_size=3, depth=2, num_heads=4)
    model = CCT(cfg)
    imgs = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), imgs)
    pooled = model.apply(v, imgs)
    assert pooled.shape == (1, 32)
    tokens = model.apply(v, imgs, return_tokens=True)
    assert tokens.ndim == 3 and tokens.shape[-1] == 32
    # truncation executes fewer blocks but same tokenizer
    cfg_t = CCTConfig(img_size=64, embed_dim=32, n_conv_layers=2,
                      kernel_size=3, depth=2, num_heads=4, truncate_at=1)
    t2 = CCT(cfg_t).apply(v, imgs, return_tokens=True)
    assert t2.shape == tokens.shape


def test_eval_cli_random_weights(tmp_path, rng):
    from anyloc_tpu.data.synthetic import build_gardens
    from anyloc_tpu.training.eval_cli import main

    root = build_gardens(str(tmp_path), n_db=6, n_q=3, size=(64, 64))
    rc = main([
        "--backbone", "resnet18conv4", "--aggregation", "gem",
        "--dataset", "gardens", "--datasets-folder", root,
        "--resize", "64", "64", "--recall-values", "1", "3",
        "--batch-size", "3",
    ])
    assert rc == 0


def test_downloaders_registry():
    from anyloc_tpu.data.downloaders import RECIPES, download_dataset

    assert {"st_lucia", "nordland", "eynsham"} <= set(RECIPES)
    with pytest.raises(RuntimeError):
        download_dataset("pitts30k", "/tmp/nowhere")  # no-URL recipe


def test_viz_cli_clusters(tmp_path, rng):
    """Drive the gradio-replacement cluster overlay end-to-end with a tiny
    model + seeded vocabulary."""
    from PIL import Image

    from anyloc_tpu.pipelines.viz_cli import main

    in_dir = tmp_path / "imgs"
    in_dir.mkdir()
    for i in range(2):
        Image.fromarray(
            (rng.random((70, 70, 3)) * 255).astype(np.uint8)
        ).save(in_dir / f"im{i}.jpg")
    vdir = tmp_path / "cache" / "vocabulary" / "dinov2_vits14" / "l3_value_c4" / "indoor"
    os.makedirs(vdir)
    np.savez(vdir / "c_centers.npz",
             centers=rng.standard_normal((4, 384)).astype(np.float32))
    out_dir = tmp_path / "viz"
    rc = main([
        "clusters", "--in-dir", str(in_dir), "--out-dir", str(out_dir),
        "--cache-dir", str(tmp_path / "cache"), "--domain", "indoor",
        "--model", "dinov2_vits14", "--layer", "3", "--facet", "value",
        "--num-clusters", "4", "--max-img-size", "70",
    ])
    assert rc == 0
    outs = list(out_dir.glob("*_clusters.png"))
    assert len(outs) == 2


def test_ablation_plot(tmp_path):
    from anyloc_tpu.viz import ablation_plot

    csv1 = tmp_path / "a.csv"
    csv1.write_text("layer,R@1\n9,0.6\n11,0.7\n10,0.65\n")
    out = ablation_plot({"dinov2": str(csv1)}, "layer",
                        output_path=str(tmp_path / "abl.png"))
    assert os.path.exists(out)


def test_viz_cli_report(tmp_path, rng):
    """The app-surface artifact (gradio/HF-space replacement): one command,
    one self-contained interactive HTML with embedded overlays + domain
    scatter."""
    from PIL import Image

    from anyloc_tpu.pipelines.viz_cli import main

    in_dir = tmp_path / "imgs"
    in_dir.mkdir()
    for i in range(2):
        Image.fromarray(
            (rng.random((70, 84, 3)) * 255).astype(np.uint8)
        ).save(in_dir / f"im{i}.jpg")
    vdir = tmp_path / "cache" / "vocabulary" / "dinov2_vits14" / "l3_value_c4" / "indoor"
    os.makedirs(vdir)
    np.savez(vdir / "c_centers.npz",
             centers=rng.standard_normal((4, 384)).astype(np.float32))
    gem = {name: rng.standard_normal((5, 384)).astype(np.float32)
           for name in ("gardens", "Oxford", "VPAir")}
    np.savez(tmp_path / "gem.npz", **gem)
    out = tmp_path / "report.html"
    rc = main([
        "report", "--in-dir", str(in_dir), "--out", str(out),
        "--cache-dir", str(tmp_path / "cache"), "--domain", "indoor",
        "--model", "dinov2_vits14", "--layer", "3", "--facet", "value",
        "--num-clusters", "4", "--max-img-size", "70",
        "--gem-cache", str(tmp_path / "gem.npz"),
    ])
    assert rc == 0
    html = out.read_text()
    assert html.count('<canvas') == 2           # one overlay per image
    assert "viz-data" in html and "data:image/jpeg;base64," in html
    assert "Domain projection" in html and "<svg" in html
    import json as _json
    import re as _re

    data = _json.loads(
        _re.search(r'id="viz-data">(.*?)</script>', html, _re.S).group(1)
    )
    assert len(data["palette"]) == 4
    gh, gw = data["images"][0]["grid"]
    assert len(data["images"][0]["labels"]) == gh * gw
    assert all(0 <= v < 4 for v in data["images"][0]["labels"])


def test_eval_cli_pca_and_save_descs(tmp_path, rng):
    """dvgl parser parity: --pca-dim (+ required --pca-dataset-folder),
    --save-descs, cross-flag validation."""
    from PIL import Image

    from anyloc_tpu.data.synthetic import build_gardens
    from anyloc_tpu.training.eval_cli import main

    root = build_gardens(str(tmp_path), n_db=6, n_q=3, size=(64, 64))
    pca_dir = tmp_path / "pca_imgs"
    pca_dir.mkdir()
    for i in range(8):
        Image.fromarray(
            (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        ).save(pca_dir / f"p{i}.jpg")
    descs_path = tmp_path / "descs"
    rc = main([
        "--backbone", "resnet18conv4", "--aggregation", "gem",
        "--dataset", "gardens", "--datasets-folder", root,
        "--resize", "64", "64", "--recall-values", "1", "3",
        "--batch-size", "3", "--pca-dim", "4",
        "--pca-dataset-folder", str(pca_dir),
        "--save-descs", str(descs_path),
    ])
    assert rc == 0
    saved = np.load(f"{descs_path}.npy")
    assert saved.shape[0] == 9          # 6 db rows then 3 queries
    with pytest.raises(SystemExit):     # pca-dim without folder
        main(["--backbone", "resnet18conv4", "--dataset", "gardens",
              "--datasets-folder", root, "--pca-dim", "4"])


def test_eval_cli_mixvpr_and_cosplace_families(tmp_path, rng):
    """--model-family routes the MixVPR (mixer_top_k_vpr.py) and CosPlace
    (CosPlace/test.py) evaluation surfaces through the shared eval loop."""
    from anyloc_tpu.data.synthetic import build_gardens
    from anyloc_tpu.training.eval_cli import main

    root = build_gardens(str(tmp_path), n_db=6, n_q=3, size=(64, 64))
    rc = main([
        "--model-family", "mixvpr", "--mix-out-channels", "8",
        "--mix-out-rows", "2", "--mix-depth", "1",
        "--dataset", "gardens", "--datasets-folder", root,
        "--resize", "64", "64", "--recall-values", "1", "3",
        "--batch-size", "3",
    ])
    assert rc == 0
    rc = main([
        "--model-family", "cosplace", "--backbone", "resnet18",
        "--fc-output-dim", "16",
        "--dataset", "gardens", "--datasets-folder", root,
        "--resize", "64", "64", "--recall-values", "1", "3",
        "--batch-size", "3",
    ])
    assert rc == 0
    # vgg16 cosplace release layout is reachable through the same route
    rc = main([
        "--model-family", "cosplace", "--backbone", "vgg16",
        "--fc-output-dim", "16",
        "--dataset", "gardens", "--datasets-folder", root,
        "--resize", "64", "64", "--recall-values", "1", "3",
        "--batch-size", "3",
    ])
    assert rc == 0
