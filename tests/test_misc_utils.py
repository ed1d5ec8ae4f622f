"""gp pipeline, device augmentations, image utils, LSeg gate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anyloc_tpu.config import PipelineArgs
from anyloc_tpu.data.augment import color_jitter, random_resized_crop
from anyloc_tpu.data.synthetic import build_gardens
from anyloc_tpu.pipelines import DescriptorEngine
from anyloc_tpu.pipelines.gp_pipeline import run_gp_pipeline
from anyloc_tpu.utils.images import pad_img, to_np, to_pil_list


def test_gp_pipeline(tmp_path):
    root = build_gardens(str(tmp_path), n_db=8, n_q=4, size=(70, 70))
    largs = PipelineArgs()
    largs.prog.data_vg_dir = root
    largs.prog.vg_dataset_name = "gardens"
    largs.bd_args.resize = (70, 70)
    largs.extractor.model_type = "dinov2_vits14"
    largs.extractor.desc_layer = 3
    largs.extractor.dtype = "float32"
    largs.extractor.batch_size = 4
    largs.top_k_vals = [1, 3]
    engine = DescriptorEngine("dinov2_vits14", 3, "value", dtype="float32",
                              batch_size=4)
    for pooling in ("max", "avg"):
        results = run_gp_pipeline(largs, engine=engine, pooling=pooling,
                                  verbose=False)
        assert results["Agg-Method"] == f"GP-{pooling}"
        assert results["R@1"] >= 0.5


def test_color_jitter(rng):
    imgs = jnp.asarray(rng.random((3, 16, 16, 3)).astype(np.float32))
    out = color_jitter(jax.random.PRNGKey(0), imgs)
    assert out.shape == imgs.shape
    # different keys give different outputs; same key deterministic
    out2 = color_jitter(jax.random.PRNGKey(0), imgs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))
    out3 = color_jitter(jax.random.PRNGKey(1), imgs)
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 1e-4
    # zero-strength jitter is identity
    ident = color_jitter(jax.random.PRNGKey(0), imgs, brightness=0.0,
                         contrast=0.0, saturation=0.0, hue=0.0)
    np.testing.assert_allclose(np.asarray(ident), np.asarray(imgs), atol=1e-6)


def test_random_resized_crop(rng):
    imgs = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    out = random_resized_crop(jax.random.PRNGKey(0), imgs, (16, 16))
    assert out.shape == (2, 16, 16, 3)
    # full-scale crop reproduces a bilinear resize of the whole image
    full = random_resized_crop(jax.random.PRNGKey(0), imgs, (32, 32),
                               scale=(1.0, 1.0))
    np.testing.assert_allclose(np.asarray(full), np.asarray(imgs), atol=1e-5)


def test_image_utils(rng):
    img = (rng.random((8, 10, 3)) * 255).astype(np.uint8)
    padded = pad_img(img, 2, color=(255, 0, 0))
    assert padded.shape == (12, 14, 3)
    assert tuple(padded[0, 0]) == (255, 0, 0)
    np.testing.assert_array_equal(padded[2:-2, 2:-2], img)

    pil = to_pil_list(rng.standard_normal((2, 3, 8, 8)).astype(np.float32))
    assert len(pil) == 2 and pil[0].size == (8, 8)
    arr = to_np(jnp.ones((2, 2)), ret_type=np.float32)
    assert arr.dtype == np.float32


def test_lseg_gate():
    from anyloc_tpu.models.factory import make_extractor

    with pytest.raises(NotImplementedError, match="LSeg"):
        make_extractor("lseg_vit_l16")
