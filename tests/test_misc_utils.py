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


def test_factory_unknown_family():
    """LSeg lost its NotImplementedError gate (it is a real family now —
    models/lseg.py, routed + numerically tested in tests/test_lseg.py);
    unknown names still fail loudly."""
    from anyloc_tpu.models.factory import make_extractor

    with pytest.raises(KeyError, match="Unknown model family"):
        make_extractor("not_a_family")


def test_resize_tensor_bilinear_matches_torch():
    """Tensor-mode resize parity: torch F.interpolate bilinear
    (align_corners=False, antialias=False) is what the reference's
    ToTensor->Normalize->Resize pipeline runs."""
    torch = pytest.importorskip("torch")
    from anyloc_tpu.data.transforms import resize_tensor_bilinear

    rng = np.random.default_rng(0)
    arr = rng.standard_normal((37, 53, 3)).astype(np.float32)
    for out_hw in ((20, 20), (64, 48)):
        ours = resize_tensor_bilinear(arr, out_hw)
        t = torch.from_numpy(arr.transpose(2, 0, 1))[None]
        expect = torch.nn.functional.interpolate(
            t, size=out_hw, mode="bilinear", align_corners=False,
            antialias=False,
        )[0].numpy().transpose(1, 2, 0)
        np.testing.assert_allclose(ours, expect, atol=3e-5)


def test_netvlad_init_matches_dvgl_semantics(rng):
    """alpha from normalized-centroid dots; assign kernel = alpha * cnorm."""
    import jax

    from anyloc_tpu.training.aggregators import NetVLAD

    descs = rng.standard_normal((300, 16)).astype(np.float32)
    descs /= np.linalg.norm(descs, axis=1, keepdims=True)
    head = NetVLAD(num_clusters=4, dim=16)
    params = head.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)))
    newp = NetVLAD.init_from_descriptors(params, descs)["params"]
    centers = np.asarray(newp["centroids"])
    kernel = np.asarray(newp["assign"]["kernel"])  # [D, C]
    cnorm = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    dots = np.sort(cnorm @ descs.T, axis=0)[::-1]
    alpha = -np.log(0.01) / np.mean(dots[0] - dots[1] + 1e-9)
    np.testing.assert_allclose(kernel, (alpha * cnorm).T, rtol=1e-5)


def test_triplet_step_freezes_batch_stats(rng):
    """BN running statistics must not receive optimizer updates."""
    import jax
    import optax

    from anyloc_tpu.training.network import GeoLocalizationNet
    from anyloc_tpu.training.triplet import make_triplet_train_step

    model = GeoLocalizationNet(backbone="resnet18conv4", aggregation="gem")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    step = make_triplet_train_step(
        lambda v, im: model.apply(v, im), optax.sgd(1.0), neg_num=2
    )
    state = step.init_state(variables)
    tuples = jnp.asarray(
        rng.standard_normal((2, 4, 64, 64, 3)).astype(np.float32)
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    state, _ = step(state, tuples)
    after = jax.tree_util.tree_leaves(state.params["batch_stats"])
    for b, a in zip(before, after):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    # params DID change
    p0 = np.asarray(
        jax.tree_util.tree_leaves(variables["params"])[0]
    )
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params["params"])[0])
    assert np.abs(p0 - p1).max() > 0


def test_openclip_name_canonicalization():
    from anyloc_tpu.models import clip as C

    C._VISION.setdefault("ViT-Tiny/16", (16, 32, 2, 4, 16, 32))
    C._TEXT.setdefault("ViT-Tiny/16", (77, 1000, 16, 4, 2))
    m = C.ClipWrapper(C.ClipWrapper.IMPL_OPEN_CLIP, "ViT-Tiny-16",
                      use_caching=False)
    assert m.vcfg.embed_dim == 32


def test_antialias_bicubic_matrix_matches_torch():
    torch = pytest.importorskip("torch")
    from anyloc_tpu.models.vit import _torch_bicubic_matrix

    rng = np.random.default_rng(0)
    src, dst = 24, 9  # downscale: antialias changes values
    x = rng.standard_normal((1, 1, src, src)).astype(np.float32)
    for aa in (False, True):
        m = _torch_bicubic_matrix(src, dst, antialias=aa)
        ours = np.einsum("hs,swc->hwc", m,
                         np.einsum("sw,tw->swt", x[0, 0], m)[..., None]
                         )[..., 0] if False else m @ x[0, 0] @ m.T
        expect = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=(dst, dst), mode="bicubic",
            align_corners=False, antialias=aa,
        )[0, 0].numpy()
        np.testing.assert_allclose(ours, expect, atol=2e-5, err_msg=f"aa={aa}")


def test_sam_registry_kwargs():
    import jax.numpy as _jnp

    from anyloc_tpu.models import registry

    cfg = registry.get("sam_vit_b").config(dtype=_jnp.bfloat16)
    assert cfg.dtype == _jnp.bfloat16
