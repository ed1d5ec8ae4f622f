"""Native image-loading pipeline (native/imagepipe.cpp) vs the PIL path.

The reference feeds every pipeline through PIL decode + torchvision Resize +
Normalize inside DataLoader workers (dvgl_benchmark/parser.py:60); here one
native call handles a whole batch. Tensor-mode resize must be float-exact
against transforms.load_image (the parity-critical path); the antialiased
mode tracks PIL within its uint8 between-pass rounding.
"""

import os

import numpy as np
import pytest
from PIL import Image

from anyloc_tpu import native

pytestmark = pytest.mark.skipif(
    not native.imagepipe_available(), reason="native imagepipe not built"
)

MEAN = [0.485, 0.456, 0.406]
STD = [0.229, 0.224, 0.225]


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = {}
    img = (rng.random((96, 128, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(d / "rgb.png")
    Image.fromarray(img).save(d / "rgb.jpg", quality=95)
    Image.fromarray(img[:, :, 0]).save(d / "gray.png")
    Image.fromarray(img).convert("P").save(d / "palette.png")
    paths["rgb_png"] = str(d / "rgb.png")
    paths["rgb_jpg"] = str(d / "rgb.jpg")
    paths["gray_png"] = str(d / "gray.png")
    paths["palette_png"] = str(d / "palette.png")
    paths["missing"] = str(d / "nope.jpg")
    return paths


def test_tensor_mode_matches_load_image(image_dir):
    """antialias=False must be float-exact vs the Python loader path."""
    from anyloc_tpu.data.transforms import load_image

    for key in ("rgb_png", "rgb_jpg", "gray_png", "palette_png"):
        out, ok = native.decode_batch(
            [image_dir[key]], (64, 80), MEAN, STD, antialias=False
        )
        assert ok.all()
        ref = load_image(image_dir[key], (64, 80))
        np.testing.assert_allclose(out[0], ref, atol=2e-5), key


def test_antialias_mode_tracks_pil(image_dir):
    """antialias=True reproduces PIL bilinear within its uint8 rounding."""
    out, ok = native.decode_batch(
        [image_dir["rgb_png"]], (64, 80), MEAN, STD, antialias=True
    )
    pil = Image.open(image_dir["rgb_png"]).resize((80, 64), Image.BILINEAR)
    ref = (np.asarray(pil, np.float32) / 255.0 - MEAN) / STD
    # PIL rounds to uint8 between the two resize passes; ours is full f32
    assert np.abs(out[0] - ref).max() < 1.5 / 255.0 / min(STD)


def test_failed_files_flagged_not_raised(image_dir):
    paths = [image_dir["rgb_png"], image_dir["missing"], image_dir["rgb_jpg"]]
    out, ok = native.decode_batch(paths, (32, 32), MEAN, STD)
    assert ok.tolist() == [True, False, True]
    assert np.all(out[1] == 0)


def test_dataset_batches_native_equals_pil(image_dir):
    """VPRDataset.batches through the native loader == per-image PIL path."""
    from anyloc_tpu.data.base import VPRDataset

    paths = [image_dir["rgb_png"], image_dir["rgb_jpg"], image_dir["gray_png"]]
    ds_native = VPRDataset(paths, paths[:1], img_size=(48, 56))
    ds_pil = VPRDataset(paths, paths[:1], img_size=(48, 56))
    ds_pil.use_native_loader = False
    got = [b for b, _ in ds_native.batches(2, which="all")]
    want = [b for b, _ in ds_pil.batches(2, which="all")]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=2e-5)


def test_dataset_batches_native_missing_file_raises(image_dir):
    from anyloc_tpu.data.base import VPRDataset

    ds = VPRDataset([image_dir["rgb_png"], image_dir["missing"]], [],
                    img_size=(32, 32))
    with pytest.raises(Exception):
        list(ds.batches(2, which="all"))


def test_dataset_batches_falls_back_to_pil_for_unknown_formats(image_dir, tmp_path):
    """Formats the native pipe can't decode (e.g. BMP) must load through
    the per-image PIL path instead of failing the whole batch."""
    from anyloc_tpu.data.base import VPRDataset

    rng = np.random.default_rng(1)
    img = (rng.random((40, 50, 3)) * 255).astype(np.uint8)
    bmp = str(tmp_path / "img.bmp")
    Image.fromarray(img).save(bmp)
    paths = [image_dir["rgb_png"], bmp]
    ds = VPRDataset(paths, [], img_size=(32, 32))
    ds_pil = VPRDataset(paths, [], img_size=(32, 32))
    ds_pil.use_native_loader = False
    (got, gi), = list(ds.batches(2, which="all"))
    (want, wi), = list(ds_pil.batches(2, which="all"))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_decode_image_matches_pil(image_dir):
    raw = native.decode_image(image_dir["rgb_jpg"])
    pil = np.asarray(Image.open(image_dir["rgb_jpg"]).convert("RGB"))
    assert raw.shape == pil.shape
    np.testing.assert_array_equal(raw, pil)   # same libjpeg IDCT -> bit-equal
    with pytest.raises(ValueError):
        native.decode_image(image_dir["missing"])


def test_decode_batch_u8_matches_python_u8(image_dir):
    """uint8 transfer format: native batch decode must match the PIL-path
    load_image_u8 exactly (same f32 resize, same rounding)."""
    from anyloc_tpu.data.transforms import load_image_u8

    for key in ("rgb_png", "rgb_jpg", "gray_png"):
        out, ok = native.decode_batch_u8([image_dir[key]], (64, 80))
        assert ok.all()
        ref = load_image_u8(image_dir[key], (64, 80))
        # resize accumulation order can differ by one ulp at exact-half
        # rounding boundaries
        assert np.abs(out[0].astype(int) - ref.astype(int)).max() <= 1, key


def test_decode_batch_u8_failure_mask(image_dir):
    out, ok = native.decode_batch_u8(
        [image_dir["rgb_png"], image_dir["missing"]], (32, 32)
    )
    assert ok.tolist() == [True, False]
    assert (out[1] == 0).all()


def test_u8_roundtrip_close_to_f32_pipeline(image_dir):
    """uint8 transfer + on-device normalize stays within the 8-bit rounding
    budget of the normalized f32 pipeline."""
    from anyloc_tpu.data.transforms import device_normalize, load_image

    out, ok = native.decode_batch_u8([image_dir["rgb_jpg"]], (64, 80))
    assert ok.all()
    normed = np.asarray(device_normalize(out[0]))
    ref = load_image(image_dir["rgb_jpg"], (64, 80))
    # 0.5/255 pre-norm -> <= 0.5/255/min(std) ~ 0.0088 post-norm
    assert np.abs(normed - ref).max() <= 0.009


def test_decode_bytes_u8_matches_daemon_pil_branch(image_dir):
    """The in-memory single-image entry (serve_http's per-request fast
    path): fixed-size and max-edge modes must match the daemon's PIL
    fallback branch (PIL decode -> tensor-mode resize -> rint to uint8)
    within 1 count of the rounding-convention difference."""
    from anyloc_tpu.data.transforms import resize_tensor_bilinear

    for key in ("rgb_png", "rgb_jpg", "gray_png", "palette_png"):
        data = open(image_dir[key], "rb").read()
        ref_full = np.asarray(
            Image.open(image_dir[key]).convert("RGB"), np.float32)

        # fixed size (the daemon's --img-size mode)
        got = native.decode_bytes_u8(data, size_hw=(64, 80))
        assert got is not None and got.shape == (64, 80, 3), key
        want = np.clip(np.rint(resize_tensor_bilinear(
            ref_full, (64, 80))), 0, 255).astype(np.uint8)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1, key

        # max-edge mode with truncating scale (96x128 -> 48x64 at cap 64)
        got = native.decode_bytes_u8(data, max_edge=64)
        assert got is not None and got.shape == (48, 64, 3), key
        want = np.clip(np.rint(resize_tensor_bilinear(
            ref_full, (48, 64)))[: 48], 0, 255).astype(np.uint8)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1, key

        # pass-through: cap above the source keeps dims and raw bytes
        got = native.decode_bytes_u8(data, max_edge=256)
        assert got is not None and got.shape == (96, 128, 3), key

    # garbage bytes -> graceful None (daemon falls back to PIL's error)
    assert native.decode_bytes_u8(b"not an image", max_edge=64) is None


def test_serve_preprocess_native_matches_pil(image_dir, monkeypatch):
    """serve_http._preprocess (uint8 branch) produces the same array with
    the native fast path as with the PIL fallback forced."""
    import argparse

    from anyloc_tpu.pipelines import serve_http

    class _Stub:  # only what _preprocess touches
        def __init__(self, args):
            self.args = args

    args = argparse.Namespace(transfer_dtype="uint8", img_size=0,
                              max_img_size=64)
    stub = _Stub(args)
    data = open(image_dir["rgb_jpg"], "rb").read()
    got_native = serve_http._Service._preprocess(stub, data)
    from anyloc_tpu import native as nat

    monkeypatch.setattr(nat, "decode_bytes_u8",
                        lambda *a, **k: None)  # force the PIL fallback
    got_pil = serve_http._Service._preprocess(stub, data)
    assert got_native.shape == got_pil.shape
    assert np.abs(got_native.astype(int) - got_pil.astype(int)).max() <= 1
