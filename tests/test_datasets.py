"""Dataset layer tests over synthetic miniature datasets in each on-disk
layout the reference supports."""

import numpy as np
import pytest

from anyloc_tpu.data import get_dataset, natsorted
from anyloc_tpu.data.loaders.global_vocab import GlobalVocabDataset
from anyloc_tpu.data.synthetic import (
    build_aerial,
    build_baidu,
    build_gardens,
    build_pose_split,
    build_vg_bench,
    build_vpr_bench,
)
from anyloc_tpu.data.transforms import center_crop_multiple, load_image


def test_natsorted():
    assert natsorted(["img10.jpg", "img2.jpg", "img1.jpg"]) == [
        "img1.jpg", "img2.jpg", "img10.jpg",
    ]


def test_gardens_loader(tmp_path):
    root = build_gardens(str(tmp_path), n_db=8, n_q=4)
    ds = get_dataset("gardens", root, img_size=(64, 64))
    assert ds.database_num == 8 and ds.queries_num == 4
    assert len(ds) == 12
    img, idx = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.float32
    # GT planted: each query has exactly its source db index
    for i in range(4):
        assert len(ds.soft_positives_per_query[i]) == 1
    # relpath cache IDs at depth 2
    assert ds.get_image_relpaths(0).count("/") == 1


def test_hawkins_loader(tmp_path):
    root = build_pose_split(str(tmp_path), n_db=127, n_q=118)
    ds = get_dataset("hawkins_long_corridor", root, img_size=(64, 64))
    assert ds.database_num == 127 and ds.queries_num == 118
    # poses planted at 2m spacing: query at gt*2+0.5, radius 8 catches
    # gt and neighbors within 4 indices
    for i, pos in enumerate(ds.soft_positives_per_query):
        assert len(pos) >= 1


def test_vg_bench_loader(tmp_path):
    root = build_vg_bench(str(tmp_path), n_db=10, n_q=5)
    ds = get_dataset("pitts30k", root, split="test", img_size=(64, 64))
    assert ds.database_num == 10 and ds.queries_num == 5
    assert ds.database_utms.shape == (10, 2)
    # UTM planted: query g at db-east + 3m, radius 25 -> exactly {g}
    for i, pos in enumerate(ds.soft_positives_per_query):
        assert len(pos) == 1
    assert ds._imgs_level == 4


def test_vpr_bench_loader(tmp_path):
    root = build_vpr_bench(str(tmp_path), n_db=10, n_q=5)
    ds = get_dataset("17places", root, img_size=(64, 64))
    assert ds.vprbench and ds.database_num == 10 and ds.queries_num == 5
    for pos in ds.soft_positives_per_query:
        assert len(pos) == 1
    assert ds._imgs_level == 2


def test_aerial_loader(tmp_path):
    root = build_aerial(str(tmp_path), n_db=10, n_q=4)
    ds = get_dataset("Tartan_GNSS_test_rotated", root, img_size=(64, 64))
    assert ds.database_num == 10 and ds.queries_num == 4
    for pos in ds.soft_positives_per_query:
        assert len(pos) == 5  # top-5 CSV
    assert ds._imgs_level == 3


def test_baidu_loader(tmp_path):
    root = build_baidu(str(tmp_path), n_db=8, n_q=4)
    ds = get_dataset("baidu_datasets", root, img_size=(64, 64))
    assert ds.database_num == 8 and ds.queries_num == 4
    # db poses 30m apart, query 1m+2m off its gt, radius 10 -> exactly {gt}
    for pos in ds.soft_positives_per_query:
        assert len(pos) == 1
    assert hasattr(ds, "soft_positives_per_db")


def test_batches_iterator(tmp_path):
    root = build_gardens(str(tmp_path), n_db=8, n_q=4)
    ds = get_dataset("gardens", root, img_size=(64, 64))
    batches = list(ds.batches(3, which="db"))
    assert len(batches) == 3
    imgs, idx = batches[-1]
    assert imgs.shape == (3, 64, 64, 3)
    assert idx[-1] == -1  # padded entry marked
    all_idx = np.concatenate([b[1] for b in batches])
    assert set(all_idx[all_idx >= 0].tolist()) == set(range(8))


def test_global_vocab_dataset(tmp_path):
    root = str(tmp_path)
    build_gardens(root, n_db=8, n_q=4)
    build_pose_split(root, n_db=20, n_q=6)
    glob_ds = GlobalVocabDataset(
        ["gardens", "hawkins_long_corridor"], root,
        ss_list={"gardens": 1, "hawkins_long_corridor": 2},
        img_size=(64, 64),
    )
    assert glob_ds.database_num == 8 + 10
    assert glob_ds.db_stat == {"gardens": 8, "hawkins_long_corridor": 10}


def test_center_crop_multiple(tmp_path):
    root = build_gardens(str(tmp_path), n_db=1, n_q=1)
    img = load_image(
        f"{root}/gardens/day_right/img_000.jpg", (65, 93)
    )
    out = center_crop_multiple(img, 14)
    assert out.shape == (56, 84, 3)


def test_query_test_methods(tmp_path):
    root = build_vg_bench(str(tmp_path), n_db=4, n_q=2)
    from anyloc_tpu.data.loaders.base_dataset import BaseDataset

    for method, expect_shape in [
        ("central_crop", (64, 64, 3)),
        ("five_crops", (5, 64, 64, 3)),
    ]:
        ds = BaseDataset(root, "pitts30k", "test", img_size=(64, 64),
                         test_method=method)
        out, _ = ds[ds.database_num]  # first query
        assert out.shape == expect_shape, (method, out.shape)


def test_oxford_loader(tmp_path):
    from anyloc_tpu.data.synthetic import build_oxford

    root = build_oxford(str(tmp_path), n_db=6, n_q=3)
    ds = get_dataset("Oxford", root, img_size=(64, 64))
    assert ds.database_num == 6 and ds.queries_num == 3
    # db 30 m apart, query at gt+1 m, radius 25 -> exactly {gt}
    for pos in ds.soft_positives_per_query:
        assert len(pos) == 1
    assert ds._imgs_level == 3
    assert ds.get_image_relpaths(0).count("/") == 2
    # Oxford_25m override keeps the same GT here (thr already 25)
    ds25 = get_dataset("Oxford_25m", root, img_size=(64, 64))
    assert ds25.loc_rad == 25


def test_naverlabs_loader(tmp_path):
    from anyloc_tpu.data.synthetic import build_naverlabs

    root = build_naverlabs(str(tmp_path), n_db=6, n_q=3)
    ds = get_dataset("NVL_datasets", root, img_size=(64, 64))
    assert ds.database_num == 6 and ds.queries_num == 3
    # db 50 m apart, query at gt+2 m, radius 20 -> exactly {gt}
    for pos in ds.soft_positives_per_query:
        assert len(pos) == 1
    img, _ = ds[0]
    assert img.shape == (64, 64, 3)


def test_eiffel_loader(tmp_path):
    from anyloc_tpu.data.synthetic import build_eiffel

    root = build_eiffel(str(tmp_path), n_db=6, n_q=3)
    ds = get_dataset("eiffel", root, img_size=(64, 64))
    assert ds.database_num == 6 and ds.queries_num == 3
    # the loader must skip the first 101 gt rows
    for pos in ds.soft_positives_per_query:
        assert len(pos) == 1
