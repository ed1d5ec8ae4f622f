"""Dataset layer tests over synthetic miniature datasets in each on-disk
layout the reference supports."""
import os

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


# ---------------------------------------------------------------------------
# dataset-specific formatters (datasets_vg format_mapillary / tokyo247 /
# pitts250k equivalents) on synthetic raw trees
# ---------------------------------------------------------------------------

def _save_jpg(path, size=(32, 40)):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.new("RGB", size, (120, 90, 60)).save(path)


def _cellcol(fns):
    """Column cell-array that loadmat round-trips to the reference's
    ``[str(f[0].item()) for f in struct]`` parsing."""
    arr = np.empty((len(fns), 1), object)
    arr[:, 0] = [np.array([f]) for f in fns]
    return arr


def test_get_dst_image_name_reference_layout():
    from anyloc_tpu.data.tools import get_dst_image_name, parse_utm_filename

    name = get_dst_image_name(40.44, -79.99, "pano42", tile_num=5,
                              timestamp="20200101", note="day_city")
    parts = name.split("@")
    assert len(parts) == 16 and parts[-1] == ".jpg"
    assert parts[3] == "17" and parts[4] == "T"          # zone for Pittsburgh
    assert parts[7] == "pano42" and parts[8] == "05"
    assert parts[13] == "20200101" and parts[14] == "day_city"
    e, n = parse_utm_filename(name)
    assert 580000 < e < 600000 and 4.4e6 < n < 4.5e6


def test_format_mapillary(tmp_path):
    from anyloc_tpu.data.tools import format_mapillary

    raw = tmp_path / "raw"
    for city, split in (("london", "train"), ("cph", "val")):
        for folder in ("database", "query"):
            d = raw / city / folder
            (d / "images").mkdir(parents=True)
            rows_raw, rows_post = ["hdr\n"], ["hdr\n"]
            for i in range(3):
                pid = f"{city}{folder}{i}"
                pano = "True" if i == 2 else "False"     # one panorama skipped
                rows_raw.append(
                    f"k,{pid},-0.12,51.50,x,2020-01-0{i+1},{pano}\n"
                )
                night = "True" if i == 1 else "False"
                rows_post.append(f"a,b,{night},Forward\n")
                _save_jpg(str(d / "images" / f"{pid}.jpg"))
            (d / "raw.csv").write_text("".join(rows_raw))
            (d / "postprocessed.csv").write_text("".join(rows_post))
    out = tmp_path / "out"
    moved = format_mapillary(str(raw), str(out))
    assert moved == 8                                    # 2 skipped panoramas
    train_db = list((out / "msls" / "train" / "database").glob("*.jpg"))
    assert len(train_db) == 2
    assert any("night_forward_london" in p.name for p in train_db)
    assert (out / "msls" / "test").exists()              # symlink to val
    # the UTM-named outputs load through the vg_bench BaseDataset parser
    from anyloc_tpu.data.tools import parse_utm_filename

    e, n = parse_utm_filename(train_db[0].name)
    assert e > 0 and n > 0


def test_format_pitts250k(tmp_path):
    import scipy.io as sio

    from anyloc_tpu.data.tools import format_pitts250k, latlon_to_utm

    raw = tmp_path / "raw"
    (raw / "datasets").mkdir(parents=True)
    e0, n0, _, _ = latlon_to_utm(40.44, -79.99)

    def struct(db_fns, q_fns):
        n_db, n_q = len(db_fns), len(q_fns)
        return np.array(
            [(
                "pitts",
                _cellcol(db_fns),
                np.array([[e0 + i, n0 + i] for i in range(n_db)]).T,
                _cellcol(q_fns),
                np.array([[e0 + i, n0 + i] for i in range(n_q)]).T,
                n_db, n_q, 25, 0, 0,
            )],
            dtype=[("whichSet", "O"), ("dbImageFns", "O"), ("utmDb", "O"),
                   ("qImageFns", "O"), ("utmQ", "O"), ("numImages", "O"),
                   ("numQueries", "O"), ("posDistThr", "O"),
                   ("posDistSqThr", "O"), ("nonTrivPosDistSqThr", "O")],
        )

    for split in ("train", "val", "test"):
        db = [f"000/00{i}{split[0]}_pitch1_yaw{i+1}.jpg" for i in range(2)]
        qs = [f"q{i}{split[0]}_pitch2_yaw{i+1}.jpg" for i in range(1)]
        for f in db:
            _save_jpg(str(raw / f))
        for f in qs:
            _save_jpg(str(raw / "queries_real" / f))
        sio.savemat(raw / "datasets" / f"pitts250k_{split}.mat",
                    {"dbStruct": struct(db, qs)})
    out = tmp_path / "out"
    done = format_pitts250k(str(raw), str(out))
    assert done == 9
    names = [p.name for p in (out / "images" / "train" / "database").glob("*")]
    assert len(names) == 2
    # tile = (pitch-1)*24 + (yaw-1): pitch1 yaw1 -> 00, pitch1 yaw2 -> 01
    assert any("@00@" in n for n in names) and any("@01@" in n for n in names)
    # registry round-trip: the formatted tree loads through BaseDataset's
    # vg_bench UTM parser with correct soft positives
    from anyloc_tpu.data.loaders.base_dataset import BaseDataset

    ds = BaseDataset(str(tmp_path), "out", "test", img_size=(32, 32))
    assert ds.database_num == 2 and ds.queries_num == 1
    pos = ds.get_positives()
    assert len(pos[0]) >= 1   # query utm == db utm -> within 25 m


def test_format_tokyo247(tmp_path):
    import scipy.io as sio

    from anyloc_tpu.data.tools import format_tokyo247, latlon_to_utm

    raw = tmp_path / "raw"
    (raw / "datasets").mkdir(parents=True)
    e0, n0, _, _ = latlon_to_utm(35.68, 139.76)   # Tokyo, zone 54S
    db = ["03814/ABCDEFGHIJKLMNOPQRSTUV_012_030.jpg",
          "03814/ABCDEFGHIJKLMNOPQRSTUV_012_330.jpg"]
    for f in db:
        _save_jpg(str(raw / "tokyo247" / f.replace(".jpg", ".png")))
    st = np.array(
        [(
            "tokyo",
            _cellcol(db),
            np.array([[e0, n0], [e0 + 5, n0 + 5]]).T,
            _cellcol([]), np.array([[], []]), 2, 0, 25, 0, 0,
        )],
        dtype=[("whichSet", "O"), ("dbImageFns", "O"), ("utmDb", "O"),
               ("qImageFns", "O"), ("utmQ", "O"), ("numImages", "O"),
               ("numQueries", "O"), ("posDistThr", "O"),
               ("posDistSqThr", "O"), ("nonTrivPosDistSqThr", "O")],
    )
    sio.savemat(raw / "datasets" / "tokyo247.mat", {"dbStruct": st})
    qdir = raw / "tokyo247" / "247query_subset_v2"
    _save_jpg(str(qdir / "q0.jpg"), size=(600, 900))
    (qdir / "q0.csv").write_text("qpano0,35.681,139.761,meta\n")
    out = tmp_path / "out"
    done = format_tokyo247(str(raw), str(out))
    assert done == 3
    dbs = sorted((out / "images" / "test" / "database").glob("*.jpg"))
    assert len(dbs) == 2
    # tile = view//30: 030 -> 01, 330 -> 11; pano id = first 22 chars
    assert "@ABCDEFGHIJKLMNOPQRSTUV@01@" in dbs[0].name
    assert "@ABCDEFGHIJKLMNOPQRSTUV@11@" in dbs[1].name
    qs = list((out / "images" / "test" / "queries").glob("*.jpg"))
    assert len(qs) == 1
    from PIL import Image

    assert min(Image.open(qs[0]).size) == 480   # short-edge resize
