"""datasets_vg tooling, viz/paper utilities, profiling helpers."""

import os

import numpy as np
import pytest

from anyloc_tpu.data.tools import (
    build_utm_filename,
    format_image_dir,
    get_distance,
    is_valid_timestamp,
    latlon_to_utm,
    parse_utm_filename,
    build_map_from_dataset,
)
from anyloc_tpu.viz import (
    PAPER_RADAR_R1,
    cluster_assignment_map,
    pca_projection,
    radar_chart,
    recall_curve,
    similarity_map,
    tsne_projection,
)


def test_utm_conversion_known_point():
    # Central-meridian invariants: easting exactly 500000, northing = k0 * M
    e, n, zone, letter = latlon_to_utm(0.0, 3.0)
    assert (e, n, zone, letter) == (500000.0, 0.0, 31, "N")
    e, n, zone, letter = latlon_to_utm(45.0, 9.0)
    assert zone == 32 and letter == "T" and e == 500000.0
    # meridian arc at 45 deg = 4984944.378 m; northing = 0.9996 * that
    assert abs(n - 0.9996 * 4984944.378) < 0.1
    # Eiffel Tower 48.8584N 2.2945E -> 31U, easting 448252 (published)
    e, n, zone, letter = latlon_to_utm(48.8584, 2.2945)
    assert zone == 31 and letter == "U" and abs(e - 448252.0) < 1.0


def test_utm_filename_roundtrip():
    name = build_utm_filename(395876.25, 4991594.5)
    e, n = parse_utm_filename(name)
    assert (e, n) == (395876.25, 4991594.5)
    assert name.endswith("@.jpg") and name.startswith("@")


def test_is_valid_timestamp():
    assert is_valid_timestamp("")
    assert is_valid_timestamp("20190101_123000")
    assert is_valid_timestamp("201901")
    assert not is_valid_timestamp("19-01-01")


def test_format_image_dir_and_map(tmp_path):
    from PIL import Image

    src = tmp_path / "src"
    src.mkdir()
    for i in range(4):
        Image.new("RGB", (8, 8), (i * 20, 0, 0)).save(src / f"img{i}.jpg")
    coords = [(1000.0 + i, 5000.0) for i in range(4)]
    dst = tmp_path / "ds" / "images" / "test" / "database"
    out = format_image_dir(str(src), str(dst), coords)
    assert len(out) == 4
    assert parse_utm_filename(out[2])[0] == 1002.0
    # queries dir for the map
    qdst = tmp_path / "ds" / "images" / "test" / "queries"
    format_image_dir(str(src), str(qdst), coords)
    fig = build_map_from_dataset(str(tmp_path / "ds"))
    assert os.path.exists(fig)


def test_get_distance():
    assert get_distance((0, 0), (3, 4)) == 5.0


def test_radar_and_recall_charts(tmp_path):
    p1 = radar_chart(output_path=str(tmp_path / "radar.png"))
    assert os.path.exists(p1)
    assert len(PAPER_RADAR_R1["AnyLoc-VLAD-DINOv2"]) == 8
    p2 = recall_curve({1: 0.7, 5: 0.9, 10: 0.95},
                      output_path=str(tmp_path / "rec.png"))
    assert os.path.exists(p2)


def test_cluster_assignment_map(rng):
    descs = rng.standard_normal((12, 8)).astype(np.float32)
    centers = rng.standard_normal((4, 8)).astype(np.float32)
    cmap = cluster_assignment_map(descs, centers, (3, 4))
    assert cmap.shape == (3, 4, 3) and cmap.dtype == np.uint8
    img = (rng.random((30, 40, 3)) * 255).astype(np.uint8)
    overlay = cluster_assignment_map(descs, centers, (3, 4), image=img)
    assert overlay.shape == (30, 40, 3)


def test_similarity_map(rng):
    target = rng.standard_normal((12, 8)).astype(np.float32)
    sim = similarity_map(target[5], target, (3, 4))
    assert sim.shape == (3, 4)
    assert np.argmax(sim) == 5 and sim.max() <= 1.0 + 1e-6


def test_projections(rng):
    sets = {
        "a": rng.standard_normal((12, 16)).astype(np.float32),
        "b": rng.standard_normal((10, 16)).astype(np.float32) + 3,
    }
    t = tsne_projection(sets, perplexity=3)
    assert t["a"].shape == (12, 2) and t["b"].shape == (10, 2)
    p = pca_projection(sets)
    assert p["a"].shape == (12, 2)


def test_stage_timer_and_flops(rng):
    import jax.numpy as jnp

    from anyloc_tpu.utils.profiling import StageTimer, flops_of

    t = StageTimer()
    x = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))
    with t.stage("matmul", fence_on=x):
        y = x @ x
    assert "matmul" in t.times and "matmul" in t.report()
    f = flops_of(lambda a: a @ a, x)
    if f is not None:
        assert f >= 2 * 64 * 64 * 64 * 0.5  # within 2x of the exact count


def test_viz_cli_radar(tmp_path):
    """radar subcommand (paper_utils/radar_chart.py surface) with an extra
    user method row."""
    import json

    from anyloc_tpu.pipelines.viz_cli import main

    extra = tmp_path / "mine.json"
    extra.write_text(json.dumps({"Ours": [80, 95, 88, 65, 78, 36, 78, 69]}))
    out = tmp_path / "radar.png"
    rc = main(["radar", "--out", str(out), "--extra", str(extra)])
    assert rc == 0 and out.exists() and out.stat().st_size > 0
