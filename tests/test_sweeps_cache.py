"""Sweep driver + descriptor cache tests."""

import os

import numpy as np
import pytest

from anyloc_tpu.config import PipelineArgs
from anyloc_tpu.data.synthetic import build_gardens
from anyloc_tpu.sweeps import run_sweep
from anyloc_tpu.utils.desc_cache import DescriptorCache


def test_sweep_grid(tmp_path):
    root = build_gardens(str(tmp_path / "data"), n_db=8, n_q=4, size=(70, 70))
    base = PipelineArgs()
    base.prog.data_vg_dir = root
    base.prog.vg_dataset_name = "gardens"
    base.bd_args.resize = (70, 70)
    base.extractor.model_type = "dinov2_vits14"
    base.extractor.desc_layer = 3
    base.extractor.dtype = "float32"
    base.extractor.batch_size = 4
    base.top_k_vals = [1, 3]
    out = str(tmp_path / "sweep.csv")
    rows = run_sweep(
        "vlad",
        {"desc_facet": ["key", "value"], "num_clusters": [2, 4]},
        base, out_csv=out, verbose=False,
    )
    assert len(rows) == 4
    assert all("R@1" in r for r in rows)
    assert os.path.exists(out)
    import csv

    with open(out) as f:
        assert len(list(csv.DictReader(f))) == 4


def test_sweep_continues_on_failure(tmp_path):
    root = build_gardens(str(tmp_path / "data"), n_db=6, n_q=3, size=(70, 70))
    base = PipelineArgs()
    base.prog.data_vg_dir = root
    base.prog.vg_dataset_name = "gardens"
    base.bd_args.resize = (70, 70)
    base.extractor.model_type = "dinov2_vits14"
    base.extractor.desc_layer = 3
    base.extractor.dtype = "float32"
    base.extractor.batch_size = 4
    base.top_k_vals = [1]
    rows = run_sweep(
        "vlad", {"dataset": ["no_such_dataset", "gardens"]}, base,
        verbose=False,
    )
    assert rows[0].get("error") is True
    assert "R@1" in rows[1]


def test_descriptor_cache_roundtrip(tmp_path, rng):
    cache = DescriptorCache(str(tmp_path), {"model": "x", "layer": 3},
                            shard_size=4)
    descs = rng.standard_normal((10, 6, 8)).astype(np.float32)
    assert not cache.has("db", 10)
    calls = []

    def compute():
        calls.append(1)
        return descs

    out1 = cache.get_or_compute("db", 10, compute)
    out2 = cache.get_or_compute("db", 10, compute)
    assert len(calls) == 1  # second call served from cache
    np.testing.assert_allclose(out1, descs)
    np.testing.assert_allclose(out2, descs)
    # distinct config -> distinct cache dir
    cache2 = DescriptorCache(str(tmp_path), {"model": "y", "layer": 3})
    assert cache2.dir != cache.dir


def test_engine_uses_descriptor_cache(tmp_path):
    from anyloc_tpu.data.synthetic import build_gardens
    from anyloc_tpu.data.registry import get_dataset
    from anyloc_tpu.pipelines import DescriptorEngine

    root = build_gardens(str(tmp_path / "d"), n_db=6, n_q=3, size=(70, 70))
    ds = get_dataset("gardens", root, img_size=(70, 70))
    eng = DescriptorEngine("dinov2_vits14", 3, "value", dtype="float32",
                           batch_size=3, cache_dir=str(tmp_path / "cache"))
    out1 = eng.extract_dataset(ds, "db", verbose=False)
    # poison the extractor: a cache hit must NOT re-extract
    eng.extract_batch = lambda imgs: (_ for _ in ()).throw(AssertionError)
    out2 = eng.extract_dataset(ds, "db", verbose=False)
    np.testing.assert_allclose(out1, out2)


def test_descriptor_cache_recomputes_when_grown(tmp_path, rng):
    from anyloc_tpu.utils.desc_cache import DescriptorCache

    cache = DescriptorCache(str(tmp_path), {"m": 1}, shard_size=4)
    cache.write("db", rng.standard_normal((6, 2, 3)).astype(np.float32))
    assert cache.has("db", 6)
    assert not cache.has("db", 8)  # grown dataset must recompute, not crash
    out = cache.get_or_compute(
        "db", 8, lambda: rng.standard_normal((8, 2, 3)).astype(np.float32)
    )
    assert out.shape == (8, 2, 3)


def test_sweep_presets_match_published_grids():
    """The named presets reproduce the reference ablation axes
    (dino_v2_global_vocab_vlad_ablations.sh:12-33, paper_utils CSVs)."""
    from anyloc_tpu.sweeps import PRESETS

    assert PRESETS["facets"]["desc_facet"] == ["query", "key", "value", "token"]
    assert PRESETS["clusters"]["num_clusters"] == [256, 128, 64, 32]
    assert PRESETS["layers-g14"]["desc_layer"][0] == 39
    assert len(PRESETS["layers-g14"]["desc_layer"]) == 40
    assert set(PRESETS["domains"]["domain"]) == {
        "indoor", "urban", "aerial", "structured", "unstructured", "both"}
    # preset flows through the CLI grid assembly
    import anyloc_tpu.sweeps as S

    captured = {}
    orig = S.run_sweep
    S.run_sweep = lambda pipe, grid, base, out: captured.update(grid) or []
    try:
        S.main(["--preset", "facets", "--grid.dataset", "gardens"])
    finally:
        S.run_sweep = orig
    assert captured["desc_facet"] == ["query", "key", "value", "token"]
    assert captured["dataset"] == ["gardens"]


def test_run_name_convention():
    """Reference wandb naming scheme verbatim (configs.py:80-91 +
    *_ablations.sh wandb_name templates) so sweep CSVs align with the
    exported ablation tables."""
    from anyloc_tpu.utils.logging_utils import run_name_for

    assert run_name_for(
        "global-vocab-vlad", "dinov2_vitg14", layer=31, facet="value",
        clusters=32, dataset="baidu_datasets", domain="indoor",
    ) == "DINO_V2_VLAD_GLOBAL_VOCAB/l31_value_c32/indoor/baidu_datasets/dinov2_vitg14"
    assert run_name_for(
        "vlad", "dinov2_vitg14", layer=31, facet="value", clusters=32,
        dataset="Oxford",
    ) == "DINO_V2_VLAD/l31_value_c32/Oxford/dinov2_vitg14"
    assert run_name_for(
        "gem", "dinov2_vitg14", layer=31, facet="value", dataset="gardens",
    ) == "DINO_V2_GeM/l31_value/gardens/dinov2_vitg14"
    # DINO v1 family prefix (DINO_V1_VLAD_GLOBAL_VOCAB template)
    assert run_name_for(
        "global-vocab-vlad", "dino_vits8", layer=9, facet="key",
        clusters=128, dataset="gardens", domain="urban",
    ).startswith("DINO_V1_VLAD_GLOBAL_VOCAB/l9_key_c128/urban/")


def test_sweep_to_csv_to_figure(tmp_path):
    """ONE command regenerates a paper_utils-style ablation figure from a
    sweep (round-2 verdict item 8): sweeps.main --plot produces CSV with
    run_name/wandb_group columns + the PNG."""
    import csv

    from anyloc_tpu.sweeps import main as sweeps_main

    root = build_gardens(str(tmp_path / "data"), n_db=8, n_q=4, size=(70, 70))
    out = str(tmp_path / "ablation.csv")
    rc = sweeps_main([
        "--pipeline", "vlad", "--out", out, "--plot",
        "--grid.num-clusters", "2", "4",
        "--prog.data-vg-dir", root,
        "--prog.vg-dataset-name", "gardens",
        "--bd-args.resize", "70", "70",
        "--extractor.model-type", "dinov2_vits14",
        "--extractor.desc-layer", "3",
        "--extractor.dtype", "float32",
        "--extractor.batch-size", "4",
    ])
    assert rc == 0
    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert rows[0]["run_name"].startswith("DINO_V2_VLAD/l3_")
    assert rows[0]["wandb_group"] == "gardens"
    png = str(tmp_path / "ablation.png")
    assert os.path.exists(png) and os.path.getsize(png) > 1000
