"""DescriptorCache robustness (round-5 review): torn shards are a MISS,
writes are atomic, stale shards clean up, layout is part of the identity,
and coverage failures raise even under python -O."""
import numpy as np
import pytest

from anyloc_tpu.utils.desc_cache import DescriptorCache


@pytest.fixture
def cache(tmp_path):
    return DescriptorCache(str(tmp_path), {"m": "x"}, shard_size=4)


def test_roundtrip_and_header_only_has(cache):
    x = np.arange(10 * 3, dtype=np.float32).reshape(10, 3)
    assert not cache.has("db", 10)
    got = cache.get_or_compute("db", 10, lambda: x)
    np.testing.assert_array_equal(got, x)
    assert cache.has("db", 10)
    np.testing.assert_array_equal(cache.read("db", 10), x)


def test_torn_shard_is_a_miss_not_a_crash(cache):
    x = np.ones((10, 3), np.float32)
    cache.write("db", x)
    # truncate the middle shard (the killed-mid-write scenario)
    p = cache._shard_path("db", 1)
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[: len(raw) // 2])
    assert not cache.has("db", 10)  # miss -> recompute, never BadZipFile
    got = cache.get_or_compute("db", 10, lambda: 2 * x)
    np.testing.assert_array_equal(got, 2 * x)
    assert cache.has("db", 10)


def test_shorter_rewrite_removes_stale_shards(cache):
    cache.write("db", np.ones((10, 3), np.float32))   # shards 0,1,2
    cache.write("db", np.full((5, 3), 7, np.float32))  # shards 0,1
    import os

    assert not os.path.exists(cache._shard_path("db", 2))
    assert cache.has("db", 5) and not cache.has("db", 10)
    np.testing.assert_array_equal(
        cache.read("db", 5), np.full((5, 3), 7, np.float32))


def test_shard_size_is_part_of_identity(tmp_path):
    a = DescriptorCache(str(tmp_path), {"m": "x"}, shard_size=2)
    b = DescriptorCache(str(tmp_path), {"m": "x"}, shard_size=4)
    assert a.dir != b.dir  # different layouts never read each other


def test_zero_items_and_short_compute(cache):
    assert not cache.has("q", 0)
    with pytest.raises(ValueError):
        cache.get_or_compute("q", 10, lambda: np.ones((8, 3), np.float32))
    # partial-shard non-final: write only shard 0 with 3 rows, claim 10
    cache.write("q", np.ones((3, 3), np.float32))
    assert not cache.has("q", 10)
