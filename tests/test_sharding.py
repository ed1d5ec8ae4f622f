"""Multi-chip semantics on the 8-device virtual CPU mesh: sharded k-means,
sharded retrieval, and data-parallel extraction must match single-device."""

import jax
import numpy as np
import pytest

from anyloc_tpu.ops.kmeans import kmeans_fit
from anyloc_tpu.ops.retrieval import top_k_search
from anyloc_tpu.parallel import (
    get_mesh,
    kmeans_fit_sharded,
    local_mesh,
    sharded_extract_fn,
    top_k_search_sharded,
)
from anyloc_tpu.parallel.distributed import get_top_k_recall_sharded


@pytest.fixture(scope="module")
def mesh():
    return local_mesh(8)


def test_mesh_shape(mesh):
    assert mesh.shape == {"data": 8, "model": 1}
    assert get_mesh(n_data=4, n_model=2).shape == {"data": 4, "model": 2}


def test_sharded_kmeans_matches_single_device(rng, mesh):
    x = rng.standard_normal((1000, 16)).astype(np.float32)
    key = jax.random.PRNGKey(3)
    single, _ = kmeans_fit(key, x, 8, mode="cosine", max_iters=20)
    sharded = kmeans_fit_sharded(key, x, 8, mesh, mode="cosine", max_iters=20)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-4)


def test_sharded_kmeans_uneven_n(rng, mesh):
    """N not divisible by 8 exercises the padding/weight mask."""
    x = rng.standard_normal((1003, 8)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    single, _ = kmeans_fit(key, x, 4, mode="euclidean", max_iters=15)
    sharded = kmeans_fit_sharded(key, x, 4, mesh, mode="euclidean", max_iters=15)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-4)


@pytest.mark.parametrize("method", ["cosine", "l2"])
@pytest.mark.parametrize("n_db", [512, 509])  # even and uneven shards
def test_sharded_topk_matches_single_device(rng, mesh, method, n_db):
    db = rng.standard_normal((n_db, 24)).astype(np.float32)
    qu = rng.standard_normal((13, 24)).astype(np.float32)
    s0, i0 = top_k_search(db, qu, 7, method)
    s1, i1 = top_k_search_sharded(db, qu, 7, mesh, method)
    np.testing.assert_allclose(s1, np.asarray(s0), atol=1e-4)
    # Indices may differ only at exact score ties; compare via scores.
    np.testing.assert_allclose(
        np.sort(s1, axis=1), np.sort(np.asarray(s0), axis=1), atol=1e-4
    )
    agree = (i1 == np.asarray(i0)).mean()
    assert agree > 0.95, f"too many index mismatches: {agree}"


def test_sharded_recall(rng, mesh):
    db = rng.standard_normal((100, 16)).astype(np.float32)
    qu = db[:9] + 0.01 * rng.standard_normal((9, 16)).astype(np.float32)
    gt = [np.array([i]) for i in range(9)]
    _, idx, recalls = get_top_k_recall_sharded([1, 5], db, qu, gt, mesh)
    assert recalls[1] == 1.0
    np.testing.assert_array_equal(idx[:, 0], np.arange(9))


def test_sharded_extract_matches_local(rng, mesh):
    """Data-parallel wrapper must reproduce the single-device forward, incl.
    the uneven-batch padding path."""
    import jax.numpy as jnp

    w = jnp.asarray(rng.standard_normal((12, 6)).astype(np.float32))

    def apply_fn(params, imgs):
        return jnp.tanh(imgs @ params)

    run = sharded_extract_fn(apply_fn, mesh)
    imgs = rng.standard_normal((21, 12)).astype(np.float32)  # 21 % 8 != 0
    out = run(w, imgs)
    expect = np.tanh(imgs @ np.asarray(w))
    assert out.shape == (21, 6)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_mesh_engine_fused_vlad_matches_unsharded(mesh, rng, tmp_path):
    """DescriptorEngine(mesh=...) fused extract+VLAD must equal the
    unsharded engine (and never round-trip the patch tensor — the device
    route returns jax arrays into the aggregate)."""
    from PIL import Image

    from anyloc_tpu.data.base import VPRDataset
    from anyloc_tpu.ops.vlad import VLAD
    from anyloc_tpu.pipelines.engine import DescriptorEngine

    paths = []
    for i in range(10):
        p = tmp_path / f"i{i}.png"
        Image.fromarray(
            (rng.random((70, 70, 3)) * 255).astype(np.uint8)
        ).save(p)
        paths.append(str(p))
    ds = VPRDataset(paths, [], img_size=(70, 70))

    e0 = DescriptorEngine("dinov2_vits14", 3, "value", batch_size=4,
                          dtype="float32")
    em = DescriptorEngine("dinov2_vits14", 3, "value", batch_size=4,
                          dtype="float32", mesh=mesh,
                          extractor=e0.extractor)
    descs = e0.extract_dataset(ds, which="db", verbose=False)
    v = VLAD(4)
    v.fit(descs.reshape(-1, descs.shape[-1]))
    ref = np.asarray(e0.extract_vlads_dataset(ds, v, "db", verbose=False))
    got = np.asarray(em.extract_vlads_dataset(ds, v, "db", verbose=False))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_sharded_search_bf16_scoring(mesh, rng):
    """score_dtype='bfloat16' agrees with exact on separated data."""
    centers = rng.standard_normal((64, 32)).astype(np.float32) * 5.0
    db = centers + 0.01 * rng.standard_normal((64, 32)).astype(np.float32)
    qu = centers[:8]
    s0, i0 = top_k_search_sharded(db, qu, 3, mesh)
    s1, i1 = top_k_search_sharded(db, qu, 3, mesh, score_dtype="bfloat16")
    np.testing.assert_array_equal(i0[:, 0], i1[:, 0])


def test_tp_split_facet_equality_and_footprint():
    """Real TP (round-1 verdict item 7): with ViTConfig(tp_split=True) the
    trunk's big matrices shard across the model axis — per-device parameter
    bytes drop toward 1/n_model, and facets equal the fused single-device
    layout exactly (the converter splits the same matrices the fused layout
    concatenates)."""
    import jax
    import jax.numpy as jnp

    from anyloc_tpu.models.extractor import ViTFacetExtractor, init_params
    from anyloc_tpu.models.vit import ViTConfig
    from anyloc_tpu.parallel.mesh import get_mesh
    from anyloc_tpu.parallel.tp import (
        params_bytes_per_device,
        replicated_shardings,
        split_fused_params,
        vit_tp_shardings,
    )

    base = dict(img_size=56, patch_size=14, embed_dim=96, depth=2,
                num_heads=4, mlp_type="swiglu_fused", layerscale_init=1e-5,
                dtype=jnp.float32)
    cfg_f = ViTConfig(**base)
    cfg_s = ViTConfig(**base, tp_split=True)
    pf = init_params(cfg_f, seed=3)
    # build the split tree FROM the fused one so both compute the same fn
    ps = split_fused_params(pf)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 56, 56, 3)), jnp.float32)
    want = np.asarray(ViTFacetExtractor(cfg_f, pf, 1, "value")(img))

    mesh = get_mesh(n_data=2, n_model=4)
    ps_sharded = jax.device_put(ps, vit_tp_shardings(ps, mesh))
    got = np.asarray(ViTFacetExtractor(cfg_s, ps_sharded, 1, "value")(img))
    np.testing.assert_allclose(got, want, atol=2e-5)

    # per-device footprint: block params shard 4-way; embeddings replicate
    rep = params_bytes_per_device(jax.device_put(ps, replicated_shardings(ps, mesh)))
    shd = params_bytes_per_device(ps_sharded)
    assert shd < 0.55 * rep, (shd, rep)  # ~1/4 of block params + embeds


def test_tp_split_checkpoint_converter_splits():
    """convert_dinov2 with tp_split splits the same fused matrices."""
    torch = pytest.importorskip("torch")

    import jax.numpy as jnp

    from anyloc_tpu.models.dinov2 import convert_dinov2, dinov2_config
    from anyloc_tpu.models.vit import ViT
    import dataclasses

    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from oracles import TorchMiniDino

    torch.manual_seed(1)
    tm = TorchMiniDino(img_size=56, d=64, depth=2, heads=4, swiglu=True).eval()
    cfg = dinov2_config("dinov2_vits14", dtype=jnp.float32)
    cfg = dataclasses.replace(
        cfg, img_size=56, embed_dim=64, depth=2, num_heads=4,
        mlp_type="swiglu_fused",
    )
    cfg_s = dataclasses.replace(cfg, tp_split=True)
    pf = convert_dinov2(tm.state_dict(), cfg)
    ps = convert_dinov2(tm.state_dict(), cfg_s)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((1, 56, 56, 3)), jnp.float32)
    a = ViT(cfg).apply(pf, img)
    b = ViT(cfg_s).apply(ps, img)
    np.testing.assert_allclose(
        np.asarray(a["tokens"]), np.asarray(b["tokens"]), atol=1e-5
    )


def test_tp_split_honored_by_non_dinov2_converters():
    """maybe_tp_split (models/convert.py): every trunk converter emits the
    wq/wk/wv layout when cfg.tp_split is set — previously only convert_dinov2
    split, so converted DINO-v1/CLIP/HF-ViT checkpoints could not be applied
    to a tp_split trunk."""
    torch = pytest.importorskip("torch")

    import dataclasses
    import pathlib
    import sys

    import jax.numpy as jnp

    from anyloc_tpu.models.dino_v1 import convert_dino_v1, dino_v1_config
    from anyloc_tpu.models.vit import ViT

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from oracles import TorchMiniDino

    torch.manual_seed(5)
    tm = TorchMiniDino(img_size=32, patch=16, d=32, depth=2, heads=4).eval()
    cfg = dino_v1_config("dino_vits16", img_size=32, dtype=jnp.float32)
    cfg = dataclasses.replace(cfg, embed_dim=32, depth=2, num_heads=4)
    cfg_s = dataclasses.replace(cfg, tp_split=True)
    pf = convert_dino_v1(tm.state_dict(), cfg)
    ps = convert_dino_v1(tm.state_dict(), cfg_s)
    attn = ps["params"]["blocks_0"]["attn"]
    assert "wq" in attn and "qkv" not in attn
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    a = ViT(cfg).apply(pf, img)
    b = ViT(cfg_s).apply(ps, img)
    np.testing.assert_allclose(
        np.asarray(a["tokens"]), np.asarray(b["tokens"]), atol=1e-5
    )


def test_pipeline_parallel_facet_equality():
    """GPipe pipeline route (parallel/pp.py): blocks sharded per stage over
    the model axis, microbatches streamed with ppermute — facets must equal
    the single-device trunk exactly, including a non-divisible block count
    (filler slots masked off)."""
    import jax.numpy as jnp

    from anyloc_tpu.models.extractor import init_params
    from anyloc_tpu.models.vit import ViT, ViTConfig
    from anyloc_tpu.parallel.mesh import get_mesh
    from anyloc_tpu.parallel.pp import (
        pipeline_facet_extract,
        stack_stage_params,
        stage_shardings,
    )

    cfg = ViTConfig(img_size=56, patch_size=14, embed_dim=96, depth=6,
                    num_heads=4, mlp_type="swiglu_fused",
                    layerscale_init=1e-5, dtype=jnp.float32)
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((4, 56, 56, 3)), jnp.float32)
    mesh = get_mesh(n_data=2, n_model=4)
    for layer, facet in ((5, "value"), (3, "token"), (2, "query")):
        want = np.asarray(ViT(cfg).apply(
            params, img, capture_layer=layer, capture_facet=facet))
        got = np.asarray(pipeline_facet_extract(
            cfg, params, img, mesh, layer, facet))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    # pre-stacked + device-placed shards: same result, ~1/4 params/device
    import jax

    from anyloc_tpu.parallel.pp import pipeline_params_bytes_per_device
    from anyloc_tpu.parallel.tp import params_bytes_per_device

    stacked = stack_stage_params(params, 5, 4)
    tree, mask, k = stacked
    staged = jax.tree_util.tree_map(
        lambda a: a.reshape((4, k) + a.shape[1:]), tree)
    placed = jax.device_put(staged, stage_shardings(staged, mesh))
    flat_placed = jax.tree_util.tree_map(
        lambda a: a.reshape((4 * k,) + a.shape[2:]), placed)
    got = np.asarray(pipeline_facet_extract(
        cfg, params, img, mesh, 5, "value",
        stacked=(flat_placed, mask, k)))
    want = np.asarray(ViT(cfg).apply(
        params, img, capture_layer=5, capture_facet="value"))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)
    per_dev = pipeline_params_bytes_per_device(placed)
    total = sum(l.size * l.dtype.itemsize
                for l in jax.tree_util.tree_leaves(staged))
    assert per_dev < 0.35 * total, (per_dev, total)


def test_ring_attention_matches_dense(rng):
    """ring_attention (parallel/sp.py): K/V sharded over the model axis with
    padded-key masking == dense softmax attention over the valid tokens."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from anyloc_tpu.parallel.mesh import get_mesh
    from anyloc_tpu.parallel.sp import ring_attention

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    mesh = get_mesh(n_data=1, n_model=8)
    b, h, t, hd = 2, 3, 11, 4  # 11 tokens -> padded to 16 over 8 shards
    t_pad = 16
    q = rng.standard_normal((b, h, t_pad, hd)).astype(np.float32)
    k = rng.standard_normal((b, h, t_pad, hd)).astype(np.float32)
    v = rng.standard_normal((b, h, t_pad, hd)).astype(np.float32)
    mask = np.arange(t_pad) < t

    def fn(ql, kl, vl, ml):
        return ring_attention(ql, kl, vl, ml, axis_name="model", n_shards=8,
                              vary_axes=("model",))

    got = shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, None, "model"), P(None, None, "model"),
                  P(None, None, "model"), P("model")),
        out_specs=P(None, None, "model"),
    )(q, k, v, jnp.asarray(mask))[:, :, :t]

    s = np.einsum("bhqd,bhkd->bhqk", q[:, :, :t] * hd ** -0.5, k[:, :, :t])
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", p, v[:, :, :t])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_sequence_parallel_facet_equality():
    """sp_facet_extract (parallel/sp.py): activations token-sharded over the
    model axis, ring attention for the global mix — facets must equal the
    single-device trunk, including a token count that does not divide the
    axis (17 tokens over 4 shards)."""
    import jax.numpy as jnp

    from anyloc_tpu.models.extractor import init_params
    from anyloc_tpu.models.vit import ViT, ViTConfig
    from anyloc_tpu.parallel.mesh import get_mesh
    from anyloc_tpu.parallel.sp import sp_facet_extract

    cfg = ViTConfig(img_size=56, patch_size=14, embed_dim=96, depth=6,
                    num_heads=4, mlp_type="swiglu_fused",
                    layerscale_init=1e-5, dtype=jnp.float32)
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((4, 56, 56, 3)), jnp.float32)
    mesh = get_mesh(n_data=2, n_model=4)  # 17 tokens -> 20 padded
    for layer, facet in ((5, "value"), (3, "token"), (2, "query")):
        want = np.asarray(ViT(cfg).apply(
            params, img, capture_layer=layer, capture_facet=facet))
        got = np.asarray(sp_facet_extract(
            cfg, params, img, mesh, layer, facet))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        sp_facet_extract(cfg, params, img, mesh, 3, "cls")


def test_expert_parallel_routed_vlad():
    """ep_vlad_aggregate (parallel/ep.py): expert banks sharded over the
    model axis, images dispatched with all_to_all — kept images equal the
    direct per-image VLAD against their routed expert; overflow beyond
    capacity drops to zeros with kept=False."""
    import jax.numpy as jnp

    from anyloc_tpu.ops.vlad import vlad_aggregate
    from anyloc_tpu.parallel.ep import ep_vlad_aggregate, route_by_domain
    from anyloc_tpu.parallel.mesh import get_mesh

    mesh = get_mesh(n_data=2, n_model=4)
    rng = np.random.default_rng(0)
    e, c, d, b, t = 8, 4, 16, 16, 9
    experts = jnp.asarray(rng.standard_normal((e, c, d)), jnp.float32)
    descs = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    route = jnp.asarray(rng.integers(0, e, b), jnp.int32)

    want = np.stack([
        np.asarray(vlad_aggregate(descs[i][None], experts[int(route[i])])[0])
        for i in range(b)
    ])

    # ample capacity: exact, nothing dropped
    v, kept = ep_vlad_aggregate(descs, route, experts, mesh,
                                capacity_factor=8.0)
    assert bool(kept.all())
    np.testing.assert_allclose(np.asarray(v), want, atol=1e-5)

    # tight capacity: kept entries exact, dropped entries zero
    v2, kept2 = ep_vlad_aggregate(descs, route, experts, mesh,
                                  capacity_factor=0.7)
    k = np.asarray(kept2)
    assert k.sum() < b  # this seed overflows at least one slot
    np.testing.assert_allclose(np.asarray(v2)[k], want[k], atol=1e-5)
    assert np.abs(np.asarray(v2)[~k]).max() == 0.0

    # experts must divide the axis; batch must divide the mesh
    with pytest.raises(ValueError):
        ep_vlad_aggregate(descs, route, experts[:6], mesh)
    with pytest.raises(ValueError):
        ep_vlad_aggregate(descs[:10], route[:10], experts, mesh)

    # GeM-nearest-domain router (the HF-space domain picker semantics)
    cents = jnp.abs(jnp.asarray(rng.standard_normal((3, d)), jnp.float32))
    biased = (jnp.abs(jnp.asarray(
        rng.standard_normal((5, t, d)), jnp.float32)) * 0.01
        + cents[1][None, None, :])
    assert (np.asarray(route_by_domain(biased, cents)) == 1).all()


def test_expert_parallel_out_of_range_routes_dropped():
    """Out-of-range route indices must come back kept=False with zero
    descriptors (never a zero vector flagged valid)."""
    import jax.numpy as jnp

    from anyloc_tpu.parallel.ep import ep_vlad_aggregate
    from anyloc_tpu.parallel.mesh import get_mesh

    mesh = get_mesh(n_data=2, n_model=4)
    rng = np.random.default_rng(3)
    experts = jnp.asarray(rng.standard_normal((8, 4, 16)), jnp.float32)
    descs = jnp.asarray(rng.standard_normal((16, 9, 16)), jnp.float32)
    route = np.zeros(16, np.int32)
    route[3], route[7] = 8, -1  # both out of range for E=8
    v, kept = ep_vlad_aggregate(descs, jnp.asarray(route), experts, mesh,
                                capacity_factor=8.0)
    k = np.asarray(kept)
    assert not k[3] and not k[7] and k.sum() == 14
    assert np.abs(np.asarray(v)[[3, 7]]).max() == 0.0


def test_sp_extractor_matches_single_device(rng):
    """SPFacetExtractor (engine-compatible interface) == ViTFacetExtractor,
    float32 and uint8 transfer modes."""
    import jax.numpy as jnp

    from anyloc_tpu.models.extractor import ViTFacetExtractor, init_params
    from anyloc_tpu.models.vit import ViTConfig
    from anyloc_tpu.parallel.mesh import get_mesh
    from anyloc_tpu.parallel.sp import SPFacetExtractor

    cfg = ViTConfig(img_size=56, patch_size=14, embed_dim=96, depth=4,
                    num_heads=4, mlp_type="swiglu_fused",
                    layerscale_init=1e-5, dtype=jnp.float32)
    params = init_params(cfg, seed=0)
    mesh = get_mesh(n_data=2, n_model=4)
    ref = ViTFacetExtractor(cfg, params, 3, "value")
    sp = SPFacetExtractor(cfg, params, 3, "value", mesh)
    img = jnp.asarray(rng.standard_normal((4, 56, 56, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(sp(img)), np.asarray(ref(img)),
                               atol=2e-5)
    u8 = jnp.asarray(
        (rng.random((4, 56, 56, 3)) * 255).astype(np.uint8))
    np.testing.assert_allclose(np.asarray(sp(u8)), np.asarray(ref(u8)),
                               atol=2e-5)

    import dataclasses

    import pytest as _pytest

    with _pytest.raises(ValueError):
        SPFacetExtractor(cfg, params, 3, "value", None)
    qcfg = dataclasses.replace(cfg, quant="int8")
    with _pytest.raises(ValueError):
        SPFacetExtractor(qcfg, params, 3, "value", mesh)


class TestFSDP:
    """ZeRO-1 optimizer-state sharding (parallel/fsdp.py): moments sharded
    over the data axis, multi-step convergence, and a sharded-state orbax
    round-trip (round-2 verdict item 6; replaces dvgl train.py:106-206
    replication at mesh scale)."""

    def test_fsdp_shardings_pick_divisible_dim(self, mesh):
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        from anyloc_tpu.parallel.fsdp import fsdp_shardings

        tree = {
            "big": jnp.zeros((64, 48)),       # 64 % 8 == 0 -> data on dim 0
            "odd": jnp.zeros((17, 129)),      # nothing divides -> replicated
            "tall": jnp.zeros((6, 4096)),     # dim 1 largest+divisible
            "tiny": jnp.zeros((8,)),          # below min_size -> replicated
            "count": jnp.zeros((), jnp.int32),
        }
        sh = fsdp_shardings(tree, mesh, min_size=512)
        assert sh["big"].spec == P("data", None)
        assert sh["odd"].spec == P()
        assert sh["tall"].spec == P(None, "data")
        assert sh["tiny"].spec == P()
        assert sh["count"].spec == P()

    def test_fsdp_multistep_and_sharded_roundtrip(self, mesh, tmp_path):
        """12 steps with FSDP moments on the mesh == 12 steps replicated on
        one device (bit-level state agreement is not expected across
        layouts; loss agreement to f32 reduction tolerance is), moments
        stay data-sharded, and save -> sharded restore -> step is
        bit-identical to the uninterrupted run."""
        import jax.numpy as jnp
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from anyloc_tpu.parallel.fsdp import (
            fsdp_shardings, fsdp_train_step, state_bytes_per_device)
        from anyloc_tpu.training import make_triplet_train_step
        from anyloc_tpu.training.triplet import TripletTrainState
        from anyloc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

        rng = np.random.default_rng(0)
        w = {"params": {"proj": {"kernel": jnp.asarray(
            rng.standard_normal((48, 64)), jnp.float32)}}}

        def descriptor_fn(variables, images):
            flat = images.reshape(images.shape[0], -1)
            d = flat @ variables["params"]["proj"]["kernel"]
            return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-9)

        opt = optax.adam(1e-3)
        step = make_triplet_train_step(descriptor_fn, opt, neg_num=2)
        tuples = rng.standard_normal((8, 4, 4, 4, 3)).astype(np.float32)

        # single-device reference
        ref_state = step.init_state(w)
        ref_losses = []
        for _ in range(12):
            ref_state, l = step(ref_state, jnp.asarray(tuples))
            ref_losses.append(float(l))

        # FSDP on the mesh
        state = step.init_state(w)
        p_sh = jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), state.params)
        o_sh = fsdp_shardings(state.opt_state, mesh, min_size=512)
        state = TripletTrainState(
            jax.device_put(state.params, p_sh),
            jax.device_put(state.opt_state, o_sh),
            jax.device_put(state.step, NamedSharding(mesh, P())),
        )
        sh = TripletTrainState(p_sh, o_sh, NamedSharding(mesh, P()))
        fstep = fsdp_train_step(step, sh)
        batch = jax.device_put(
            jnp.asarray(tuples),
            NamedSharding(mesh, P("data", None, None, None, None)))
        losses = []
        for _ in range(12):
            state, l = fstep(state, batch)
            losses.append(float(l))
        assert losses[-1] < losses[0]
        np.testing.assert_allclose(losses, ref_losses, rtol=1e-4)
        moments = [
            m for m in jax.tree_util.tree_leaves(state.opt_state)
            if "data" in str(getattr(m.sharding, "spec", ""))
        ]
        assert moments, "no moment stayed data-sharded through the steps"

        # footprint: sharded moments hold 1/8 per device
        rep = state_bytes_per_device(TripletTrainState(
            state.params,
            jax.device_put(
                jax.tree_util.tree_map(np.asarray, state.opt_state),
                jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), o_sh)),
            state.step))
        assert state_bytes_per_device(state) < rep

        # sharded round-trip: restore INTO the shardings, resume bit-equal
        save_checkpoint(str(tmp_path), state._asdict(), is_best=False)
        back = load_checkpoint(
            str(tmp_path / "last_checkpoint"), target=state._asdict())
        restored = TripletTrainState(**back)
        for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                        jax.tree_util.tree_leaves(restored.opt_state)):
            assert a.sharding == b.sharding
        cont, lc = fstep(state, batch)
        rest, lr = fstep(restored, batch)
        assert float(lc) == float(lr)
        for a, b in zip(jax.tree_util.tree_leaves(cont),
                        jax.tree_util.tree_leaves(rest)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multiprocess_mesh_two_processes():
    """SURVEY §5 distributed row, the DCN half: everything else in this file
    runs on a single-process virtual mesh (ICI emulation). This launches TWO
    real processes (4 CPU devices each), joins them via ``init_distributed``
    (jax.distributed + a localhost coordinator), and runs sharded k-means
    (psum) and sharded retrieval (all_gather) with the data axis crossing
    the process boundary — the collective transport is Gloo, the CPU
    stand-in for DCN. Each worker asserts equality with single-device
    results; see tests/mp_mesh_worker.py."""
    import os
    import pathlib
    import socket
    import subprocess
    import sys

    worker = pathlib.Path(__file__).resolve().parent / "mp_mesh_worker.py"
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # device count is set in-process by the worker
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=worker.parent.parent,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            outs.append(p.communicate(timeout=300))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {i} rc={p.returncode}\nstdout:\n{out}\nstderr:\n{err[-2000:]}")
        assert f"MP_MESH_OK proc={i}" in out, out


class TestShardedPQ:
    """pq_search_sharded: the compressed engine's scale-out — codes shard
    over 'data', per-shard gather-free ADC, all_gather + merge."""

    def _fit(self, rng, n=1003, d=32, m=8):
        from anyloc_tpu.ops.pq import pq_fit

        db = rng.standard_normal((n, d)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        return db, pq_fit(db, m, method="cosine")

    def test_matches_single_device(self, rng, mesh):
        from anyloc_tpu.parallel import pq_search_sharded

        db, index = self._fit(rng)  # 1003 rows: exercises shard padding
        qu = db[rng.choice(1003, 16, replace=False)]
        s1, i1 = index.search(qu, 5)
        ss, ii = pq_search_sharded(index, qu, 5, mesh)
        np.testing.assert_array_equal(ii, np.asarray(i1))
        np.testing.assert_allclose(ss, np.asarray(s1), atol=1e-5)

    def test_opq_rotation_honored(self, rng, mesh):
        from anyloc_tpu.ops.pq import pq_fit
        from anyloc_tpu.parallel import pq_search_sharded

        lam = (1.0 + np.arange(32, dtype=np.float32)) ** -0.75
        db = rng.standard_normal((600, 32)).astype(np.float32) * lam
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        index = pq_fit(db, 8, method="cosine", opq_iters=3)
        assert index.rotation is not None
        qu = db[:8]
        s1, i1 = index.search(qu, 5)
        ss, ii = pq_search_sharded(index, qu, 5, mesh)
        np.testing.assert_array_equal(ii, np.asarray(i1))
        np.testing.assert_allclose(ss, np.asarray(s1), atol=1e-5)

    def test_per_device_code_bytes_shrink(self, rng, mesh):
        """The point of sharding: each chip holds ~1/n_dev of the codes."""
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from anyloc_tpu.parallel.mesh import pad_to_multiple

        db, index = self._fit(rng, n=4096)
        codes_pad, _ = pad_to_multiple(np.asarray(index.codes), 8)
        dev = _jax.device_put(
            codes_pad, NamedSharding(mesh, P("data", None)))
        shard_b = [s.data.nbytes for s in dev.addressable_shards]
        assert max(shard_b) == codes_pad.nbytes // 8

    def test_decode_and_tables_scans_agree(self, rng, mesh):
        from anyloc_tpu.parallel import pq_search_sharded

        db, index = self._fit(rng, n=512)
        qu = db[:4]
        st, it_ = pq_search_sharded(index, qu, 5, mesh, scan="tables")
        sd, id_ = pq_search_sharded(index, qu, 5, mesh, scan="decode")
        np.testing.assert_array_equal(it_, id_)
        np.testing.assert_allclose(st, sd, atol=1e-4)


class TestShardedIVFPQ:
    """ivf_pq_search_sharded: cell buckets shard over 'data', global probe
    on replicated centroids, shard-0-owned overflow pool, merge."""

    def _fit(self, rng, n=2000, d=32, cells=16, m=8):
        from anyloc_tpu.ops.ivf_pq import ivf_pq_fit

        db = rng.standard_normal((n, d)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        # bucket_factor < 1 guarantees overflow rows even on balanced
        # cells (cap = ceil(n/cells * 0.8))
        return db, ivf_pq_fit(db, cells, m=m, method="cosine",
                              bucket_factor=0.8)

    def test_matches_single_device(self, rng, mesh):
        from anyloc_tpu.parallel import ivf_pq_search_sharded

        db, index = self._fit(rng)
        assert index.overflow_codes.shape[0] > 0, "fixture must overflow"
        qu = db[rng.choice(2000, 12, replace=False)]
        for n_probe in (4, 16):  # partial and full probe
            s1, i1 = index.search(qu, 5, n_probe=n_probe)
            ss, ii = ivf_pq_search_sharded(index, qu, 5, mesh,
                                           n_probe=n_probe)
            np.testing.assert_array_equal(ii, np.asarray(i1))
            np.testing.assert_allclose(ss, np.asarray(s1), atol=1e-5)

    def test_l2_method_and_uneven_cells(self, rng, mesh):
        """l2 scores (sign handling through the merge) + a cell count that
        does not divide the mesh (padded cell slabs)."""
        from anyloc_tpu.ops.ivf_pq import ivf_pq_fit
        from anyloc_tpu.parallel import ivf_pq_search_sharded

        db = rng.standard_normal((1500, 32)).astype(np.float32)
        index = ivf_pq_fit(db, 13, m=8, method="l2")  # 13 cells % 8 != 0
        qu = db[:10]
        s1, i1 = index.search(qu, 5, n_probe=6)
        ss, ii = ivf_pq_search_sharded(index, qu, 5, mesh, n_probe=6)
        np.testing.assert_array_equal(ii, np.asarray(i1))
        np.testing.assert_allclose(ss, np.asarray(s1), atol=1e-4)
        assert (np.diff(ss, axis=1) >= -1e-6).all()  # distances ascend

    def test_opq_rotation_honored(self, rng, mesh):
        from anyloc_tpu.ops.ivf_pq import ivf_pq_fit
        from anyloc_tpu.parallel import ivf_pq_search_sharded

        lam = (1.0 + np.arange(32, dtype=np.float32)) ** -0.75
        db = rng.standard_normal((800, 32)).astype(np.float32) * lam
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        index = ivf_pq_fit(db, 8, m=8, method="cosine", opq_iters=3)
        assert index.rotation is not None
        qu = db[:6]
        s1, i1 = index.search(qu, 5, n_probe=8)
        ss, ii = ivf_pq_search_sharded(index, qu, 5, mesh, n_probe=8)
        np.testing.assert_array_equal(ii, np.asarray(i1))
        np.testing.assert_allclose(ss, np.asarray(s1), atol=1e-5)


def test_sharded_recall_compressed_engines(rng, mesh):
    """get_top_k_recall_sharded routes the pq / ivf_pq sharded engines
    with the single-device API's engine names."""
    from anyloc_tpu.parallel.distributed import get_top_k_recall_sharded

    db = rng.standard_normal((600, 32)).astype(np.float32)
    qu = db[:10] + 0.01 * rng.standard_normal((10, 32)).astype(np.float32)
    gt = [np.array([i]) for i in range(10)]
    for engine in ("pq", "ivf", "ivf_pq"):
        _, idx, rec = get_top_k_recall_sharded(
            [1, 5], db, qu, gt, mesh, engine=engine, pq_m=8)
        assert idx.shape == (10, 5)
        assert rec[5] >= rec[1]
        assert rec[1] in (1.0, 100.0), (engine, rec)  # near-self queries


def test_sharded_pq_pad_rows_cannot_evict(mesh):
    """Regression (round-5 review): zero-padded shard rows decode to the
    codeword-0 reconstruction — a legitimate high-scoring vector — and
    must mask BEFORE the per-shard running top-k, or they evict true
    top-k rows. Crafted so the pad row would win its shard's top-1:
    codeword 0 is 10*e1, the true best row (id 16, coded to 5*e1) shares
    the final shard with the pads, everything else scores 1."""
    import jax.numpy as jnp

    from anyloc_tpu.ops.pq import PQIndex
    from anyloc_tpu.parallel import pq_search_sharded

    d, m = 8, 1
    cb = np.zeros((m, 4, d), np.float32)
    cb[0, 0, 0] = 10.0   # what a zero pad code decodes to
    cb[0, 1, 0] = 5.0    # the true best row's word
    cb[0, 2, 0] = 1.0
    codes = np.full((17, m), 2, np.uint8)   # 17 rows: pads to 24 on 8 dev
    codes[16, 0] = 1
    index = PQIndex(jnp.asarray(cb), jnp.asarray(codes), method="cosine")
    qu = np.zeros((1, d), np.float32)
    qu[0, 0] = 1.0
    s1, i1 = index.search(qu, 1)
    assert int(np.asarray(i1)[0, 0]) == 16 and float(
        np.asarray(s1)[0, 0]) == 5.0
    ss, ii = pq_search_sharded(index, qu, 1, mesh)
    np.testing.assert_array_equal(ii, np.asarray(i1))
    np.testing.assert_allclose(ss, np.asarray(s1), atol=1e-6)


class TestShardedIVF:
    """ivf_search_sharded: f32 cell buckets shard over 'data' — same
    construction as the IVF-PQ scale-out, exact-equal to IVFIndex.search
    including full-probe == exact."""

    def _fit(self, rng, n=1500, d=32, cells=13, method="cosine"):
        from anyloc_tpu.ops.ivf import ivf_fit

        db = rng.standard_normal((n, d)).astype(np.float32)
        if method == "cosine":
            db /= np.linalg.norm(db, axis=1, keepdims=True)
        return db, ivf_fit(db, cells, method=method, bucket_factor=0.9)

    def test_matches_single_device(self, rng, mesh):
        from anyloc_tpu.parallel import ivf_search_sharded

        db, index = self._fit(rng)  # 13 cells % 8 != 0: padded cell slabs
        assert index.overflow.shape[0] > 0
        qu = db[rng.choice(1500, 12, replace=False)]
        for n_probe in (4, 13):  # partial + full probe
            s1, i1 = index.search(qu, 5, n_probe=n_probe)
            ss, ii = ivf_search_sharded(index, qu, 5, mesh,
                                        n_probe=n_probe)
            np.testing.assert_array_equal(ii, np.asarray(i1))
            np.testing.assert_allclose(ss, np.asarray(s1), atol=1e-5)

    def test_full_probe_equals_exact_engine(self, rng, mesh):
        from anyloc_tpu.ops.retrieval import top_k_search
        from anyloc_tpu.parallel import ivf_search_sharded

        db, index = self._fit(rng, n=800, cells=8)
        qu = db[:10] + 0.01 * rng.standard_normal((10, 32)).astype(
            np.float32)
        _, i_ex = top_k_search(db, qu.astype(np.float32), 5)
        _, ii = ivf_search_sharded(index, qu, 5, mesh, n_probe=8)
        np.testing.assert_array_equal(ii, np.asarray(i_ex))

    def test_l2_method(self, rng, mesh):
        from anyloc_tpu.parallel import ivf_search_sharded

        db, index = self._fit(rng, method="l2")
        qu = db[:8]
        s1, i1 = index.search(qu, 5, n_probe=6)
        ss, ii = ivf_search_sharded(index, qu, 5, mesh, n_probe=6)
        np.testing.assert_array_equal(ii, np.asarray(i1))
        np.testing.assert_allclose(ss, np.asarray(s1), atol=1e-4)
        assert (np.diff(ss, axis=1) >= -1e-6).all()


def test_sharded_engines_randomized_config_sweep(mesh):
    """Randomized corner sweep: 8 random (n, d, cells, probe, k) configs
    per engine must keep sharded == single-device — catches the corners
    the fixed tests don't (k at the shortlist clamp, n_probe > n_cells,
    single-row cells, n barely above n_dev)."""
    from anyloc_tpu.ops.ivf import ivf_fit
    from anyloc_tpu.ops.ivf_pq import ivf_pq_fit
    from anyloc_tpu.ops.pq import pq_fit
    from anyloc_tpu.parallel import (
        ivf_pq_search_sharded, ivf_search_sharded, pq_search_sharded)

    rng = np.random.default_rng(123)
    for trial in range(8):
        n = int(rng.integers(9, 400))
        d = int(rng.choice([16, 32]))
        db = rng.standard_normal((n, d)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        qu = db[rng.choice(n, min(5, n), replace=False)]
        k = int(rng.integers(1, 8))
        m = int(rng.choice([4, 8]))
        cells = int(rng.integers(1, max(2, n // 8)))
        n_probe = int(rng.integers(1, cells + 3))  # may exceed n_cells
        ctx = dict(trial=trial, n=n, d=d, k=k, m=m, cells=cells,
                   n_probe=n_probe)

        pqi = pq_fit(db, m, n_codes=min(64, n), method="cosine")
        s1, i1 = pqi.search(qu, k)
        ss, ii = pq_search_sharded(pqi, qu, k, mesh)
        np.testing.assert_array_equal(ii, np.asarray(i1),
                                      err_msg=str(ctx))
        np.testing.assert_allclose(ss, np.asarray(s1), atol=1e-5,
                                   err_msg=str(ctx))

        ivfi = ivf_fit(db, cells, method="cosine",
                       bucket_factor=float(rng.choice([0.8, 2.0])))
        s1, i1 = ivfi.search(qu, k, n_probe=n_probe)
        ss, ii = ivf_search_sharded(ivfi, qu, k, mesh, n_probe=n_probe)
        np.testing.assert_array_equal(ii, np.asarray(i1),
                                      err_msg=str(ctx))
        np.testing.assert_allclose(ss, np.asarray(s1), atol=1e-5,
                                   err_msg=str(ctx))

        ipqi = ivf_pq_fit(db, cells, m=m, n_codes=min(64, n),
                          method="cosine",
                          bucket_factor=float(rng.choice([0.8, 2.0])))
        s1, i1 = ipqi.search(qu, k, n_probe=n_probe)
        ss, ii = ivf_pq_search_sharded(ipqi, qu, k, mesh, n_probe=n_probe)
        np.testing.assert_array_equal(ii, np.asarray(i1),
                                      err_msg=str(ctx))
        np.testing.assert_allclose(ss, np.asarray(s1), atol=1e-5,
                                   err_msg=str(ctx))


def test_sharded_recall_contract_parity(rng, mesh):
    """The sharded recall wrapper must keep the single-device API's
    contracts (round-5 review): l2 pq dists convert to positive squared
    distances, ivf rejects non-f32 score_dtype, a prebuilt index skips
    the database entirely, and exact-engine k clamps to valid rows."""
    from anyloc_tpu.ops.pq import pq_fit
    from anyloc_tpu.ops.retrieval import get_top_k_recall
    from anyloc_tpu.parallel import top_k_search_sharded
    from anyloc_tpu.parallel.distributed import get_top_k_recall_sharded

    db = rng.standard_normal((400, 32)).astype(np.float32)
    qu = db[:6]
    gt = [np.array([i]) for i in range(6)]

    # l2 pq: dists equal the single-device wrapper's positive distances
    d1, i1, _ = get_top_k_recall(
        [1, 3], db, qu, gt, method="l2", norm_descs=False, engine="pq",
        pq_m=8)
    ds, is_, _ = get_top_k_recall_sharded(
        [1, 3], db, qu, gt, mesh, method="l2", norm_descs=False,
        engine="pq", pq_m=8)
    np.testing.assert_array_equal(is_, np.asarray(i1))
    np.testing.assert_allclose(ds, np.asarray(d1), atol=1e-4)
    assert (ds >= -1e-5).all()  # positive squared distances

    # ivf: non-f32 score_dtype must raise, like the single-device API
    with pytest.raises(ValueError):
        get_top_k_recall_sharded(
            [1], db, qu, gt, mesh, engine="ivf", score_dtype="bfloat16")

    # prebuilt index: the db argument must not be touched (None works)
    dbn = db / np.linalg.norm(db, axis=1, keepdims=True)
    index = pq_fit(dbn, 8, method="cosine")
    _, idx, rec = get_top_k_recall_sharded(
        [1], None, dbn[:6], gt, mesh, engine="pq", index=index)
    assert rec[1] in (1.0, 100.0)

    # exact sharded: k beyond valid rows clamps (10 rows pad to 16)
    small = dbn[:10]
    s, i = top_k_search_sharded(small, small[:2], 14, mesh)
    assert i.shape == (2, 10) and (i < 10).all()
