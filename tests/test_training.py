"""Trained-baseline slice tests: backbones, GeoLocalizationNet aggregations,
eval path with crop ensembles, mining, a real (tiny) triplet training run,
CosPlace class partitioning + CosFace step, MixVPR model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from anyloc_tpu.data.synthetic import build_vg_bench
from anyloc_tpu.data.loaders.base_dataset import BaseDataset
from anyloc_tpu.models.resnet import ResNet, resnet18_config, resnet50_config
from anyloc_tpu.training.cosplace import (
    MarginCosineProduct,
    assign_classes,
    cosface_loss_fn,
    make_cosplace_train_step,
)
from anyloc_tpu.training.evaluate import evaluate, top_n_voting
from anyloc_tpu.training.mining import TripletMiner
from anyloc_tpu.training.network import GeoLocalizationNet
from anyloc_tpu.training.train_loop import train_triplet


def test_resnet18_shapes(rng):
    model = ResNet(resnet18_config(truncate="conv4"))
    imgs = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(variables, imgs)
    assert out.shape == (1, 4, 4, 256)  # 64/16 at conv4, 256 channels
    model5 = ResNet(resnet18_config(truncate="conv5"))
    v5 = model5.init(jax.random.PRNGKey(0), imgs)
    assert model5.apply(v5, imgs).shape == (1, 2, 2, 512)


def test_resnet50_bottleneck_channels(rng):
    model = ResNet(resnet50_config(truncate="conv4"))
    imgs = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), imgs)
    assert model.apply(v, imgs).shape == (1, 4, 4, 1024)


def test_torchvision_resnet_conversion(rng):
    """torchvision isn't installed; validate the converter against a
    synthetic state dict in torchvision resnet18 naming (shape-true)."""
    from anyloc_tpu.models.resnet import convert_torchvision_resnet

    cfg = resnet18_config(truncate="conv4")
    sd = {}

    def add_bn(name, c):
        sd[f"{name}.weight"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)

    sd["conv1.weight"] = rng.standard_normal((64, 3, 7, 7)).astype(np.float32)
    add_bn("bn1", 64)
    sizes = [(64, 64), (128, 64), (256, 128)]
    for stage, (c_out, c_in) in enumerate(sizes, start=1):
        for i in range(2):
            pre = f"layer{stage}.{i}"
            cin = c_in if i == 0 else c_out
            sd[f"{pre}.conv1.weight"] = rng.standard_normal(
                (c_out, cin, 3, 3)).astype(np.float32) * 0.05
            add_bn(f"{pre}.bn1", c_out)
            sd[f"{pre}.conv2.weight"] = rng.standard_normal(
                (c_out, c_out, 3, 3)).astype(np.float32) * 0.05
            add_bn(f"{pre}.bn2", c_out)
            if i == 0 and c_out != c_in:
                sd[f"{pre}.downsample.0.weight"] = rng.standard_normal(
                    (c_out, cin, 1, 1)).astype(np.float32)
                add_bn(f"{pre}.downsample.1", c_out)
    variables = convert_torchvision_resnet(sd, cfg)
    model = ResNet(cfg)
    imgs = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    out = model.apply(variables, imgs)
    assert out.shape == (1, 4, 4, 256) and np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("agg", ["netvlad", "gem", "mac", "spoc", "rmac", "crn", "rrm"])
def test_geolocalization_net(rng, agg):
    model = GeoLocalizationNet(backbone="resnet18conv4", aggregation=agg,
                               netvlad_clusters=4)
    imgs = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(v, imgs)
    assert out.shape[0] == 2 and out.ndim == 2
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-4
    )


@pytest.fixture(scope="module")
def vg_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("vg")
    build_vg_bench(str(root), n_db=12, n_q=6, size=(64, 64))
    return BaseDataset(str(root), "pitts30k", "test", img_size=(64, 64))


def _desc_fn():
    """Cheap deterministic descriptor: mean-pooled random projection."""
    rng = np.random.default_rng(0)
    w = rng.standard_normal((3, 32)).astype(np.float32)

    def fn(imgs):
        imgs = np.asarray(imgs, np.float32)
        if imgs.ndim == 3:
            imgs = imgs[None]
        feats = imgs.reshape(imgs.shape[0], -1, 3) @ w
        pooled = feats.mean(axis=1)
        return pooled / np.maximum(
            np.linalg.norm(pooled, axis=-1, keepdims=True), 1e-9
        )

    return fn


@pytest.mark.parametrize("method", ["hard_resize", "central_crop",
                                    "single_query", "five_crops",
                                    "nearest_crop", "maj_voting"])
def test_evaluate_methods(vg_ds, method):
    recalls, s = evaluate(_desc_fn(), vg_ds, test_method=method,
                          recall_values=(1, 5), batch_size=4)
    assert recalls.shape == (2,)
    assert 0 <= recalls[0] <= 100 and recalls[1] >= recalls[0]
    assert "R@1" in s


def test_evaluate_efficient_ram_matches_resident(vg_ds):
    """dvgl test_efficient_ram_usage analogue: the streamed-database path
    must reproduce the device-resident recalls exactly (f32 stream)."""
    fn = _desc_fn()
    r0, _ = evaluate(fn, vg_ds, recall_values=(1, 5), batch_size=4)
    r1, _ = evaluate(fn, vg_ds, recall_values=(1, 5), batch_size=4,
                     efficient_ram=True)
    np.testing.assert_array_equal(r0, r1)
    r2, _ = evaluate(fn, vg_ds, recall_values=(1, 5), batch_size=4,
                     efficient_ram=True, stream_dtype="bfloat16")
    assert r2.shape == (2,) and 0 <= r2[0] <= 100


def test_top_n_voting_discounts_repeats():
    preds = np.array([[3, 1], [3, 2], [3, 4], [5, 6], [3, 7]])
    dists = np.ones((5, 2), np.float32)
    top_n_voting("top1", preds, dists, maj_weight=0.1)
    # id 3 appears 4x in column 0 -> those distances discounted by 0.4
    assert np.allclose(dists[:, 0][preds[:, 0] == 3], 0.6)


@pytest.mark.parametrize("mining", ["random", "partial", "full"])
def test_triplet_miner(vg_ds, mining):
    miner = TripletMiner(vg_ds, neg_num=3, mining=mining, neg_samples_num=8)
    trips = miner.compute_triplets(_desc_fn(), n_queries=4, batch_size=4)
    assert len(trips) == 4
    for q, p, negs in trips:
        assert q >= vg_ds.database_num
        pos = vg_ds.get_positives()[q - vg_ds.database_num]
        assert p in pos
        assert len(negs) == 3
        assert not any(n in pos for n in negs)
    batch = miner.tuples_as_batch(trips, [0, 1])
    assert batch.shape == (2, 5, 64, 64, 3)


def test_train_triplet_e2e(vg_ds, tmp_path):
    """A real 2-epoch training run on a tiny GeoLocalizationNet — loss is
    finite, checkpoints written, recall evaluated."""
    model = GeoLocalizationNet(backbone="resnet18conv4", aggregation="gem")
    imgs0 = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), imgs0)

    def descriptor_fn(params, images):
        return model.apply(params, images)

    state, best_r5, hist = train_triplet(
        descriptor_fn, variables, vg_ds, vg_ds,
        epochs=2, queries_per_epoch=4, cache_refresh_every=4,
        batch_size=2, neg_num=2, mining="random",
        output_dir=str(tmp_path / "ckpt"), recall_values=(1, 5),
        eval_batch_size=4,
    )
    assert len(hist) == 2
    assert all(np.isfinite(h["loss"]) for h in hist)
    import os

    assert os.path.exists(tmp_path / "ckpt" / "last_checkpoint")
    from anyloc_tpu.utils.checkpoint import resume_train

    restored, start_epoch, r5 = resume_train(str(tmp_path / "ckpt"))
    assert start_epoch == 2


def test_cosplace_class_assignment():
    east = np.array([0.0, 5.0, 15.0, 105.0])
    north = np.array([0.0, 5.0, 0.0, 0.0])
    groups, classes, labels = assign_classes(east, north, M=10, N=5, L=2)
    # imgs 0,1 same cell -> same group + label; img 2 adjacent cell ->
    # different group (spatial separation); img 3 cell 10 -> (10%5)=0 same
    # group as img 0 but different class
    g_of = {i: g for g, idxs in enumerate(groups) for i in idxs}
    assert g_of[0] == g_of[1]
    assert labels[0] == labels[1]
    assert g_of[2] != g_of[0]
    assert g_of[3] == g_of[0] and labels[3] != labels[0]


def test_cosplace_train_step(rng):
    head = MarginCosineProduct(num_classes=6)
    feats0 = jnp.zeros((2, 16))
    labels0 = jnp.zeros((2,), jnp.int32)
    cp = head.init(jax.random.PRNGKey(0), feats0, labels0)
    w = jnp.asarray(rng.standard_normal((48, 16)).astype(np.float32) * 0.1)
    mp = {"w": w}

    def descriptor_fn(params, images):
        flat = images.reshape(images.shape[0], -1)
        out = flat @ params["w"]
        return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-9)

    step = make_cosplace_train_step(
        descriptor_fn, head, optax.sgd(0.1), optax.sgd(0.1)
    )
    state = step.init_state(mp, cp)
    imgs = jnp.asarray(rng.standard_normal((4, 4, 4, 3)).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 3])
    losses = []
    for _ in range(5):
        state, l = step(state, imgs, labels)
        losses.append(float(l))
    assert losses[-1] < losses[0]  # CosFace loss decreases


def test_mixvpr_model(rng):
    from anyloc_tpu.training.mixvpr import VPRModel

    model = VPRModel(out_channels=8, out_rows=2, mixer_depth=1)
    imgs = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(v, imgs)
    assert out.shape == (1, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out)), 1.0, atol=1e-5)


class TestTripletLossOracles:
    """Loss-function parity vs torch oracles that independently implement the
    reference formulas (dvgl model/functional.py:6-27) and the training
    loop's reduction (dvgl train.py:140-165: batch sum / (B * NEG))."""

    def _tuples(self, rng, b=3, neg=4, d=16):
        q = rng.standard_normal((b, d)).astype(np.float32)
        p = rng.standard_normal((b, d)).astype(np.float32)
        n = rng.standard_normal((b, neg, d)).astype(np.float32)
        return q, p, n

    def test_triplet_margin_matches_torch(self, rng):
        import torch

        from anyloc_tpu.training.triplet import triplet_margin_loss

        q, p, n = self._tuples(rng)
        crit = torch.nn.TripletMarginLoss(margin=0.1, p=2, reduction="sum")
        tq, tp, tn = map(torch.from_numpy, (q, p, n))
        want = sum(
            float(crit(tq[i : i + 1], tp[i : i + 1], tn[i, j : j + 1]))
            for i in range(q.shape[0])
            for j in range(n.shape[1])
        ) / (q.shape[0] * n.shape[1])
        got = float(triplet_margin_loss(jnp.asarray(q), jnp.asarray(p), jnp.asarray(n)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_sare_ind_matches_reference_formula(self, rng):
        import torch
        import torch.nn.functional as F

        from anyloc_tpu.training.triplet import sare_ind_loss

        q, p, n = self._tuples(rng)
        tq, tp, tn = map(torch.from_numpy, (q, p, n))
        total = 0.0
        for i in range(q.shape[0]):
            for j in range(n.shape[1]):
                d_pos = ((tq[i] - tp[i]) ** 2).sum()[None]
                d_neg = ((tq[i] - tn[i, j]) ** 2).sum()[None]
                dist = F.log_softmax(-torch.cat([d_pos, d_neg]), 0)
                total += float(-dist[0])
        want = total / (q.shape[0] * n.shape[1])
        got = float(sare_ind_loss(jnp.asarray(q), jnp.asarray(p), jnp.asarray(n)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_sare_joint_matches_reference_formula(self, rng):
        import torch
        import torch.nn.functional as F

        from anyloc_tpu.training.triplet import sare_joint_loss

        q, p, n = self._tuples(rng)
        tq, tp, tn = map(torch.from_numpy, (q, p, n))
        total = 0.0
        for i in range(q.shape[0]):
            d_pos = ((tq[i] - tp[i]) ** 2).sum()[None]
            d_neg = ((tq[i][None] - tn[i]) ** 2).sum(1)
            dist = F.log_softmax(-torch.cat([d_pos, d_neg]), 0)
            total += float(-dist[0])
        want = total / (q.shape[0] * n.shape[1])
        got = float(sare_joint_loss(jnp.asarray(q), jnp.asarray(p), jnp.asarray(n)))
        np.testing.assert_allclose(got, want, rtol=1e-5)


# ---------------------------------------------------------------------------
# dvgl backbone parity: alexnet / cct384 / vit (network.py:106-198)
# ---------------------------------------------------------------------------

def test_geolocalization_alexnet_forward(rng):
    model = GeoLocalizationNet(backbone="alexnet", aggregation="gem")
    imgs = jnp.asarray(rng.standard_normal((2, 67, 67, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(v, imgs)
    assert out.ndim == 2 and out.shape[0] == 2
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-4
    )


def test_alexnet_matches_torch_oracle(rng):
    """Faithful torchvision features[:-2] geometry: conv/pool semantics vs
    an independently-built torch stack + converter round-trip."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    from anyloc_tpu.models.resnet import AlexNet, convert_torchvision_alexnet

    feats = tnn.Sequential(
        tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(), tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(), tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, padding=1),
    ).eval()
    torch.manual_seed(0)
    for p in feats.parameters():
        p.data.mul_(0.2)
    # state-dict with torchvision's features.N naming
    sd = {}
    for tv_idx, mod_idx in ((0, 0), (3, 3), (6, 6), (8, 8), (10, 10)):
        sd[f"features.{tv_idx}.weight"] = feats[mod_idx].weight
        sd[f"features.{tv_idx}.bias"] = feats[mod_idx].bias
    variables = convert_torchvision_alexnet(sd)
    img = rng.standard_normal((1, 3, 67, 67)).astype(np.float32)
    with torch.no_grad():
        want = feats(torch.from_numpy(img)).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(AlexNet().apply(variables, jnp.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.parametrize("agg", ["netvlad", "gem", "cls"])
def test_geolocalization_cct_forward(rng, agg):
    """cct384 wiring (network.py:144-155): tokens feed netvlad/gem;
    cls gets the CCT sequence-pool vector (spatial aggregators raise)."""
    model = GeoLocalizationNet(
        backbone="cct384", aggregation=agg, netvlad_clusters=4, trunc_te=2
    )
    imgs = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), imgs)
    # trunc_te=2 must keep exactly blocks 0..1
    bb = v["params"]["backbone"]
    assert "norm1_1" in bb and "norm1_2" not in bb
    out = model.apply(v, imgs)
    assert out.ndim == 2 and out.shape[0] == 2
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-4
    )


@pytest.mark.parametrize("agg", ["netvlad", "cls"])
def test_geolocalization_vit_forward(rng, agg):
    """vit wiring (VitWrapper semantics, network.py:189-198): tokens for
    netvlad/gem, CLS otherwise; trunc_te truncates encoder depth."""
    model = GeoLocalizationNet(
        backbone="vit", aggregation=agg, netvlad_clusters=4, trunc_te=2
    )
    imgs = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(v, imgs)
    assert out.ndim == 2 and out.shape[0] == 2
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-4
    )


@pytest.mark.parametrize("backbone", ["alexnet", "cct384"])
def test_train_step_new_backbones(rng, backbone):
    """One real triplet-loss gradient step through each new backbone."""
    import optax

    from anyloc_tpu.training.triplet import triplet_margin_loss

    model = GeoLocalizationNet(
        backbone=backbone, aggregation="gem",
        trunc_te=1 if backbone == "cct384" else None,
    )
    imgs = jnp.asarray(rng.standard_normal((6, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), imgs)
    tx = optax.sgd(1e-3)
    opt_state = tx.init(variables)

    def loss_fn(params):
        d = model.apply(params, imgs, train=False)
        q, pos, neg = d[:2], d[2:4], d[4:6]
        return triplet_margin_loss(q, pos, neg[:, None], margin=0.1)

    loss, grads = jax.value_and_grad(loss_fn)(variables)
    assert np.isfinite(float(loss))
    updates, _ = tx.update(grads, opt_state)
    new_vars = optax.apply_updates(variables, updates)
    loss2 = loss_fn(new_vars)
    assert np.isfinite(float(loss2))


def test_train_cli_cross_flag_validation():
    """parser.py:102-151 validation semantics."""
    from anyloc_tpu.training.train_cli import main

    base = ["--dataset", "pitts30k", "--datasets-folder", "/tmp/none"]
    for extra in (
        ["--queries-per-epoch", "5000", "--cache-refresh-every", "999"],
        ["--mining", "msls_weighted"],
        ["--backbone", "vit", "--resize", "480", "640"],
        ["--backbone", "cct384", "--resize", "480", "640"],
        ["--backbone", "alexnet", "--aggregation", "cls"],
        ["--backbone", "cct384", "--resize", "384", "384", "--aggregation", "rmac"],
        ["--backbone", "vit", "--resize", "224", "224", "--aggregation", "crn"],
        ["--backbone", "resnet18conv4", "--trunc-te", "2"],
    ):
        with pytest.raises(SystemExit):
            main(base + extra)


def test_msls_weighted_mining(vg_ds):
    """MSLS-supplementary weighted query sampling (datasets_ws.py:322-337):
    night/sideways queries are over-sampled; datasets without the marker
    index sets are rejected."""
    from anyloc_tpu.training.mining import TripletMiner

    with pytest.raises(RuntimeError):
        TripletMiner(vg_ds, mining="msls_weighted")
    vg_ds.night_indexes = np.array([0, 1])
    vg_ds.sideways_indexes = np.array([2])
    try:
        miner = TripletMiner(vg_ds, neg_num=2, mining="msls_weighted", seed=0)
        assert miner.query_weights is not None
        # night/sideways queries carry amplified weight
        assert miner.query_weights[0] > miner.query_weights[4]
        trips = miner.compute_triplets(
            lambda imgs: np.asarray(imgs, np.float32).reshape(len(imgs), -1)[:, :8],
            n_queries=4, batch_size=4,
        )
        assert len(trips) == 4
    finally:
        del vg_ds.night_indexes, vg_ds.sideways_indexes


def test_make_augment_fn_shapes(rng):
    from anyloc_tpu.data.augment import make_augment_fn

    fn = make_augment_fn(brightness=0.3, contrast=0.3, saturation=0.2,
                         hue=0.1, horizontal_flip=True,
                         random_resized_crop=0.7)
    imgs = jnp.asarray(rng.random((4, 32, 40, 3)).astype(np.float32))
    out = fn(jax.random.PRNGKey(0), imgs)
    assert out.shape == imgs.shape
    assert np.isfinite(np.asarray(out)).all()
    # identity config composes to a no-op
    ident = make_augment_fn()
    np.testing.assert_array_equal(
        np.asarray(ident(jax.random.PRNGKey(1), imgs)), np.asarray(imgs)
    )


def test_make_augment_fn_normalized_ordering(rng):
    """With imagenet_normalized=True (the triplet-loop wiring), jittering a
    normalized batch must equal normalize(jitter(raw [0,1] batch)) — the
    reference applies ColorJitter BEFORE Normalize (datasets_ws.py:292-298)."""
    from anyloc_tpu.data.augment import make_augment_fn
    from anyloc_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    raw = rng.random((3, 16, 16, 3)).astype(np.float32)
    norm = (raw - IMAGENET_MEAN) / IMAGENET_STD
    kw = dict(brightness=0.4, contrast=0.3, saturation=0.3, hue=0.2)
    key = jax.random.PRNGKey(7)
    got = np.asarray(
        make_augment_fn(**kw, imagenet_normalized=True)(key, jnp.asarray(norm))
    )
    want = (
        np.asarray(
            make_augment_fn(**kw, imagenet_normalized=False)(
                key, jnp.asarray(raw)
            )
        )
        - IMAGENET_MEAN
    ) / IMAGENET_STD
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_token_backbone_rejects_spatial_aggregations(rng):
    """parser.py:146-151 semantics enforced at the model level: CCT/ViT
    token backbones raise for spatial-map aggregators instead of silently
    training a different head."""
    for agg in ("crn", "rrm", "mac"):
        model = GeoLocalizationNet(backbone="cct384", aggregation=agg)
        with pytest.raises(ValueError, match="can't work with aggregation"):
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)))


def test_train_triplet_patience_early_stop(vg_ds, tmp_path):
    """patience semantics (train.py:183-206): constant recalls stop the run
    after `patience` stale epochs."""
    model = GeoLocalizationNet(backbone="alexnet", aggregation="gem")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    state, best, hist = train_triplet(
        lambda p, im: model.apply(p, im), variables, vg_ds, vg_ds,
        epochs=6, queries_per_epoch=2, cache_refresh_every=2,
        batch_size=2, neg_num=2, mining="random", lr=0.0, optim="sgd",
        patience=2, output_dir=str(tmp_path / "ck"), recall_values=(1, 5),
        eval_batch_size=4,
    )
    # lr=0 -> params never change -> identical recalls -> early stop
    assert len(hist) < 6


def test_freeze_te_mask_zeroes_frozen_updates(rng):
    """--freeze_te semantics (network.py:150-160): backbone embeddings +
    blocks <= freeze_te get ZERO updates; later blocks and the head train."""
    import optax

    from anyloc_tpu.training.network import make_freeze_te_mask
    from anyloc_tpu.training.triplet import triplet_margin_loss

    model = GeoLocalizationNet(backbone="cct384", aggregation="gem",
                               trunc_te=2)
    imgs = jnp.asarray(rng.standard_normal((6, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), imgs)
    mask_fn = make_freeze_te_mask(0)
    opt = optax.multi_transform(
        {"train": optax.sgd(1.0), "freeze": optax.set_to_zero()},
        lambda p: jax.tree_util.tree_map(
            lambda t: "train" if t else "freeze", mask_fn(p)),
    )
    opt_state = opt.init(variables)

    def loss_fn(params):
        d = model.apply(params, imgs)
        return triplet_margin_loss(d[:2], d[2:4], d[4:6][:, None], margin=0.5)

    _, grads = jax.value_and_grad(loss_fn)(variables)
    updates, _ = opt.update(grads, opt_state)
    new_vars = optax.apply_updates(variables, updates)
    bb_old = variables["params"]["backbone"]
    bb_new = new_vars["params"]["backbone"]
    # block 0 and the tokenizer frozen; block 1 trainable
    np.testing.assert_array_equal(
        np.asarray(bb_new["qkv_0"]["kernel"]), np.asarray(bb_old["qkv_0"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(bb_new["tokenizer"]["conv_0"]["kernel"]),
        np.asarray(bb_old["tokenizer"]["conv_0"]["kernel"]))
    assert not np.array_equal(
        np.asarray(bb_new["qkv_1"]["kernel"]), np.asarray(bb_old["qkv_1"]["kernel"]))


def test_freeze_te_cli_validation():
    from anyloc_tpu.training.train_cli import main

    with pytest.raises(SystemExit):
        main(["--dataset", "x", "--datasets-folder", "/tmp/none",
              "--backbone", "resnet18conv4", "--freeze-te", "2"])


@pytest.mark.parametrize("backbone,agg,size", [
    ("vit", "cls", 224), ("cct384", "seqpool", 384),
])
def test_train_cli_cls_seqpool_e2e(tmp_path, backbone, agg, size):
    """cls/seqpool pass straight through to GeoLocalizationNet (a former
    CLI remap to 'mac' crashed every token-backbone pooled run at init)."""
    from anyloc_tpu.data.synthetic import build_vg_bench
    from anyloc_tpu.training.train_cli import main

    build_vg_bench(str(tmp_path / "vg"), n_db=4, n_q=2, size=(size, size))
    rc = main([
        "--dataset", "pitts30k", "--datasets-folder", str(tmp_path / "vg"),
        "--backbone", backbone, "--aggregation", agg,
        "--resize", str(size), str(size), "--trunc-te", "1",
        "--epochs", "1", "--queries-per-epoch", "2",
        "--cache-refresh-every", "2", "--mining", "random",
        "--train-batch-size", "2", "--neg-num", "1",
        "--infer-batch-size", "4", "--recall-values", "1",
        "--output-dir", str(tmp_path / "out"),
    ])
    assert rc == 0
