"""Flax ViT vs torch-DINOv2 numerics parity.

The torch model below implements the DINOv2 block math exactly (LayerScale,
eps-1e-6 LayerNorms, fused qkv, exact-erf GELU / SwiGLU-fused, bicubic
pos-embed interpolation) with dinov2 state-dict naming, and facets are
captured the way the *reference* captures them — forward hooks on
``blocks[layer].attn.qkv`` (AnyLoc utilities.py:246-252). Our flax trunk +
converter must reproduce the hooked tensors without hooks.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from anyloc_tpu.models.dinov2 import convert_dinov2
from anyloc_tpu.models.extractor import ViTFacetExtractor
from anyloc_tpu.models.vit import ViT, ViTConfig

import jax.numpy as jnp


from oracles import TorchMiniDino


def make_pair(swiglu=False, img_size=56, depth=4):
    torch.manual_seed(0)
    tm = TorchMiniDino(img_size=img_size, depth=depth, swiglu=swiglu).eval()
    # Give non-trivial weights everywhere (default inits leave some zeros).
    with torch.no_grad():
        for p in tm.parameters():
            if p.ndim >= 2:
                p.add_(0.02 * torch.randn_like(p))
    cfg = ViTConfig(
        img_size=img_size,
        patch_size=14,
        embed_dim=64,
        depth=depth,
        num_heads=4,
        mlp_type="swiglu_fused" if swiglu else "mlp",
        layerscale_init=1e-5,
        ln_eps=1e-6,
        dtype=jnp.float32,
    )
    params = convert_dinov2(tm.state_dict(), cfg)
    return tm, cfg, params


@pytest.mark.parametrize("swiglu", [False, True])
def test_full_forward_parity(swiglu):
    tm, cfg, params = make_pair(swiglu=swiglu)
    rng = np.random.default_rng(1)
    img = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        expect = tm(torch.from_numpy(img)).numpy()
    out = ViT(cfg).apply(params, jnp.asarray(img.transpose(0, 2, 3, 1)))
    got = np.concatenate(
        [np.asarray(out["cls"])[:, None], np.asarray(out["tokens"])], axis=1
    )
    np.testing.assert_allclose(got, expect, atol=2e-5)


@pytest.mark.parametrize("facet", ["query", "key", "value", "token"])
def test_facet_parity_via_reference_hooks(facet):
    """Capture facets the way the reference does (hooks on attn.qkv /
    block output, utilities.py:246-285) and check our truncated forward."""
    tm, cfg, params = make_pair()
    rng = np.random.default_rng(2)
    img = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    layer = 2
    captured = {}
    if facet == "token":
        h = tm.blocks[layer].register_forward_hook(
            lambda m, i, o: captured.__setitem__("out", o)
        )
    else:
        h = tm.blocks[layer].attn.qkv.register_forward_hook(
            lambda m, i, o: captured.__setitem__("out", o)
        )
    with torch.no_grad():
        tm(torch.from_numpy(img))
    h.remove()
    res = captured["out"]
    res = res[:, 1:]  # drop CLS (use_cls=False path)
    if facet != "token":
        d = res.shape[2] // 3
        off = {"query": 0, "key": 1, "value": 2}[facet]
        res = res[:, :, off * d : (off + 1) * d]
    expect = tF.normalize(res, dim=-1).numpy()

    ext = ViTFacetExtractor(cfg, params, layer, facet, norm_descs=True)
    got = np.asarray(ext(jnp.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, expect, atol=3e-5)


def test_pos_embed_interpolation_parity():
    """Non-native resolution exercises the torch-exact bicubic resample."""
    tm, cfg, params = make_pair(img_size=56)
    rng = np.random.default_rng(3)
    img = rng.standard_normal((1, 3, 112, 84)).astype(np.float32)  # 8x6 grid
    with torch.no_grad():
        expect = tm(torch.from_numpy(img)).numpy()
    out = ViT(cfg).apply(params, jnp.asarray(img.transpose(0, 2, 3, 1)))
    got = np.concatenate(
        [np.asarray(out["cls"])[:, None], np.asarray(out["tokens"])], axis=1
    )
    np.testing.assert_allclose(got, expect, atol=3e-5)


def test_use_cls_keeps_first_token():
    tm, cfg, params = make_pair()
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.standard_normal((1, 56, 56, 3)).astype(np.float32))
    with_cls = ViTFacetExtractor(cfg, params, 2, "value", use_cls=True)(img)
    no_cls = ViTFacetExtractor(cfg, params, 2, "value", use_cls=False)(img)
    assert with_cls.shape[1] == no_cls.shape[1] + 1
    np.testing.assert_allclose(
        np.asarray(with_cls)[:, 1:], np.asarray(no_cls), atol=1e-6
    )


def test_facet_truncation_is_cheaper():
    """The captured-layer forward must not execute later blocks: perturbing
    block-3 weights must not change a layer-1 facet."""
    tm, cfg, params = make_pair()
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.standard_normal((1, 56, 56, 3)).astype(np.float32))
    base = np.asarray(ViTFacetExtractor(cfg, params, 1, "value")(img))
    import copy

    p2 = copy.deepcopy(params)
    p2["params"]["blocks_3"]["attn"]["qkv"]["kernel"] = (
        p2["params"]["blocks_3"]["attn"]["qkv"]["kernel"] + 100.0
    )
    perturbed = np.asarray(ViTFacetExtractor(cfg, p2, 1, "value")(img))
    np.testing.assert_array_equal(base, perturbed)


def test_remat_gradient_equality(rng):
    """ViTConfig(remat=True) must be a pure memory/recompute trade: params
    tree, forward outputs, and gradients all identical to the plain trunk."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from anyloc_tpu.models.extractor import init_params
    from anyloc_tpu.models.vit import ViT, ViTConfig

    cfg = ViTConfig(img_size=28, patch_size=14, embed_dim=32, depth=3,
                    num_heads=2, mlp_type="mlp", layerscale_init=1e-5,
                    dtype=jnp.float32)
    rcfg = dataclasses.replace(cfg, remat=True)
    params = init_params(cfg, seed=0)
    rparams = init_params(rcfg, seed=0)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(rparams)

    img = jnp.asarray(rng.standard_normal((2, 28, 28, 3)), jnp.float32)

    def loss(model_cfg):
        def f(p):
            out = ViT(model_cfg).apply(p, img)
            return jnp.sum(out["tokens"] ** 2) + jnp.sum(out["cls"] ** 2)
        return f

    base, gbase = jax.value_and_grad(loss(cfg))(params)
    rem, grem = jax.value_and_grad(loss(rcfg))(params)
    np.testing.assert_allclose(float(rem), float(base), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gbase),
                    jax.tree_util.tree_leaves(grem)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_multilayer_capture_single_pass(rng):
    """capture_layers=[...] (one forward, the reference's multi-hook
    pattern, dino_extractor.py:215-230) must equal per-layer captures."""
    import jax.numpy as jnp
    import pytest

    from anyloc_tpu.models.extractor import init_params
    from anyloc_tpu.models.vit import ViT, ViTConfig

    cfg = ViTConfig(img_size=28, patch_size=14, embed_dim=32, depth=6,
                    num_heads=2, mlp_type="mlp", layerscale_init=1e-5,
                    dtype=jnp.float32)
    params = init_params(cfg, seed=0)
    img = jnp.asarray(rng.standard_normal((2, 28, 28, 3)), jnp.float32)
    for facet in ("value", "key", "token"):
        multi = ViT(cfg).apply(params, img, capture_layers=[1, 4],
                               capture_facet=facet)
        assert sorted(multi) == [1, 4]
        for layer in (1, 4):
            single = ViT(cfg).apply(params, img, capture_layer=layer,
                                    capture_facet=facet)
            np.testing.assert_array_equal(np.asarray(multi[layer]),
                                          np.asarray(single))
    with pytest.raises(ValueError):
        ViT(cfg).apply(params, img, capture_layer=1, capture_layers=[2])
    with pytest.raises(ValueError):
        ViT(cfg).apply(params, img, capture_layers=[2], capture_facet="attn")
