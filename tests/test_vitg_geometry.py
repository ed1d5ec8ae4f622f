"""Full ViT-G/14 geometry parity (verdict round-2 item 2).

Everything else in the suite runs toy geometry; these tests lock the exact
flagship shape the real dinov2_vitg14 checkpoint would exercise:

  * 1536-d, 24 heads, SwiGLU-fused MLP (hidden 4096), LayerScale, eps-1e-6
    LayerNorms — a 2-block slice vs the torch oracle in f32;
  * the 37x37 pos-embed table (518-px training grid) bicubically
    interpolated — with dinov2's 0.1 scale fudge — down to 16x16 (224 px)
    and 22x22 (308 px), the two operating points bench.py reports;
  * a synthetic FULL dinov2_vitg14 state dict (40 blocks, real key names —
    flat and chunked variants, incl. mask_token) round-tripped through
    convert_dinov2 and shape-locked against ViT.init;
  * the HF ``Dinov2Model(use_swiglu_ffn=True)`` layout at full width vs our
    converter + trunk (518 px native grid; HF's own pos-embed interpolation
    dropped the 0.1 fudge in recent transformers, so interpolation parity
    is asserted against the torch oracle above, not HF).

Reference geometry: torch.hub dinov2 ViT-G (AnyLoc utilities.py:219-288).
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from anyloc_tpu.models.dinov2 import convert_dinov2, dinov2_config
from anyloc_tpu.models.extractor import ViTFacetExtractor
from anyloc_tpu.models.vit import ViT

from oracles import TorchMiniDino, hooked_facet

# the real giant is depth 40; a 2-block slice is oracle-affordable and
# covers every per-block tensor at the true width
GD, GHEADS, GDEPTH = 1536, 24, 2


def _vitg_cfg(depth=GDEPTH):
    cfg = dinov2_config("dinov2_vitg14", dtype=jnp.float32)
    return dataclasses.replace(cfg, depth=depth)


@pytest.fixture(scope="module")
def vitg_pair():
    torch.manual_seed(0)
    tm = TorchMiniDino(
        img_size=518, patch=14, d=GD, depth=GDEPTH, heads=GHEADS,
        ratio=4.0, swiglu=True,
    ).eval()
    with torch.no_grad():
        for p in tm.parameters():
            if p.ndim >= 2:
                p.add_(0.02 * torch.randn_like(p))
    cfg = _vitg_cfg()
    params = convert_dinov2(tm.state_dict(), cfg)
    return tm, cfg, params


def test_vitg_swiglu_hidden_dim(vitg_pair):
    """hidden = round8(1536 * 4 * 2/3) = 4096 on both sides."""
    tm, cfg, params = vitg_pair
    assert tm.blocks[0].mlp.w12.out_features == 2 * 4096
    assert params["params"]["blocks_0"]["mlp"]["w12"]["kernel"].shape == (
        GD, 2 * 4096)
    assert params["params"]["pos_embed"].shape == (1, 1 + 37 * 37, GD)


@pytest.mark.parametrize("img_size,grid", [(224, 16), (308, 22)])
def test_vitg_facet_parity_at_flagship_resolutions(vitg_pair, img_size, grid):
    """Value facet at the two bench operating points: exercises the 37x37 ->
    16x16 / 22x22 bicubic pos-embed interpolation (0.1 fudge) plus the full
    1536-d/24-head block math against the reference's hook capture."""
    tm, cfg, params = vitg_pair
    rng = np.random.default_rng(img_size)
    img = rng.standard_normal((1, 3, img_size, img_size)).astype(np.float32)

    expect = hooked_facet(tm, torch.from_numpy(img), layer=1, facet="value")
    assert expect.shape == (1, grid * grid, GD)

    ext = ViTFacetExtractor(cfg, params, layer=1, facet="value")
    got = np.asarray(ext(jnp.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, expect.numpy(), atol=5e-4)
    # descriptors are unit vectors; the cosine criterion is what the
    # pipeline actually depends on — assert it tightly as well
    cos = (got * expect.numpy()).sum(-1)
    assert float(cos.min()) > 1 - 1e-6


def test_vitg_full_forward_parity(vitg_pair):
    tm, cfg, params = vitg_pair
    rng = np.random.default_rng(7)
    img = rng.standard_normal((1, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        expect = tm(torch.from_numpy(img)).numpy()
    out = ViT(cfg).apply(params, jnp.asarray(img.transpose(0, 2, 3, 1)))
    got = np.concatenate(
        [np.asarray(out["cls"])[:, None], np.asarray(out["tokens"])], axis=1)
    np.testing.assert_allclose(got, expect, atol=5e-4)


# ---------------------------------------------------------------------------
# full 40-block synthetic state dict: naming + shape lock
# ---------------------------------------------------------------------------

def _vitg_state_dict(chunked: bool):
    """Every key of the public dinov2_vitg14 checkpoint, real shapes.
    chunked=True uses the block_chunks>0 naming (blocks.{chunk}.{global_i})
    the dinov2 code emits when built with chunked blocks."""
    d, depth, hidden = 1536, 40, 4096
    z = np.zeros
    sd = {
        "cls_token": z((1, 1, d), np.float32),
        "mask_token": z((1, d), np.float32),  # present in the real ckpt; unused
        "pos_embed": z((1, 1 + 37 * 37, d), np.float32),
        "patch_embed.proj.weight": z((d, 3, 14, 14), np.float32),
        "patch_embed.proj.bias": z((d,), np.float32),
        "norm.weight": np.ones((d,), np.float32),
        "norm.bias": z((d,), np.float32),
    }
    for i in range(depth):
        pre = f"blocks.{i // 10}.{i}" if chunked else f"blocks.{i}"
        sd.update({
            f"{pre}.norm1.weight": np.ones((d,), np.float32),
            f"{pre}.norm1.bias": z((d,), np.float32),
            f"{pre}.attn.qkv.weight": z((3 * d, d), np.float32),
            f"{pre}.attn.qkv.bias": z((3 * d,), np.float32),
            f"{pre}.attn.proj.weight": z((d, d), np.float32),
            f"{pre}.attn.proj.bias": z((d,), np.float32),
            f"{pre}.ls1.gamma": z((d,), np.float32),
            f"{pre}.norm2.weight": np.ones((d,), np.float32),
            f"{pre}.norm2.bias": z((d,), np.float32),
            f"{pre}.mlp.w12.weight": z((2 * hidden, d), np.float32),
            f"{pre}.mlp.w12.bias": z((2 * hidden,), np.float32),
            f"{pre}.mlp.w3.weight": z((d, hidden), np.float32),
            f"{pre}.mlp.w3.bias": z((d,), np.float32),
            f"{pre}.ls2.gamma": z((d,), np.float32),
        })
    return sd


@pytest.mark.parametrize("chunked", [False, True])
def test_vitg_full_state_dict_shape_lock(chunked):
    """convert_dinov2 over the COMPLETE 40-block giant state dict must
    produce exactly the parameter tree ViT.init would — any naming or shape
    drift a real checkpoint could expose fails here, without weights."""
    cfg = dinov2_config("dinov2_vitg14", dtype=jnp.float32)
    sd = _vitg_state_dict(chunked)
    params = convert_dinov2(sd, cfg)

    expect = jax.eval_shape(
        ViT(cfg).init, jax.random.PRNGKey(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
    )
    got_shapes = jax.tree.map(lambda a: tuple(a.shape), params)
    want_shapes = jax.tree.map(lambda a: tuple(a.shape), expect)
    # pos_embed: init builds the cfg.img_size grid (518 -> 37x37), matching
    # the checkpoint table; everything must agree exactly
    assert got_shapes == want_shapes


def test_vitg_state_dict_missing_block_raises():
    cfg = dinov2_config("dinov2_vitg14", dtype=jnp.float32)
    sd = _vitg_state_dict(False)
    for k in list(sd):
        if k.startswith("blocks.17."):
            del sd[k]
    with pytest.raises(KeyError, match="block 17"):
        convert_dinov2(sd, cfg)


# ---------------------------------------------------------------------------
# HF transformers cross-check at full width (native 518 grid)
# ---------------------------------------------------------------------------

def test_vitg_hf_swiglu_cross_check():
    transformers = pytest.importorskip("transformers")
    torch.manual_seed(1)
    hf_cfg = transformers.Dinov2Config(
        hidden_size=GD, num_hidden_layers=GDEPTH, num_attention_heads=GHEADS,
        mlp_ratio=4, use_swiglu_ffn=True, image_size=518, patch_size=14,
        layerscale_value=1e-5,
    )
    hm = transformers.Dinov2Model(hf_cfg).eval()
    with torch.no_grad():
        for p in hm.parameters():
            if p.ndim >= 2:
                p.add_(0.02 * torch.randn_like(p))

    cfg = _vitg_cfg()
    params = convert_dinov2(hm.state_dict(), cfg)

    rng = np.random.default_rng(3)
    img = rng.standard_normal((1, 3, 518, 518)).astype(np.float32)
    with torch.no_grad():
        expect = hm(torch.from_numpy(img)).last_hidden_state.numpy()
    out = ViT(cfg).apply(params, jnp.asarray(img.transpose(0, 2, 3, 1)))
    got = np.concatenate(
        [np.asarray(out["cls"])[:, None], np.asarray(out["tokens"])], axis=1)
    np.testing.assert_allclose(got, expect, atol=8e-4)
