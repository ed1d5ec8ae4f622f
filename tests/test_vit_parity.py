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


# ---------------------------------------------------------------------------
# torch mini-DINOv2 (oracle)
# ---------------------------------------------------------------------------

class TorchMlp(tnn.Module):
    def __init__(self, d, ratio):
        super().__init__()
        h = int(d * ratio)
        self.fc1 = tnn.Linear(d, h)
        self.fc2 = tnn.Linear(h, d)

    def forward(self, x):
        return self.fc2(tF.gelu(self.fc1(x)))


class TorchSwiGLU(tnn.Module):
    def __init__(self, d, ratio):
        super().__init__()
        h = ((int(d * ratio * 2 / 3) + 7) // 8) * 8
        self.w12 = tnn.Linear(d, 2 * h)
        self.w3 = tnn.Linear(h, d)

    def forward(self, x):
        x12 = self.w12(x)
        x1, x2 = x12.chunk(2, dim=-1)
        return self.w3(tF.silu(x1) * x2)


class TorchAttention(tnn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.heads = heads
        self.qkv = tnn.Linear(d, 3 * d)
        self.proj = tnn.Linear(d, d)

    def forward(self, x):
        b, n, d = x.shape
        hd = d // self.heads
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, d)
        return self.proj(out)


class TorchLayerScale(tnn.Module):
    def __init__(self, d, init):
        super().__init__()
        self.gamma = tnn.Parameter(init * torch.ones(d))

    def forward(self, x):
        return x * self.gamma


class TorchBlock(tnn.Module):
    def __init__(self, d, heads, ratio, swiglu):
        super().__init__()
        self.norm1 = tnn.LayerNorm(d, eps=1e-6)
        self.attn = TorchAttention(d, heads)
        self.ls1 = TorchLayerScale(d, 1e-5)
        self.norm2 = tnn.LayerNorm(d, eps=1e-6)
        self.mlp = TorchSwiGLU(d, ratio) if swiglu else TorchMlp(d, ratio)
        self.ls2 = TorchLayerScale(d, 1e-5)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        x = x + self.ls2(self.mlp(self.norm2(x)))
        return x


class TorchMiniDino(tnn.Module):
    def __init__(self, img_size=56, patch=14, d=64, depth=4, heads=4,
                 ratio=4.0, swiglu=False):
        super().__init__()
        self.patch = patch
        self.grid = img_size // patch
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, d, patch, patch)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, 1 + self.grid ** 2, d) * 0.02)
        self.blocks = tnn.ModuleList(
            [TorchBlock(d, heads, ratio, swiglu) for _ in range(depth)]
        )
        self.norm = tnn.LayerNorm(d, eps=1e-6)

    def interpolate_pos_encoding(self, x, gh, gw):
        n = self.pos_embed.shape[1] - 1
        if gh * gw == n and gh == gw:
            return self.pos_embed
        m = int(math.sqrt(n))
        cls_pos = self.pos_embed[:, :1]
        patch_pos = self.pos_embed[:, 1:].reshape(1, m, m, -1).permute(0, 3, 1, 2)
        # real DINOv2 uses scale_factor=(g + 0.1)/m, recompute_scale_factor
        # unset — the fudge shifts sampling, so the oracle must match it
        patch_pos = tF.interpolate(
            patch_pos, scale_factor=((gh + 0.1) / m, (gw + 0.1) / m),
            mode="bicubic", align_corners=False, recompute_scale_factor=False,
        )
        assert patch_pos.shape[-2:] == (gh, gw)
        patch_pos = patch_pos.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)
        return torch.cat([cls_pos, patch_pos], dim=1)

    def forward(self, x):
        b, _, h, w = x.shape
        gh, gw = h // self.patch, w // self.patch
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.interpolate_pos_encoding(x, gh, gw)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


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
