"""DINO v1 ViTExtractor parity vs a torch oracle (stride-patching, per-head
facet flatten, log-binning, saliency)."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

import jax.numpy as jnp

from anyloc_tpu.models.dino_v1 import (
    ViTExtractor,
    convert_dino_v1,
    dino_v1_config,
    log_bin,
)
from anyloc_tpu.models.vit import ViT


# -- torch oracle: mini DINO v1 (no LayerScale, stride-able patch conv) ------

class TBlock(tnn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(d, eps=1e-6)
        self.attn = tnn.Module()
        self.attn.num_heads = heads
        self.attn.qkv = tnn.Linear(d, 3 * d)
        self.attn.proj = tnn.Linear(d, d)
        self.norm2 = tnn.LayerNorm(d, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(d, 4 * d)
        self.mlp.fc2 = tnn.Linear(4 * d, d)

    def attend(self, x):
        b, n, d = x.shape
        h = self.attn.num_heads
        qkv = self.attn.qkv(x).reshape(b, n, 3, h, d // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = ((q @ k.transpose(-2, -1)) * (d // h) ** -0.5).softmax(-1)
        return self.attn.proj((a @ v).transpose(1, 2).reshape(b, n, d)), qkv, a

    def forward(self, x):
        o, _, _ = self.attend(self.norm1(x))
        x = x + o
        x = x + self.mlp.fc2(tF.gelu(self.mlp.fc1(self.norm2(x))))
        return x


class TDino(tnn.Module):
    def __init__(self, img=32, patch=8, stride=4, d=32, depth=3, heads=4):
        super().__init__()
        self.patch, self.stride_ = patch, stride
        self.grid = img // patch
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, d, patch, stride)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, 1 + self.grid ** 2, d) * 0.02)
        self.blocks = tnn.ModuleList([TBlock(d, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(d, eps=1e-6)

    def interp_pos(self, npatch, w, h):
        n = self.pos_embed.shape[1] - 1
        if npatch == n and w == h:
            return self.pos_embed
        dim = self.pos_embed.shape[-1]
        w0 = 1 + (w - self.patch) // self.stride_
        h0 = 1 + (h - self.patch) // self.stride_
        m = int(math.sqrt(n))
        pp = self.pos_embed[:, 1:].reshape(1, m, m, dim).permute(0, 3, 1, 2)
        pp = tF.interpolate(
            pp, scale_factor=((h0 + 0.1) / m, (w0 + 0.1) / m), mode="bicubic",
            align_corners=False, recompute_scale_factor=False,
        )
        assert pp.shape[-2] == h0 and pp.shape[-1] == w0
        pp = pp.permute(0, 2, 3, 1).reshape(1, -1, dim)
        return torch.cat([self.pos_embed[:, :1], pp], dim=1)

    def forward(self, x, upto=None, qkv_layer=None, attn_layer=None):
        b, _, h, w = x.shape
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], 1)
        x = x + self.interp_pos(x.shape[1] - 1, w, h)
        for i, blk in enumerate(self.blocks):
            if qkv_layer == i:
                _, qkv, _ = blk.attend(blk.norm1(x))
                return qkv
            if attn_layer == i:
                _, _, a = blk.attend(blk.norm1(x))
                return a
            x = blk(x)
            if upto == i:
                return x
        return self.norm(x)


def make_pair(stride=4):
    torch.manual_seed(0)
    tm = TDino(stride=stride).eval()
    with torch.no_grad():
        for p in tm.parameters():
            if p.ndim >= 2:
                p.add_(0.02 * torch.randn_like(p))
    cfg = dino_v1_config("dino_vits8", stride=stride, img_size=32)
    cfg = cfg.__class__(**{**cfg.__dict__, "embed_dim": 32, "depth": 3,
                           "num_heads": 4})
    params = convert_dino_v1(tm.state_dict(), cfg)
    return tm, cfg, params


@pytest.mark.parametrize("facet", ["key", "query", "value"])
def test_dino_v1_facet_parity_with_head_minor_flatten(facet):
    tm, cfg, params = make_pair()
    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    layer = 1
    with torch.no_grad():
        qkv = tm(torch.from_numpy(img), qkv_layer=layer)  # [3, B, h, t, dh]
    fidx = {"query": 0, "key": 1, "value": 2}[facet]
    x = qkv[fidx]  # [B, h, t, dh]
    expect = (
        x.permute(0, 2, 3, 1).flatten(-2).numpy()[:, 1:]
    )  # reference head-minor flatten, CLS dropped

    ext = ViTExtractor.__new__(ViTExtractor)
    ext.model_type = "dino_vits8"
    ext.cfg = cfg
    ext.model = ViT(cfg)
    ext.p = cfg.patch_size
    ext.stride = (4, 4)
    ext.params = params
    out = np.asarray(
        ext.extract_descriptors(
            jnp.asarray(img.transpose(0, 2, 3, 1)), layer=layer, facet=facet
        )
    )[:, 0]
    np.testing.assert_allclose(out, expect, atol=3e-5)


def test_dino_v1_stride_grid():
    tm, cfg, params = make_pair(stride=4)
    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 3, 40, 32)).astype(np.float32)
    ext = ViTExtractor.__new__(ViTExtractor)
    ext.model_type = "dino_vits8"
    ext.cfg = cfg
    ext.model = ViT(cfg)
    ext.p = 8
    ext.stride = (4, 4)
    ext.params = params
    out = ext.extract_descriptors(
        jnp.asarray(img.transpose(0, 2, 3, 1)), layer=1, facet="key"
    )
    # grid: 1+(40-8)/4 = 9, 1+(32-8)/4 = 7 -> 63 patches
    assert ext.num_patches == (9, 7)
    assert out.shape == (1, 1, 63, 32)
    # token facet matches the torch block output at a non-square strided grid
    with torch.no_grad():
        expect = tm(torch.from_numpy(img), upto=1).numpy()[:, 1:]
    tok = np.asarray(
        ext.extract_descriptors(
            jnp.asarray(img.transpose(0, 2, 3, 1)), layer=1, facet="token"
        )
    )[:, 0]
    np.testing.assert_allclose(tok, expect, atol=3e-5)


def test_log_bin_matches_torch_oracle():
    """Vectorized log_bin vs a direct transliteration of the reference loop."""
    rng = np.random.default_rng(2)
    gh, gw, d, hierarchy = 5, 4, 6, 2
    x = rng.standard_normal((2, gh * gw, d)).astype(np.float32)
    ours = np.asarray(log_bin(jnp.asarray(x), (gh, gw), hierarchy))

    # torch oracle (reference loop, dino_extractor.py:260-306)
    t = torch.from_numpy(x)  # [B, T, D]
    B = t.shape[0]
    num_bins = 1 + 8 * hierarchy
    bin_x = t.permute(0, 2, 1).reshape(B, d, gh, gw)
    avg_pools = []
    for k in range(hierarchy):
        win = 3 ** k
        avg_pools.append(
            tnn.AvgPool2d(win, stride=1, padding=win // 2,
                          count_include_pad=False)(bin_x)
        )
    out = torch.zeros(B, d * num_bins, gh, gw)
    for y in range(gh):
        for xx in range(gw):
            part = 0
            for k in range(hierarchy):
                ks = 3 ** k
                for i in range(y - ks, y + ks + 1, ks):
                    for j in range(xx - ks, xx + ks + 1, ks):
                        if i == y and j == xx and k != 0:
                            continue
                        ti = max(0, min(i, gh - 1))
                        tj = max(0, min(j, gw - 1))
                        out[:, part * d : (part + 1) * d, y, xx] = \
                            avg_pools[k][:, :, ti, tj]
                        part += 1
    expect = out.flatten(-2).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, expect, atol=1e-5)


def test_saliency_shape():
    tm, cfg, params = make_pair()
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    ext = ViTExtractor.__new__(ViTExtractor)
    ext.model_type = "dino_vits8"
    ext.cfg = cfg
    ext.model = ViT(cfg)
    ext.p = 8
    ext.stride = (4, 4)
    ext.params = params
    # saliency reads layer 11; mini model has 3 blocks -> use monkey surface
    attn = ext.model.apply(params, img, capture_layer=2, capture_facet="attn")
    assert attn.shape[1] == cfg.num_heads
    # compare attn probs vs torch
    with np.errstate(all="ignore"):
        import torch as _t

        with _t.no_grad():
            expect = tm(
                _t.from_numpy(np.asarray(img).transpose(0, 3, 1, 2)), attn_layer=2
            ).numpy()
    np.testing.assert_allclose(np.asarray(attn), expect, atol=3e-5)
