"""LSeg encoder parity vs an independent torch implementation.

The torch oracle below reproduces the lang-seg/DPT module TREE exactly
(``pretrained.model.*`` timm ViT, ``pretrained.act_postprocessN`` with the
Sequential indices the real checkpoints use, ``scratch.*`` refinenets/head)
so that ``model.state_dict()`` IS a lang-seg-format checkpoint — one test
validates the converter's naming map, the Flax DPT modules, the
torch-exact bilinear/deconv semantics, and frozen-BN statistics handling
simultaneously. Reference scope: scripts/lseg_vlad.py:1-304 (the repo this
rebuilds never ships the encoder; architecture per LSeg ICLR'22 + DPT
ICCV'21 and the published checkpoint layout)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax.numpy as jnp

from anyloc_tpu.models.lseg import (LSegConfig, LSegEncoder, convert_lseg,
                                     lseg_backbone_config, lseg_config,
                                     lseg_logits)

# tiny geometry: patch 16, img 64 -> grid 4 (even, so the stride-2 stage
# works); hooks one per quarter like the real [5,11,17,23] of depth 24
D, DEPTH, HEADS, IMG = 64, 8, 4, 64
HOOKS = (1, 3, 5, 7)
REASM = (16, 24, 32, 32)
FEATURES = 16
OUT_DIM = 20


class TorchTimmBlock(tnn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(d, eps=1e-6)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(d, 3 * d)
        self.attn.proj = tnn.Linear(d, d)
        self.heads = heads
        self.norm2 = tnn.LayerNorm(d, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(d, 4 * d)
        self.mlp.fc2 = tnn.Linear(4 * d, d)

    def _attn(self, x):
        b, n, d = x.shape
        hd = d // self.heads
        qkv = self.attn.qkv(x).reshape(b, n, 3, self.heads, hd)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        a = (q @ k.transpose(-2, -1) * hd ** -0.5).softmax(-1)
        return self.attn.proj((a @ v).transpose(1, 2).reshape(b, n, d))

    def forward(self, x):
        x = x + self._attn(self.norm1(x))
        return x + self.mlp.fc2(tF.gelu(self.mlp.fc1(self.norm2(x))))


class TorchTimmViT(tnn.Module):
    def __init__(self):
        super().__init__()
        grid = IMG // 16
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, D, 16, 16)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, D) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, 1 + grid ** 2, D) * 0.02)
        self.blocks = tnn.ModuleList(
            [TorchTimmBlock(D, HEADS) for _ in range(DEPTH)])
        self.norm = tnn.LayerNorm(D, eps=1e-6)

    def forward_hooked(self, x):
        b = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        outs = {}
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in HOOKS:
                outs[i] = x
        return outs


class ProjectReadout(tnn.Module):
    def __init__(self, d):
        super().__init__()
        self.project = tnn.Sequential(tnn.Linear(2 * d, d), tnn.GELU())

    def forward(self, tokens, cls):
        return self.project(
            torch.cat([tokens, cls.expand_as(tokens)], dim=-1))


class ResidualConvUnitT(tnn.Module):
    def __init__(self, f, bn):
        super().__init__()
        self.conv1 = tnn.Conv2d(f, f, 3, padding=1, bias=not bn)
        self.conv2 = tnn.Conv2d(f, f, 3, padding=1, bias=not bn)
        self.use_bn = bn
        if bn:
            self.bn1 = tnn.BatchNorm2d(f)
            self.bn2 = tnn.BatchNorm2d(f)

    def forward(self, x):
        out = tF.relu(x)
        out = self.conv1(out)
        if self.use_bn:
            out = self.bn1(out)
        out = tF.relu(out)
        out = self.conv2(out)
        if self.use_bn:
            out = self.bn2(out)
        return out + x


class FeatureFusionBlockT(tnn.Module):
    def __init__(self, f, bn):
        super().__init__()
        self.resConfUnit1 = ResidualConvUnitT(f, bn)
        self.resConfUnit2 = ResidualConvUnitT(f, bn)
        self.out_conv = tnn.Conv2d(f, f, 1)

    def forward(self, x, res=None):
        if res is not None:
            x = x + self.resConfUnit1(res)
        x = self.resConfUnit2(x)
        x = tF.interpolate(x, scale_factor=2, mode="bilinear",
                           align_corners=True)
        return self.out_conv(x)


class TorchLSeg(tnn.Module):
    """Module tree named EXACTLY like the published lang-seg checkpoint."""

    def __init__(self, use_bn=True):
        super().__init__()
        self.use_bn = use_bn
        self.pretrained = tnn.Module()
        self.pretrained.model = TorchTimmViT()
        mk = lambda *mods: tnn.Sequential(*mods)
        ident = tnn.Identity
        self.pretrained.act_postprocess1 = mk(
            ProjectReadout(D), ident(), ident(),
            tnn.Conv2d(D, REASM[0], 1),
            tnn.ConvTranspose2d(REASM[0], REASM[0], 4, 4))
        self.pretrained.act_postprocess2 = mk(
            ProjectReadout(D), ident(), ident(),
            tnn.Conv2d(D, REASM[1], 1),
            tnn.ConvTranspose2d(REASM[1], REASM[1], 2, 2))
        self.pretrained.act_postprocess3 = mk(
            ProjectReadout(D), ident(), ident(),
            tnn.Conv2d(D, REASM[2], 1))
        self.pretrained.act_postprocess4 = mk(
            ProjectReadout(D), ident(), ident(),
            tnn.Conv2d(D, REASM[3], 1),
            tnn.Conv2d(REASM[3], REASM[3], 3, stride=2, padding=1))
        self.scratch = tnn.Module()
        for i in range(4):
            setattr(self.scratch, f"layer{i + 1}_rn",
                    tnn.Conv2d(REASM[i], FEATURES, 3, padding=1, bias=False))
            setattr(self.scratch, f"refinenet{i + 1}",
                    FeatureFusionBlockT(FEATURES, use_bn))
        self.scratch.head1 = tnn.Conv2d(FEATURES, OUT_DIM, 1)

    def forward(self, x, normalize=True):
        grid = IMG // 16
        hooked = self.pretrained.model.forward_hooked(x)
        aps = [self.pretrained.act_postprocess1,
               self.pretrained.act_postprocess2,
               self.pretrained.act_postprocess3,
               self.pretrained.act_postprocess4]
        rns = [self.scratch.layer1_rn, self.scratch.layer2_rn,
               self.scratch.layer3_rn, self.scratch.layer4_rn]
        pyr = []
        for idx, layer in enumerate(HOOKS):
            t = hooked[layer]
            r = aps[idx][0](t[:, 1:], t[:, :1])        # readout project
            b, n, d = r.shape
            r = r.transpose(1, 2).reshape(b, d, grid, grid)
            for mod in list(aps[idx])[3:]:             # conv (+ resample)
                r = mod(r)
            pyr.append(rns[idx](r))
        p = self.scratch.refinenet4(pyr[3])
        p = self.scratch.refinenet3(p, pyr[2])
        p = self.scratch.refinenet2(p, pyr[1])
        p = self.scratch.refinenet1(p, pyr[0])
        feats = self.scratch.head1(p)
        if normalize:
            feats = feats / feats.norm(dim=1, keepdim=True).clamp_min(1e-12)
        return feats


def _mini_cfg(use_bn=True):
    import dataclasses

    bc = dataclasses.replace(
        lseg_backbone_config(dtype=jnp.float32, img_size=IMG),
        patch_size=16, embed_dim=D, depth=DEPTH, num_heads=HEADS,
    )
    return LSegConfig(backbone=bc, hooks=HOOKS, reassemble_dims=REASM,
                      features=FEATURES, out_dim=OUT_DIM, use_bn=use_bn)


@pytest.mark.parametrize("use_bn", [True, False])
def test_lseg_encoder_matches_torch_oracle(use_bn):
    torch.manual_seed(0)
    model = TorchLSeg(use_bn=use_bn).eval()
    if use_bn:
        # meaningful frozen statistics (fresh BNs have mean 0 / var 1)
        g = torch.Generator().manual_seed(1)
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.num_features, generator=g) * 0.2)
                m.running_var.copy_(
                    torch.rand(m.num_features, generator=g) + 0.5)

    imgs = torch.randn(2, 3, IMG, IMG, generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        want = model(imgs).numpy()                    # [B, C, H/2, W/2]

    cfg = _mini_cfg(use_bn)
    params = convert_lseg(model.state_dict(), cfg)
    got = np.asarray(
        LSegEncoder(cfg).apply(
            params, jnp.asarray(imgs.numpy().transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_lseg_converter_rejects_bn_mismatch():
    torch.manual_seed(0)
    model = TorchLSeg(use_bn=False).eval()
    with pytest.raises(ValueError, match="use_bn"):
        convert_lseg(model.state_dict(), _mini_cfg(use_bn=True))


def test_lseg_net_prefix_stripped():
    torch.manual_seed(0)
    model = TorchLSeg(use_bn=False).eval()
    sd = {f"net.{k}": v for k, v in model.state_dict().items()}
    params = convert_lseg(sd, _mini_cfg(use_bn=False))
    imgs = np.random.default_rng(0).standard_normal((1, IMG, IMG, 3))
    out = LSegEncoder(_mini_cfg(False)).apply(
        params, jnp.asarray(imgs, jnp.float32))
    assert out.shape == (1, IMG // 2, IMG // 2, OUT_DIM)


def test_lseg_logits_match_torch():
    """Zero-shot path: logit matmul + 2x align_corners upsample == torch."""
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((2, 8, 8, OUT_DIM)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    text = rng.standard_normal((5, OUT_DIM)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    scale = 100.0
    got = np.asarray(lseg_logits(
        jnp.asarray(feats), jnp.asarray(text), scale))
    tl = scale * torch.einsum(
        "bhwd,kd->bkhw", torch.from_numpy(feats), torch.from_numpy(text))
    want = tF.interpolate(tl, scale_factor=2, mode="bilinear",
                          align_corners=True).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_lseg_factory_route():
    """make_extractor('lseg') returns a standard [B, N, D] extractor (the
    formerly-gated family; factory.py)."""
    import dataclasses

    from anyloc_tpu.models import factory as F
    from anyloc_tpu.models import lseg as L

    # shrink the default config for test speed
    def tiny(dtype=None, img_size=384, **kw):
        return _mini_cfg(use_bn=True)

    F_lseg_config = L.lseg_config
    L.lseg_config = tiny
    try:
        ex = F.make_extractor("lseg", dtype=jnp.float32, seed=0)
        imgs = np.random.default_rng(0).standard_normal(
            (2, IMG, IMG, 3)).astype(np.float32)
        descs = np.asarray(ex(imgs))
        assert descs.shape == (2, (IMG // 2) ** 2, OUT_DIM)
        np.testing.assert_allclose(
            np.linalg.norm(descs, axis=-1), 1.0, atol=1e-4)
    finally:
        L.lseg_config = F_lseg_config
