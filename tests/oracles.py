"""Torch oracles shared by parity tests.

Independent re-implementations of the REFERENCE pipeline semantics
(AnyLoc utilities.py / demo pipeline) in PyTorch+PIL, used as ground truth:
the mini-DINOv2 trunk (exact block math + dinov2 state-dict naming), the
reference's hook-based facet capture, torchvision-free transforms with the
reference's documented order (ToTensor -> Normalize -> tensor-mode bilinear
Resize -> CenterCrop to a patch multiple), hard-assign VLAD, and
FAISS-style top-k recall. Nothing here imports anyloc_tpu — drift between
the two stacks is exactly what the tests measure.
"""
import math

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF


# ---------------------------------------------------------------------------
# torch mini-DINOv2 (trunk oracle; block math of facebookresearch/dinov2)
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
        x1, x2 = self.w12(x).chunk(2, dim=-1)
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


# ---------------------------------------------------------------------------
# reference pipeline oracle (preprocess -> hooked facet -> VLAD -> recall)
# ---------------------------------------------------------------------------

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_reference(pil_img, resize_hw):
    """The reference transform order (SURVEY.md §2.2): ToTensor(/255) ->
    ImageNet Normalize -> tensor-mode bilinear Resize(resize_hw)
    (align_corners=False, antialias=False — torchvision<=0.14 tensor
    default). Returns a [3, H, W] torch tensor."""
    arr = np.asarray(pil_img.convert("RGB"), np.float32) / 255.0
    arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    t = torch.from_numpy(arr.transpose(2, 0, 1))[None]
    t = tF.interpolate(t, size=resize_hw, mode="bilinear", align_corners=False)
    return t[0]


def center_crop_multiple_t(t, multiple=14):
    """torchvision CenterCrop semantics to the next-lower patch multiple:
    crop_top = int(round(margin / 2)) (matches T.CenterCrop)."""
    _, h, w = t.shape
    ch, cw = h - h % multiple, w - w % multiple
    top = int(round((h - ch) / 2.0))
    left = int(round((w - cw) / 2.0))
    return t[:, top : top + ch, left : left + cw]


def hooked_facet(model, imgs, layer, facet="value"):
    """Facet capture exactly the way the reference does it
    (utilities.py:246-285): a forward hook on blocks[layer].attn.qkv grabs
    [B, 1+N, 3D], the FULL model still runs, CLS is dropped, the facet third
    is sliced, and descriptors are L2-normalized."""
    captured = {}

    def hook(_m, _inp, out):
        captured["qkv"] = out

    handle = model.blocks[layer].attn.qkv.register_forward_hook(hook)
    try:
        with torch.no_grad():
            model(imgs)
    finally:
        handle.remove()
    qkv = captured["qkv"][:, 1:]                 # drop CLS
    d = qkv.shape[-1] // 3
    idx = {"query": 0, "key": 1, "value": 2}[facet]
    desc = qkv[:, :, idx * d : (idx + 1) * d]
    return tF.normalize(desc, dim=-1)


def vlad_reference(descs, centers, intra_norm=True):
    """Hard-assign VLAD with the reference semantics (utilities.py:819-890):
    cosine argmax assignment, residual sum per cluster, per-cluster intra
    L2-norm, flatten, final L2-norm. descs [N, D] (already normalized),
    centers [C, D] -> [C*D]."""
    c_norm = tF.normalize(centers, dim=-1)
    labels = (tF.normalize(descs, dim=-1) @ c_norm.T).argmax(dim=1)
    cd = torch.zeros(centers.shape[0], descs.shape[1])
    for ci in range(centers.shape[0]):
        sel = descs[labels == ci]
        if len(sel):
            r = (sel - centers[ci]).sum(dim=0)
            cd[ci] = tF.normalize(r, dim=0) if intra_norm else r
    flat = cd.reshape(-1)
    return tF.normalize(flat, dim=0)


def top_k_recall_reference(top_k, db, qu, gt_pos):
    """FAISS IndexFlatIP-style cosine top-k + np.isin recall accumulation
    (utilities.py:390-469)."""
    sims = qu @ db.T
    order = np.argsort(-sims, axis=1)[:, : max(top_k)]
    recalls = {k: 0.0 for k in top_k}
    for qi in range(qu.shape[0]):
        for k in top_k:
            if np.isin(order[qi, :k], gt_pos[qi]).any():
                recalls[k] += 1.0
    return order, {k: v / qu.shape[0] for k, v in recalls.items()}
