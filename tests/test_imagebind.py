"""ImageBind multimodal surface: every modality embeds into the joint space."""

import numpy as np
import pytest

import jax.numpy as jnp

from anyloc_tpu.models import imagebind as ib


@pytest.fixture(scope="module")
def tiny_model(monkeypatch_module=None):
    m = ib.ImageBindModel.__new__(ib.ImageBindModel)
    import jax

    m.dtype = jnp.float32
    m.seed = 0
    # shrink every trunk for test speed
    m.vision_cfg = ib.imagebind_vision_config(img_size=28)
    m.vision_cfg = m.vision_cfg.__class__(
        **{**m.vision_cfg.__dict__, "embed_dim": 32, "depth": 2, "num_heads": 4}
    )
    from anyloc_tpu.models.vit import ViT

    m.vision = ViT(m.vision_cfg)
    m.text = ib.ImageBindText(vocab=500, context=16, embed_dim=32, depth=2,
                              heads=4, out_dim=16)
    m.audio = ib._PatchTrunk(32, 2, 4, out_dim=16, kernel=16, stride=10,
                             in_hw=(128, 204))
    m.depth = ib._PatchTrunk(32, 2, 4, out_dim=16, kernel=16)
    m.thermal = ib._PatchTrunk(32, 2, 4, out_dim=16, kernel=16)
    m.imu = ib._PatchTrunk(32, 2, 4, out_dim=16, kernel=8, mode="linear1d")
    from anyloc_tpu.models.clip import SimpleTokenizer

    m.tokenizer = SimpleTokenizer(vocab=500, allow_hash_fallback=True)
    m._params, m._fns = {}, {}
    m.logit_scales = {k: 1.0 for k in
                      ('vision', 'text', 'audio', 'depth', 'thermal', 'imu')}
    return m


def test_text_modality(tiny_model):
    out = tiny_model({"text": ["a shopping mall", "an aerial view"]})
    emb = np.asarray(out["text"])
    assert emb.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)


def test_audio_modality(tiny_model, rng):
    mel = rng.standard_normal((2, 128, 204)).astype(np.float32)
    out = tiny_model({"audio": mel})
    assert out["audio"].shape == (2, 16)


def test_depth_thermal_imu(tiny_model, rng):
    out = tiny_model({
        "depth": rng.standard_normal((1, 64, 64)).astype(np.float32),
        "thermal": rng.standard_normal((1, 64, 64)).astype(np.float32),
        "imu": rng.standard_normal((1, 6, 80)).astype(np.float32),
    })
    for k in ("depth", "thermal", "imu"):
        assert out[k].shape[0] == 1
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out[k]), axis=1), 1.0, atol=1e-5
        )


def test_log_mel_spectrogram():
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    wave = np.sin(2 * np.pi * 440 * t)
    mel = ib.log_mel_spectrogram(wave, sr)
    assert mel.shape == (128, 204)
    # a pure 440 Hz tone concentrates energy in the low-frequency mel bins
    assert mel[:20].mean() > mel[100:].mean()


def test_vision_extractor_still_gates_other_modalities(rng):
    cfg = ib.imagebind_vision_config(img_size=28)
    cfg = cfg.__class__(**{**cfg.__dict__, "embed_dim": 32, "depth": 1,
                           "num_heads": 4})
    from anyloc_tpu.models.vit import ViT
    import jax

    v = ib.ImageBindVision.__new__(ib.ImageBindVision)
    v.cfg = cfg
    v.model = ViT(cfg)
    v.params = v.model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3))
    )
    v._fwd = jax.jit(
        lambda p, im: (
            v.model.apply(p, im)["cls"].astype(jnp.float32),
            v.model.apply(p, im)["tokens"].astype(jnp.float32),
        )
    )
    out = v(np.zeros((1, 28, 28, 3), np.float32))
    assert out["cls"].shape == (1, 32)
    with pytest.raises(NotImplementedError):
        v(np.zeros((1, 28, 28, 3), np.float32), modality="audio")


# ---------------------------------------------------------------------------
# Converter parity vs torch oracles (reference module semantics rebuilt
# independently with torch primitives; no reference code imported)
# ---------------------------------------------------------------------------

def _torch_trunk(d, nh, depth, bias_kv, seed=0):
    import torch

    torch.manual_seed(seed)
    blocks = []
    for _ in range(depth):
        blk = {
            "attn": torch.nn.MultiheadAttention(
                d, nh, bias=True, add_bias_kv=bias_kv
            ),
            "norm1": torch.nn.LayerNorm(d, eps=1e-6),
            "norm2": torch.nn.LayerNorm(d, eps=1e-6),
            "fc1": torch.nn.Linear(d, 4 * d),
            "fc2": torch.nn.Linear(4 * d, d),
        }
        for m in blk.values():
            for prm in m.parameters():
                torch.nn.init.normal_(prm, std=0.05)
        blocks.append(blk)
    return blocks


def _torch_trunk_forward(blocks, x, causal=False):
    """x [B, T, D] -> reference SimpleTransformer forward (seq-first MHA)."""
    import torch

    t = x.shape[1]
    mask = None
    if causal:
        mask = torch.full((t, t), float("-inf"))
        mask.triu_(1)
    h = x.transpose(0, 1)  # b l d -> l b d (pre_transformer_layer rearrange)
    for blk in blocks:
        a = blk["attn"](blk["norm1"](h), blk["norm1"](h), blk["norm1"](h),
                        need_weights=False, attn_mask=mask)[0]
        h = h + a
        m = blk["fc2"](torch.nn.functional.gelu(blk["fc1"](blk["norm2"](h))))
        h = h + m
    return h.transpose(0, 1)


def _trunk_sd(blocks, prefix, bias_kv):
    sd = {}
    for i, blk in enumerate(blocks):
        b = f"{prefix}.blocks.{i}"
        sd[f"{b}.attn.in_proj_weight"] = blk["attn"].in_proj_weight
        sd[f"{b}.attn.in_proj_bias"] = blk["attn"].in_proj_bias
        sd[f"{b}.attn.out_proj.weight"] = blk["attn"].out_proj.weight
        sd[f"{b}.attn.out_proj.bias"] = blk["attn"].out_proj.bias
        if bias_kv:
            sd[f"{b}.attn.bias_k"] = blk["attn"].bias_k
            sd[f"{b}.attn.bias_v"] = blk["attn"].bias_v
        sd[f"{b}.norm_1.weight"] = blk["norm1"].weight
        sd[f"{b}.norm_1.bias"] = blk["norm1"].bias
        sd[f"{b}.norm_2.weight"] = blk["norm2"].weight
        sd[f"{b}.norm_2.bias"] = blk["norm2"].bias
        sd[f"{b}.mlp.fc1.weight"] = blk["fc1"].weight
        sd[f"{b}.mlp.fc1.bias"] = blk["fc1"].bias
        sd[f"{b}.mlp.fc2.weight"] = blk["fc2"].weight
        sd[f"{b}.mlp.fc2.bias"] = blk["fc2"].bias
    return sd


def test_patch_modality_converter_matches_torch_oracle():
    """Audio tower (conv stem + add_bias_kv trunk + LN/CLS/Linear head):
    converted flax forward == torch forward with the same state dict."""
    import torch

    torch.manual_seed(1)
    d, nh, depth, out_dim = 32, 4, 2, 16
    conv = torch.nn.Conv2d(1, d, 16, stride=10, bias=False)
    stem_norm = torch.nn.LayerNorm(d)          # torch default eps 1e-5
    head_norm = torch.nn.LayerNorm(d, eps=1e-6)
    head = torch.nn.Linear(d, out_dim, bias=False)
    for m in (conv, stem_norm, head_norm, head):
        for prm in m.parameters():
            torch.nn.init.normal_(prm, std=0.05)
    blocks = _torch_trunk(d, nh, depth, bias_kv=True)
    x = torch.randn(2, 1, 32, 46)
    tok = conv(x).flatten(2).transpose(1, 2)   # [B, t, D]
    tok = stem_norm(tok)
    t = tok.shape[1]
    cls = torch.randn(1, 1, d) * 0.05
    pos = torch.randn(1, t + 1, d) * 0.05
    tok = torch.cat([cls.expand(2, -1, -1), tok], 1) + pos
    trunk_out = _torch_trunk_forward(blocks, tok)
    want = head(head_norm(trunk_out[:, 0]))
    want = torch.nn.functional.normalize(want, dim=-1).detach().numpy()

    sd = {
        "modality_preprocessors.audio.rgbt_stem.proj.weight": conv.weight,
        "modality_preprocessors.audio.rgbt_stem.norm_layer.weight": stem_norm.weight,
        "modality_preprocessors.audio.rgbt_stem.norm_layer.bias": stem_norm.bias,
        "modality_preprocessors.audio.cls_token": cls,
        "modality_preprocessors.audio.pos_embedding_helper.pos_embed": pos,
        "modality_heads.audio.0.weight": head_norm.weight,
        "modality_heads.audio.0.bias": head_norm.bias,
        "modality_heads.audio.2.weight": head.weight,
        **_trunk_sd(blocks, "modality_trunks.audio", bias_kv=True),
    }
    params = ib.convert_imagebind_patch(sd, ib.ModalityType.AUDIO, depth=depth)
    model = ib._PatchTrunk(d, depth, nh, out_dim=out_dim, kernel=16,
                           stride=10)
    got = np.asarray(model.apply(params, jnp.asarray(x.numpy()[:, 0])))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_text_converter_matches_torch_oracle():
    """Causal text tower: embed + pos -> causal trunk -> EOS LN/Linear."""
    import torch

    torch.manual_seed(2)
    vocab, ctx, d, nh, depth, out_dim = 50, 12, 32, 4, 2, 16
    emb = torch.nn.Embedding(vocab, d)
    head_norm = torch.nn.LayerNorm(d, eps=1e-6)
    head = torch.nn.Linear(d, out_dim, bias=False)
    for m in (emb, head_norm, head):
        for prm in m.parameters():
            torch.nn.init.normal_(prm, std=0.05)
    pos = torch.randn(1, ctx, d) * 0.05
    blocks = _torch_trunk(d, nh, depth, bias_kv=False, seed=3)
    ids = torch.randint(1, vocab - 1, (2, ctx))
    ids[0, 5] = vocab - 1   # EOT = highest id
    ids[1, 9] = vocab - 1
    tok = emb(ids) + pos
    trunk_out = _torch_trunk_forward(blocks, tok, causal=True)
    eos = ids.argmax(-1)
    pooled = trunk_out[torch.arange(2), eos]
    want = torch.nn.functional.normalize(
        head(head_norm(pooled)), dim=-1
    ).detach().numpy()

    sd = {
        "modality_preprocessors.text.token_embedding.weight": emb.weight,
        "modality_preprocessors.text.pos_embed": pos,
        "modality_heads.text.proj.0.weight": head_norm.weight,
        "modality_heads.text.proj.0.bias": head_norm.bias,
        "modality_heads.text.proj.1.weight": head.weight,
        **_trunk_sd(blocks, "modality_trunks.text", bias_kv=False),
    }
    params = ib.convert_imagebind_text(sd, depth=depth)
    model = ib.ImageBindText(vocab=vocab, context=ctx, embed_dim=d,
                             depth=depth, heads=nh, out_dim=out_dim)
    got = np.asarray(model.apply(params, jnp.asarray(ids.numpy())))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_default_logit_scales_match_reference():
    m = ib.ImageBindModel()   # lazy init: constructing is parameter-free
    assert m.logit_scales[ib.ModalityType.AUDIO] == 20.0
    assert m.logit_scales[ib.ModalityType.DEPTH] == 5.0
    assert m.logit_scales[ib.ModalityType.THERMAL] == 10.0
    assert m.logit_scales[ib.ModalityType.IMU] == 5.0
    assert abs(m.logit_scales[ib.ModalityType.TEXT] - 1 / 0.07) < 1e-6
