"""HF-format checkpoint ingestion, parity-tested against ``transformers``.

The environment has no pretrained weights (zero egress), so converter
correctness is proven the next-best way: build each HF model with RANDOM
weights, push its state dict through our converters
(models/hf_convert.py -> the per-family converters), and require our
forward to equal the transformers implementation's forward — an oracle
that is fully independent of both this repo and the torch oracles in
tests/oracles.py.

Covers the HF redistributions of every checkpoint family the reference
loads from the original repos: facebook/dinov2-* (utilities.py:239-240),
facebook/vit-mae-* (models_mae.py), openai/clip-vit-* (clip_wrapper.py),
facebook/sam-vit-* (scripts/SAM_vlad.py:140).
"""

import numpy as np
import pytest

import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402


def _nchw(rng, b, s):
    return rng.standard_normal((b, 3, s, s)).astype(np.float32)


def _nhwc(img):
    return jnp.asarray(img.transpose(0, 2, 3, 1))


# ---------------------------------------------------------------------------
# DINOv2
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("swiglu", [False, True], ids=["mlp", "swiglu"])
def test_dinov2_hf_parity(rng, swiglu):
    """Dinov2Model (both FFN variants — SwiGLU is the giant's) == our ViT
    after hf_to_dinov2 + convert_dinov2."""
    from anyloc_tpu.models.dinov2 import convert_dinov2
    from anyloc_tpu.models.vit import ViT, ViTConfig

    torch.manual_seed(0)
    hcfg = transformers.Dinov2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        patch_size=14, image_size=28, use_swiglu_ffn=swiglu, mlp_ratio=4,
    )
    tm = transformers.Dinov2Model(hcfg).eval()
    cfg = ViTConfig(
        img_size=28, patch_size=14, embed_dim=64, depth=2, num_heads=4,
        mlp_type="swiglu_fused" if swiglu else "mlp",
        layerscale_init=1e-5, ln_eps=1e-6,
    )
    params = convert_dinov2(tm.state_dict(), cfg)

    img = _nchw(rng, 2, 28)
    with torch.no_grad():
        expect = tm(torch.from_numpy(img)).last_hidden_state.numpy()
    out = ViT(cfg).apply(params, _nhwc(img))
    got = np.concatenate(
        [np.asarray(out["cls"])[:, None], np.asarray(out["tokens"])], 1
    )
    np.testing.assert_allclose(got, expect, atol=3e-5)


# ---------------------------------------------------------------------------
# DINO v1 (HF redistributes facebook/dino-vit* as plain ViTModel)
# ---------------------------------------------------------------------------

def test_dino_v1_hf_parity(rng):
    """ViTModel == our ViT after hf_to_dino_v1 + convert_dino_v1 (the
    timm-naming converter the original DINO checkpoints use)."""
    from anyloc_tpu.models.dino_v1 import convert_dino_v1
    from anyloc_tpu.models.vit import ViT, ViTConfig

    torch.manual_seed(4)
    hcfg = transformers.ViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=16,
    )
    tm = transformers.ViTModel(hcfg, add_pooling_layer=True).eval()
    cfg = ViTConfig(
        img_size=32, patch_size=16, embed_dim=32, depth=2, num_heads=4,
        mlp_type="mlp", layerscale_init=None, ln_eps=hcfg.layer_norm_eps,
    )
    params = convert_dino_v1(tm.state_dict(), cfg)

    img = _nchw(rng, 2, 32)
    with torch.no_grad():
        expect = tm(torch.from_numpy(img)).last_hidden_state.numpy()
    out = ViT(cfg).apply(params, _nhwc(img))
    got = np.concatenate(
        [np.asarray(out["cls"])[:, None], np.asarray(out["tokens"])], 1
    )
    np.testing.assert_allclose(got, expect, atol=3e-5)


# ---------------------------------------------------------------------------
# MAE
# ---------------------------------------------------------------------------

def test_mae_hf_parity(rng):
    """ViTMAEForPreTraining == our MAE: encoder latents AND decoder pixel
    predictions (the latter exercises decoder_pred column layout — torch
    patchify is nhwpqc channels-LAST, models_mae.py:101-113, so no
    permutation may be applied).  mask_ratio=0 with identity noise makes
    the token ordering deterministic on both sides."""
    from anyloc_tpu.models.mae import MAEConfig, MaskedAutoencoderViT, convert_mae

    torch.manual_seed(1)
    hcfg = transformers.ViTMAEConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=28, patch_size=14,
        decoder_hidden_size=16, decoder_num_hidden_layers=1,
        decoder_num_attention_heads=2, decoder_intermediate_size=32,
        mask_ratio=0.0, layer_norm_eps=1e-6,
    )
    tm = transformers.ViTMAEForPreTraining(hcfg).eval()
    cfg = MAEConfig(
        img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=4,
        decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
        mlp_ratio=2.0,
    )
    params = convert_mae(tm.state_dict(), cfg)

    # transformers 4.57's _init_weights ZEROES decoder_pos_embed on random
    # init (modeling_vit_mae.py "module.decoder_pos_embed.data.zero_()");
    # real facebook/vit-mae checkpoints carry the fb sincos buffer, which our
    # model recomputes — install it so the comparison reflects checkpoint
    # loading, not HF's random-init quirk
    from anyloc_tpu.models.vit import sincos_2d_pos_embed

    with torch.no_grad():
        tm.decoder.decoder_pos_embed.copy_(torch.from_numpy(
            np.asarray(sincos_2d_pos_embed(16, 2, cls_token=True))
        ))

    img = _nchw(rng, 2, 28)
    n_tok = (28 // 14) ** 2
    # strictly increasing noise -> argsort is the identity permutation
    noise = torch.arange(n_tok, dtype=torch.float32)[None].repeat(2, 1) / n_tok
    with torch.no_grad():
        t_in = torch.from_numpy(img)
        latent_hf = tm.vit(t_in, noise=noise).last_hidden_state.numpy()
        logits_hf = tm(t_in, noise=noise).logits.numpy()
    _, pred, _, latent = MaskedAutoencoderViT(cfg).apply(
        params, _nhwc(img), 0.0
    )
    np.testing.assert_allclose(np.asarray(latent), latent_hf, atol=3e-5)
    np.testing.assert_allclose(np.asarray(pred), logits_hf, atol=3e-5)


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------

class TestClipHFParity:
    @pytest.fixture(scope="class")
    def pair(self, tmp_path_factory):
        torch.manual_seed(2)
        # intermediate = 4 * hidden: our towers use CLIP's fixed 4x MLP ratio
        hcfg = transformers.CLIPConfig(
            text_config=dict(hidden_size=32, intermediate_size=128,
                             num_hidden_layers=2, num_attention_heads=4,
                             max_position_embeddings=16, vocab_size=128,
                             eos_token_id=127),
            vision_config=dict(hidden_size=32, intermediate_size=128,
                               num_hidden_layers=2, num_attention_heads=4,
                               image_size=28, patch_size=14),
            projection_dim=24,
        )
        tm = transformers.CLIPModel(hcfg).eval()
        ckpt = tmp_path_factory.mktemp("hfclip") / "clip_hf.pt"
        torch.save(tm.state_dict(), str(ckpt))

        from anyloc_tpu.models import clip as C

        # registry entries matching the HF geometry:
        # _VISION: (patch, width, layers, heads, proj_dim, img_size)
        # _TEXT:   (context, vocab, width, heads, layers)
        C._VISION["HF-Tiny/14"] = (14, 32, 2, 4, 24, 28)
        C._TEXT["HF-Tiny/14"] = (16, 128, 32, 4, 2)
        ours = C.ClipWrapper(
            C.ClipWrapper.IMPL_OPENAI, "HF-Tiny/14", use_caching=False,
            checkpoint=str(ckpt), allow_hash_tokenizer=True,
        )
        return tm, ours

    def test_encode_image(self, pair, rng):
        """get_image_features (pre-norm) == encode_image via the full HF
        state dict loaded through the OpenAI-naming converter path."""
        tm, ours = pair
        img = _nchw(rng, 2, 28)
        with torch.no_grad():
            expect = tm.get_image_features(torch.from_numpy(img)).numpy()
        got = np.asarray(ours.encode_image(np.asarray(_nhwc(img))))
        np.testing.assert_allclose(got, expect, atol=3e-5)

    def test_encode_text(self, pair, rng):
        """Text towers on identical token ids (EOT = max id, placed once, so
        HF eos-pooling and OpenAI argmax-pooling select the same position)."""
        tm, ours = pair
        ids = rng.integers(1, 120, (3, 16))
        ids[:, 5] = 127  # EOT; everything after is causal-masked padding noise
        with torch.no_grad():
            expect = tm.get_text_features(torch.from_numpy(ids)).numpy()
        got = np.asarray(ours._enc_txt(ours.tparams, jnp.asarray(ids)))
        np.testing.assert_allclose(got, expect, atol=3e-5)

    def test_logit_scale(self, pair):
        tm, ours = pair
        np.testing.assert_allclose(
            ours.logit_scale, float(tm.logit_scale.detach().exp()), rtol=1e-5
        )


# ---------------------------------------------------------------------------
# SAM
# ---------------------------------------------------------------------------

def test_sam_hf_parity(rng):
    """SamModel.vision_encoder (windowed + global attention, decomposed
    rel-pos, 2-conv neck) == our SAMImageEncoder after hf_to_sam."""
    from anyloc_tpu.models.sam import SAMConfig, SAMImageEncoder, convert_sam

    torch.manual_seed(3)
    hcfg = transformers.SamConfig(
        vision_config=dict(hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=2, image_size=32, patch_size=8,
                           output_channels=16, mlp_dim=64, window_size=2,
                           global_attn_indexes=[1]),
    )
    tm = transformers.SamModel(hcfg).eval()
    cfg = SAMConfig(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
        window_size=2, global_attn_indexes=(1,), out_chans=16, mlp_ratio=2.0,
    )
    params = convert_sam(tm.state_dict(), cfg)

    img = _nchw(rng, 2, 32)
    with torch.no_grad():
        expect = (
            tm.vision_encoder(torch.from_numpy(img)).last_hidden_state.numpy()
        )  # [B, C, h, w]
    got = np.asarray(SAMImageEncoder(cfg).apply(params, _nhwc(img)))
    np.testing.assert_allclose(
        got.transpose(0, 3, 1, 2), expect, atol=3e-5
    )
