"""Model-zoo coverage: HF-ViT parity against real transformers, CLIP wrapper
behavior, MAE mask/restore/loss semantics, SAM encoder, ImageBind vision."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anyloc_tpu.models.clip import ClipWrapper, SimpleTokenizer
from anyloc_tpu.models.cosplace_vit import convert_hf_vit, hf_vit_config
from anyloc_tpu.models.extractor import ViTFacetExtractor
from anyloc_tpu.models.mae import MAEConfig, MaskedAutoencoderViT
from anyloc_tpu.models.sam import SAMConfig, SAMImageEncoder
from anyloc_tpu.models.vit import ViT


class TestHFViTParity:
    """Convert a real (randomly initialized) HuggingFace ViTModel and compare
    against transformers' own forward — validates the fused-qkv conversion and
    the eps-1e-12 pre-norm block math against an independent implementation."""

    @pytest.fixture(scope="class")
    def hf_pair(self):
        hft = pytest.importorskip("transformers")
        import torch

        torch.manual_seed(0)
        cfg_t = hft.ViTConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128, image_size=32, patch_size=16,
        )
        tm = hft.ViTModel(cfg_t, add_pooling_layer=False).eval()
        cfg = hf_vit_config(img_size=32)
        cfg = cfg.__class__(**{**cfg.__dict__, "embed_dim": 32, "depth": 2,
                               "num_heads": 4})
        params = convert_hf_vit(tm.state_dict(), cfg)
        return tm, cfg, params

    def test_full_forward(self, hf_pair):
        import torch

        tm, cfg, params = hf_pair
        rng = np.random.default_rng(0)
        img = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            expect = tm(torch.from_numpy(img)).last_hidden_state.numpy()
        out = ViT(cfg).apply(params, jnp.asarray(img.transpose(0, 2, 3, 1)))
        got = np.concatenate(
            [np.asarray(out["cls"])[:, None], np.asarray(out["tokens"])], 1
        )
        np.testing.assert_allclose(got, expect, atol=3e-5)

    def test_value_facet_is_hf_value_linear(self, hf_pair):
        import torch

        tm, cfg, params = hf_pair
        rng = np.random.default_rng(1)
        img = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
        captured = {}
        h = tm.encoder.layer[1].attention.attention.value.register_forward_hook(
            lambda m, i, o: captured.__setitem__("v", o)
        )
        with torch.no_grad():
            tm(torch.from_numpy(img))
        h.remove()
        expect = torch.nn.functional.normalize(
            captured["v"][:, 1:], dim=-1
        ).numpy()
        ext = ViTFacetExtractor(cfg, params, 1, "value", norm_descs=True)
        got = np.asarray(ext(jnp.asarray(img.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got, expect, atol=3e-5)


class TestClipWrapper:
    @pytest.fixture(scope="class")
    def clip(self, tmp_path_factory):
        cache = tmp_path_factory.mktemp("clip_cache")
        # mini config: patch the registry for test speed
        from anyloc_tpu.models import clip as C

        C._VISION["ViT-Tiny/16"] = (16, 32, 2, 4, 16, 32)
        C._TEXT["ViT-Tiny/16"] = (77, 1000, 16, 4, 2)
        return ClipWrapper(
            ClipWrapper.IMPL_OPENAI, "ViT-Tiny/16",
            base_cache_dir=str(cache), use_caching="exp1",
            allow_hash_tokenizer=True,  # no merges file in this fixture
        )

    def test_encode_image_shape_and_cache(self, clip, rng):
        img = rng.standard_normal((32, 32, 3)).astype(np.float32)
        out = clip.encode_image(img, ci="img0")
        assert out.shape == (1, 16)
        # cache hit returns identical values
        out2 = clip.encode_image(np.zeros_like(img), ci="img0")
        np.testing.assert_allclose(np.asarray(out2), np.asarray(out))

    def test_zero_shot_probs(self, clip, rng):
        img = rng.standard_normal((32, 32, 3)).astype(np.float32)
        probs, imf, txf = clip(img, ["a dog", "a cat", "a place"])
        assert probs.shape == (1, 3)
        np.testing.assert_allclose(np.asarray(probs).sum(), 1.0, atol=1e-5)
        assert txf.shape == (3, 16)

    def test_tokenizer_fallback_deterministic(self):
        tok = SimpleTokenizer(allow_hash_fallback=True)
        a = tok.tokenize(["hello world"])
        b = tok.tokenize(["hello world"])
        np.testing.assert_array_equal(a, b)
        assert a[0, 0] == SimpleTokenizer.SOT
        assert SimpleTokenizer.EOT in a[0]

    def test_list_models(self):
        models = ClipWrapper.list_models(ret_vals=True)
        assert "ViT-L/14" in models[ClipWrapper.IMPL_OPENAI]


class TestMAE:
    @pytest.fixture(scope="class")
    def mae(self):
        cfg = MAEConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                        num_heads=4, decoder_embed_dim=16, decoder_depth=1,
                        decoder_num_heads=4)
        model = MaskedAutoencoderViT(cfg)
        rng = jax.random.PRNGKey(0)
        imgs = jnp.zeros((1, 32, 32, 3))
        params = model.init({"params": rng, "mask": rng}, imgs, 0.75)
        return cfg, model, params

    def test_patchify_roundtrip(self, mae, rng):
        cfg, model, params = mae
        imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
        m = MaskedAutoencoderViT(cfg)
        patches = m.patchify(imgs)
        assert patches.shape == (2, 4, 16 * 16 * 3)
        back = m.unpatchify(patches)
        np.testing.assert_allclose(np.asarray(back), np.asarray(imgs), atol=1e-6)

    def test_forward_latents_no_mask(self, mae, rng):
        cfg, model, params = mae
        imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
        loss, pred, mask, latent = model.apply(
            params, imgs, 0.0, rngs={"mask": jax.random.PRNGKey(1)}
        )
        assert latent.shape == (2, 5, 32)  # cls + 4 patches
        assert float(np.asarray(mask).sum()) == 0.0
        assert pred.shape == (2, 4, 768)

    def test_forward_masked(self, mae, rng):
        cfg, model, params = mae
        imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
        loss, pred, mask, latent = model.apply(
            params, imgs, 0.75, rngs={"mask": jax.random.PRNGKey(1)}
        )
        # 75% of 4 patches masked -> 3 per image
        assert float(np.asarray(mask).sum(axis=1)[0]) == 3.0
        assert latent.shape == (2, 2, 32)  # cls + 1 kept patch
        assert np.isfinite(float(loss))


class TestSAM:
    def test_encoder_shapes_and_window_attention(self, rng):
        cfg = SAMConfig(img_size=64, patch_size=16, embed_dim=32, depth=2,
                        num_heads=4, window_size=3, global_attn_indexes=(1,),
                        out_chans=8)
        model = SAMImageEncoder(cfg)
        imgs = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), imgs)
        neck = model.apply(params, imgs)
        assert neck.shape == (1, 4, 4, 8)
        tokens = model.apply(params, imgs, return_tokens=True)
        assert tokens.shape == (1, 16, 32)

    def test_rel_pos_table(self):
        from anyloc_tpu.models.sam import get_rel_pos

        table = jnp.arange(7, dtype=jnp.float32)[:, None] * jnp.ones((1, 4))
        out = get_rel_pos(4, 4, table)
        assert out.shape == (4, 4, 4)
        # diagonal (zero offset) must index the center row (k_size-1 = 3)
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0], 3.0)


def test_imagebind_vision_smoke(rng):
    from anyloc_tpu.models import imagebind as ib

    cfg = ib.imagebind_vision_config(img_size=28)
    cfg = cfg.__class__(**{**cfg.__dict__, "embed_dim": 32, "depth": 2,
                           "num_heads": 4})
    model = ViT(cfg)
    imgs = jnp.asarray(rng.standard_normal((1, 28, 28, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(params, imgs)
    assert out["cls"].shape == (1, 32)
    assert out["tokens"].shape == (1, 4, 32)
    with pytest.raises(NotImplementedError):
        wrapper = ib.ImageBindVision.__new__(ib.ImageBindVision)
        wrapper.cfg = cfg
        wrapper.model = model
        wrapper.params = params
        wrapper._fwd = lambda p, i: (None, None)
        wrapper(np.zeros((1, 28, 28, 3), np.float32), modality="audio")


class TestBPETokenizer:
    """CLIP BPE parity (round-1 verdict item 5): the committed fixture loads
    into BOTH our SimpleTokenizer and transformers' independent
    CLIPTokenizer implementation — token ids must match exactly."""

    FIXTURE = __import__("pathlib").Path(__file__).parent / "fixtures" / "bpe"
    STRINGS = [
        "hello world",
        "a photo of the city",
        "building 123 street",
        "the cat's hat, and more.",
        "  Weird   WHITESPACE\tand CASE  ",
        "café naïve",           # non-ASCII utf-8 byte path
        "unmergeable zxqj tokens",
    ]

    def _ours(self):
        from anyloc_tpu.models.clip import SimpleTokenizer

        return SimpleTokenizer(str(self.FIXTURE / "merges.txt"))

    def test_matches_transformers_clip_tokenizer(self):
        transformers = pytest.importorskip("transformers")
        hf = transformers.CLIPTokenizer(
            str(self.FIXTURE / "vocab.json"), str(self.FIXTURE / "merges.txt")
        )
        ours = self._ours()
        for s in self.STRINGS:
            got = ours.encode(s)
            want = hf(s, add_special_tokens=False)["input_ids"]
            assert got == want, (s, got, want)

    def test_gz_loading_matches_plain(self):
        from anyloc_tpu.models.clip import SimpleTokenizer

        a = SimpleTokenizer(str(self.FIXTURE / "merges.txt"))
        b = SimpleTokenizer(str(self.FIXTURE / "merges.txt.gz"))
        for s in self.STRINGS:
            assert a.encode(s) == b.encode(s)

    def test_special_ids_derived_from_vocab(self):
        ours = self._ours()
        import json

        vocab = json.loads((self.FIXTURE / "vocab.json").read_text())
        assert ours.SOT == vocab["<|startoftext|>"]
        assert ours.EOT == vocab["<|endoftext|>"]
        toks = ours.tokenize(["hello world"])
        assert toks[0, 0] == ours.SOT and ours.EOT in toks[0]

    def test_small_vocab_refuses_oversized_merges(self):
        """A merges file whose derived vocab exceeds the tokenizer's
        embedding-table size must be ignored (with a warning), not silently
        emit out-of-range ids that JAX embedding lookups would clamp."""
        from anyloc_tpu.models.clip import SimpleTokenizer

        with pytest.warns(UserWarning, match="ignoring the file"):
            tok = SimpleTokenizer(str(self.FIXTURE / "merges.txt"), vocab=128)
        assert tok.bpe is None
        assert tok.SOT == 126 and tok.EOT == 127  # clamped into range
        with pytest.raises(RuntimeError, match="BPE merges"):
            tok.encode("hello world")

    def test_no_merges_refuses_without_opt_in(self, monkeypatch):
        from anyloc_tpu.models.clip import SimpleTokenizer

        monkeypatch.delenv("ANYLOC_CLIP_BPE", raising=False)
        monkeypatch.setattr(SimpleTokenizer, "_find_standard_path",
                            classmethod(lambda cls: None))
        tok = SimpleTokenizer()
        with pytest.raises(RuntimeError, match="BPE merges"):
            tok.encode("hello")
        ok = SimpleTokenizer(allow_hash_fallback=True)
        assert ok.encode("hello")  # stable hash ids, explicit opt-in

    def test_env_var_discovery(self, monkeypatch):
        from anyloc_tpu.models.clip import SimpleTokenizer

        monkeypatch.setenv("ANYLOC_CLIP_BPE", str(self.FIXTURE / "merges.txt"))
        tok = SimpleTokenizer()
        assert tok.bpe
