"""CLIP (OpenAI / OpenCLIP) — image + text towers and the ClipWrapper API.

Replaces the reference's backend wrapper (AnyLoc ``clip_wrapper.py:51-451``)
with native Flax towers:

  * the **vision tower** is the shared ViT trunk configured CLIP-style
    (pre-LN, quick-GELU for OpenAI models, bias-free patch conv, learned
    pos-embed incl. CLS, post-LN + linear projection to the joint space);
  * the **text tower** is a causal pre-LN transformer with EOT-token pooling
    and a text projection;
  * ``ClipWrapper`` mirrors the reference API (``encode_image`` /
    ``encode_text`` / ``__call__`` zero-shot probs / ``load`` /
    ``list_models`` / per-item descriptor caching, clip_wrapper.py:237-451)
    with .npz caches instead of .pt.

Tokenization: ``SimpleTokenizer`` implements CLIP's exact BPE and loads
``bpe_simple_vocab_16e6.txt.gz`` from an explicit path, $ANYLOC_CLIP_BPE, or
the standard cache locations. Without a merges file it refuses to encode —
the deterministic hash fallback is an explicit opt-in
(``allow_hash_fallback=True``) for cache-key/shape work only.
"""

from __future__ import annotations

import gzip
import hashlib
import os
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from anyloc_tpu.models.vit import ViT, ViTConfig, exact_gelu, quick_gelu
from anyloc_tpu.models.convert import (conv_kernel, dense_params, ln_params,
                                        maybe_tp_split, t2np)
from anyloc_tpu.ops.common import l2_normalize

# name: (patch, width, layers, heads, embed_dim, image_size)
_VISION = {
    "ViT-B/32": (32, 768, 12, 12, 512, 224),
    "ViT-B/16": (16, 768, 12, 12, 512, 224),
    "ViT-L/14": (14, 1024, 24, 16, 768, 224),
    "ViT-L/14@336px": (14, 1024, 24, 16, 768, 336),
}
# text: (context, vocab, width, heads, layers) — embed_dim from vision
_TEXT = {
    "ViT-B/32": (77, 49408, 512, 8, 12),
    "ViT-B/16": (77, 49408, 512, 8, 12),
    "ViT-L/14": (77, 49408, 768, 12, 12),
    "ViT-L/14@336px": (77, 49408, 768, 12, 12),
}


def clip_vision_config(name: str, dtype=None, quick: bool = True) -> ViTConfig:
    p, w, layers, heads, embed, img = _VISION[name]
    kwargs = dict(
        img_size=img,
        patch_size=p,
        embed_dim=w,
        depth=layers,
        num_heads=heads,
        mlp_type="mlp",
        act="quick_gelu" if quick else "gelu",
        layerscale_init=None,
        ln_eps=1e-5,
        pre_norm=True,
        patch_bias=False,
        proj_dim=embed,
        interpolate_offset=0.0,
    )
    if dtype is not None:
        kwargs["dtype"] = dtype
    return ViTConfig(**kwargs)


class CLIPTextTower(nn.Module):
    """Causal text transformer with EOT pooling (OpenAI CLIP layout)."""

    vocab: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    context: int = 77
    embed_dim: int = 512
    quick: bool = True

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:  # [B, T] int32
        b, t = tokens.shape
        x = nn.Embed(self.vocab, self.width, name="token_embedding")(tokens)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context, self.width),
        )
        x = x + pos[None, :t]
        mask = jnp.tril(jnp.ones((t, t), bool))
        # non-quickGELU CLIP variants use torch's exact-erf GELU (flax's
        # default is the tanh approximation — parity pitfall, see vit.py)
        act = quick_gelu if self.quick else exact_gelu
        for i in range(self.layers):
            h = nn.LayerNorm(epsilon=1e-5, name=f"ln1_{i}")(x)
            qkv = nn.Dense(3 * self.width, name=f"attn_qkv_{i}")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            hd = self.width // self.heads

            def heads_(z):
                return z.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)

            q, k, v = heads_(q), heads_(k), heads_(v)
            s = jnp.einsum("bhqd,bhkd->bhqk", q * hd ** -0.5, k,
                           preferred_element_type=jnp.float32)
            s = jnp.where(mask[None, None], s, -jnp.inf)
            a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
            o = o.transpose(0, 2, 1, 3).reshape(b, t, self.width)
            x = x + nn.Dense(self.width, name=f"attn_proj_{i}")(o)
            h = nn.LayerNorm(epsilon=1e-5, name=f"ln2_{i}")(x)
            h = nn.Dense(4 * self.width, name=f"mlp_fc_{i}")(h)
            h = act(h)
            x = x + nn.Dense(self.width, name=f"mlp_proj_{i}")(h)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        # EOT pooling: highest token id marks end-of-text
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(b), eot]
        return nn.Dense(self.embed_dim, use_bias=False, name="text_projection")(
            pooled
        )


# ---------------------------------------------------------------------------
# Converters (OpenAI CLIP state-dict naming)
# ---------------------------------------------------------------------------

def convert_clip_vision(sd: Dict, cfg: ViTConfig) -> Dict:
    from anyloc_tpu.models.hf_convert import ensure_native_naming

    sd = ensure_native_naming(sd, "clip")
    pre = "visual."
    p: Dict = {
        "patch_embed": {"kernel": conv_kernel(sd[pre + "conv1.weight"])},
        "cls_token": t2np(sd[pre + "class_embedding"]).reshape(1, 1, -1),
        "pos_embed": t2np(sd[pre + "positional_embedding"])[None],
        "norm_pre": ln_params(sd, pre + "ln_pre"),
        "norm": ln_params(sd, pre + "ln_post"),
        "proj_out": {"kernel": t2np(sd[pre + "proj"])},
    }
    for i in range(cfg.depth):
        b = f"{pre}transformer.resblocks.{i}"
        p[f"blocks_{i}"] = {
            "norm1": ln_params(sd, f"{b}.ln_1"),
            "norm2": ln_params(sd, f"{b}.ln_2"),
            "attn": {
                "qkv": {
                    "kernel": t2np(sd[f"{b}.attn.in_proj_weight"]).T,
                    "bias": t2np(sd[f"{b}.attn.in_proj_bias"]),
                },
                "proj": dense_params(sd, f"{b}.attn.out_proj"),
            },
            "mlp": {
                "fc1": dense_params(sd, f"{b}.mlp.c_fc"),
                "fc2": dense_params(sd, f"{b}.mlp.c_proj"),
            },
        }
    return maybe_tp_split({"params": p}, cfg)


def convert_clip_text(sd: Dict, layers: int) -> Dict:
    from anyloc_tpu.models.hf_convert import ensure_native_naming

    sd = ensure_native_naming(sd, "clip")
    p: Dict = {
        "token_embedding": {"embedding": t2np(sd["token_embedding.weight"])},
        "positional_embedding": t2np(sd["positional_embedding"]),
        "ln_final": ln_params(sd, "ln_final"),
        "text_projection": {"kernel": t2np(sd["text_projection"])},
    }
    for i in range(layers):
        b = f"transformer.resblocks.{i}"
        p[f"ln1_{i}"] = ln_params(sd, f"{b}.ln_1")
        p[f"ln2_{i}"] = ln_params(sd, f"{b}.ln_2")
        p[f"attn_qkv_{i}"] = {
            "kernel": t2np(sd[f"{b}.attn.in_proj_weight"]).T,
            "bias": t2np(sd[f"{b}.attn.in_proj_bias"]),
        }
        p[f"attn_proj_{i}"] = dense_params(sd, f"{b}.attn.out_proj")
        p[f"mlp_fc_{i}"] = dense_params(sd, f"{b}.mlp.c_fc")
        p[f"mlp_proj_{i}"] = dense_params(sd, f"{b}.mlp.c_proj")
    return {"params": p}


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

class SimpleTokenizer:
    """CLIP's BPE tokenizer (the algorithm of the reference's vendored
    simple_tokenizer, imagebind_extractor.py:285-336,790-850), loading the
    standard ``bpe_simple_vocab_16e6.txt.gz`` merges file.

    Without a merges file the tokenizer REFUSES to encode unless constructed
    with ``allow_hash_fallback=True`` — the hash fallback produces stable but
    meaningless ids (adequate only for cache keys / shape tests, never for
    real zero-shot prompts), so it must be an explicit opt-in.

    Search order when ``bpe_path`` is None: $ANYLOC_CLIP_BPE, then
    ``~/.cache/clip/`` and ``~/.cache/anyloc_tpu/`` standard filenames.
    """

    SOT, EOT = 49406, 49407  # class-level defaults (full CLIP vocab)
    _STD_NAME = "bpe_simple_vocab_16e6.txt.gz"

    def __init__(self, bpe_path: Optional[str] = None, vocab: int = 49408,
                 allow_hash_fallback: bool = False):
        self.bpe = None
        self.vocab = vocab
        self.allow_hash_fallback = allow_hash_fallback
        # standard CLIP special ids; clamped into range for smaller vocabs
        self.SOT = min(49406, vocab - 2)
        self.EOT = min(49407, vocab - 1)
        if bpe_path is None:
            bpe_path = self._find_standard_path()
        if bpe_path and os.path.exists(bpe_path):
            self._load_bpe(bpe_path)

    @classmethod
    def _find_standard_path(cls) -> Optional[str]:
        cands = [os.environ.get("ANYLOC_CLIP_BPE")]
        for d in ("~/.cache/clip", "~/.cache/anyloc_tpu"):
            cands.append(os.path.join(os.path.expanduser(d), cls._STD_NAME))
        for c in cands:
            if c and os.path.exists(c):
                return c
        return None

    def _load_bpe(self, path: str):
        import regex as _re  # available via transformers dependency

        raw = (gzip.open(path).read() if path.endswith(".gz")
               else open(path, "rb").read())
        lines = raw.decode("utf-8").split("\n")[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in lines]
        merges = [m for m in merges if len(m) == 2]  # drop blank tail lines
        self.byte_encoder = self._bytes_to_unicode()
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        if len(vocab) > self.vocab:
            # the merges file produces ids beyond this text tower's embedding
            # table (e.g. a tiny test tower + the discovered full 49152-merge
            # file) — JAX embedding lookups clamp out-of-range ids silently,
            # so using it would yield garbage descriptors with no error.
            # Refuse the file; encode() then raises (or hash-falls-back if
            # explicitly opted in), keeping the __init__-clamped special ids.
            import warnings

            warnings.warn(
                f"BPE merges at {path} define {len(vocab)} ids but this "
                f"tokenizer's vocab is {self.vocab}; ignoring the file "
                "(use the full 49408-id text tower for real BPE)."
            )
            return
        self.encoder = {v: i for i, v in enumerate(vocab)}
        # specials sit at the end of the BPE vocab — derive, don't assume
        # (only equals 49406/49407 for the full 49152-merge file)
        self.SOT = self.encoder["<|startoftext|>"]
        self.EOT = self.encoder["<|endoftext|>"]
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.pat = _re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            _re.IGNORECASE,
        )
        self.bpe = True

    @staticmethod
    def _bytes_to_unicode():
        """GPT-2/CLIP byte->unicode table: printable bytes map to themselves,
        the rest to chr(256+n) — BPE then operates on these surrogate chars
        (CLIP simple_tokenizer.bytes_to_unicode)."""
        bs = (list(range(ord("!"), ord("~") + 1))
              + list(range(ord("\xa1"), ord("\xac") + 1))
              + list(range(ord("\xae"), ord("\xff") + 1)))
        cs = bs[:]
        n = 0
        for b in range(256):
            if b not in bs:
                bs.append(b)
                cs.append(256 + n)
                n += 1
        return dict(zip(bs, (chr(c) for c in cs)))

    def _bpe_word(self, token: str) -> List[str]:
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = [(word[i], word[i + 1]) for i in range(len(word) - 1)]
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1e18))
            if best not in self.bpe_ranks:
                break
            first, second = best
            new = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new.append(first + second)
                    i += 2
                else:
                    new.append(word[i])
                    i += 1
            word = tuple(new)
        return list(word)

    @staticmethod
    def _clean(text: str) -> str:
        """CLIP's whitespace_clean + (ftfy-free) basic_clean: html unescape
        twice, collapse whitespace, strip, lowercase."""
        import html
        import re as _sre

        text = html.unescape(html.unescape(text))
        return _sre.sub(r"\s+", " ", text).strip().lower()

    def encode(self, text: str) -> List[int]:
        if self.bpe:
            out = []
            for tok in self.pat.findall(self._clean(text)):
                # UTF-8 bytes -> surrogate unicode chars, then BPE (CLIP's
                # exact preprocessing; raw unicode would mistokenize non-ASCII)
                tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
                out.extend(self.encoder[u] for u in self._bpe_word(tok))
            return out
        if not self.allow_hash_fallback:
            raise RuntimeError(
                "No BPE merges file found — real CLIP tokenization needs "
                f"'{self._STD_NAME}' (set $ANYLOC_CLIP_BPE or place it under "
                "~/.cache/clip/). Pass allow_hash_fallback=True only for "
                "cache-key/shape work: hash ids are NOT CLIP token ids."
            )
        # hash fallback (explicit opt-in): one id per whitespace token,
        # stable across runs, kept inside [1, SOT) so any vocab embeds it
        hi = max(self.SOT - 1, 2)
        return [
            int.from_bytes(
                hashlib.sha1(w.encode()).digest()[:3], "little"
            ) % (hi - 1) + 1
            for w in text.lower().strip().split()
        ]

    def tokenize(self, texts, context_length: int = 77) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), np.int32)
        for i, t in enumerate(texts):
            ids = [self.SOT] + self.encode(t)[: context_length - 2] + [self.EOT]
            out[i, : len(ids)] = ids
        return out


# ---------------------------------------------------------------------------
# ClipWrapper (API parity with clip_wrapper.py)
# ---------------------------------------------------------------------------

class ClipWrapper:
    IMPL_OPENAI = "openai"
    IMPL_OPEN_CLIP = "open_clip"

    def __init__(
        self,
        impl: str,
        name: str,
        pretrained: Optional[str] = None,
        prep_apply: bool = True,
        use_caching=True,
        base_cache_dir: Optional[str] = None,
        save_norm_descs: bool = True,
        checkpoint: Optional[str] = None,
        bpe_path: Optional[str] = None,
        allow_hash_tokenizer: bool = False,
        dtype=jnp.float32,
        seed: int = 42,
        device=None,
    ) -> None:
        del device
        assert impl in (self.IMPL_OPENAI, self.IMPL_OPEN_CLIP), impl
        self.impl, self.name, self.pretrained = impl, name, pretrained
        self.prep_apply = prep_apply
        self.save_norm_descs = save_norm_descs
        quick = impl == self.IMPL_OPENAI or "quickgelu" in name
        canonical = name
        if impl == self.IMPL_OPEN_CLIP and name not in _VISION:
            # open_clip writes 'ViT-B-16' for OpenAI's 'ViT-B/16': the LAST
            # dash is the patch separator
            head, _, tail = name.rpartition("-")
            canonical = f"{head}/{tail}"
        if canonical not in _VISION:
            raise KeyError(f"Unknown CLIP model {name}; have {list(_VISION)}")
        self.vcfg = clip_vision_config(canonical, dtype=dtype, quick=quick)
        ctx, vocab, twidth, theads, tlayers = _TEXT[canonical]
        self.vision = ViT(self.vcfg)
        self.text = CLIPTextTower(
            vocab=vocab, width=twidth, heads=theads, layers=tlayers,
            context=ctx, embed_dim=self.vcfg.proj_dim, quick=quick,
        )
        self.tokenizer = SimpleTokenizer(
            bpe_path, vocab=vocab, allow_hash_fallback=allow_hash_tokenizer
        )
        if checkpoint is not None:
            from anyloc_tpu.models.convert import load_torch_checkpoint

            sd = load_torch_checkpoint(checkpoint)
            self.vparams = convert_clip_vision(sd, self.vcfg)
            self.tparams = convert_clip_text(sd, tlayers)
            self.logit_scale = float(np.exp(t2np(sd["logit_scale"])))
        else:
            key = jax.random.PRNGKey(seed)
            size = self.vcfg.img_size
            self.vparams = self.vision.init(
                key, jnp.zeros((1, size, size, 3), jnp.float32)
            )
            self.tparams = self.text.init(
                key, jnp.zeros((1, 8), jnp.int32)
            )
            self.logit_scale = 100.0
        # caching (reference: _ensure_cache_dir, clip_wrapper.py:161-201)
        self.cache_dir = None
        if use_caching is not False and base_cache_dir is not None:
            sub = use_caching if isinstance(use_caching, str) else "global"
            safe = f"{impl}_{name}".replace("/", "_")
            self.cache_dir = os.path.join(
                base_cache_dir, "experiments", sub, safe
            )
            os.makedirs(os.path.join(self.cache_dir, "images"), exist_ok=True)
            os.makedirs(os.path.join(self.cache_dir, "text"), exist_ok=True)

        @jax.jit
        def _enc_img(params, imgs):
            return self.vision.apply(params, imgs)["cls"].astype(jnp.float32)

        @jax.jit
        def _enc_txt(params, toks):
            return self.text.apply(params, toks).astype(jnp.float32)

        self._enc_img, self._enc_txt = _enc_img, _enc_txt

    # -- preprocessing ----------------------------------------------------
    def get_preprocessing(self, disable_prep: bool = True):
        if disable_prep:
            self.prep_apply = False

        size = self.vcfg.img_size
        mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
        std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

        def prep(pil_img):
            from PIL import Image

            w, h = pil_img.size
            scale = size / min(w, h)
            img = pil_img.resize(
                (int(round(w * scale)), int(round(h * scale))), Image.BICUBIC
            )
            arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
            top = (arr.shape[0] - size) // 2
            left = (arr.shape[1] - size) // 2
            arr = arr[top : top + size, left : left + size]
            return (arr - mean) / std

        return prep

    def get_tokenizer(self, disable_prep: bool = True):
        if disable_prep:
            self.prep_apply = False
        return self.tokenizer.tokenize

    # -- caching helpers ---------------------------------------------------
    def _cache_path(self, kind: str, ci: str) -> Optional[str]:
        if self.cache_dir is None or ci is None:
            return None
        return os.path.join(self.cache_dir, kind, f"{ci}.npz")

    # -- encoding ----------------------------------------------------------
    def encode_image(self, image, normalize: bool = False, ci: Optional[str] = None):
        path = self._cache_path("images", ci)
        if path and os.path.exists(path):
            out = np.load(path)["desc"]
            return l2_normalize(jnp.asarray(out)) if (normalize and not self.save_norm_descs) else jnp.asarray(out)
        if self.prep_apply and not isinstance(image, (np.ndarray, jnp.ndarray)):
            image = self.get_preprocessing(disable_prep=False)(image)
        arr = jnp.asarray(np.asarray(image, np.float32))
        if arr.ndim == 3:
            arr = arr[None]
        out = self._enc_img(self.vparams, arr)
        if normalize or (path and self.save_norm_descs):
            out = l2_normalize(out)
        if path:
            np.savez(path, desc=np.asarray(out))
        return out

    def encode_text(self, text, context_length: int = 77,
                    normalize: bool = False, ci: Optional[str] = None):
        path = self._cache_path("text", ci)
        if path and os.path.exists(path):
            out = jnp.asarray(np.load(path)["desc"])
            if normalize and not self.save_norm_descs:
                out = l2_normalize(out)
            return out
        toks = text
        if self.prep_apply or isinstance(text, (str, list)):
            toks = self.tokenizer.tokenize(text, context_length)
        out = self._enc_txt(self.tparams, jnp.asarray(toks, jnp.int32))
        if normalize or (path and self.save_norm_descs):
            out = l2_normalize(out)
        if path:
            np.savez(path, desc=np.asarray(out))
        return out

    def __call__(self, img, text, normalize: bool = False,
                 context_length: int = 77, ci_img=None, ci_text=None):
        """Zero-shot class probabilities (clip_wrapper.py:365-399):
        returns (probs [N_img, N_text], img_features, text_features)."""
        imf = self.encode_image(img, ci=ci_img)
        txf = self.encode_text(text, context_length, ci=ci_text)
        imn, txn = l2_normalize(imf), l2_normalize(txf)
        logits = self.logit_scale * imn @ txn.T
        probs = jax.nn.softmax(logits, axis=-1)
        if normalize:
            imf, txf = imn, txn
        return probs, imf, txf

    # -- statics -----------------------------------------------------------
    @staticmethod
    def load(impl, name, pretrained=None, **kwargs) -> "ClipWrapper":
        return ClipWrapper(impl, name, pretrained, **kwargs)

    @staticmethod
    def list_models(ret_vals: bool = False):
        models = {
            ClipWrapper.IMPL_OPENAI: sorted(_VISION),
            ClipWrapper.IMPL_OPEN_CLIP: sorted(
                n.replace("/", "-") for n in _VISION
            ),
        }
        if ret_vals:
            return models
        for impl, names in models.items():
            print(f"{impl}: {names}")
