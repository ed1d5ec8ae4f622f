"""ImageBind — full multimodal model (vendored in the reference as
``imagebind_extractor.py``, 1745 LoC; AnyLoc evaluates the vision trunk in
``scripts/imagebind_global_vpr.py``).

imagebind_huge geometry (reference :1567-1580 + trunk defaults):

| modality | trunk | tokens |
|---|---|---|
| vision  | 1280 x 32 blocks x 16 heads | 3D patch (2,14,14) over 2 duplicated frames -> collapsed to 2D conv (exact for stills), CLS |
| text    | 1024 x 24 x 16, causal      | CLIP BPE ids, 77 ctx, EOS(argmax) pooling |
| audio   |  768 x 12 x 12              | conv2d k=16 s=10 over 128-mel x 204-frame log-mel spectrogram, CLS |
| depth   |  768 x 12 x 12              | 1-channel conv k=16, CLS |
| thermal |  768 x 12 x 12              | 1-channel conv k=16, CLS |
| imu     |  512 x  6 x  8              | 1D linear patches k=8 over [6, 2000] windows, CLS |

Heads: LN -> CLS/EOS select -> Linear(trunk_dim, 1024, no bias);
postprocessors L2-normalize and multiply by a per-modality logit scale
(text learnable, init 1/0.07, clipped at 100; audio 20, depth 5, thermal
10, imu 5; vision 1) — ``ImageBindModel.__call__`` applies BOTH, matching
the reference forward contract, so returned embeddings are NOT unit-norm
except for vision. The vision trunk is the shared ViT Block stack; the
other trunks are ``_SimpleTrunk`` (torch MultiheadAttention semantics,
add_bias_kv for audio/depth/thermal/imu, causal for text; eps 1e-6).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from anyloc_tpu.models.convert import dense_params, ln_params, maybe_tp_split, t2np
from anyloc_tpu.models.vit import Block, ViT, ViTConfig
from anyloc_tpu.ops.common import l2_normalize


class ModalityType:  # API parity (imagebind_extractor.py:1115)
    VISION = "vision"
    TEXT = "text"
    AUDIO = "audio"
    THERMAL = "thermal"
    DEPTH = "depth"
    IMU = "imu"


def imagebind_vision_config(dtype=None, img_size: int = 224) -> ViTConfig:
    # Reference vision trunk (imagebind_extractor.py:1403-1410): a learned
    # pre-transformer LayerNorm (pre_transformer_ln=True -> our pre_norm) and
    # NO trunk-final LayerNorm (post_transformer_layer is only a rearrange);
    # the final LN lives in the modality head (:1466-1470).
    kwargs = dict(
        img_size=img_size, patch_size=14, embed_dim=1280, depth=32,
        num_heads=16, mlp_type="mlp", layerscale_init=None, ln_eps=1e-6,
        pre_norm=True, final_norm=False, interpolate_offset=0.0,
    )
    if dtype is not None:
        kwargs["dtype"] = dtype
    return ViTConfig(**kwargs)


def _block_cfg(embed_dim, depth, heads, dtype) -> ViTConfig:
    return ViTConfig(
        embed_dim=embed_dim, depth=depth, num_heads=heads,
        layerscale_init=None, ln_eps=1e-6, dtype=dtype,
    )


class _SimpleTrunk(nn.Module):
    """Reference ``SimpleTransformer`` block stack (imagebind_extractor.py:
    1005-1123): pre-norm blocks of torch ``nn.MultiheadAttention`` semantics
    with optional learned ``bias_k``/``bias_v`` appended as one extra
    attention position (``add_bias_kv=True`` — the audio/depth/thermal/imu
    trunks, :1420-1447), optional causal masking (text), and fc1/fc2 MLP.
    There is NO trunk-final LayerNorm — the final LN lives in each modality
    head (:1466-1502). Flat param names (``blocks_{i}_qkv``...) keep the
    checkpoint converters one level deep."""

    cfg: ViTConfig
    causal: bool = False
    bias_kv: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        b, t, d = x.shape
        nh, hd = c.num_heads, c.embed_dim // c.num_heads
        mask = jnp.tril(jnp.ones((t, t), bool)) if self.causal else None
        if mask is not None and self.bias_kv:
            # the appended bias position is attendable from every query
            mask = jnp.concatenate([mask, jnp.ones((t, 1), bool)], axis=1)

        def heads(z):
            return z.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)

        for i in range(c.depth):
            h = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype,
                             name=f"blocks_{i}_norm1")(x)
            qkv = nn.Dense(3 * d, dtype=c.dtype, name=f"blocks_{i}_qkv")(h)
            q, k, v = (heads(z) for z in jnp.split(qkv, 3, axis=-1))
            if self.bias_kv:
                # torch MultiheadAttention add_bias_kv: raw k/v-space vectors
                # appended after projection, shared across the batch
                bk = self.param(f"blocks_{i}_bias_k",
                                nn.initializers.normal(0.02), (d,))
                bv = self.param(f"blocks_{i}_bias_v",
                                nn.initializers.normal(0.02), (d,))
                k = jnp.concatenate(
                    [k, jnp.broadcast_to(
                        bk.astype(c.dtype).reshape(1, nh, 1, hd),
                        (b, nh, 1, hd))], axis=2)
                v = jnp.concatenate(
                    [v, jnp.broadcast_to(
                        bv.astype(c.dtype).reshape(1, nh, 1, hd),
                        (b, nh, 1, hd))], axis=2)
            s = jnp.einsum("bhqd,bhkd->bhqk", q * hd ** -0.5, k,
                           preferred_element_type=jnp.float32)
            if mask is not None:
                s = jnp.where(mask[None, None], s, -jnp.inf)
            a = jax.nn.softmax(s, axis=-1).astype(c.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
            o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
            x = x + nn.Dense(d, dtype=c.dtype, name=f"blocks_{i}_proj")(o)
            h = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype,
                             name=f"blocks_{i}_norm2")(x)
            h = nn.Dense(int(4 * d), dtype=c.dtype, name=f"blocks_{i}_fc1")(h)
            h = nn.gelu(h, approximate=False)
            x = x + nn.Dense(d, dtype=c.dtype, name=f"blocks_{i}_fc2")(h)
        return x


class _PatchTrunk(nn.Module):
    """Generic conv-patch preprocessor + trunk + CLS head for audio / depth /
    thermal (2D, 1 channel) and imu (1D linear patches)."""

    embed_dim: int
    depth: int
    heads: int
    out_dim: int = 1024
    kernel: int = 16
    stride: Optional[int] = None
    in_hw: tuple = (128, 204)  # audio default (mel x frames)
    mode: str = "conv2d"       # "conv2d" | "linear1d"
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = _block_cfg(self.embed_dim, self.depth, self.heads, self.dtype)
        b = x.shape[0]
        if self.mode == "conv2d":  # x [B, H, W] or [B, H, W, 1]
            if x.ndim == 3:
                x = x[..., None]
            s = self.stride or self.kernel
            x = nn.Conv(self.embed_dim, (self.kernel, self.kernel),
                        strides=(s, s), padding="VALID", use_bias=False,
                        dtype=self.dtype, name="stem")(x.astype(self.dtype))
            x = x.reshape(b, -1, self.embed_dim)
            # reference audio/depth/thermal stems LayerNorm the projected
            # tokens (PatchEmbedGeneric norm_layer, imagebind :1273/1292/1313;
            # torch-default eps 1e-5)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name="stem_norm")(x)
        else:  # imu: x [B, C=6, T]; linear over kernel-sized chunks
            k = self.kernel
            bt = x.shape[-1] // k
            x = x[:, :, : bt * k].reshape(b, x.shape[1], bt, k)
            x = x.transpose(0, 2, 1, 3).reshape(b, bt, -1)  # [B, T/k, 6k]
            # reference order: Linear stem THEN norm_layer over embed_dim
            # (PatchEmbedGeneric.forward + IMUPreprocessor, :362-373,:535-547)
            x = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                         name="stem")(x.astype(self.dtype))
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name="stem_norm")(x)
        t = x.shape[1]
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.embed_dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.embed_dim)), x], 1
        )
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, t + 1, self.embed_dim))
        x = x + pos.astype(self.dtype)
        # add_bias_kv=True trunk, no trunk-final LN — the head LN below IS
        # the only final normalization (reference :1480-1502)
        x = _SimpleTrunk(c, bias_kv=True, name="trunk")(x)
        out = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                       name="head")(
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="head_norm")(
                x[:, 0]
            )
        )
        return l2_normalize(out.astype(jnp.float32))


class ImageBindText(nn.Module):
    vocab: int = 49408
    context: int = 77
    embed_dim: int = 1024
    depth: int = 24
    heads: int = 16
    out_dim: int = 1024
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:  # [B, T] ids
        b, t = tokens.shape
        x = nn.Embed(self.vocab, self.embed_dim, name="token_embedding")(tokens)
        pos = self.param("pos_embed", nn.initializers.normal(0.01),
                         (1, self.context, self.embed_dim))
        x = (x + pos[:, :t]).astype(self.dtype)
        x = _SimpleTrunk(
            _block_cfg(self.embed_dim, self.depth, self.heads, self.dtype),
            causal=True, name="trunk",
        )(x)
        # SelectEOSAndProject (reference :116-130,:1473-1478): take the EOT
        # token (highest BPE id) then LN + Linear
        eos = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(b), eos]
        pooled = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                              name="head_norm")(pooled)
        out = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                       name="head")(pooled)
        return l2_normalize(out.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Preprocessors (host-side numpy)
# ---------------------------------------------------------------------------

def log_mel_spectrogram(
    waveform: np.ndarray, sample_rate: int = 16000, num_mel_bins: int = 128,
    target_len: int = 204, frame_ms: float = 25.0, shift_ms: float = 10.0,
) -> np.ndarray:
    """Minimal log-mel fbank (torchaudio-kaldi-style shape semantics:
    [mel, frames] padded/cropped to target_len frames). Replaces the
    torchaudio dependency of the reference's audio transform."""
    win = int(sample_rate * frame_ms / 1000)
    hop = int(sample_rate * shift_ms / 1000)
    n_fft = 1 << (win - 1).bit_length()
    frames = []
    w = np.hanning(win).astype(np.float32)
    for s in range(0, max(len(waveform) - win, 1), hop):
        seg = waveform[s : s + win]
        if len(seg) < win:
            seg = np.pad(seg, (0, win - len(seg)))
        frames.append(np.abs(np.fft.rfft(seg * w, n_fft)) ** 2)
    spec = np.stack(frames, 1)  # [n_fft/2+1, T]
    # mel filterbank
    def hz2mel(f):
        return 2595 * np.log10(1 + f / 700)

    def mel2hz(m):
        return 700 * (10 ** (m / 2595) - 1)

    mels = np.linspace(hz2mel(0), hz2mel(sample_rate / 2), num_mel_bins + 2)
    freqs = mel2hz(mels)
    bins = np.floor((n_fft + 1) * freqs / sample_rate).astype(int)
    fb = np.zeros((num_mel_bins, spec.shape[0]), np.float32)
    for m in range(num_mel_bins):
        lo, ce, hi = bins[m], bins[m + 1], bins[m + 2]
        if ce > lo:
            fb[m, lo:ce] = (np.arange(lo, ce) - lo) / (ce - lo)
        if hi > ce:
            fb[m, ce:hi] = (hi - np.arange(ce, hi)) / (hi - ce)
    mel = np.log(fb @ spec + 1e-10)
    if mel.shape[1] < target_len:
        mel = np.pad(mel, ((0, 0), (0, target_len - mel.shape[1])))
    return mel[:, :target_len].astype(np.float32)


# ---------------------------------------------------------------------------
# The multimodal model
# ---------------------------------------------------------------------------

class ImageBindModel:
    """Unified multimodal embedder: ``model({modality: batch})`` returns
    1024-d joint embeddings per modality — L2-normalized then multiplied by
    the modality's logit scale, the reference's exact forward contract
    (imagebind_extractor.py:1125+, postprocessors :1506-1530)."""

    def __init__(self, checkpoint: Optional[str] = None, dtype=jnp.float32,
                 seed: int = 42, bpe_path: Optional[str] = None,
                 allow_hash_tokenizer: bool = False):
        self.dtype = dtype
        self.seed = seed
        self.vision_cfg = imagebind_vision_config(dtype=dtype)
        self.vision = ViT(self.vision_cfg)
        self.text = ImageBindText(dtype=dtype)
        self.audio = _PatchTrunk(768, 12, 12, kernel=16, stride=10,
                                 in_hw=(128, 204), dtype=dtype)
        self.depth = _PatchTrunk(768, 12, 12, kernel=16, mode="conv2d",
                                 in_hw=(224, 224), dtype=dtype)
        self.thermal = _PatchTrunk(768, 12, 12, kernel=16, mode="conv2d",
                                   in_hw=(224, 224), dtype=dtype)
        self.imu = _PatchTrunk(512, 6, 8, kernel=8, mode="linear1d",
                               dtype=dtype)
        from anyloc_tpu.models.clip import SimpleTokenizer

        self.tokenizer = SimpleTokenizer(
            bpe_path, allow_hash_fallback=allow_hash_tokenizer
        )
        self._params: Dict[str, Dict] = {}
        self._fns: Dict[str, object] = {}
        self._vision_head = None  # (ln_params, w) once known
        # Postprocessor logit scales (reference _create_modality_postprocessors,
        # imagebind_extractor.py:1506-1530): outputs are L2-normalized then
        # multiplied by exp(log_logit_scale) clipped at 100 — learnable for
        # text (init 1/0.07), fixed elsewhere.
        self.logit_scales: Dict[str, float] = {
            ModalityType.VISION: 1.0,
            ModalityType.TEXT: min(1.0 / 0.07, 100.0),
            ModalityType.AUDIO: 20.0,
            ModalityType.DEPTH: 5.0,
            ModalityType.THERMAL: 10.0,
            ModalityType.IMU: 5.0,
        }
        if checkpoint is not None:
            from anyloc_tpu.models.convert import load_torch_checkpoint

            sd = load_torch_checkpoint(checkpoint)
            self._params[ModalityType.VISION] = convert_imagebind_vision(
                sd, self.vision_cfg
            )
            self._vision_head = convert_imagebind_vision_head(sd)
            self._params[ModalityType.TEXT] = convert_imagebind_text(
                sd, depth=self.text.depth
            )
            for m in (ModalityType.AUDIO, ModalityType.DEPTH,
                      ModalityType.THERMAL, ModalityType.IMU):
                self._params[m] = convert_imagebind_patch(sd, m)
            ts = sd.get("modality_postprocessors.text.1.log_logit_scale")
            if ts is not None:
                self.logit_scales[ModalityType.TEXT] = min(
                    float(np.exp(np.asarray(ts))), 100.0
                )

    def _get(self, modality: str, example):
        if modality not in self._fns:
            module, needs_head = {
                ModalityType.VISION: (self.vision, True),
                ModalityType.TEXT: (self.text, False),
                ModalityType.AUDIO: (self.audio, False),
                ModalityType.DEPTH: (self.depth, False),
                ModalityType.THERMAL: (self.thermal, False),
                ModalityType.IMU: (self.imu, False),
            }[modality]
            if modality not in self._params:
                self._params[modality] = module.init(
                    jax.random.PRNGKey(self.seed), example
                )
            if modality == ModalityType.VISION:
                # vision head: LN -> CLS -> Linear(1280, 1024). The trunk has
                # NO final LN (cfg.final_norm=False); the LN lives here. Uses
                # the converted head when a checkpoint was loaded, otherwise
                # a seeded random one.
                if self._vision_head is None:
                    key = jax.random.PRNGKey(self.seed + 1)
                    dim = self.vision_cfg.embed_dim
                    self._vision_head = (
                        {"scale": np.ones(dim, np.float32),
                         "bias": np.zeros(dim, np.float32)},
                        np.asarray(jax.random.normal(key, (dim, 1024)) * 0.02),
                    )
                head_ln = {k: jnp.asarray(v)
                           for k, v in self._vision_head[0].items()}
                head_w = jnp.asarray(self._vision_head[1])

                @jax.jit
                def fn(params, x):
                    pre = module.apply(params, x)["pre_norm_tokens"].astype(
                        jnp.float32
                    )
                    mu = pre.mean(-1, keepdims=True)
                    var = ((pre - mu) ** 2).mean(-1, keepdims=True)
                    normed = (pre - mu) / jnp.sqrt(var + 1e-6)
                    normed = normed * head_ln["scale"] + head_ln["bias"]
                    return l2_normalize(normed[:, 0] @ head_w)

                self._fns[modality] = fn
            else:
                self._fns[modality] = jax.jit(module.apply)
        return self._fns[modality]

    def __call__(self, inputs: Dict[str, object]) -> Dict[str, jnp.ndarray]:
        out = {}
        for modality, batch in inputs.items():
            if modality == ModalityType.TEXT and not isinstance(
                batch, (np.ndarray, jnp.ndarray)
            ):
                batch = self.tokenizer.tokenize(batch, self.text.context)
            batch = jnp.asarray(batch)
            fn = self._get(modality, batch)
            emb = fn(self._params[modality], batch)
            # reference postprocessors: Normalize (inside fn) then logit scale
            out[modality] = emb * self.logit_scales.get(modality, 1.0)
        return out


class ImageBindVision:
    """Vision-trunk extractor (the VPR path,
    scripts/imagebind_global_vpr.py): ``cls`` = the modality-head output
    (LN -> CLS -> Linear(1280, 1024), the embedding the reference's
    eval consumes), ``tokens`` = trunk patch features (for VLAD)."""

    def __init__(self, checkpoint: Optional[str] = None, dtype=jnp.bfloat16,
                 seed: int = 42):
        self.cfg = imagebind_vision_config(dtype=dtype)
        self.model = ViT(self.cfg)
        if checkpoint is not None:
            from anyloc_tpu.models.convert import load_torch_checkpoint

            sd = load_torch_checkpoint(checkpoint)
            self.params = convert_imagebind_vision(sd, self.cfg)
            self.head_ln, self.head_w = convert_imagebind_vision_head(sd)
        else:
            from anyloc_tpu.models.extractor import init_params

            self.params = init_params(self.cfg, seed=seed)
            key = jax.random.PRNGKey(seed + 1)
            self.head_ln = {
                "scale": np.ones(self.cfg.embed_dim, np.float32),
                "bias": np.zeros(self.cfg.embed_dim, np.float32),
            }
            self.head_w = np.asarray(
                jax.random.normal(key, (self.cfg.embed_dim, 1024)) * 0.02
            )

        head_ln = {k: jnp.asarray(v) for k, v in self.head_ln.items()}
        head_w = jnp.asarray(self.head_w)

        @jax.jit
        def _fwd(params, imgs):
            out = self.model.apply(params, imgs)
            # trunk-final LN lives in the head (reference :1466-1470)
            pre = out["pre_norm_tokens"].astype(jnp.float32)
            mu = pre.mean(-1, keepdims=True)
            var = ((pre - mu) ** 2).mean(-1, keepdims=True)
            normed = (pre - mu) / jnp.sqrt(var + 1e-6)
            normed = normed * head_ln["scale"] + head_ln["bias"]
            emb = l2_normalize(normed[:, 0] @ head_w)
            return emb, out["tokens"].astype(jnp.float32)

        self._fwd = _fwd

    def __call__(self, imgs, modality: str = ModalityType.VISION):
        if modality != ModalityType.VISION:
            raise NotImplementedError(
                "ImageBindVision is the vision-only extractor; use "
                "ImageBindModel for the multimodal surface"
            )
        if imgs.ndim == 3:
            imgs = imgs[None]
        cls, tokens = self._fwd(self.params, jnp.asarray(imgs))
        return {"cls": cls, "tokens": tokens}


def convert_imagebind_vision(sd: Dict, cfg: ViTConfig) -> Dict:
    """ImageBind checkpoint (modality_trunks.vision.* naming) -> flax params.
    The 3-D patch kernel [D, 3, 2, 14, 14] collapses over time (sum) because
    still images duplicate the frame — exact equivalence. The learned
    pre-transformer LN converts to ``norm_pre``; there is no trunk-final LN."""
    vp = "modality_preprocessors.vision."
    vt = "modality_trunks.vision."
    k3d = t2np(sd[f"{vp}rgbt_stem.proj.1.weight"])  # [D, 3, T, p, p]
    k2d = k3d.sum(axis=2)
    p: Dict = {
        "patch_embed": {"kernel": k2d.transpose(2, 3, 1, 0)},
        "cls_token": t2np(sd[f"{vp}cls_token"]),
        "pos_embed": t2np(sd[f"{vp}pos_embedding_helper.pos_embed"]),
        "norm_pre": ln_params(sd, f"{vt}pre_transformer_layer.0"),
    }
    for i in range(cfg.depth):
        b = f"{vt}blocks.{i}"
        p[f"blocks_{i}"] = {
            "norm1": ln_params(sd, f"{b}.norm_1"),
            "norm2": ln_params(sd, f"{b}.norm_2"),
            "attn": {
                "qkv": {
                    "kernel": t2np(sd[f"{b}.attn.in_proj_weight"]).T,
                    "bias": t2np(sd[f"{b}.attn.in_proj_bias"]),
                },
                "proj": dense_params(sd, f"{b}.attn.out_proj"),
            },
            "mlp": {
                "fc1": dense_params(sd, f"{b}.mlp.fc1"),
                "fc2": dense_params(sd, f"{b}.mlp.fc2"),
            },
        }
    return maybe_tp_split({"params": p}, cfg)


def convert_imagebind_vision_head(sd: Dict):
    """modality_heads.vision: LN(1280) -> CLS select -> Linear(1280, 1024,
    no bias) (imagebind_extractor.py:1466-1470). Returns (ln_params, w)."""
    return (
        ln_params(sd, "modality_heads.vision.0"),
        t2np(sd["modality_heads.vision.2.weight"]).T,  # [1280, 1024]
    )


def _convert_simple_trunk(sd: Dict, prefix: str, depth: int,
                          bias_kv: bool) -> Dict:
    """``modality_trunks.{m}.blocks.{i}`` (torch nn.MultiheadAttention
    in_proj/out_proj + norm_1/norm_2 + mlp.fc1/fc2 naming) -> the flat
    ``_SimpleTrunk`` param dict."""
    p: Dict = {}
    for i in range(depth):
        b = f"{prefix}.blocks.{i}"
        p[f"blocks_{i}_norm1"] = ln_params(sd, f"{b}.norm_1")
        p[f"blocks_{i}_qkv"] = {
            # in_proj packs q|k|v rows [3D, D] -> transpose to [D, 3D] cols
            "kernel": t2np(sd[f"{b}.attn.in_proj_weight"]).T,
            "bias": t2np(sd[f"{b}.attn.in_proj_bias"]),
        }
        p[f"blocks_{i}_proj"] = dense_params(sd, f"{b}.attn.out_proj")
        if bias_kv:
            p[f"blocks_{i}_bias_k"] = t2np(sd[f"{b}.attn.bias_k"]).reshape(-1)
            p[f"blocks_{i}_bias_v"] = t2np(sd[f"{b}.attn.bias_v"]).reshape(-1)
        p[f"blocks_{i}_norm2"] = ln_params(sd, f"{b}.norm_2")
        p[f"blocks_{i}_fc1"] = dense_params(sd, f"{b}.mlp.fc1")
        p[f"blocks_{i}_fc2"] = dense_params(sd, f"{b}.mlp.fc2")
    return p


def convert_imagebind_text(sd: Dict, depth: int = 24) -> Dict:
    """Text tower: token embedding + learned pos embed
    (modality_preprocessors.text, imagebind_extractor.py:647-726), causal
    trunk, and the SelectEOSAndProject head (proj.0 LN + proj.1 Linear,
    :1473-1478) -> ``ImageBindText`` params."""
    pre = "modality_preprocessors.text."
    p: Dict = {
        "token_embedding": {
            "embedding": t2np(sd[f"{pre}token_embedding.weight"])
        },
        "pos_embed": t2np(sd[f"{pre}pos_embed"]),
        "trunk": _convert_simple_trunk(
            sd, "modality_trunks.text", depth, bias_kv=False
        ),
        "head_norm": ln_params(sd, "modality_heads.text.proj.0"),
        "head": {"kernel": t2np(sd["modality_heads.text.proj.1.weight"]).T},
    }
    return {"params": p}


# (stem key, trunk depth, head Sequential index of the Linear — imu has a
# Dropout at index 2, reference :1480-1502)
_PATCH_MODALITY_SPECS = {
    ModalityType.AUDIO: ("rgbt_stem", 12, 2),
    ModalityType.DEPTH: ("depth_stem", 12, 2),
    ModalityType.THERMAL: ("rgbt_stem", 12, 2),
    ModalityType.IMU: ("imu_stem", 6, 3),
}


def convert_imagebind_patch(
    sd: Dict, modality: str, depth: Optional[int] = None
) -> Dict:
    """Audio / depth / thermal / imu tower -> ``_PatchTrunk`` params.

    Stems: Conv2d [D, 1, k, k] -> flax [k, k, 1, D] (audio/thermal live
    under ``rgbt_stem`` because their preprocessors subclass
    RGBDTPreprocessor, reference :483-490,:727-735; imu is a Linear [D, 48]
    -> [48, D]); plus the stem norm_layer, cls_token, learned pos embed,
    add_bias_kv trunk, and the LN -> CLS -> Linear head."""
    stem, default_depth, head_idx = _PATCH_MODALITY_SPECS[modality]
    depth = default_depth if depth is None else depth
    pre = f"modality_preprocessors.{modality}."
    p: Dict = {"cls_token": t2np(sd[f"{pre}cls_token"])}
    if modality == ModalityType.IMU:
        p["stem"] = {"kernel": t2np(sd[f"{pre}{stem}.proj.weight"]).T}
        p["pos_embed"] = t2np(sd[f"{pre}pos_embed"])
    else:
        k = t2np(sd[f"{pre}{stem}.proj.weight"])        # [D, 1, k, k]
        p["stem"] = {"kernel": k.transpose(2, 3, 1, 0)}  # [k, k, 1, D]
        p["pos_embed"] = t2np(sd[f"{pre}pos_embedding_helper.pos_embed"])
    p["stem_norm"] = ln_params(sd, f"{pre}{stem}.norm_layer")
    p["trunk"] = _convert_simple_trunk(
        sd, f"modality_trunks.{modality}", depth, bias_kv=True
    )
    p["head_norm"] = ln_params(sd, f"modality_heads.{modality}.0")
    p["head"] = {
        "kernel": t2np(
            sd[f"modality_heads.{modality}.{head_idx}.weight"]
        ).T
    }
    return {"params": p}


def imagebind_huge(checkpoint: Optional[str] = None, full: bool = False, **kw):
    """Factory-name parity (imagebind_extractor.py:1567-1596). ``full=True``
    returns the multimodal ImageBindModel; default returns the vision
    extractor used by the VPR pipeline."""
    if full:
        return ImageBindModel(checkpoint, **kw)
    return ImageBindVision(checkpoint, **kw)
