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
postprocessor L2-normalizes (and scales logits for audio/thermal/imu —
inference-irrelevant constants kept for parity). All trunks share the
pre-norm Block of the ViT trunk (no LayerScale, eps 1e-6).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from anyloc_tpu.models.convert import dense_params, ln_params, t2np
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


class _TrunkStack(nn.Module):
    """Pre-norm block stack + final LN shared by the non-vision trunks."""

    cfg: ViTConfig
    causal: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        if self.causal:
            # causal attention via additive mask is not plumbed through
            # Block; emulate with explicit loop using Attention? Simpler:
            # reuse Block but pre-mask is needed — implement inline blocks.
            raise RuntimeError("use _CausalTrunk for text")
        for i in range(c.depth):
            x = Block(c, name=f"blocks_{i}")(x)
        return nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="norm")(x)


class _CausalTrunk(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        b, t, d = x.shape
        mask = jnp.tril(jnp.ones((t, t), bool))
        nh, hd = c.num_heads, c.embed_dim // c.num_heads
        for i in range(c.depth):
            h = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype,
                             name=f"blocks_{i}_norm1")(x)
            qkv = nn.Dense(3 * d, dtype=c.dtype, name=f"blocks_{i}_qkv")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def heads(z):
                return z.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)

            q, k, v = heads(q), heads(k), heads(v)
            s = jnp.einsum("bhqd,bhkd->bhqk", q * hd ** -0.5, k,
                           preferred_element_type=jnp.float32)
            s = jnp.where(mask[None, None], s, -jnp.inf)
            a = jax.nn.softmax(s, axis=-1).astype(c.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
            o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
            x = x + nn.Dense(d, dtype=c.dtype, name=f"blocks_{i}_proj")(o)
            h = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype,
                             name=f"blocks_{i}_norm2")(x)
            h = nn.Dense(4 * d, dtype=c.dtype, name=f"blocks_{i}_fc1")(h)
            h = nn.gelu(h, approximate=False)
            x = x + nn.Dense(d, dtype=c.dtype, name=f"blocks_{i}_fc2")(h)
        return nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="norm")(x)


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
            # tokens (PatchEmbedGeneric norm_layer, imagebind :1273/1292/1313)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name="stem_norm")(x)
        else:  # imu: x [B, C=6, T]; linear over kernel-sized chunks
            k = self.kernel
            bt = x.shape[-1] // k
            x = x[:, :, : bt * k].reshape(b, x.shape[1], bt, k)
            x = x.transpose(0, 2, 1, 3).reshape(b, bt, -1)  # [B, T/k, 6k]
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(
                x.astype(self.dtype)
            )
            x = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                         name="stem")(x)
        t = x.shape[1]
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.embed_dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.embed_dim)), x], 1
        )
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, t + 1, self.embed_dim))
        x = x + pos.astype(self.dtype)
        x = _TrunkStack(c, name="trunk")(x)
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
        x = _CausalTrunk(
            _block_cfg(self.embed_dim, self.depth, self.heads, self.dtype),
            name="trunk",
        )(x)
        eos = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(b), eos]
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
    L2-normalized 1024-d joint embeddings per modality (the reference's
    forward contract, imagebind_extractor.py:1125+)."""

    def __init__(self, checkpoint: Optional[str] = None, dtype=jnp.float32,
                 seed: int = 42, bpe_path: Optional[str] = None):
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

        self.tokenizer = SimpleTokenizer(bpe_path)
        self._params: Dict[str, Dict] = {}
        self._fns: Dict[str, object] = {}
        self._vision_head = None  # (ln_params, w) once known
        if checkpoint is not None:
            from anyloc_tpu.models.convert import load_torch_checkpoint

            sd = load_torch_checkpoint(checkpoint)
            self._params[ModalityType.VISION] = convert_imagebind_vision(
                sd, self.vision_cfg
            )
            self._vision_head = convert_imagebind_vision_head(sd)
            # Other modalities' converters follow the same uniform naming;
            # add as checkpoints become available in-environment.

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
            out[modality] = fn(self._params[modality], batch)
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
    return {"params": p}


def convert_imagebind_vision_head(sd: Dict):
    """modality_heads.vision: LN(1280) -> CLS select -> Linear(1280, 1024,
    no bias) (imagebind_extractor.py:1466-1470). Returns (ln_params, w)."""
    return (
        ln_params(sd, "modality_heads.vision.0"),
        t2np(sd["modality_heads.vision.2.weight"]).T,  # [1280, 1024]
    )


def imagebind_huge(checkpoint: Optional[str] = None, full: bool = False, **kw):
    """Factory-name parity (imagebind_extractor.py:1567-1596). ``full=True``
    returns the multimodal ImageBindModel; default returns the vision
    extractor used by the VPR pipeline."""
    if full:
        return ImageBindModel(checkpoint, **kw)
    return ImageBindVision(checkpoint, **kw)
