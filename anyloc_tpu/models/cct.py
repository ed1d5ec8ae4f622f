"""CCT — Compact Convolutional Transformer backbone
(dvgl_benchmark/model/cct/, ~880 LoC vendored SHI-Labs code; the benchmark
uses cct_14_7x2_384 truncated at a transformer layer, network.py:144-155).

Faithful compact Flax version: conv tokenizer (n_conv_layers of conv3x3 +
ReLU + maxpool), learned (or sinusoidal) pos-embed, pre-norm transformer
encoder blocks with stochastic-depth-free eval path, and sequence pooling
(attention-weighted token average) as the head.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CCTConfig:
    img_size: int = 384
    embed_dim: int = 384
    n_conv_layers: int = 2
    kernel_size: int = 7
    depth: int = 14
    num_heads: int = 6
    mlp_ratio: float = 3.0
    truncate_at: Optional[int] = None  # keep blocks [0, truncate_at)
    dtype: Any = jnp.float32


def cct_14_7x2_384(**kw) -> CCTConfig:
    return CCTConfig(img_size=384, embed_dim=384, n_conv_layers=2,
                     kernel_size=7, depth=14, num_heads=6, **kw)


class CCTTokenizer(nn.Module):
    cfg: CCTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B,H,W,3] -> [B,T,D]
        c = self.cfg
        # reference tokenizer uses a fixed 64-channel stem for every
        # intermediate conv (dvgl model/cct/tokenizer.py n_filter_list)
        chans = [64] * (c.n_conv_layers - 1) + [c.embed_dim]
        for i, ch in enumerate(chans):
            x = nn.Conv(ch, (c.kernel_size, c.kernel_size), strides=(2, 2),
                        padding=c.kernel_size // 2, use_bias=False,
                        dtype=c.dtype, name=f"conv_{i}")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        b, h, w, d = x.shape
        return x.reshape(b, h * w, d)


class CCT(nn.Module):
    cfg: CCTConfig

    @nn.compact
    def __call__(self, imgs: jnp.ndarray, return_tokens: bool = False):
        c = self.cfg
        x = CCTTokenizer(c, name="tokenizer")(imgs.astype(c.dtype))
        t = x.shape[1]
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, t, c.embed_dim))
        x = x + pos.astype(c.dtype)
        n_blocks = c.truncate_at if c.truncate_at is not None else c.depth
        for i in range(n_blocks):
            h = nn.LayerNorm(epsilon=1e-6, dtype=c.dtype, name=f"norm1_{i}")(x)
            qkv = nn.Dense(3 * c.embed_dim, dtype=c.dtype, name=f"qkv_{i}")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            hd = c.embed_dim // c.num_heads

            def heads(z):
                return z.reshape(z.shape[0], t, c.num_heads, hd).transpose(0, 2, 1, 3)

            q, k, v = heads(q), heads(k), heads(v)
            a = jax.nn.softmax(
                jnp.einsum("bhqd,bhkd->bhqk", q * hd ** -0.5, k,
                           preferred_element_type=jnp.float32),
                axis=-1,
            ).astype(c.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
            o = o.transpose(0, 2, 1, 3).reshape(x.shape[0], t, c.embed_dim)
            x = x + nn.Dense(c.embed_dim, dtype=c.dtype, name=f"proj_{i}")(o)
            h = nn.LayerNorm(epsilon=1e-6, dtype=c.dtype, name=f"norm2_{i}")(x)
            h = nn.Dense(int(c.embed_dim * c.mlp_ratio), dtype=c.dtype,
                         name=f"fc1_{i}")(h)
            h = nn.gelu(h, approximate=False)
            x = x + nn.Dense(c.embed_dim, dtype=c.dtype, name=f"fc2_{i}")(h)
        x = nn.LayerNorm(epsilon=1e-6, dtype=c.dtype, name="norm")(x)
        if return_tokens:
            return x
        # sequence pooling: softmax(attn_pool(x)) weighted sum
        w = nn.Dense(1, dtype=c.dtype, name="attention_pool")(x)  # [B, T, 1]
        w = jax.nn.softmax(w, axis=1)
        return jnp.sum(w * x, axis=1)
