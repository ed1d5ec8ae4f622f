"""Learned aggregation heads.

TPU-native re-implementations of the reference's trained aggregators:
  * NetVLAD  — dvgl_benchmark/model/aggregation.py:85-174 (conv soft-assign,
    residual sum, intra-norm, flatten, L2; k-means init from sampled descs);
  * GeM head — CosPlace/model/network.py:22-44 (L2 -> GeM -> flatten ->
    Linear -> L2);
  * MixVPR   — MixVPR/models/aggregators/mixvpr.py:8-66 (feature-mixer over
    the flattened spatial axis + channel/row projections).

All heads take token/patch features [B, N, D] (channels-last ViT layout; CNN
feature maps reshape [B, H*W, C] first).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from anyloc_tpu.ops.common import l2_normalize


class NetVLAD(nn.Module):
    """NetVLAD with conv soft-assignment.

    Matches dvgl's forward: soft_assign = softmax(conv1x1(x)); residuals to
    learned centroids weighted by assignment; intra-norm per cluster; flatten;
    final L2. The [B,N,C,D] residual tensor is factorized away exactly as in
    ops.vlad (one matmul + rank-1 correction).
    """

    num_clusters: int = 64
    dim: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, N, D] -> [B, C*D]
        b, n, d = x.shape
        assert d == self.dim, f"expected dim {self.dim}, got {d}"
        # conv 1x1 over tokens == Dense over feature dim
        logits = nn.Dense(self.num_clusters, use_bias=False, name="assign")(x)
        a = jax.nn.softmax(logits, axis=-1)  # [B, N, C]
        centroids = self.param(
            "centroids",
            nn.initializers.normal(1.0 / jnp.sqrt(self.dim)),
            (self.num_clusters, self.dim),
        )
        wsum = jnp.einsum("bnc,bnd->bcd", a, x)
        acount = jnp.sum(a, axis=1)
        v = wsum - acount[..., None] * centroids[None]
        v = l2_normalize(v, axis=-1)  # intra-norm
        v = v.reshape(b, self.num_clusters * d)
        return l2_normalize(v, axis=-1)

    @staticmethod
    def init_from_descriptors(params, descs, seed: int = 42):
        """k-means initialization (dvgl init_params, aggregation.py:112-124):
        centroids = k-means centers; dots of L2-NORMALIZED centroids against
        the (already L2-normalized backbone) descriptors give
        alpha = -log(0.01) / mean(top1 - top2); assignment conv weight =
        alpha * normalized_centroids (no bias)."""
        import numpy as np

        from anyloc_tpu.ops.kmeans import kmeans_fit

        p = params["params"]
        c = p["centroids"].shape[0]
        centers, _ = kmeans_fit(
            jax.random.PRNGKey(seed), jnp.asarray(descs), c, mode="euclidean"
        )
        centers = np.asarray(centers)
        cnorm = centers / np.maximum(
            np.linalg.norm(centers, axis=1, keepdims=True), 1e-12
        )
        dots = np.sort(cnorm @ np.asarray(descs).T, axis=0)[::-1]
        alpha = float(-np.log(0.01) / np.mean(dots[0] - dots[1] + 1e-9))
        p = dict(p)
        p["centroids"] = jnp.asarray(centers)
        p["assign"] = {"kernel": jnp.asarray((alpha * cnorm).T)}
        return {"params": p}


class GeMHead(nn.Module):
    """CosPlace-style head: L2 -> GeM(p) -> Linear(out_dim) -> L2."""

    out_dim: int = 512
    p_init: float = 3.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, N, D] -> [B, out]
        p = self.param("p", nn.initializers.constant(self.p_init), ())
        x = l2_normalize(x, axis=-1)
        # learned-p GeM over tokens (positive inputs via clamp, CNN semantics)
        x = jnp.clip(x, 1e-6, None)
        g = jnp.mean(x ** p, axis=1) ** (1.0 / p)
        g = nn.Dense(self.out_dim, name="fc")(g)
        return l2_normalize(g, axis=-1)


class GeMPool(nn.Module):
    """Standalone GeM aggregation layer (MixVPR/models/aggregators/gem.py:5-18):
    clamp -> p-mean over tokens -> flatten -> L2. Learnable scalar p."""

    p_init: float = 3.0
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, N, D] -> [B, D]
        p = self.param("p", nn.initializers.constant(self.p_init), ())
        g = jnp.mean(jnp.clip(x, self.eps, None) ** p, axis=1) ** (1.0 / p)
        return l2_normalize(g, axis=-1)


class ConvAP(nn.Module):
    """ConvAP (arXiv 2210.10239; MixVPR/models/aggregators/convap.py:6-23):
    1x1 channel projection -> adaptive average pool to (s1, s2) -> flatten
    (channel-major, matching torch) -> L2. Takes the spatial feature map
    [B, H, W, C] (channels-last) since the pooling is spatial."""

    out_channels: int = 512
    s1: int = 2
    s2: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B,H,W,C] -> [B,s1*s2*Co]
        b, h, w, _ = x.shape
        x = nn.Dense(self.out_channels, name="channel_pool")(x)
        # torch AdaptiveAvgPool2d: cell i covers [floor(i*h/s), ceil((i+1)*h/s))
        rows = []
        for i in range(self.s1):
            h0, h1 = (i * h) // self.s1, -(-((i + 1) * h) // self.s1)
            cols = []
            for j in range(self.s2):
                w0, w1 = (j * w) // self.s2, -(-((j + 1) * w) // self.s2)
                cols.append(jnp.mean(x[:, h0:h1, w0:w1], axis=(1, 2)))
            rows.append(jnp.stack(cols, axis=1))  # [B, s2, Co]
        pooled = jnp.stack(rows, axis=1)  # [B, s1, s2, Co]
        # torch flattens [B, Co, s1, s2] channel-major
        flat = pooled.transpose(0, 3, 1, 2).reshape(b, -1)
        return l2_normalize(flat, axis=-1)


class FeatureMixer(nn.Module):
    """One MixVPR mixer block: LayerNorm -> MLP over the token axis + skip."""

    mix_ratio: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, D, N]
        n = x.shape[-1]
        # torch nn.LayerNorm eps (1e-5), not the flax default (1e-6)
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        h = nn.Dense(int(n * self.mix_ratio), name="mix1")(h)
        h = nn.relu(h)
        h = nn.Dense(n, name="mix2")(h)
        return x + h


class MixVPRHead(nn.Module):
    """MixVPR aggregator: L mixer blocks over flattened tokens, then channel
    and row projections (MixVPR/models/aggregators/mixvpr.py:28-66)."""

    out_channels: int = 256
    out_rows: int = 4
    depth: int = 4
    mix_ratio: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, N, D]
        x = jnp.swapaxes(x, 1, 2)  # [B, D, N] mix over token axis
        for i in range(self.depth):
            x = FeatureMixer(self.mix_ratio, name=f"mixer_{i}")(x)
        x = jnp.swapaxes(x, 1, 2)  # [B, N, D]
        x = nn.Dense(self.out_channels, name="channel_proj")(x)  # [B, N, Co]
        x = jnp.swapaxes(x, 1, 2)  # [B, Co, N]
        x = nn.Dense(self.out_rows, name="row_proj")(x)  # [B, Co, R]
        x = x.reshape(x.shape[0], -1)
        return l2_normalize(x, axis=-1)
