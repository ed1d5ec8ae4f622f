"""Pallas kernels vs their XLA reference paths (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from anyloc_tpu.ops.pallas.flash_attention import (
    flash_attention,
    flash_attention_heads,
    xla_attention,
)
from anyloc_tpu.ops.pallas.vlad_kernel import vlad_aggregate_fused
from anyloc_tpu.ops.vlad import vlad_aggregate


@pytest.mark.parametrize("n", [64, 57])  # aligned and padded token counts
@pytest.mark.parametrize("variant", [flash_attention, flash_attention_heads])
def test_flash_attention_matches_xla(rng, n, variant):
    b, h, hd = 2, 4, 32
    q = jnp.asarray(rng.standard_normal((b, h, n, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, n, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, n, hd)).astype(np.float32))
    ours = np.asarray(variant(q, k, v, interpret=True))
    ref = np.asarray(xla_attention(q, k, v))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_flash_attention_heads_chunking(rng):
    """head_chunk not dividing h falls back to a divisor; odd h works."""
    b, h, n, hd = 1, 6, 40, 16
    q = jnp.asarray(rng.standard_normal((b, h, n, hd)).astype(np.float32))
    ours = np.asarray(
        flash_attention_heads(q, q, q, head_chunk=4, interpret=True)
    )
    ref = np.asarray(xla_attention(q, q, q))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("dist_mode", ["cosine", "euclidean"])
@pytest.mark.parametrize("n", [48, 50])  # padded token path included
def test_fused_vlad_matches_xla(rng, dist_mode, n):
    b, d, c = 3, 64, 8
    descs = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    centers = jnp.asarray(rng.standard_normal((c, d)).astype(np.float32))
    fused = np.asarray(
        vlad_aggregate_fused(descs, centers, dist_mode=dist_mode, interpret=True)
    )
    ref = np.asarray(
        vlad_aggregate(descs, centers, dist_mode=dist_mode, impl="xla")
    )
    np.testing.assert_allclose(fused, ref, atol=2e-5)


def test_fused_vlad_flag_combinations(rng):
    descs = jnp.asarray(rng.standard_normal((2, 40, 32)).astype(np.float32))
    centers = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    for intra in (True, False):
        for normd in (True, False):
            fused = np.asarray(
                vlad_aggregate_fused(
                    descs, centers, intra_norm=intra, norm_descs=normd,
                    interpret=True,
                )
            )
            ref = np.asarray(
                vlad_aggregate(
                    descs, centers, intra_norm=intra, norm_descs=normd, impl="xla"
                )
            )
            np.testing.assert_allclose(fused, ref, atol=2e-5, err_msg=f"{intra},{normd}")


@pytest.mark.parametrize("norm_descs", [True, False])
def test_fused_vlad_soft_mode(rng, norm_descs):
    """Soft mode must reproduce the reference's all-centers residual sum
    (the XLA path is oracle-tested in test_vlad.py)."""
    descs = jnp.asarray(rng.standard_normal((2, 40, 32)).astype(np.float32))
    centers = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    fused = np.asarray(
        vlad_aggregate_fused(descs, centers, vlad_mode="soft", soft_temp=2.0,
                             norm_descs=norm_descs, interpret=True)
    )
    ref = np.asarray(
        vlad_aggregate(descs, centers, vlad_mode="soft", soft_temp=2.0,
                       norm_descs=norm_descs, impl="xla")
    )
    np.testing.assert_allclose(fused, ref, atol=3e-5)


@pytest.mark.parametrize("vlad_mode", ["hard", "soft"])
@pytest.mark.parametrize("n", [96, 100])  # block-aligned and ragged tails
def test_fused_vlad_token_blocked_matches_xla(rng, monkeypatch, vlad_mode, n):
    """The multi-block accumulation path (demo-path images reach 5.3k tokens,
    a 33 MB slab that overflows scoped VMEM) must match XLA exactly. Force
    blocking at test shapes by shrinking the single-block budget."""
    from anyloc_tpu.ops.pallas import vlad_kernel as vk

    monkeypatch.setattr(vk, "_SINGLE_BLOCK_MAX_BYTES", 1)
    monkeypatch.setattr(vk, "_BLOCK_TOKENS", 32)  # n=96 -> 3 blocks
    b, d, c = 2, 64, 8
    descs = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
    centers = jnp.asarray(rng.standard_normal((c, d)).astype(np.float32))
    fused = np.asarray(
        vk.vlad_aggregate_fused(descs, centers, vlad_mode=vlad_mode,
                                interpret=True)
    )
    ref = np.asarray(
        vlad_aggregate(descs, centers, vlad_mode=vlad_mode, impl="xla")
    )
    np.testing.assert_allclose(fused, ref, atol=2e-5)


def test_flash_attention_long_sequence_falls_back(rng):
    """Beyond the VMEM token budget the kernels must route to XLA instead of
    dying in Mosaic (demo-path images reach ~5.4k tokens)."""
    b, h, n, hd = 1, 2, 1536, 16
    q = jnp.asarray(rng.standard_normal((b, h, n, hd)).astype(np.float32))
    out = flash_attention_heads(q, q, q)  # would VMEM-OOM without fallback
    ref = xla_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("n", [96, 100])
def test_flash_attention_blocked_matches_xla(rng, n):
    from anyloc_tpu.ops.pallas.flash_attention import flash_attention_blocked

    b, h, hd = 1, 2, 32
    q = jnp.asarray(rng.standard_normal((b, h, n, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, n, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, n, hd)).astype(np.float32))
    ours = np.asarray(
        flash_attention_blocked(q, k, v, block_q=64, block_k=64, interpret=True)
    )
    ref = np.asarray(xla_attention(q, k, v))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_fused_block_int8_matches_two_kernel_math(rng):
    """Whole-block kernel == the attention-half + MLP-half composition
    (same quantization points), interpret mode."""
    import jax
    import jax.numpy as jnp

    from anyloc_tpu.ops.pallas.fused_block import fused_block_int8
    from anyloc_tpu.ops.pallas.fused_mlp import _ln_rows

    B, H, D, HID, N = 2, 4, 64, 48, 30

    def qw(shape):
        w = rng.standard_normal(shape).astype(np.float32) * 0.05
        s = np.abs(w).max(axis=0) / 127.0
        return (jnp.asarray(np.round(w / s).clip(-127, 127).astype(np.int8)),
                jnp.asarray(s))

    wqkv_q, wqkv_s = qw((D, 3 * D)); wp_q, wp_s = qw((D, D))
    w12_q, w12_s = qw((D, 2 * HID)); w3_q, w3_s = qw((HID, D))
    ln1 = (jnp.ones((D,), jnp.float32), jnp.zeros((D,), jnp.float32))
    x = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    got = fused_block_int8(
        x, (wqkv_q, wqkv_s, None, wp_q, wp_s, None),
        (w12_q, w12_s, None, w3_q, w3_s, None),
        num_heads=H, ln1=ln1, ln2=ln1, interpret=True,
    )

    def q_rows(xn):
        s = jnp.maximum(jnp.max(jnp.abs(xn), -1, keepdims=True), 1e-6) / 127.
        return jnp.clip(jnp.round(xn / s), -127, 127), s

    xn = _ln_rows(x, *ln1, 1e-6)
    xq, xs = q_rows(xn)
    qkv = (xq @ wqkv_q.astype(jnp.float32)) * xs * wqkv_s
    q3, k3, v3 = jnp.split(qkv, 3, -1)
    hd = D // H
    heads = lambda t: t.reshape(B, N, H, hd).transpose(0, 2, 1, 3)  # noqa: E731
    s = jnp.einsum("bhqd,bhkd->bhqk",
                   heads(q3 * hd ** -0.5).astype(jnp.bfloat16),
                   heads(k3).astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, -1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(jnp.bfloat16),
                   heads(v3).astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    o = o.transpose(0, 2, 1, 3).reshape(B, N, D)
    oq, osc = q_rows(o)
    x2 = x + (oq @ wp_q.astype(jnp.float32)) * osc * wp_s
    xn2 = _ln_rows(x2, *ln1, 1e-6)
    xq2, xs2 = q_rows(xn2)
    h12 = (xq2 @ w12_q.astype(jnp.float32)) * xs2 * w12_s
    h1, h2 = jnp.split(h12, 2, -1)
    a = jax.nn.silu(h1) * h2
    aq, asc = q_rows(a)
    want = x2 + (aq @ w3_q.astype(jnp.float32)) * asc * w3_s
    g = np.asarray(got).ravel(); w = np.asarray(want).ravel()
    assert g @ w / (np.linalg.norm(g) * np.linalg.norm(w)) > 0.999
