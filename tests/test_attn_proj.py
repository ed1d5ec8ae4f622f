"""Fused attention+projection kernel vs the unfused reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anyloc_tpu.ops.pallas.attn_proj import attention_proj, flash_attention_qkv_proj
from anyloc_tpu.ops.pallas.flash_attention import xla_attention


def _reference(q, k, v, w_proj):
    b, h, n, hd = q.shape
    o = xla_attention(q, k, v)                      # [B, H, N, hd]
    o = o.transpose(0, 2, 1, 3).reshape(b, n, h * hd)
    return o.astype(jnp.float32) @ w_proj.astype(jnp.float32)


@pytest.mark.parametrize("n", [8, 20])            # aligned + padded
@pytest.mark.parametrize("skew", [True, False])
def test_attention_proj_matches_reference(rng, n, skew):
    b, h, hd, d_out = 2, 4, 16, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, n, hd)), jnp.float32)
        for _ in range(3)
    )
    wp = jnp.asarray(rng.standard_normal((h * hd, d_out)) * 0.1, jnp.float32)
    got = attention_proj(q, k, v, wp, skew=skew, interpret=True)
    want = _reference(q, k, v, wp)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3
    )


def test_attention_proj_head_chunking(rng):
    b, h, n, hd, d_out = 1, 8, 12, 8, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, n, hd)), jnp.float32)
        for _ in range(3)
    )
    wp = jnp.asarray(rng.standard_normal((h * hd, d_out)) * 0.1, jnp.float32)
    full = attention_proj(q, k, v, wp, head_chunk=8, interpret=True)
    chunked = attention_proj(q, k, v, wp, head_chunk=2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(chunked), rtol=1e-4, atol=1e-4
    )


def test_attention_proj_uneven_heads_rounds_down(rng):
    # h=6 with requested chunk 4 -> falls back to 3 (divisor)
    b, h, n, hd = 1, 6, 8, 8
    q = jnp.asarray(rng.standard_normal((b, h, n, hd)), jnp.float32)
    wp = jnp.asarray(np.eye(h * hd), jnp.float32)
    out = attention_proj(q, q, q, wp, head_chunk=4, interpret=True)
    assert out.shape == (b, n, h * hd)


class TestQkvProj:
    def _reference_full(self, qkv, wp, bp, gamma, res, h):
        b, n, d3 = qkv.shape
        d = d3 // 3
        hd = d // h
        q, k, v = (
            qkv[..., i * d : (i + 1) * d]
            .reshape(b, n, h, hd).transpose(0, 2, 1, 3)
            for i in range(3)
        )
        o = xla_attention(q, k, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
        out = o.astype(jnp.float32) @ wp.astype(jnp.float32)
        if bp is not None:
            out = out + bp
        if gamma is not None:
            out = out * gamma
        if res is not None:
            out = out + res.astype(jnp.float32)
        return out

    @pytest.mark.parametrize("n", [8, 13])           # aligned + ragged
    @pytest.mark.parametrize("epilogue", [False, True])
    def test_matches_reference(self, rng, n, epilogue):
        b, h, hd = 2, 4, 16
        d = h * hd
        qkv = jnp.asarray(rng.standard_normal((b, n, 3 * d)), jnp.float32)
        wp = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32)
        bp = gamma = res = None
        if epilogue:
            bp = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
            gamma = jnp.asarray(rng.standard_normal((d,)) * 0.5, jnp.float32)
            res = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
        got = flash_attention_qkv_proj(
            qkv, wp, bp, num_heads=h, layerscale=gamma, residual=res,
            head_chunk=2, interpret=True,
        )
        want = self._reference_full(qkv, wp, bp, gamma, res, h)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3
        )

    def test_head_chunk_invariance(self, rng):
        b, h, hd, n = 1, 8, 8, 12
        d = h * hd
        qkv = jnp.asarray(rng.standard_normal((b, n, 3 * d)), jnp.float32)
        wp = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32)
        a = flash_attention_qkv_proj(qkv, wp, num_heads=h, head_chunk=8, interpret=True)
        c = flash_attention_qkv_proj(qkv, wp, num_heads=h, head_chunk=2, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-4)
