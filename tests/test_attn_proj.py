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


class TestFusedAttnHalfInt8:
    """quant='int8_full': LN1 + int8 qkv + attention + int8 proj + residual."""

    def _rms_rel(self, got, want):
        got = np.asarray(got, np.float64)
        want = np.asarray(want, np.float64)
        return np.sqrt(np.mean((got - want) ** 2)) / (
            np.sqrt(np.mean(want ** 2)) + 1e-12
        )

    def _problem(self, rng, b=2, n=13, h=4, hd=16):
        d = h * hd
        x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
        wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.1, jnp.float32)
        bqkv = jnp.asarray(rng.standard_normal((3 * d,)) * 0.02, jnp.float32)
        wp = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32)
        bp = jnp.asarray(rng.standard_normal((d,)) * 0.02, jnp.float32)
        ln_s = jnp.asarray(1.0 + 0.1 * rng.standard_normal((d,)), jnp.float32)
        ln_b = jnp.asarray(0.05 * rng.standard_normal((d,)), jnp.float32)
        gamma = jnp.asarray(rng.standard_normal((d,)) * 0.5, jnp.float32)
        return x, wqkv, bqkv, wp, bp, ln_s, ln_b, gamma

    def _reference_f32(self, x, wqkv, bqkv, wp, bp, ln_s, ln_b, gamma, h):
        b, n, d = x.shape
        hd = d // h
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        xn = (x - mean) * jax.lax.rsqrt(var + 1e-6) * ln_s + ln_b
        qkv = xn @ wqkv + bqkv
        q, k, v = (
            qkv[..., i * d : (i + 1) * d]
            .reshape(b, n, h, hd).transpose(0, 2, 1, 3)
            for i in range(3)
        )
        o = xla_attention(q, k, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
        out = o @ wp + bp
        if gamma is not None:
            out = out * gamma
        return x + out

    @pytest.mark.parametrize("n", [16, 13])          # aligned + ragged
    @pytest.mark.parametrize("with_gamma", [True, False])
    def test_matches_f32_within_int8_noise(self, rng, n, with_gamma):
        from anyloc_tpu.ops.pallas.attn_proj import fused_attn_half_int8
        from anyloc_tpu.ops.quant import quantize_weight_cols

        x, wqkv, bqkv, wp, bp, ln_s, ln_b, gamma = self._problem(rng, n=n)
        if not with_gamma:
            gamma = None
        wqkv_q, sqkv = quantize_weight_cols(wqkv)
        wp_q, sp = quantize_weight_cols(wp)
        got = fused_attn_half_int8(
            x, wqkv_q, sqkv, bqkv, wp_q, sp, bp,
            num_heads=4, ln_params=(ln_s, ln_b), ln_eps=1e-6,
            layerscale=gamma, head_chunk=2, interpret=True,
        )
        want = self._reference_f32(x, wqkv, bqkv, wp, bp, ln_s, ln_b, gamma, 4)
        assert got.shape == want.shape
        assert self._rms_rel(got, want) < 0.03

    @pytest.mark.parametrize("n", [16, 13])          # aligned + ragged
    def test_pack_pairs_bit_equal_unpacked(self, rng, n):
        """M-packed head pairs (round-4 verdict item 9): block-diagonal Q
        zeros kill cross-head terms, so packed == unpacked EXACTLY (the
        same dots in a different tiling), both skews."""
        from anyloc_tpu.ops.pallas.attn_proj import fused_attn_half_int8
        from anyloc_tpu.ops.quant import quantize_weight_cols

        x, wqkv, bqkv, wp, bp, ln_s, ln_b, gamma = self._problem(rng, n=n)
        wqkv_q, sqkv = quantize_weight_cols(wqkv)
        wp_q, sp = quantize_weight_cols(wp)
        kw = dict(num_heads=4, ln_params=(ln_s, ln_b), layerscale=gamma,
                  head_chunk=4, interpret=True)
        want = fused_attn_half_int8(
            x, wqkv_q, sqkv, bqkv, wp_q, sp, bp, **kw)
        for skew in (True, False):
            got = fused_attn_half_int8(
                x, wqkv_q, sqkv, bqkv, wp_q, sp, bp, pack_pairs=True,
                skew=skew, **kw)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-5)

    def test_head_chunk_invariance(self, rng):
        from anyloc_tpu.ops.pallas.attn_proj import fused_attn_half_int8
        from anyloc_tpu.ops.quant import quantize_weight_cols

        x, wqkv, bqkv, wp, bp, ln_s, ln_b, gamma = self._problem(rng, h=4)
        wqkv_q, sqkv = quantize_weight_cols(wqkv)
        wp_q, sp = quantize_weight_cols(wp)
        outs = [
            fused_attn_half_int8(
                x, wqkv_q, sqkv, bqkv, wp_q, sp, bp,
                num_heads=4, ln_params=(ln_s, ln_b), layerscale=gamma,
                head_chunk=hc, interpret=True,
            )
            for hc in (4, 1)
        ]
        # per-(row, chunk) o_cat requantization differs across chunkings —
        # bounded by int8 noise, not bit-equal
        assert self._rms_rel(outs[0], outs[1]) < 0.02

    def test_trunk_int8_full_kernel_matches_fallback(self):
        """Block-level: interpret kernel vs the CPU XLA-int8 composition."""
        import anyloc_tpu.models.vit as vit_mod
        from anyloc_tpu.models.extractor import init_params
        from anyloc_tpu.models.vit import ViT, ViTConfig
        from anyloc_tpu.ops.quant import quantize_vit_params

        kw = dict(
            img_size=56, patch_size=14, embed_dim=128, depth=3, num_heads=4,
            mlp_type="swiglu_fused", layerscale_init=1e-5, attn_impl="xla",
        )
        cfg = ViTConfig(**kw)
        qcfg = ViTConfig(**kw, quant="int8_full")
        params = init_params(cfg, seed=0)
        qp = quantize_vit_params(params, mode="int8_full", min_size=1)
        # converted tree loads into the int8_full module layout
        qinit = init_params(qcfg, seed=0)
        assert jax.tree_util.tree_structure(qp) == jax.tree_util.tree_structure(
            qinit
        )
        # precondition for this test to exercise the fused-attention route:
        # Block takes it when impl=='pallas' OR backend=='cpu' (conftest
        # pins tests to the virtual CPU mesh)
        assert jax.default_backend() == "cpu"
        imgs = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 56, 56, 3)), jnp.float32
        )
        ref = ViT(cfg).apply(params, imgs, capture_layer=2, capture_facet="value")
        fallback = ViT(qcfg).apply(qp, imgs, capture_layer=2, capture_facet="value")
        vit_mod._FUSED_ATTN_INTERPRET = True
        vit_mod._FUSED_MLP_INTERPRET = True
        try:
            kernel = ViT(qcfg).apply(
                qp, imgs, capture_layer=2, capture_facet="value"
            )
        finally:
            vit_mod._FUSED_ATTN_INTERPRET = False
            vit_mod._FUSED_MLP_INTERPRET = False
        assert self._rms_rel(kernel, fallback) < 0.02
        # quantized trunk tracks the f32 trunk
        a = np.asarray(ref, np.float64).reshape(-1, ref.shape[-1])
        b = np.asarray(kernel, np.float64).reshape(-1, ref.shape[-1])
        cos = np.sum(a * b, -1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
        )
        assert cos.min() > 0.99, cos.min()


class TestFusedAttnHalfBf16:
    """Unwired bf16 twin (measured slower than the split path at the
    flagship shape — kept for other-shape re-evaluation): correctness only."""

    def test_matches_f32_reference(self, rng):
        from anyloc_tpu.ops.pallas.attn_proj import fused_attn_half_bf16

        b, n, h, hd = 2, 13, 4, 16
        d = h * hd
        x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
        wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.1, jnp.float32)
        bqkv = jnp.asarray(rng.standard_normal((3 * d,)) * 0.02, jnp.float32)
        wp = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32)
        bp = jnp.asarray(rng.standard_normal((d,)) * 0.02, jnp.float32)
        ln_s = jnp.asarray(1 + 0.1 * rng.standard_normal((d,)), jnp.float32)
        ln_b = jnp.asarray(0.05 * rng.standard_normal((d,)), jnp.float32)
        gamma = jnp.asarray(rng.standard_normal((d,)) * 0.5, jnp.float32)
        got = fused_attn_half_bf16(
            x, wqkv, bqkv, wp, bp, num_heads=h, ln_params=(ln_s, ln_b),
            layerscale=gamma, head_chunk=2, interpret=True,
        )
        want = TestFusedAttnHalfInt8._reference_f32(
            None, x, wqkv, bqkv, wp, bp, ln_s, ln_b, gamma, h
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
        )


    def test_int8_full_respects_qkv_bias_flag(self):
        """qkv_bias=False must work through the fused int8 route (the
        fused branch once declared a bias unconditionally)."""
        import dataclasses

        from anyloc_tpu.models.extractor import init_params
        from anyloc_tpu.models.vit import ViT, ViTConfig
        from anyloc_tpu.ops.quant import quantize_vit_params

        kw = dict(
            img_size=56, patch_size=14, embed_dim=128, depth=2, num_heads=4,
            mlp_type="swiglu_fused", layerscale_init=1e-5, attn_impl="xla",
            qkv_bias=False,
        )
        cfg = ViTConfig(**kw)
        qcfg = dataclasses.replace(cfg, quant="int8_full")
        qp = quantize_vit_params(init_params(cfg, seed=0), mode="int8_full",
                                 min_size=1)
        imgs = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 56, 56, 3)),
            jnp.float32,
        )
        out = ViT(qcfg).apply(qp, imgs, capture_layer=1, capture_facet="value")
        assert out.shape[-1] == 128

def test_int8_batch_tile_invariance(rng):
    """batch_tile>1 packs images into one grid cell (padded row stripes) —
    outputs must match the per-image path up to requantization noise.
    (Measured break-even at the flagship shape; default stays 1 —
    docs/PERFORMANCE.md.)"""
    from anyloc_tpu.ops.pallas.attn_proj import fused_attn_half_int8
    from anyloc_tpu.ops.quant import quantize_weight_cols

    x, wqkv, bqkv, wp, bp, ln_s, ln_b, gamma = (
        TestFusedAttnHalfInt8()._problem(rng, b=4, n=13)
    )
    wqkv_q, sqkv = quantize_weight_cols(wqkv)
    wp_q, sp = quantize_weight_cols(wp)
    outs = [
        fused_attn_half_int8(
            x, wqkv_q, sqkv, bqkv, wp_q, sp, bp,
            num_heads=4, ln_params=(ln_s, ln_b), layerscale=gamma,
            head_chunk=2, batch_tile=bt, interpret=True,
        )
        for bt in (1, 2, 4)
    ]
    for o in outs[1:]:
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(outs[0]), rtol=1e-5, atol=1e-5
        )
