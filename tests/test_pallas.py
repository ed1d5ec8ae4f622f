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
