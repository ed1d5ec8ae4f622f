"""Sequence parallelism for the ViT trunk — ring attention over a mesh axis.

Long-context route: the demo path runs images up to 1024 px through ViT-G,
i.e. ~5.3k tokens (demo/anyloc_vlad_generate.py:165-181); activation memory
at that length is the single-chip limiter, not parameters. Sequence
parallelism shards the TOKEN axis across chips: LayerNorm / qkv / proj / MLP
are token-local (zero communication), and only attention needs remote keys —
served by a **ring**: each device holds one K/V shard and passes it around
the ``sp`` axis with ``ppermute`` while accumulating an online softmax
(the distributed sibling of the k-blocked flash kernel in
ops/pallas/flash_attention.py). Per-device activation bytes drop ~1/n_sp and
each ring step's K/V block transfer overlaps the local [nq, nk] dots.

The reference has no sequence/context parallelism anywhere (SURVEY.md §5
"long-context handling: none") — this exists because a TPU-first framework
scales token counts past one chip's HBM, the same way parallel/pp.py scales
parameter bytes.

Token counts rarely divide the mesh (DINOv2 at 224 px = 257 tokens, prime) —
shards are zero-padded and the ring masks padded KEYS out of every softmax;
padded QUERY rows compute garbage that never escapes (dropped on unpad, and
never read as keys).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from anyloc_tpu.models.vit import Block, ViT, ViTConfig

_NEG = -1e30


def _pvary(x, axes):
    """Mark ``x`` as varying over mesh axes (jax>=0.7 VMA typing; no-op on
    older jax) — scan carries that later mix with ppermute outputs need it."""
    if hasattr(lax, "pcast"):
        return lax.pcast(x, axes, to="varying")
    if hasattr(lax, "pvary"):
        return lax.pvary(x, axes)
    return x


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: jnp.ndarray,
    *,
    axis_name: str,
    n_shards: int,
    vary_axes=(),
) -> jnp.ndarray:
    """Exact attention with K/V sharded over ``axis_name``.

    All of q/k/v are the LOCAL token shard [B, H, n_loc, hd]; ``kv_mask``
    [n_loc] marks which local keys are real (False = padding). ``n_shards``
    ring steps of (online-softmax update; ppermute K/V/mask to the next
    device) produce the same result as single-device softmax(QK^T)V over the
    full sequence, in f32 accumulation.
    """
    scale = q.shape[-1] ** -0.5
    qf = q.astype(jnp.float32) * scale
    b, h, nq, hd = q.shape
    axes = tuple(vary_axes) or (axis_name,)
    m0 = _pvary(jnp.full((b, h, nq, 1), _NEG, jnp.float32), axes)
    l0 = _pvary(jnp.zeros((b, h, nq, 1), jnp.float32), axes)
    a0 = _pvary(jnp.zeros((b, h, nq, hd), jnp.float32), axes)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def body(carry, _):
        k_c, v_c, msk, m, el, acc = carry
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, k_c.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        valid = msk[None, None, None, :]
        s = jnp.where(valid, s, _NEG)
        m_new = jnp.maximum(m, s.max(-1, keepdims=True))
        # explicit zeroing: an all-padded block gives s == m_new == _NEG and
        # exp(0) == 1 otherwise
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m - m_new)
        acc = acc * corr + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_c.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        el = el * corr + p.sum(-1, keepdims=True)
        k_c = lax.ppermute(k_c, axis_name, perm)
        v_c = lax.ppermute(v_c, axis_name, perm)
        msk = lax.ppermute(msk, axis_name, perm)
        return (k_c, v_c, msk, m_new, el, acc), None

    (_, _, _, _, el, acc), _ = lax.scan(
        body, (k, v, kv_mask, m0, l0, a0), None, length=n_shards
    )
    return (acc / jnp.maximum(el, 1e-30)).astype(q.dtype)


def _stack_blocks(params: Dict, n_run: int) -> Dict:
    """Blocks 0..n_run-1 as one [n_run, ...]-leaved tree for lax.scan
    (pp.py's stage stacker with a single stage: no fillers, no mask)."""
    from anyloc_tpu.parallel.pp import stack_stage_params

    return stack_stage_params(params, n_run, 1)[0]


def sp_facet_extract(
    cfg: ViTConfig,
    params: Dict,
    imgs: jnp.ndarray,
    mesh: Mesh,
    layer: int,
    facet: str = "value",
    *,
    data_axis: str = "data",
    sp_axis: str = "model",
) -> jnp.ndarray:
    """Facet extraction with activations token-sharded over
    ``mesh[sp_axis]`` and batch-sharded over ``mesh[data_axis]``.

    Matches ``ViT.apply(..., capture_layer=layer, capture_facet=facet)``
    (vit.py facet semantics: q/k/v stop at block ``layer``'s qkv, ``token``
    includes block ``layer``); equality is test-enforced on the virtual mesh
    (tests/test_sharding.py).
    """
    if facet not in ("query", "key", "value", "token"):
        raise ValueError(f"sp route supports q/k/v/token, got {facet}")
    if not 0 <= layer < cfg.depth:
        raise ValueError(f"layer {layer} out of range [0, {cfg.depth})")
    if cfg.quant is not None:
        raise ValueError(
            "sequence parallelism uses the unfused block path; run with "
            "quant=None (the fused int8 kernels are single-device)"
        )
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    n_sp = mesh.shape[sp_axis]
    n_run = layer + 1 if facet == "token" else layer

    embedded = ViT(cfg).apply(params, imgs, embed_only=True)  # [B, T, D]
    b, t, d = embedded.shape
    t_pad = -(-t // n_sp) * n_sp
    emb = jnp.pad(embedded, ((0, 0), (0, t_pad - t), (0, 0)))
    mask = jnp.arange(t_pad) < t
    stacked = _stack_blocks(params, max(n_run, 1))
    cap = params["params"][f"blocks_{layer}"]

    def fn(emb_loc, mask_loc, stacked_rep, cap_rep):
        ring = functools.partial(
            ring_attention, axis_name=sp_axis, n_shards=n_sp,
            vary_axes=(data_axis, sp_axis),
        )

        def attn(qh, kh, vh):
            return ring(qh, kh, vh, mask_loc)

        def body(x, pb):
            return Block(cfg).apply({"params": pb}, x, attn_fn=attn), None

        x = emb_loc
        if n_run > 0:
            x, _ = lax.scan(body, emb_loc, stacked_rep)
        if facet == "token":
            return x
        return Block(cfg).apply({"params": cap_rep}, x, qkv_only=True)

    out = shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P(data_axis, sp_axis, None),
            P(sp_axis),
            jax.tree_util.tree_map(lambda _: P(), stacked),
            jax.tree_util.tree_map(lambda _: P(), cap),
        ),
        out_specs=P(data_axis, sp_axis, None),
    )(emb, mask, stacked, cap)

    out = out[:, :t]
    if facet == "token":
        return out
    off = {"query": 0, "key": 1, "value": 2}[facet]
    return out[..., off * d: (off + 1) * d]


class SPFacetExtractor:
    """Drop-in extractor (the ``ViTFacetExtractor`` interface: ``_forward``,
    ``__call__``, ``supports_uint8``) whose trunk runs SEQUENCE-PARALLEL over
    ``mesh`` — tokens sharded on the sp axis, batch on the data axis. Plugs
    into ``DescriptorEngine`` and every pipeline unchanged (pass the engine
    ``mesh=None``: the sharding lives inside this extractor).

    The multi-chip serving route for the long-N demo path (1024 px ViT-G,
    ~5.3k tokens) when one chip's HBM can't hold the activations.
    """

    supports_uint8 = True

    def __init__(self, cfg: ViTConfig, params, layer: int,
                 facet: str = "value", mesh: Mesh = None, *,
                 use_cls: bool = False, norm_descs: bool = True,
                 data_axis: str = "data", sp_axis: str = "model") -> None:
        if mesh is None:
            raise ValueError("SPFacetExtractor requires a mesh")
        if cfg.quant is not None:
            raise ValueError("sequence parallelism requires quant=None")
        assert facet in ("query", "key", "value", "token"), facet
        self.cfg, self.params = cfg, params
        self.layer, self.facet = layer, facet
        self.use_cls, self.norm_descs = use_cls, norm_descs
        self.mesh = mesh
        skip = (1 if cfg.use_cls_token else 0) + cfg.num_register_tokens

        @jax.jit
        def _forward(params, imgs):
            if imgs.dtype == jnp.uint8:
                from anyloc_tpu.data.transforms import device_normalize

                imgs = device_normalize(imgs)
            out = sp_facet_extract(
                cfg, params, imgs, mesh, layer, facet,
                data_axis=data_axis, sp_axis=sp_axis,
            )
            if use_cls:
                if cfg.num_register_tokens:
                    out = jnp.concatenate([out[:, :1], out[:, skip:]], axis=1)
            else:
                out = out[:, skip:]
            out = out.astype(jnp.float32)
            if norm_descs:
                from anyloc_tpu.ops.common import l2_normalize

                out = l2_normalize(out, axis=-1)
            return out

        self._forward = _forward

    def __call__(self, imgs: jnp.ndarray) -> jnp.ndarray:
        if imgs.ndim == 3:
            imgs = imgs[None]
        return self._forward(self.params, imgs)
