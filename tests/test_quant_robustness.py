"""int8_full robustness to NON-random weight/activation distributions.

Random-init trunks (the rest of test_quant.py) cannot surface the known
trained-transformer failure mode for W8A8: a handful of embed channels that
carry 30-100x activation magnitudes (mechanism: LayerNorm gamma spikes +
residual-stream accumulation — Dettmers et al., LLM.int8()). A per-token
(per-row) dynamic activation scale is inflated by the outlier channel,
crushing the effective resolution of every other channel in that row.

These tests build the adversarial regime explicitly — LN-gamma spikes on
fixed channels in EVERY block, heavy-tailed (Student-t, df=2) dense
kernels, and both combined — and assert the serving default (int8_full,
bench.py) keeps facet cosine high and retrieval on the committed real-JPEG
fixture unchanged. Measured deltas are recorded in docs/PERFORMANCE.md
("int8_full under adversarial weight distributions").

Why this holds without a mitigation knob: activations are quantized
per-row dynamically (ops/quant.py::quantize_rows), so an outlier channel
costs resolution only *within its own token row*, and the induced error is
zero-mean across the K=embed_dim contraction of the following matmul —
it averages down by ~sqrt(K) relative to the signal. Weights are quantized
per-output-channel, so column-wise outliers never leak across channels.
(A static per-tensor activation scale — the design this module does NOT
use — fails this test.)
"""

import dataclasses
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from anyloc_tpu.data.transforms import center_crop_multiple, load_image
from anyloc_tpu.models.dinov2 import dinov2_config
from anyloc_tpu.models.extractor import ViTFacetExtractor, init_params
from anyloc_tpu.ops.quant import quantize_vit_params
from anyloc_tpu.ops.retrieval import get_top_k_recall
from anyloc_tpu.ops.vlad import VLAD

N_OUTLIER_CH = 12
OUTLIER_MAG = 100.0


def _fixture_imgs(sub, n, size=160):
    fixture = pathlib.Path(__file__).parent / "fixtures" / "e2e"
    paths = sorted((fixture / sub).glob("*.jpg"))[:n]
    assert paths, fixture
    return np.stack([
        center_crop_multiple(load_image(str(p), (size, size)), 14)
        for p in paths
    ])


def _spike_ln_gammas(params, cfg, channels, mag):
    """LN-gamma outlier channels in every block (norm1 feeds qkv, norm2
    feeds fc1 — both int8-quantized inputs in int8_full)."""
    import flax

    p = flax.core.unfreeze(params)
    for i in range(cfg.depth):
        blk = p["params"][f"blocks_{i}"]
        for ln in ("norm1", "norm2"):
            s = np.array(blk[ln]["scale"], copy=True)
            s[channels] *= mag
            blk[ln]["scale"] = jnp.asarray(s)
    return p


def _heavy_tail_kernels(params, df=2.0, seed=1):
    """Replace every 2-D dense kernel with a Student-t draw at the same
    per-tensor RMS (within-column outlier entries stress the per-column
    weight scale)."""
    import flax

    p = flax.core.unfreeze(params)
    r = np.random.default_rng(seed)

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k == "kernel" and hasattr(v, "ndim") and v.ndim == 2:
                old = np.asarray(v)
                t = r.standard_t(df, size=old.shape).astype(np.float32)
                t *= old.std() / max(t.std(), 1e-9)
                out[k] = jnp.asarray(t)
            else:
                out[k] = walk(v)
        return out

    return walk(p)


@pytest.fixture(scope="module")
def adversarial_setup():
    cfg = dinov2_config("dinov2_vits14", dtype=jnp.float32)  # depth 12
    base = init_params(cfg, seed=11)
    ch = np.random.default_rng(0).choice(
        cfg.embed_dim, size=N_OUTLIER_CH, replace=False
    )
    params = _heavy_tail_kernels(
        _spike_ln_gammas(base, cfg, ch, OUTLIER_MAG)
    )
    return cfg, params


def _facets(cfg, params, imgs, quant=None):
    if quant:
        cfg = dataclasses.replace(cfg, quant=quant)
        params = quantize_vit_params(params, quant)
    ex = ViTFacetExtractor(cfg, params, cfg.depth - 1, "value")
    return np.asarray(ex(jnp.asarray(imgs)), np.float32)


def test_int8_full_facet_cosine_under_outliers(adversarial_setup):
    """Facet cosine vs f32 stays high through 12 quantized blocks with
    x100 LN-gamma outlier channels + Student-t kernels on real JPEGs."""
    cfg, params = adversarial_setup
    imgs = _fixture_imgs("db", 8)
    f32 = _facets(cfg, params, imgs)
    q = _facets(cfg, params, imgs, quant="int8_full")
    cos = (f32 * q).sum(-1) / (
        np.linalg.norm(f32, axis=-1) * np.linalg.norm(q, axis=-1) + 1e-12
    )
    # measured on this fixture: median 0.9986, min 0.9969 (PERFORMANCE.md)
    assert np.median(cos) > 0.995, float(np.median(cos))
    assert cos.min() > 0.99, float(cos.min())


def test_int8_full_recall_delta_zero_under_outliers(adversarial_setup):
    """The serving default's R@1/R@5 on the e2e fixture is UNCHANGED vs the
    f32 trunk under the adversarial weight regime (the BASELINE.md budget
    is 0.3%; the assertion here is exact equality on this fixture)."""
    cfg, params = adversarial_setup
    db_imgs = _fixture_imgs("db", 8)
    qu_imgs = _fixture_imgs("queries", 4)
    gt = [np.array([i]) for i in range(qu_imgs.shape[0])]

    results = {}
    for name, quant in (("f32", None), ("int8", "int8_full")):
        db = _facets(cfg, params, db_imgs, quant)
        qu = _facets(cfg, params, qu_imgs, quant)
        v = VLAD(num_clusters=8)
        dv = v.fit_and_generate(db)
        qv = v.generate_multi(qu)
        _, idx, rec = get_top_k_recall([1, 5], dv, qv, gt)
        results[name] = (idx[:, 0].tolist(), rec)
    assert results["f32"][0] == results["int8"][0], results
    assert results["f32"][1] == results["int8"][1], results
