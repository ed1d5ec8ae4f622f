"""Bisect the int8 end-to-end regression: time the real ViT-G trunk
(31 blocks, capture l31 value) under config toggles."""
import sys, time, dataclasses, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from anyloc_tpu.models.dinov2 import dinov2_config
from anyloc_tpu.models.extractor import init_params
from anyloc_tpu.models.vit import ViT

B, SZ, LAYER = 32, 224, 31

def bench(cfg, tag):
    model = ViT(cfg)
    params = init_params(cfg, seed=0)
    imgs = jnp.asarray(np.random.default_rng(1).standard_normal((B, SZ, SZ, 3)), jnp.float32)
    @jax.jit
    def f(params, imgs):
        out = model.apply(params, imgs, capture_layer=LAYER, capture_facet="value")
        return jnp.max(out.astype(jnp.float32))
    float(f(params, imgs))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(f(params, imgs))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:28s}: {best*1e3:8.2f} ms  ({B/best:6.1f} img/s trunk-only)", flush=True)

base = dinov2_config("dinov2_vitg14", dtype=jnp.bfloat16)
which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "bf16"):
    bench(base, "bf16 pallas-attn")
if which in ("all", "int8"):
    bench(dataclasses.replace(base, quant="int8"), "int8 pallas-attn")
if which in ("all", "bf16xla"):
    bench(dataclasses.replace(base, attn_impl="xla"), "bf16 xla-attn")
if which in ("all", "int8xla"):
    bench(dataclasses.replace(base, quant="int8", attn_impl="xla"), "int8 xla-attn")
