"""Isolate the int8 regression: 31x the real flax Block at [32,257,1536]."""
import sys, time, dataclasses, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from anyloc_tpu.models.dinov2 import dinov2_config
from anyloc_tpu.models.vit import Block
from anyloc_tpu.ops.quant import quantize_tree

B, N, DEPTH = 32, 257, 31

def bench(cfg, params, tag):
    block = Block(cfg)
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal((B, N, cfg.embed_dim)), jnp.bfloat16)
    @jax.jit
    def f(params, x):
        for _ in range(DEPTH):
            x = block.apply(params, x)
        return jnp.max(x.astype(jnp.float32))
    float(f(params, x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(f(params, x0))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:24s}: {best*1e3:8.2f} ms", flush=True)

base = dinov2_config("dinov2_vitg14", dtype=jnp.bfloat16)
x_init = jnp.zeros((1, 8, base.embed_dim), jnp.bfloat16)
params = Block(base).init(jax.random.PRNGKey(0), x_init)
qparams = quantize_tree(params)

which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "bf16"):
    bench(base, params, "block bf16")
if which in ("all", "int8"):
    bench(dataclasses.replace(base, quant="int8"), qparams, "block int8")
