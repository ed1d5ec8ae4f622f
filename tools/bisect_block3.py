"""Marginal cost of attention in context: 31x Block vs attention stubbed,
all timed with the in-jit fori-loop harness."""
import sys, time, dataclasses, pathlib, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import flax.linen as nn
import jax, jax.numpy as jnp, numpy as np
from anyloc_tpu.models.dinov2 import dinov2_config
from anyloc_tpu.models.vit import Block, ViTConfig
from anyloc_tpu.ops.quant import quantize_tree

B, N, DEPTH = 32, 257, 31

def timeit(f, *args, iters=5):
    @jax.jit
    def loop(*args):
        def body(i, acc):
            out = f(args[0], args[1] + i.astype(args[1].dtype) * 1e-6, *args[2:])
            return acc + jnp.max(out).astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))
    float(loop(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

base = dinov2_config("dinov2_vitg14", dtype=jnp.bfloat16)
x0 = jnp.asarray(np.random.default_rng(1).standard_normal((B, N, base.embed_dim)), jnp.bfloat16)

which = sys.argv[1] if len(sys.argv) > 1 else "all"

def run_variant(tag, cfg, params=None):
    block = Block(cfg)
    p = params if params is not None else block.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, cfg.embed_dim), jnp.bfloat16))
    def f(p, x):
        for _ in range(DEPTH):
            x = block.apply(p, x)
        return x.astype(jnp.float32)
    t = timeit(f, p, x0)
    print(f"{tag:22s}: {t*1e3:8.2f} ms  ({t/DEPTH*1e3:5.2f} ms/block)", flush=True)

if which in ("all", "pallas"):
    run_variant("block bf16 pallas", base)
if which in ("all", "xla"):
    run_variant("block bf16 xla-attn", dataclasses.replace(base, attn_impl="xla"))
if which in ("all", "stub"):
    run_variant("block bf16 attn-stub", dataclasses.replace(base, attn_impl="stub"))
if which in ("all", "int8", "int8_mlp", "int8_fused"):
    cfg = dataclasses.replace(base, quant=which)
    block = Block(cfg)
    from anyloc_tpu.ops.quant import quantize_tree as qt
    full = Block(base).init(jax.random.PRNGKey(0), jnp.zeros((1, 8, base.embed_dim), jnp.bfloat16))
    if which in ("int8_mlp", "int8_fused"):
        import flax
        plain = flax.core.unfreeze(full)
        plain["params"]["mlp"] = qt({"p": plain["params"]["mlp"]})["p"]
        p = plain
    else:
        p = qt(full)
    def f(p, x):
        for _ in range(DEPTH):
            x = block.apply(p, x)
        return x.astype(jnp.float32)
    t = timeit(f, p, x0)
    print(f"{'block %s pallas' % which:22s}: {t*1e3:8.2f} ms  ({t/DEPTH*1e3:5.2f} ms/block)", flush=True)
