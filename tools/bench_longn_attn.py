"""Long-N attention kernel experiments (demo path, B2 x H24 x N5330 x 64).

Bounds the VPU (exp) vs MXU (dots) split of flash_attention_blocked and
measures candidate variants: bf16 exp, block-size sweep, no-mask interior.
Methodology per docs/PERFORMANCE.md: long fori_loop inside one jit, consume
with max, perturb input per iteration.
"""
import time, sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
import anyloc_tpu  # compile cache
from anyloc_tpu.ops.pallas.flash_attention import flash_attention_blocked

B, H, N, HD = 2, 24, 5330, 64
ITERS = 30

def bench(fn, *args):
    @jax.jit
    def loop(a0, *rest):
        def body(i, acc):
            out = fn(a0 + i * 1e-6, *rest)
            return acc + jnp.max(out).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))
    float(loop(*args))  # compile+warm
    t0 = time.perf_counter(); float(loop(*args)); dt = time.perf_counter() - t0
    return dt / ITERS * 1000  # ms per call

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, H, N, HD)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, H, N, HD)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, H, N, HD)), jnp.bfloat16)

for bq, bk in ((512, 512), (256, 1024), (1024, 512), (512, 1024), (1024, 1024)):
    ms = bench(lambda qq, kk, vv: flash_attention_blocked(qq, kk, vv, block_q=bq, block_k=bk), q, k, v)
    print(f"blocked bq={bq} bk={bk}: {ms:.2f} ms", flush=True)

for bq, bk in ((1024, 2048), (2048, 1024), (2048, 2048), (1344, 1344)):
    try:
        ms = bench(lambda qq, kk, vv: flash_attention_blocked(qq, kk, vv, block_q=bq, block_k=bk), q, k, v)
        print(f"blocked bq={bq} bk={bk}: {ms:.2f} ms", flush=True)
    except Exception as e:
        print(f"bq={bq} bk={bk} failed: {type(e).__name__} {str(e)[:120]}", flush=True)
