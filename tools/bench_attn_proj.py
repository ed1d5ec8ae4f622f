"""TPU benchmark: fused attention+proj vs flash_attention_heads + XLA proj.

Flagship shape: DINOv2-G at 224px -> [32, 24, 257, 64], proj 1536x1536.
Also 320px (N=530). Loops run inside one jit (tunnel-safe timing)."""
import sys, time, functools, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from anyloc_tpu.ops.pallas.attn_proj import attention_proj
from anyloc_tpu.ops.pallas.flash_attention import flash_attention_heads

def timeit(fn, *args, iters=10):
    @jax.jit
    def run(*args):
        def body(i, acc):
            out = fn(args[0] + i.astype(args[0].dtype) * 1e-6, *args[1:])
            return acc + jnp.max(out).astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))
    float(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(run(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

def unfused(q, k, v, wp):
    b, h, n, hd = q.shape
    o = flash_attention_heads(q, k, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, h * hd)
    return jnp.dot(o, wp, preferred_element_type=jnp.bfloat16)

rng = np.random.default_rng(0)
B, H, HD, D = 32, 24, 64, 1536
for N in (257, 530):
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, N, HD)), jnp.bfloat16) for _ in range(3))
    wp = jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.bfloat16)
    t0 = timeit(unfused, q, k, v, wp)
    t1 = timeit(functools.partial(attention_proj, skew=True), q, k, v, wp)
    t2 = timeit(functools.partial(attention_proj, skew=False), q, k, v, wp)
    print(f"N={N}: unfused {t0*1e3:6.3f} ms | fused-skew {t1*1e3:6.3f} ms | fused-noskew {t2*1e3:6.3f} ms", flush=True)
