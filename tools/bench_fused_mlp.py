"""TPU benchmark: fused int8 MLP kernel vs XLA MLP paths, 31-deep stack.
Flagship shape: [32,257,1536], SwiGLU hidden 4096."""
import sys, time, functools, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from anyloc_tpu.ops.pallas.fused_mlp import fused_mlp_int8
from anyloc_tpu.ops.quant import quantize_weight_cols, qdense

B, N, D, HID, DEPTH = 32, 257, 1536, 4096, 31
rng = np.random.default_rng(0)
w12 = jnp.asarray(rng.standard_normal((D, 2 * HID)) * 0.02, jnp.bfloat16)
b12 = jnp.asarray(rng.standard_normal((2 * HID,)) * 0.01, jnp.float32)
w3 = jnp.asarray(rng.standard_normal((HID, D)) * 0.02, jnp.bfloat16)
b3 = jnp.asarray(rng.standard_normal((D,)) * 0.01, jnp.float32)
w12q, s12 = quantize_weight_cols(w12)
w3q, s3 = quantize_weight_cols(w3)
x0 = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)

def mlp_bf16(x):
    h = jnp.einsum("bnd,dh->bnh", x, w12, preferred_element_type=jnp.bfloat16) + b12.astype(jnp.bfloat16)
    g = jax.nn.silu(h[..., :HID]) * h[..., HID:]
    return jnp.einsum("bnh,hd->bnd", g, w3, preferred_element_type=jnp.bfloat16) + b3.astype(jnp.bfloat16)

def mlp_int8_xla(x):
    h = qdense(x, w12q, s12, b12)
    g = jax.nn.silu(h[..., :HID]) * h[..., HID:]
    return qdense(g, w3q, s3, b3)

def mlp_fused(x, m_tile=2176, hc=512):
    return fused_mlp_int8(x, w12q, s12, b12, w3q, s3, b3,
                          mlp_type="swiglu_fused", hidden_chunk=hc, m_tile=m_tile)

def timeit(f, iters=5):
    @jax.jit
    def loop(x):
        def body(i, x):
            x = x + i.astype(x.dtype) * 1e-6
            for _ in range(DEPTH):
                x = 0.9 * x + 0.1 * f(x)   # keep magnitudes bounded
            return x
        out = jax.lax.fori_loop(0, iters, body, x)
        return jnp.max(out.astype(jnp.float32))
    float(loop(x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(x0))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

which = sys.argv[1] if len(sys.argv) > 1 else "all"
jobs = {
    "bf16": mlp_bf16,
    "int8_xla": mlp_int8_xla,
    "fused": mlp_fused,
    "fused_mt1088": functools.partial(mlp_fused, m_tile=1088),
    "fused_mt4352": functools.partial(mlp_fused, m_tile=4352),
    "fused_hc1024": functools.partial(mlp_fused, hc=1024),
    "fused_mt544": functools.partial(mlp_fused, m_tile=544),
    "fused_mt1088_hc256": functools.partial(mlp_fused, m_tile=1088, hc=256),
    "fused_mt1088_hc1024": functools.partial(mlp_fused, m_tile=1088, hc=1024),
}
for k, f in jobs.items():
    if which in ("all", k):
        try:
            t = timeit(f)
            print(f"{k:14s}: {t*1e3:7.2f} ms/stack  ({t/DEPTH*1e3:5.3f} ms/layer)", flush=True)
        except Exception as e:
            print(f"{k:14s}: FAIL {str(e)[:120]}", flush=True)
