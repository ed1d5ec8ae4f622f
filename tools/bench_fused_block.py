"""TPU benchmark: whole-block int8 kernel vs the shipped two-kernel path.

Compares fused_block_int8 (one launch per block) against
fused_attn_half_int8 + fused_mlp_int8 (the quant='int8_full' trunk) at the
flagship ViT-G shapes. 31-layer stacks inside ONE jit (per-dispatch RPC
amortizes over the stack; docs/PERFORMANCE.md measurement hygiene).
"""
import sys, time, functools, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from anyloc_tpu.ops.pallas.attn_proj import fused_attn_half_int8
from anyloc_tpu.ops.pallas.fused_mlp import fused_mlp_int8
from anyloc_tpu.ops.pallas.fused_block import fused_block_int8

LAYERS, REPS = 31, 4

def timeit_stack(layer_fn, x):
    @jax.jit
    def run(x):
        def rep(i, acc):
            def body(l, h):
                return layer_fn(h + (i + l).astype(h.dtype) * 1e-8)
            out = jax.lax.fori_loop(0, LAYERS, body, x)
            return acc + jnp.max(out).astype(jnp.float32)
        return jax.lax.fori_loop(0, REPS, rep, jnp.zeros((), jnp.float32))
    float(run(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(run(x))
        best = min(best, (time.perf_counter() - t0) / (LAYERS * REPS))
    return best

rng = np.random.default_rng(0)
B, H, D, HID = 32, 24, 1536, 4096
def qw(shape):
    w = rng.standard_normal(shape).astype(np.float32) * 0.02
    s = np.abs(w).max(axis=0) / 127.0
    return jnp.asarray(np.round(w/s).clip(-127,127).astype(np.int8)), jnp.asarray(s)
wqkv_q, wqkv_s = qw((D, 3*D)); wp_q, wp_s = qw((D, D))
w12_q, w12_s = qw((D, 2*HID)); w3_q, w3_s = qw((HID, D))
ln = (jnp.ones((D,), jnp.float32), jnp.zeros((D,), jnp.float32))
gamma = jnp.full((D,), 0.02, jnp.float32)

def two_kernel(h):
    h = fused_attn_half_int8(
        h, wqkv_q, wqkv_s, None, wp_q, wp_s, None, num_heads=H,
        ln_params=ln, layerscale=gamma)
    return fused_mlp_int8(
        h, w12_q, w12_s, None, w3_q, w3_s, None, mlp_type="swiglu_fused",
        ln_params=ln, layerscale=gamma, residual=True)

def one_kernel(h):
    return fused_block_int8(
        h, (wqkv_q, wqkv_s, None, wp_q, wp_s, None),
        (w12_q, w12_s, None, w3_q, w3_s, None),
        num_heads=H, ln1=ln, ln2=ln, gamma1=gamma, gamma2=gamma)

for N in (int(a) for a in (sys.argv[1:] or ["257", "485"])):
    x = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    t2 = timeit_stack(two_kernel, x)
    t1 = timeit_stack(one_kernel, x)
    print(f"N={N}: two-kernel {t2*1e3:6.3f} ms/block | merged {t1*1e3:6.3f} "
          f"ms/block ({t2/t1:.3f}x)", flush=True)
