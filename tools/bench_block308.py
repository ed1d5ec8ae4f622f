"""TPU benchmark: int8_full block halves at the reference resolution.

308px -> 22x22 grid + CLS = 485 tokens, the reference SOTA eval shape
(scripts/dino_v2_global_vocab_vlad.py:142,355-357). Measures the fused int8
attention half and the fused int8 MLP half per ViT-G layer, at N=485 and
N=257 (224px), isolating the QK^T score-dtype change. Loops run inside one
jit with iters>=100 (the ~20 ms per-dispatch RPC cost through the tunnel
inflates shorter loops by ~1 ms/iter — docs/PERFORMANCE.md)."""
import sys, time, functools, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from anyloc_tpu.ops.pallas.attn_proj import fused_attn_half_int8
from anyloc_tpu.ops.pallas.fused_mlp import fused_mlp_int8

def timeit(fn, *args, iters=100):
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

rng = np.random.default_rng(0)
B, H, HD, D, HID = 32, 24, 64, 1536, 4096

def qw(shape):
    w = rng.standard_normal(shape).astype(np.float32) * 0.02
    s = np.abs(w).max(axis=0) / 127.0
    return jnp.asarray(np.round(w / s).clip(-127, 127).astype(np.int8)), jnp.asarray(s)

wqkv_q, wqkv_s = qw((D, 3 * D))
wp_q, wp_s = qw((D, D))
w12_q, w12_s = qw((D, 2 * HID))
w3_q, w3_s = qw((HID, D))
b_qkv = jnp.asarray(rng.standard_normal(3 * D), jnp.float32) * 0.01
b_p = jnp.asarray(rng.standard_normal(D), jnp.float32) * 0.01
ln = (jnp.ones((D,), jnp.float32), jnp.zeros((D,), jnp.float32))
gamma = jnp.full((D,), 0.5, jnp.float32)

for N in (257, 485):
    x = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    attn = functools.partial(
        fused_attn_half_int8, wqkv_q=wqkv_q, wqkv_scale=wqkv_s, b_qkv=b_qkv,
        wp_q=wp_q, wp_scale=wp_s, b_proj=b_p, num_heads=H,
        ln_params=ln, layerscale=gamma,
    )
    mlp = functools.partial(
        fused_mlp_int8, w12_q=w12_q, w12_scale=w12_s, b12=None,
        w3_q=w3_q, w3_scale=w3_s, b3=None, mlp_type="swiglu_fused",
        ln_params=ln, layerscale=gamma, residual=True,
    )
    ta = timeit(attn, x)
    tm = timeit(mlp, x)
    print(f"N={N}: attn-half {ta*1e3:6.3f} ms | mlp-half {tm*1e3:6.3f} ms | "
          f"block {(ta+tm)*1e3:6.3f} ms -> {B/( (ta+tm)*31 ):6.1f} img/s-trunk",
          flush=True)
