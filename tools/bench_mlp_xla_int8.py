"""Candidate: XLA-native int8 MLP half vs the fused Pallas int8 MLP kernel.

XLA's int8 dot_general emitter reaches 276 TF/s at the w12 shape where the
Pallas tiled kernel plateaus at ~209 (tools/bench_int8_matmul.py tile
sweep). Question: does an all-XLA int8 MLP half (LN -> per-token quant ->
int8 w12 -> dequant+SwiGLU+requant -> int8 w3 -> LS+residual) keep that
advantage once the quantize chains are in the graph, or do the fusion
boundaries eat it (the round-1 finding that killed XLA-level QDense)?

Run: python tools/bench_mlp_xla_int8.py [N_tokens ...]
"""
import sys, time, functools, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
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

D, HID = 1536, 4096

def xla_mlp_int8(x, w12_q, w12_s, w3_q, w3_s, lns, lnb, gamma):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-6) * lns + lnb
    s = jnp.maximum(jnp.max(jnp.abs(xn), axis=-1, keepdims=True), 1e-6) / 127.0
    xq = jnp.clip(jnp.round(xn / s), -127, 127).astype(jnp.int8)
    h = jax.lax.dot_general(xq, w12_q, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    hf = h.astype(jnp.float32) * s * w12_s
    a = jax.nn.silu(hf[..., :HID]) * hf[..., HID:]
    s2 = jnp.maximum(jnp.max(jnp.abs(a), axis=-1, keepdims=True), 1e-6) / 127.0
    aq = jnp.clip(jnp.round(a / s2), -127, 127).astype(jnp.int8)
    o = jax.lax.dot_general(aq, w3_q, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    of = o.astype(jnp.float32) * s2 * w3_s
    return (x.astype(jnp.float32) + gamma * of).astype(x.dtype)

def main():
    rng = np.random.default_rng(0)
    B = 32
    def qw(shape):
        w = rng.standard_normal(shape).astype(np.float32) * 0.02
        s = np.abs(w).max(axis=0) / 127.0
        return (jnp.asarray(np.round(w / s).clip(-127, 127).astype(np.int8)),
                jnp.asarray(s))
    w12_q, w12_s = qw((D, 2 * HID))
    w3_q, w3_s = qw((HID, D))
    lns = jnp.ones((D,), jnp.float32); lnb = jnp.zeros((D,), jnp.float32)
    gamma = jnp.full((D,), 0.5, jnp.float32)
    Ns = [int(a) for a in sys.argv[1:]] or [257, 485]
    for N in Ns:
        x = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
        flops = 2 * B * N * (D * 2 * HID + HID * D)
        t_xla = timeit(xla_mlp_int8, x, w12_q, w12_s, w3_q, w3_s, lns, lnb, gamma)
        pl_fn = functools.partial(
            fused_mlp_int8, w12_q=w12_q, w12_scale=w12_s, b12=None,
            w3_q=w3_q, w3_scale=w3_s, b3=None, mlp_type="swiglu_fused",
            ln_params=(lns, lnb), layerscale=gamma, residual=True)
        t_pl = timeit(pl_fn, x)
        print(f"N={N}: XLA int8 {t_xla*1e3:6.3f} ms ({flops/t_xla/1e12:5.1f} TF/s)"
              f" | Pallas fused {t_pl*1e3:6.3f} ms ({flops/t_pl/1e12:5.1f} TF/s)",
              flush=True)

if __name__ == "__main__":
    main()
