"""Experiment: fully-fused bf16 attention half (LN + qkv + attn + proj +
residual in one kernel) vs the shipped split (XLA LN+qkv, fused attn+proj
kernel). Corrected methodology: fori_loop inside one jit, perturbed input,
consume with jnp.max (docs/PERFORMANCE.md)."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from anyloc_tpu.ops.pallas.attn_proj import (
    flash_attention_qkv_proj, fused_attn_half_bf16,
)

B, N, D, H = 32, 257, 1536, 24
ITERS = 100


def timed(fn, args):
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.max(out))  # warm + compile
    t0 = time.perf_counter()
    out = f(*args)
    s = float(jnp.max(out))
    dt = time.perf_counter() - t0
    return dt / ITERS * 1000, s


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, D)) * 0.1, jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.bfloat16)
    bqkv = jnp.asarray(rng.standard_normal((3 * D,)) * 0.01, jnp.float32)
    wp = jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.bfloat16)
    bp = jnp.asarray(rng.standard_normal((D,)) * 0.01, jnp.float32)
    ln_s = jnp.ones((D,), jnp.float32)
    ln_b = jnp.zeros((D,), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal((D,)) * 0.1, jnp.float32)

    def split_path(x):
        def body(i, x):
            xf = x.astype(jnp.float32)
            mu = xf.mean(-1, keepdims=True)
            var = ((xf - mu) ** 2).mean(-1, keepdims=True)
            h = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * ln_s + ln_b).astype(
                jnp.bfloat16
            )
            qkv = h @ wqkv + bqkv.astype(jnp.bfloat16)
            return flash_attention_qkv_proj(
                qkv, wp, bp, num_heads=H, layerscale=gamma, residual=x
            ) + (i * 0).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, ITERS, body, x)

    def fused_path(x):
        def body(i, x):
            return fused_attn_half_bf16(
                x, wqkv, bqkv, wp, bp, num_heads=H,
                ln_params=(ln_s, ln_b), layerscale=gamma,
            ) + (i * 0).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, ITERS, body, x)

    ms_split, s1 = timed(split_path, (x,))
    ms_fused, s2 = timed(fused_path, (x,))
    print(f"split (XLA ln+qkv -> attn_proj kernel): {ms_split:.3f} ms/layer")
    print(f"fused bf16 attn half kernel           : {ms_fused:.3f} ms/layer")
    print(f"outputs: {s1:.4f} vs {s2:.4f}")


if __name__ == "__main__":
    main()
