"""Microbenchmark: int8 Pallas matmul vs bf16 XLA matmul at flagship shapes.

Question to answer (docs/PERFORMANCE.md "int8 datapoint"): plain XLA
`dot_general(int8, int8)` is slower than bf16 — does an explicit Pallas
kernel reach the v5e's native int8 MXU path (394 TOPS, 2x bf16)?

Shapes are the DINOv2-G per-block matmuls at the flagship pipeline shape
(batch 32 x 257 tokens -> M=8224 rows).

Run on the real TPU:  python tools/bench_int8_matmul.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


# ---------------------------------------------------------------- kernels
def _mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, n_kblocks):
    """Tiled matmul cell: grid (M/bm, N/bn, K/bk), K innermost."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32 if a_ref.dtype == jnp.int8 else jnp.float32,
    )

    @pl.when(kb == n_kblocks - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def pallas_matmul(a, b, *, bm=512, bn=1024, bk=None, out_dtype=None):
    m, k = a.shape
    k2, n = b.shape
    assert k == k2
    bk = k if bk is None else bk
    bm, bn, bk = min(bm, m), min(bn, n), min(bk, k)
    acc_dtype = jnp.int32 if a.dtype == jnp.int8 else jnp.float32
    out_dtype = out_dtype or acc_dtype
    grid = (m // bm, n // bn, k // bk)
    kern = functools.partial(_mm_kernel, n_kblocks=grid[2])
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
    )(a, b)


def _mm_dequant_kernel(a_ref, b_ref, sa_ref, sb_ref, o_ref, acc_ref, *, n_kblocks):
    """int8 matmul + fused dequant epilogue: o = (a@b) * sa[:,None] * sb[None,:]."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(kb == n_kblocks - 1)
    def _():
        o_ref[:] = (
            acc_ref[:].astype(jnp.float32) * sa_ref[:] * sb_ref[:]
        ).astype(o_ref.dtype)


def pallas_matmul_dequant(a, b, sa, sb, *, bm=512, bn=1024, bk=None,
                          out_dtype=jnp.bfloat16):
    m, k = a.shape
    _, n = b.shape
    bk = k if bk is None else bk
    bm, bn, bk = min(bm, m), min(bn, n), min(bk, k)
    grid = (m // bm, n // bn, k // bk)
    kern = functools.partial(_mm_dequant_kernel, n_kblocks=grid[2])
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
    )(a, b, sa, sb)


# ---------------------------------------------------------------- timing
def timeit(fn, a, *rest, iters=20):
    """Time `fn(a, *rest)` with the loop INSIDE one jit — per-dispatch RPC
    overhead through the axon tunnel otherwise dominates ms-scale kernels.
    `a` is perturbed per-iteration (cheap VPU pass) so XLA cannot hoist the
    loop-invariant matmul out of the fori_loop."""

    def perturb(x, i):
        if x.dtype == jnp.int8:
            return jax.lax.bitwise_xor(x, i.astype(jnp.int8))
        return x + i.astype(x.dtype)

    @jax.jit
    def run(a, *rest):
        def body(i, acc):
            out = fn(perturb(a, i), *rest)
            # max (NOT out[0,0] / sum): a slice lets XLA rewrite the dot to a
            # row*column product, a sum can be algebraically pushed into the
            # operands — max forces the full matmul to execute.
            return acc + jnp.max(out).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    float(run(a, *rest))     # compile + fetch
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(a, *rest))  # fetch = the only reliable fence over the tunnel
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    rng = np.random.default_rng(0)
    shapes = [
        ("w12 ", 8224, 1536, 8192),
        ("qkv ", 8224, 1536, 4608),
        ("w3  ", 8224, 4096, 1536),
        ("proj", 8224, 1536, 1536),
    ]
    print(f"device: {jax.devices()[0].device_kind}")
    for name, m, k, n in shapes:
        mp = _round_up(m, 512)
        a8 = jnp.asarray(rng.integers(-127, 128, (mp, k)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        abf = jnp.asarray(rng.standard_normal((mp, k)), jnp.bfloat16)
        bbf = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        sa = jnp.ones((mp, 1), jnp.float32)
        sb = jnp.ones((1, n), jnp.float32)
        flops = 2 * mp * k * n

        t_bf = timeit((lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)), abf, bbf)
        t_bf_pl = timeit(functools.partial(pallas_matmul, bk=512), abf, bbf)
        t_i8 = timeit(functools.partial(pallas_matmul, bk=512), a8, b8)
        t_i8_dq = timeit(functools.partial(pallas_matmul_dequant, bk=512), a8, b8, sa, sb)
        t_i8_xla = timeit(
            jax.jit(lambda x, y: jax.lax.dot_general(
                x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)),
            a8, b8,
        )

        def tf(t):
            return f"{t*1e3:7.3f} ms {flops/t/1e12:6.1f} TF/s"

        print(f"{name} [{mp}x{k}]x[{k}x{n}]")
        print(f"   bf16 XLA    : {tf(t_bf)}")
        print(f"   bf16 Pallas : {tf(t_bf_pl)}")
        print(f"   int8 Pallas : {tf(t_i8)}")
        print(f"   int8 Pallas+dequant: {tf(t_i8_dq)}")
        print(f"   int8 XLA    : {tf(t_i8_xla)}")


if __name__ == "__main__":
    main()
