"""Per-kernel roofline regression harness (round-3 verdict item 1).

Measures the three flagship compute units at their REAL shapes on the chip
and pins each against its recorded ceiling — the proof that the trunk sits
at its measured optimum (docs/PERFORMANCE.md "308 px roofline"), run in
the TPU lane every round so a Mosaic/XLA regression (or a future win)
surfaces as a number, not an anecdote.

  unit                      shape                       recorded ceiling
  fused int8 MLP half       B32 x N485 x 1536/4096      262 TF/s (67% peak)
  fused int8 attn half      B32 x N485 x 1536, 24 heads 180 TF/s (46% peak)
  in-trunk ViT-G block      both + pipeline overlap     239 TF/s (61% peak)
  demo-path block (--demo)  B1 x N5330 (long-N route)   see DEMO_CEILINGS_TFS

Run:  python tools/roofline.py [--json out.json] [--n 485] [--demo]
Exit code 1 if any unit lands below (1 - tolerance) x ceiling.
"""
import argparse
import dataclasses
import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

B, H, HD, D, HID, DEPTH = 32, 24, 64, 1536, 4096, 31
INT8_PEAK_TFS = 394.0  # v5e int8 MXU peak

# Recorded ceilings (docs/PERFORMANCE.md round-2 campaign, N=485, iters=100
# in-jit loops). A future chip/toolchain bump should RAISE these.
CEILINGS_TFS = {"mlp_half": 262.0, "attn_half": 180.0, "block": 239.0}
DEFAULT_TOL = 0.08  # run-to-run scatter on this tunnel is ~2-4%

# Demo-path operating point (round-4 verdict item 6): the max-1024 demo
# route = 1022 px -> 73x73 grid = 5330 tokens at batch 1, where int8_full
# falls back to QDense qkv/proj + the k-blocked long-N flash attention
# (models/vit.py MAX_FUSED_TOKENS gate). Ceiling recorded on v5e, best of
# two runs at iters=20/40 in-jit (104.2 / 104.7 TF/s — run-to-run scatter
# <1%); docs/PERFORMANCE.md "Padding-aware long-N attention".
DEMO_N, DEMO_B = 5330, 1
DEMO_CEILINGS_TFS = {"demo_block": 104.7}


def flops_per_token(n):
    """f(attn)=qkv+proj+QK+PV, f(mlp)=w12+w3 — MACs x2, per token."""
    attn = 2 * (D * 3 * D + D * D + 2 * n * HD * H)
    mlp = 2 * (D * 2 * HID + HID * D)
    return {"attn_half": attn, "mlp_half": mlp, "block": attn + mlp}


def timeit(fn, *args, iters=100):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*args):
        def body(i, acc):
            out = fn(args[0] + i.astype(args[0].dtype) * 1e-6, *args[1:])
            return acc + jnp.max(out).astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    float(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _int8_block():
    """The production int8_full Block module + quantized single-block params
    (routing — fused kernels vs QDense + long-N attention — is the module's
    own, so a chain of these IS the trunk at any N)."""
    import jax.numpy as jnp

    from anyloc_tpu.models.dinov2 import dinov2_config
    from anyloc_tpu.models.extractor import init_params
    from anyloc_tpu.models.vit import Block
    from anyloc_tpu.ops.quant import quantize_vit_params

    cfg = dataclasses.replace(
        dinov2_config("dinov2_vitg14", dtype=jnp.bfloat16), quant="int8_full")
    block = Block(cfg)
    bp = quantize_vit_params(
        {"params": {"blocks_0": init_params(
            dataclasses.replace(cfg, quant=None, depth=1), seed=0
        )["params"]["blocks_0"]}}, "int8_full")
    return block, {"params": bp["params"]["blocks_0"]}


def measure_demo(n=DEMO_N, b=DEMO_B, iters=20):
    """Per-block time/TF/s on the demo-path shape (long-N fallback route),
    pinned by tests/test_tpu_lane.py next to the flagship roofline."""
    import jax.numpy as jnp

    block, bparams = _int8_block()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n, D)) * 0.5, jnp.bfloat16)

    def chain(xx):
        for _ in range(DEPTH):
            xx = block.apply(bparams, xx)
        return xx

    t = timeit(chain, x, iters=iters) / DEPTH
    tfs = flops_per_token(n)["block"] * b * n / t / 1e12
    return {"demo_block": {
        "ms": t * 1e3, "tfs": tfs, "pct_peak": tfs / INT8_PEAK_TFS,
        "ceiling_tfs": DEMO_CEILINGS_TFS["demo_block"],
        "vs_ceiling": tfs / DEMO_CEILINGS_TFS["demo_block"],
    }}


def measure(n=485, iters=100):
    import jax.numpy as jnp

    from anyloc_tpu.ops.pallas.attn_proj import fused_attn_half_int8
    from anyloc_tpu.ops.pallas.fused_mlp import fused_mlp_int8

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, n, D)) * 0.5, jnp.bfloat16)
    ln = (jnp.ones((D,), jnp.float32), jnp.zeros((D,), jnp.float32))
    gamma = jnp.asarray(rng.random(D) * 1e-3, jnp.float32)

    wqkv_q = jnp.asarray(rng.integers(-127, 128, (D, 3 * D)), jnp.int8)
    wqkv_s = jnp.asarray(rng.random(3 * D) * 0.01 + 1e-3, jnp.float32)
    wp_q = jnp.asarray(rng.integers(-127, 128, (D, D)), jnp.int8)
    wp_s = jnp.asarray(rng.random(D) * 0.01 + 1e-3, jnp.float32)
    t_attn = timeit(
        lambda xx: fused_attn_half_int8(
            xx, wqkv_q, wqkv_s, None, wp_q, wp_s, None,
            num_heads=H, ln_params=ln, layerscale=gamma),
        x, iters=iters)

    w12_q = jnp.asarray(rng.integers(-127, 128, (D, 2 * HID)), jnp.int8)
    w12_s = jnp.asarray(rng.random(2 * HID) * 0.01 + 1e-3, jnp.float32)
    w3_q = jnp.asarray(rng.integers(-127, 128, (HID, D)), jnp.int8)
    w3_s = jnp.asarray(rng.random(D) * 0.01 + 1e-3, jnp.float32)
    t_mlp = timeit(
        lambda xx: fused_mlp_int8(
            xx, w12_q, w12_s, None, w3_q, w3_s, None,
            ln_params=ln, layerscale=gamma, residual=True),
        x, iters=iters)

    # in-trunk block: the production Block module in int8_full mode
    block, bparams = _int8_block()

    def chain(xx):
        # 31-block chain, matching the in-trunk measurement context: the
        # recorded 239 TF/s includes adjacent-layer overlap (MLP half of
        # layer i pipelines against attention half of i+1), which a
        # single-block loop body does not expose.
        for _ in range(DEPTH):
            xx = block.apply(bparams, xx)
        return xx

    t_block = timeit(chain, x, iters=max(3, iters // 20)) / DEPTH

    fpt = flops_per_token(n)
    rows = {}
    for name, t in (("mlp_half", t_mlp), ("attn_half", t_attn),
                    ("block", t_block)):
        tfs = fpt[name] * B * n / t / 1e12
        rows[name] = {
            "ms": t * 1e3, "tfs": tfs, "pct_peak": tfs / INT8_PEAK_TFS,
            "ceiling_tfs": CEILINGS_TFS[name],
            "vs_ceiling": tfs / CEILINGS_TFS[name],
        }
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=485)
    p.add_argument("--iters", type=int, default=None,
                   help="timing iterations (default: 100, or 20 with --demo)")
    p.add_argument("--tol", type=float, default=DEFAULT_TOL)
    p.add_argument("--json", default=None)
    p.add_argument("--demo", action="store_true",
                   help="measure the demo-path block (B1 x N5330) instead")
    args = p.parse_args()

    iters = args.iters if args.iters is not None else (20 if args.demo else 100)
    rows = measure_demo(iters=iters) if args.demo else measure(args.n, iters)
    ok = True
    print(f"{'unit':>10} {'ms/layer':>9} {'TF/s':>7} {'% peak':>7} "
          f"{'vs ceiling':>11}")
    for name, r in rows.items():
        flag = "" if r["vs_ceiling"] >= 1 - args.tol else "  << REGRESSION"
        ok &= not flag
        print(f"{name:>10} {r['ms']:>9.3f} {r['tfs']:>7.1f} "
              f"{r['pct_peak']:>6.1%} {r['vs_ceiling']:>10.1%}{flag}")
    if args.json:
        pathlib.Path(args.json).write_text(json.dumps(rows, indent=2))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
