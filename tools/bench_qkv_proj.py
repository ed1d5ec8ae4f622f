"""TPU bench: flash_attention_qkv_proj (attention half from raw qkv) vs the
current split/transpose + flash_heads + transpose + proj + ls1 + residual."""
import sys, time, functools, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from anyloc_tpu.ops.pallas.attn_proj import flash_attention_qkv_proj
from anyloc_tpu.ops.pallas.flash_attention import flash_attention_heads

B, N, H, HD = 32, 257, 24, 64
D = H * HD
DEPTH = 31
rng = np.random.default_rng(0)
qkv0 = jnp.asarray(rng.standard_normal((B, N, 3 * D)), jnp.bfloat16)
wp = jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.bfloat16)
bp = jnp.asarray(rng.standard_normal((D,)) * 0.01, jnp.float32)
gamma = jnp.asarray(np.full(D, 0.9), jnp.float32)
x0 = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)

def old_path(qkv, x):
    q, k, v = jnp.split(qkv, 3, axis=-1)
    heads = lambda t: t.reshape(B, N, H, HD).transpose(0, 2, 1, 3)
    o = flash_attention_heads(heads(q), heads(k), heads(v))
    o = o.transpose(0, 2, 1, 3).reshape(B, N, D)
    o = jnp.dot(o, wp, preferred_element_type=jnp.bfloat16) + bp.astype(jnp.bfloat16)
    return x + (o.astype(jnp.float32) * gamma).astype(jnp.bfloat16)

def new_path(qkv, x, **kw):
    return flash_attention_qkv_proj(
        qkv, wp, bp, num_heads=H, layerscale=gamma, residual=x, **kw)

def timeit(f, iters=5):
    @jax.jit
    def loop(qkv, x):
        def body(i, x):
            # chain: x feeds back; qkv perturbed from x so nothing hoists
            qk = qkv + x[..., :1] * 1e-6
            return 0.9 * x + 0.1 * f(qk, x)
        out = jax.lax.fori_loop(0, iters * DEPTH, body, x)
        return jnp.max(out.astype(jnp.float32))
    float(loop(qkv0, x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(qkv0, x0))
        best = min(best, (time.perf_counter() - t0) / (iters * DEPTH))
    return best

which = sys.argv[1] if len(sys.argv) > 1 else "all"
jobs = {
    "old": old_path,
    "new": new_path,
    "new_hc4": functools.partial(new_path, head_chunk=4),
    "new_hc12": functools.partial(new_path, head_chunk=12),
    "new_noskew": functools.partial(new_path, skew=False),
}
for k, f in jobs.items():
    if which in ("all", k):
        try:
            t = timeit(f)
            print(f"{k:12s}: {t*1e3:6.3f} ms/layer", flush=True)
        except Exception as e:
            print(f"{k:12s}: FAIL {str(e)[:110]}", flush=True)
