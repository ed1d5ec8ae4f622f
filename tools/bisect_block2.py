"""Split the int8 regression: attn-half vs mlp-half of the real Block."""
import sys, time, dataclasses, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import flax.linen as nn
import jax, jax.numpy as jnp, numpy as np
from anyloc_tpu.models.dinov2 import dinov2_config
from anyloc_tpu.models.vit import Attention, LayerScale, Mlp, ViTConfig
from anyloc_tpu.ops.quant import quantize_tree

B, N, DEPTH = 32, 257, 31

class AttnHalf(nn.Module):
    cfg: ViTConfig
    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="norm1")(x)
        a = Attention(c, name="attn")(h)
        return x + LayerScale(c.embed_dim, 1e-5, name="ls1")(a)

class MlpHalf(nn.Module):
    cfg: ViTConfig
    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="norm2")(x)
        m = Mlp(c, name="mlp")(h)
        return x + LayerScale(c.embed_dim, 1e-5, name="ls2")(m)

def bench(mod_cls, cfg, tag):
    mod = mod_cls(cfg)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, cfg.embed_dim), jnp.bfloat16))
    if cfg.quant:
        params = quantize_tree(params)
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal((B, N, cfg.embed_dim)), jnp.bfloat16)
    @jax.jit
    def f(params, x):
        for _ in range(DEPTH):
            x = mod.apply(params, x)
        return jnp.max(x.astype(jnp.float32))
    float(f(params, x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(f(params, x0))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:24s}: {best*1e3:8.2f} ms", flush=True)

base = dinov2_config("dinov2_vitg14", dtype=jnp.bfloat16)
q = dataclasses.replace(base, quant="int8")
import sys as _s
which = _s.argv[1] if len(_s.argv) > 1 else "all"
jobs = {
    "mlp_bf16":  (MlpHalf, base), "mlp_int8":  (MlpHalf, q),
    "attn_bf16": (AttnHalf, base), "attn_int8": (AttnHalf, q),
}
for k, (m, c) in jobs.items():
    if which in ("all", k):
        bench(m, c, k)
