"""Drill into one MiT-b3 stage-3 block: which sub-op eats the ~5 ms?

Stage 3: N=1200 tokens (30x40), C=320, sr=2, heads=5, mlp x4, batch 8.
Run: python scripts/bench_block.py
"""

import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("PAIF_PRECISION", "default")
os.environ.setdefault("PAIF_PALLAS_ATTN", "0")

import jax

if os.environ.get("PAIF_PLATFORM"):  # off-chip smoke: force a backend
    jax.config.update("jax_platforms", os.environ["PAIF_PLATFORM"])
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from paif_tpu.utils.jax_cache import configure_compile_cache


configure_compile_cache()


def timeit(name, fn, *args, iters=4, reps=10):
    def body(*a):
        a = list(a)
        acc = jnp.float32(0)
        for _ in range(reps):
            out = fn(*a)
            s = sum(
                jnp.sum(x.astype(jnp.float32))
                for x in jax.tree_util.tree_leaves(out)
                if hasattr(x, "astype")
            )
            acc = acc + s
            a[0] = jax.tree_util.tree_map(lambda t: t + (s * 0).astype(t.dtype), a[0])
        return acc

    red = jax.jit(body)
    float(red(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(red(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts) / reps * 1e3:9.3f} ms", flush=True)


def main():
    from paif_tpu.models.mit import Block, MixFFN, SRAttention

    B, h, w, C = 8, 30, 40, 320
    n = h * w
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    tok = jnp.asarray(rng.normal(0, 1, (B, n, C)), dt)
    print(f"devices: {jax.devices()}", flush=True)

    def cast(t):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dt) if x.dtype == jnp.float32 else x, t
        )

    blk = Block(C, 5, 4.0, 2, 0.0)
    bv = cast(blk.init(jax.random.PRNGKey(0), tok, (h, w)))
    timeit("full block (N=1200,C=320,sr=2)", lambda v, t: blk.apply(v, t, (h, w)), bv, tok)

    attn = SRAttention(C, 5, 2)
    av = cast(attn.init(jax.random.PRNGKey(0), tok, (h, w)))
    timeit("SRAttention", lambda v, t: attn.apply(v, t, (h, w)), av, tok)

    ffn = MixFFN(C, 4 * C)
    fv = cast(ffn.init(jax.random.PRNGKey(0), tok, (h, w)))
    timeit("MixFFN", lambda v, t: ffn.apply(v, t, (h, w)), fv, tok)

    ln = nn.LayerNorm(epsilon=1e-6)
    lv = cast(ln.init(jax.random.PRNGKey(0), tok))
    timeit("LayerNorm", lambda v, t: ln.apply(v, t), lv, tok)

    # raw pieces
    wq = jnp.asarray(rng.normal(0, 0.02, (C, C)), dt)
    timeit("dense q (9600x320x320)", lambda t, w_: t @ w_, tok.reshape(-1, C), wq)
    w1 = jnp.asarray(rng.normal(0, 0.02, (C, 4 * C)), dt)
    timeit("dense fc1 (9600x320x1280)", lambda t, w_: t @ w_, tok.reshape(-1, C), w1)
    hid = jnp.asarray(rng.normal(0, 1, (B, h, w, 4 * C)), dt)
    wdw = jnp.asarray(rng.normal(0, 0.1, (3, 3, 1, 4 * C)), dt)
    timeit("dwconv 3x3 C1280", lambda a, b: jax.lax.conv_general_dilated(
        a, b, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=4 * C), hid, wdw)
    q = jnp.asarray(rng.normal(0, 1, (B, 5, n, 64)), dt)
    k = jnp.asarray(rng.normal(0, 1, (B, 5, n // 4, 64)), dt)
    v = jnp.asarray(rng.normal(0, 1, (B, 5, n // 4, 64)), dt)

    def attn_core(q_, k_, v_):
        s = jnp.einsum("bhnd,bhmd->bhnm", q_, k_) * 0.125
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhnm,bhmd->bhnd", p, v_)

    timeit("attn core (einsum+softmax)", attn_core, q, k, v)

    # GELU alone
    timeit("gelu exact on (8,1200,1280)", lambda t: jax.nn.gelu(t, approximate=False), hid.reshape(B, n, 4 * C))

    # sr conv: 2x2 s2 320->320
    xs = jnp.asarray(rng.normal(0, 1, (B, h, w, C)), dt)
    wsr = jnp.asarray(rng.normal(0, 0.02, (2, 2, C, C)), dt)
    timeit("sr conv 2x2s2 320", lambda a, b: jax.lax.conv_general_dilated(
        a, b, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")), xs, wsr)


if __name__ == "__main__":
    main()
