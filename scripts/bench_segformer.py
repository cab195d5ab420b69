"""Per-stage MiT-b3 timing at 480x640, batch 8, bf16: where do the 163 ms go?

Times each encoder stage (patch embed + its blocks at the stage's token
count/width), the decode head, and isolated block sub-ops.
Run: python scripts/bench_segformer.py
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


def timeit(name, fn, *args, gflops=None, iters=4, reps=8):
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
    ms = min(ts) / reps * 1e3
    extra = f"  {gflops / ms:7.2f} TF/s" if gflops else ""
    print(f"{name:42s} {ms:9.3f} ms{extra}", flush=True)


def main():
    from paif_tpu.models.mit import Block, OverlapPatchEmbed, MIT_CONFIGS
    from paif_tpu.models.segformer_head import SegFormerHead

    B, H, W = 8, 480, 640
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    dims, heads, depths, srs, mlps, _ = MIT_CONFIGS["mit_b3"]

    print(f"devices: {jax.devices()}", flush=True)

    x = jnp.asarray(rng.normal(0, 1, (B, H, W, 3)), dt)

    total_est = 0.0
    for s in range(4):
        stride = 4 * (2**s)
        h, w = H // stride, W // stride
        n = h * w
        c = dims[s]
        patch, pstride = (7, 4) if s == 0 else (3, 2)
        cin = 3 if s == 0 else dims[s - 1]

        # patch embed at stage input size
        pe = OverlapPatchEmbed(c, patch, pstride)
        xin = jnp.asarray(rng.normal(0, 1, (B, h * pstride, w * pstride, cin)), dt)
        pv = jax.tree_util.tree_map(
            lambda t: t.astype(dt) if t.dtype == jnp.float32 else t,
            pe.init(jax.random.PRNGKey(0), xin),
        )
        gf_pe = 2 * patch * patch * cin * c * B * n / 1e12
        timeit(f"stage{s+1} patch_embed ({cin}->{c})", lambda v, t: pe.apply(v, t), pv, xin, gflops=gf_pe)

        # one block at stage token geometry
        blk = Block(c, heads[s], mlps[s], srs[s], 0.0)
        tok = jnp.asarray(rng.normal(0, 1, (B, n, c)), dt)
        bv = jax.tree_util.tree_map(
            lambda t: t.astype(dt) if t.dtype == jnp.float32 else t,
            blk.init(jax.random.PRNGKey(0), tok, (h, w)),
        )
        m = n // (srs[s] ** 2)
        gf_blk = (
            2 * B * (n * c * c * (2 + 2)  # q,proj + kv(2c) at reduced m... approx below
                     + 2 * m * c * c
                     + n * m * c * 2
                     + n * c * 4 * c * 2)
        ) / 1e12
        timeit(
            f"stage{s+1} block x1 (N={n},C={c},sr={srs[s]})",
            lambda v, t: blk.apply(v, t, (h, w)),
            bv,
            tok,
            gflops=gf_blk,
        )
        total_est += gf_blk and 0

    # decode head on a random pyramid
    feats = [
        jnp.asarray(rng.normal(0, 1, (B, H // (4 * 2**s), W // (4 * 2**s), dims[s])), dt)
        for s in range(4)
    ]
    head = SegFormerHead(num_classes=9, embedding_dim=256)
    hv = jax.tree_util.tree_map(
        lambda t: t.astype(dt) if t.dtype == jnp.float32 else t,
        head.init(jax.random.PRNGKey(0), feats),
    )
    timeit("decode head", lambda v, f: head.apply(v, f), hv, feats)


if __name__ == "__main__":
    main()
