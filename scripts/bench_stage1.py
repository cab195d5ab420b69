"""MiT-b3 stage-1 anatomy at 480x640 B16: why 22 ms for ~8 ms of work?

Times the patch embed (k7s4, C=3 in), one block's attention path, one
block's Mix-FFN path, the LNs, and softmax/dwconv sub-ops, each amortized
(N reps inside one jit). Run: python scripts/bench_stage1.py [--batch 16]
"""

import argparse
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


def timeit(name, fn, *args, iters=4, reps=40):
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
            a[-1] = jax.tree_util.tree_map(lambda t: t + (s * 0).astype(t.dtype), a[-1])
        return acc

    red = jax.jit(body)
    try:
        float(red(*args))
    except Exception as e:
        print(f"{name:40s} FAILED {type(e).__name__}: {str(e).splitlines()[0][:100]}")
        return None
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(red(*args))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3 / reps
    print(f"{name:40s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    B = args.batch

    from paif_tpu.models.mit import Block, MixFFN, OverlapPatchEmbed, SRAttention, _gelu

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x_img = jnp.asarray(rng.normal(0, 1, (B, 480, 640, 3)), dt)
    H, W, C = 120, 160, 64
    N = H * W
    tok = jnp.asarray(rng.normal(0, 1, (B, N, C)), dt)

    print(f"devices: {jax.devices()}  B={B}", flush=True)

    bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda v: v.astype(dt) if v.dtype == jnp.float32 else v, t
    )

    # patch embed (k7s4 conv 3->64 + LN)
    pe = OverlapPatchEmbed(64, 7, 4)
    v = bf16(pe.init(jax.random.PRNGKey(0), x_img[:1]))
    timeit("patch_embed k7s4 3->64", lambda vv, xx: pe.apply(vv, xx), v, x_img)

    # raw conv alone (is the C=3 input the problem?)
    conv = nn.Conv(64, (7, 7), strides=(4, 4), padding=[(3, 3), (3, 3)])
    v = bf16(conv.init(jax.random.PRNGKey(0), x_img[:1]))
    timeit("conv k7s4 3->64 (no LN)", lambda vv, xx: conv.apply(vv, xx), v, x_img)

    # one full block
    blk = Block(64, 1, 4.0, 8, 0.0)
    v = bf16(blk.init(jax.random.PRNGKey(0), tok[:1], (H, W)))
    timeit("block (attn+ffn)", lambda vv, xx: blk.apply(vv, xx, (H, W)), v, tok)

    # attention alone
    attn = SRAttention(64, 1, 8, name=None)
    v = bf16(attn.init(jax.random.PRNGKey(0), tok[:1], (H, W)))
    timeit("SRAttention sr8", lambda vv, xx: attn.apply(vv, xx, (H, W)), v, tok)

    # ffn alone
    ffn = MixFFN(64, 256)
    v = bf16(ffn.init(jax.random.PRNGKey(0), tok[:1], (H, W)))
    timeit("MixFFN 64->256", lambda vv, xx: ffn.apply(vv, xx, (H, W)), v, tok)

    # LN alone
    ln = nn.LayerNorm(epsilon=1e-6)
    v = bf16(ln.init(jax.random.PRNGKey(0), tok[:1]))
    timeit("LayerNorm (B,19200,64)", lambda vv, xx: ln.apply(vv, xx), v, tok)

    # softmax at the attention score shape
    scores = jnp.asarray(rng.normal(0, 1, (B, 1, N, 300)), dt)
    timeit("softmax (B,1,19200,300) bf16", lambda _v, s: nn.softmax(s, axis=-1), None, scores)
    timeit(
        "softmax f32 upcast",
        lambda _v, s: nn.softmax(s.astype(jnp.float32), axis=-1).astype(dt),
        None,
        scores,
    )

    # dwconv alone at hidden 256
    hid = jnp.asarray(rng.normal(0, 1, (B, H, W, 256)), dt)
    dw = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=256)
    v = bf16(dw.init(jax.random.PRNGKey(0), hid[:1]))
    timeit("dwconv 3x3 C=256", lambda vv, xx: dw.apply(vv, xx), v, hid)

    # gelu alone
    big = jnp.asarray(rng.normal(0, 1, (B, N, 256)), dt)
    timeit("exact GELU f32-upcast (B,N,256)", lambda _v, x: _gelu(x), None, big)

    # qkv-style dense 64->64
    dense = nn.Dense(64)
    v = bf16(dense.init(jax.random.PRNGKey(0), tok[:1]))
    timeit("Dense 64->64 (B,19200,.)", lambda vv, xx: dense.apply(vv, xx), v, tok)


if __name__ == "__main__":
    main()
