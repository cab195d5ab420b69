"""Ground-truth MiT-b3 per-stage cost at 480x640: time encoder PREFIXES
(stage 1, stages 1-2, 1-3, full, full+head) each as ONE jitted call with
N reps chained inside, and difference them. Avoids the per-block dispatch
noise that made scripts/bench_segformer.py's per-op numbers add up to 2x
the real encoder time.

Run: python scripts/bench_mit_stages.py [--batch 16] [--reps 4]
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


class MitPrefix(nn.Module):
    """First `n_stages` stages of MiT-b3 (plus the head when with_head)."""

    n_stages: int = 4
    with_head: bool = False

    @nn.compact
    def __call__(self, x):
        from paif_tpu.models.mit import MIT_CONFIGS, Block, OverlapPatchEmbed
        from paif_tpu.models.segformer_head import SegFormerHead

        dims, heads, depths, srs, mlps, _ = MIT_CONFIGS["mit_b3"]
        outs = []
        for s in range(self.n_stages):
            patch, stride = (7, 4) if s == 0 else (3, 2)
            tokens, (h, w) = OverlapPatchEmbed(
                dims[s], patch, stride, name=f"patch_embed{s + 1}"
            )(x)
            for i in range(depths[s]):
                tokens = Block(
                    dims[s], heads[s], mlps[s], srs[s], 0.0, name=f"block{s + 1}_{i}"
                )(tokens, (h, w), True)
            tokens = nn.LayerNorm(epsilon=1e-6, name=f"norm{s + 1}")(tokens)
            x = tokens.reshape(tokens.shape[0], h, w, dims[s])
            outs.append(x)
        if self.with_head:
            return SegFormerHead(num_classes=9, name="head")(outs, False)
        return outs


def timeit(name, model, x, reps):
    v = model.init(jax.random.PRNGKey(0), x[:1])
    v = jax.tree_util.tree_map(
        lambda t: t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t, v
    )

    @jax.jit
    def body(v, x):
        acc = jnp.float32(0)
        xi = x
        for _ in range(reps):
            out = model.apply(v, xi)
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree_util.tree_leaves(out))
            acc = acc + s
            xi = x + (s * 0).astype(x.dtype)
        return acc

    float(body(v, x))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(body(v, x))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) / reps * 1e3
    print(f"{name:28s} {ms:9.2f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()
    B, H, W = args.batch, 480, 640
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, 3)), jnp.bfloat16)
    print(f"devices: {jax.devices()}  batch={B}", flush=True)

    prev = 0.0
    for n in (1, 2, 3, 4):
        ms = timeit(f"stages 1..{n}", MitPrefix(n_stages=n), x, args.reps)
        print(f"{'  -> stage ' + str(n) + ' alone':28s} {ms - prev:9.2f} ms", flush=True)
        prev = ms
    full = timeit("stages 1..4 + head", MitPrefix(4, with_head=True), x, args.reps)
    print(f"{'  -> head alone':28s} {full - prev:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
