"""Why does MixFFN cost 5x the sum of its parts? Compose raw pieces vs the
flax module; also calibrate the dispatch floor with an identity.
Run: python scripts/bench_ffn.py
"""

import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("PAIF_PRECISION", "default")

import jax

if os.environ.get("PAIF_PLATFORM"):  # off-chip smoke: force a backend
    jax.config.update("jax_platforms", os.environ["PAIF_PLATFORM"])
import jax.numpy as jnp
import numpy as np

from paif_tpu.utils.jax_cache import configure_compile_cache


configure_compile_cache()


def timeit(name, fn, *args, iters=4, reps=20):
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
    print(f"{name:46s} {min(ts) / reps * 1e3:9.3f} ms/rep", flush=True)


def main():
    from paif_tpu.models.mit import MixFFN

    B, h, w, C = 8, 30, 40, 320
    n = h * w
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    tok = jnp.asarray(rng.normal(0, 1, (B, n, C)), dt)
    print(f"devices: {jax.devices()}", flush=True)

    timeit("identity (dispatch floor)", lambda t: t, tok)

    ffn = MixFFN(C, 4 * C)
    fv = jax.tree_util.tree_map(
        lambda t: t.astype(dt) if t.dtype == jnp.float32 else t,
        ffn.init(jax.random.PRNGKey(0), tok, (h, w)),
    )
    timeit("MixFFN module", lambda v, t: ffn.apply(v, t, (h, w)), fv, tok)

    p = fv["params"]
    w1, b1 = p["fc1"]["kernel"], p["fc1"]["bias"]
    w2, b2 = p["fc2"]["kernel"], p["fc2"]["bias"]
    wd, bd = p["dwconv"]["kernel"], p["dwconv"]["bias"]

    def raw(t):
        x = t @ w1 + b1
        xs = x.reshape(B, h, w, 4 * C)
        xs = jax.lax.conv_general_dilated(
            xs, wd, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=4 * C,
        ) + bd
        x = xs.reshape(B, n, 4 * C)
        x = jax.nn.gelu(x, approximate=False)
        return x @ w2 + b2

    timeit("raw compose (same math)", raw, tok)

    def raw_nogelu(t):
        x = t @ w1 + b1
        xs = x.reshape(B, h, w, 4 * C)
        xs = jax.lax.conv_general_dilated(
            xs, wd, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=4 * C,
        ) + bd
        x = xs.reshape(B, n, 4 * C)
        return x @ w2 + b2

    timeit("raw compose, no gelu", raw_nogelu, tok)

    def raw_nodw(t):
        x = t @ w1 + b1
        x = jax.nn.gelu(x, approximate=False)
        return x @ w2 + b2

    timeit("raw compose, no dwconv", raw_nodw, tok)

    def raw_tanh_gelu(t):
        x = t @ w1 + b1
        xs = x.reshape(B, h, w, 4 * C)
        xs = jax.lax.conv_general_dilated(
            xs, wd, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=4 * C,
        ) + bd
        x = xs.reshape(B, n, 4 * C)
        x = jax.nn.gelu(x, approximate=True)
        return x @ w2 + b2

    timeit("raw compose, tanh gelu", raw_tanh_gelu, tok)

    # erf in bf16 vs f32
    big = jnp.asarray(rng.normal(0, 1, (B, n, 4 * C)), dt)
    timeit("erf gelu bf16 (8,1200,1280)", lambda t: jax.nn.gelu(t, approximate=False), big)
    timeit("erf gelu f32 (8,1200,1280)", lambda t: jax.nn.gelu(t.astype(jnp.float32), approximate=False).astype(jnp.bfloat16), big)
    timeit("tanh gelu bf16", lambda t: jax.nn.gelu(t, approximate=True), big)


if __name__ == "__main__" and not os.environ.get("FFN2"):
    main()


def main2():
    """Disambiguate: data-dependence through tok vs through params."""
    from paif_tpu.models.mit import MixFFN

    B, h, w, C = 8, 30, 40, 320
    n = h * w
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    tok = jnp.asarray(rng.normal(0, 1, (B, n, C)), dt)
    ffn = MixFFN(C, 4 * C)
    fv = jax.tree_util.tree_map(
        lambda t: t.astype(dt) if t.dtype == jnp.float32 else t,
        ffn.init(jax.random.PRNGKey(0), tok, (h, w)),
    )
    # dep through tok (params constant per jit args, but STILL traced args)
    timeit("MixFFN module, dep through tok", lambda t, v: ffn.apply(v, t, (h, w)), tok, fv)

    p = fv["params"]

    def raw_args(t, w1, b1, wd, bd, w2, b2):
        x = t @ w1 + b1
        xs = x.reshape(B, h, w, 4 * C)
        xs = jax.lax.conv_general_dilated(
            xs, wd, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=4 * C,
        ) + bd
        x = xs.reshape(B, n, 4 * C)
        x = jax.nn.gelu(x, approximate=False)
        return x @ w2 + b2

    timeit("raw compose, weights as traced args", raw_args, tok,
           p["fc1"]["kernel"], p["fc1"]["bias"], p["dwconv"]["kernel"],
           p["dwconv"]["bias"], p["fc2"]["kernel"], p["fc2"]["bias"])


if __name__ == "__main__" and os.environ.get("FFN2"):
    main2()
