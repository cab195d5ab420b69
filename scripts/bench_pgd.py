"""PGD-5 throughput sweep: remat scope x attack batch (VERDICT round-1 #2).

The attack differentiates the full joint model per step. Full per-block remat
fits any batch but recomputes all 28 b3 blocks in every backward; the encoder
activation *bytes* live in stages 1-2 (19200/4800 tokens) while ~70% of the
FLOPs live in stage 3 (18 blocks), so remat=(0,1) should buy the memory at a
fraction of the recompute. This sweep measures it on the real chip.

Run: python scripts/bench_pgd.py [--iters 5]
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    ap.add_argument(
        "--configs",
        default=None,
        help="comma list of remat:batch pairs to run instead of the full "
        "sweep, e.g. 'True:24,False:16,01:24' (01 = remat stages (0,1))",
    )
    ap.add_argument(
        "--remat_filter",
        action="store_true",
        help="checkpoint the guided-filter split (drop its residuals in "
        "the backward; the robust-CLI/AAT memory mode)",
    )
    ap.add_argument(
        "--env",
        default=None,
        help="comma list of K=V env toggles applied before tracing, e.g. "
        "'PAIF_PALLAS_BOX_DIFF=1,PAIF_FUSED_GF_BOX=1' (round-3 fused "
        "boxes inside the differentiated attack graph)",
    )
    args = ap.parse_args()
    if args.env:
        for kv in args.env.split(","):
            k, _, v = kv.partition("=")
            os.environ[k.strip()] = v.strip()

    from paif_tpu.attack.pgd import AttackConfig, make_attack_both
    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models import FusionNetSearched, PAIFJoint

    H, W = args.hw
    rng = np.random.default_rng(0)

    def variables_for(model):
        v = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 1), jnp.float32),
            jnp.zeros((1, 64, 64, 3), jnp.float32),
        )
        bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
        )
        return dict(v, params=bf16(v["params"]))

    if args.configs:
        _R = {"True": True, "False": False, "01": (0, 1)}
        combos = [
            (_R[c.split(":")[0]], int(c.split(":")[1])) for c in args.configs.split(",")
        ]
        plan = [(r, [b for rr, b in combos if rr == r]) for r in dict.fromkeys(r for r, _ in combos)]
    else:
        plan = [(r, [8, 16, 24]) for r in (False, (0, 1), True)]

    results = []
    for remat, batches in plan:
        model = PAIFJoint(
            backbone="mit_b3",
            num_classes=9,
            fusion=lambda: FusionNetSearched(
                32, PAIF_GENOTYPE, remat_filter=args.remat_filter
            ),
            remat=remat,
        )
        variables = variables_for(model)
        atk = make_attack_both(
            lambda v, i, s: model.apply(v, i, s), AttackConfig(iters=args.iters)
        )
        for batch in batches:
            ir = jnp.asarray(rng.uniform(0, 1, (batch, H, W, 1)), jnp.bfloat16)
            vis = jnp.asarray(rng.uniform(0, 1, (batch, H, W, 3)), jnp.bfloat16)
            label = jnp.asarray(rng.integers(0, 9, (batch, H, W)), jnp.int32)

            def run(key):
                d_ir, d_vis = atk(variables, ir, vis, label, key)
                return float(
                    jnp.sum(d_ir.astype(jnp.float32)) + jnp.sum(d_vis.astype(jnp.float32))
                )

            tag = f"remat={remat} batch={batch}"
            try:
                t0 = time.perf_counter()
                run(jax.random.PRNGKey(0))
                print(f"{tag}: compile+first {time.perf_counter() - t0:.1f}s", flush=True)
                ts = []
                for k in range(2):
                    t0 = time.perf_counter()
                    run(jax.random.PRNGKey(1 + k))
                    ts.append(time.perf_counter() - t0)
                dt = min(ts)
                pps = batch / dt
                print(
                    f"{tag}: {dt * 1e3:.0f} ms/batch -> {pps:.2f} attacked pairs/s "
                    f"({batch * args.iters / dt:.1f} attack steps/s)",
                    flush=True,
                )
                results.append((tag, pps))
            except Exception as e:
                # full text: the remote compile helper buries the real
                # Mosaic/XLA error below an HTTP 500 first line
                msg = str(e)[:8000] if str(e) else type(e).__name__
                print(f"{tag}: FAILED {type(e).__name__}: {msg}", flush=True)

    print("\n== summary ==")
    for tag, pps in sorted(results, key=lambda t: -t[1]):
        print(f"{pps:7.2f} pairs/s  {tag}")


if __name__ == "__main__":
    main()
