"""Benchmark: fused-pairs/sec of the flagship joint model (searched fusion +
MiT-b3 SegFormer) at MFNet resolution 480x640, batched, jit-compiled.

Prints ONE JSON line:
  {"metric": "fused_pairs_per_sec", "value": N, "unit": "pairs/s",
   "vs_baseline": N / BASELINE_PAIRS_PER_SEC}

The baseline is the PyTorch reference's un-jitted batch-1 CPU loop
(robust_test.py: no batching, no compilation). BASELINE_PAIRS_PER_SEC below
was measured with scripts/measure_baseline.py on this machine; re-run that
script to recalibrate.

Extra diagnostics (PGD steps/sec etc.) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Reference throughput: PyTorch CPU, batch 1, full joint forward at 480x640.
# Measured on this host via scripts/measure_baseline.py (see BASELINE.md):
# clean forward 13.59 s/pair (0.0736 pairs/s); PGD-5 attack 513 s/pair.
BASELINE_PAIRS_PER_SEC = 0.0736

# Steady-state (slope) pairs/s on v5e: B8 91.8 / B16 ~105 — the old B32
# default only looked best because single-dispatch timing amortized the
# ~122 ms fixed host-sync overhead over more pairs (see round-3 notes in
# docs/PERF.md; scripts/bench_steady_state.py reproduces the sweep).
BATCH = 16
# Attack leg: b16 NO-REMAT is the round-4 optimum (5.88 attacked pairs/s,
# bench_logs/r4/pgd_sweep_densedw.log) — the dense depthwise routing + fused
# Pallas boxes in the analytic GF backward make no-remat fit for the first
# time; b24/b32 OOM at every remat scope, so b16 is the memory frontier.
ATTACK_BATCH = 16
INIT_HW = (64, 64)  # param shapes are resolution-independent; init small, run big
H, W = 480, 640
STEPS = 5
REPS = 4  # chained in-jit reps for the steady-state slope (see below)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--dp",
        action="store_true",
        help="data-parallel over all devices: batch sharded over a 1-D mesh, "
        "params replicated (auto when >1 device is visible)",
    )
    ap.add_argument("--batch", type=int, default=None, help="per-device batch size")
    args = ap.parse_args()

    import os

    import jax

    # PAIF_PLATFORM=cpu: off-chip smoke runs on images whose sitecustomize
    # pins the TPU plugin (must happen before any backend touch)
    if os.environ.get("PAIF_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PAIF_PLATFORM"])
    import jax.numpy as jnp

    from paif_tpu.attack.pgd import AttackConfig, make_attack_both
    from paif_tpu.genotype import PAIF_GENOTYPE
    from paif_tpu.models import FusionNetSearched, PAIFJoint

    # persistent compile cache, repo-local so the builder session's compiles
    # survive into the driver environment (BENCH_r03 paid 1225 s re-compiling
    # because /tmp did not persist + the bench programs were new code)
    from paif_tpu.utils.jax_cache import configure_compile_cache

    log(f"compile cache: {configure_compile_cache()}")
    log(f"devices: {jax.devices()}")
    global BATCH, ATTACK_BATCH, H, W  # noqa: PLW0603
    # PAIF_BENCH_SMOKE=1: tiny shapes so the bench SCRIPT (timing plumbing,
    # JSON contract) is testable off-chip; numbers are meaningless there.
    smoke = bool(os.environ.get("PAIF_BENCH_SMOKE"))
    if smoke:
        H, W = 64, 64
        BATCH, ATTACK_BATCH = 2, 2
    n_dev = len(jax.devices())
    use_dp = args.dp or n_dev > 1
    per_chip = args.batch or BATCH
    BATCH = per_chip * n_dev if use_dp else per_chip
    ATTACK_BATCH = ATTACK_BATCH * n_dev if use_dp else ATTACK_BATCH
    model = PAIFJoint(
        backbone="mit_b3",
        num_classes=9,
        fusion=lambda: FusionNetSearched(32, PAIF_GENOTYPE),
    )
    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.uniform(0, 1, (BATCH, H, W, 1)), jnp.float32)
    vis = jnp.asarray(rng.uniform(0, 1, (BATCH, H, W, 3)), jnp.float32)
    import os
    os.environ.setdefault("PAIF_PRECISION", "default")  # bf16 fast path
    t0 = time.perf_counter()
    ih, iw = INIT_HW
    # Init on the IN-PROCESS CPU backend when the main backend is a remote
    # TPU: the axon backend re-pays ~300 s for the init program per process
    # even with a warm persistent cache (round-5 validation:
    # bench_logs/r5/make_bench_cache.log), while the CPU compile is local,
    # fast, and reliably cached. Param values are backend-independent; the
    # bf16 cast also runs on CPU (eager per-leaf casts are ~free there but
    # ~700 x ~122 ms tunnel dispatches on axon), and ONE device_put ships
    # the bf16 tree to the chip.
    init_dev = None
    if jax.devices()[0].platform != "cpu":
        try:
            init_dev = jax.local_devices(backend="cpu")[0]
        except Exception:  # no CPU backend registered: init on the default
            init_dev = None
    import contextlib

    with jax.default_device(init_dev) if init_dev is not None else contextlib.nullcontext():
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, ih, iw, 1), jnp.float32),
            jnp.zeros((1, ih, iw, 3), jnp.float32),
        )
        # force completion so the logged time is honest (readback = hard sync)
        float(jnp.sum(variables["params"]["denoise_net"]["decoder"]["linear_pred"]["bias"]))
    log(f"init: {time.perf_counter() - t0:.1f}s" + (" (cpu)" if init_dev is not None else ""))

    # bfloat16 params + inputs: the TPU fast path (f32 parity is tested in CI)
    bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    t0 = time.perf_counter()
    variables_b = dict(variables, params=bf16(variables["params"]))
    if init_dev is not None:
        variables_b = jax.device_put(variables_b, jax.devices()[0])
        jax.block_until_ready(variables_b)
        log(f"param cast+transfer: {time.perf_counter() - t0:.1f}s")
    ir_b, vis_b = ir.astype(jnp.bfloat16), vis.astype(jnp.bfloat16)

    if use_dp:
        from paif_tpu.parallel.mesh import make_mesh, replicate, shard_batch

        mesh = make_mesh()
        variables_b = replicate(mesh, variables_b)
        ir_b, vis_b = shard_batch(mesh, (ir_b, vis_b))
        log(f"DP over {n_dev} devices: global batch {BATCH} ({per_chip}/chip)")

    # The jitted step reduces its outputs to ONE scalar that we read back to
    # host each iteration: a hard synchronization point that works even on
    # remote-tunnel platforms where block_until_ready returns early.
    #
    # Round-3 methodology fix: one dispatch+readback through the axon tunnel
    # carries ~122 ms of FIXED host-sync latency (measured intercept: reps
    # 1/2/4 at B16 = 273/425/728 ms -> slope 151.5, intercept 121.7;
    # scripts/bench_steady_state.py). A production eval pipeline overlaps
    # that latency (eval/harness.py accumulates its confusion matrix on
    # device and syncs once), so the headline is the STEADY-STATE cost: the
    # slope of wall time vs chained in-jit reps. The single-dispatch number
    # (what rounds 1-2 reported) is still logged for continuity.
    def make_fwd(reps):
        @jax.jit
        def fwd(v, i, s):
            acc = jnp.float32(0)
            for _ in range(reps):
                fused, seg = model.apply(v, i, s)
                t = jnp.sum(fused.astype(jnp.float32)) + jnp.sum(seg.astype(jnp.float32))
                acc = acc + t
                i = i + (t * 0).astype(i.dtype)  # serialize reps (not folded)
            return acc

        return fwd

    reps = 2 if smoke else REPS
    steps = 1 if smoke else STEPS
    fwd1, fwdR = make_fwd(1), make_fwd(reps)
    t0 = time.perf_counter()
    first = float(fwd1(variables_b, ir_b, vis_b))
    log(f"compile+first step: {time.perf_counter() - t0:.1f}s  checksum={first:.3f}")
    float(fwdR(variables_b, ir_b, vis_b))  # compile the chained body

    t1 = tR = None
    for _ in range(steps):
        t0 = time.perf_counter()
        float(fwd1(variables_b, ir_b, vis_b))
        t1 = min(t1 or 1e9, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(fwdR(variables_b, ir_b, vis_b))
        tR = min(tR or 1e9, time.perf_counter() - t0)
    dt = (tR - t1) / (reps - 1)  # steady-state ms/batch (overhead cancels)
    if dt <= 0:
        # a tunnel hiccup on the chained body can make the difference
        # non-positive; fall back to the (overhead-laden, conservative)
        # single-dispatch time rather than emitting a garbage headline
        log(f"steady-state slope non-positive ({dt * 1e3:.1f} ms) — using single-dispatch")
        dt = t1
    pairs_per_sec = BATCH / dt
    log(
        f"forward: steady {dt * 1e3:.1f} ms/batch of {BATCH} -> {pairs_per_sec:.2f} pairs/s"
        f" (single-dispatch {t1 * 1e3:.1f} ms -> {BATCH / t1:.2f} pairs/s incl ~122 ms sync)"
        + (f" ({pairs_per_sec / n_dev:.2f}/chip)" if use_dp else "")
    )

    # PGD-5 attack throughput (the robust-eval hot loop), diagnostics only
    try:
        ab = min(ATTACK_BATCH, BATCH)  # --batch < 16 shrinks the attack leg too
        label = jnp.asarray(rng.integers(0, 9, (ab, H, W)), jnp.int32)
        atk_ir, atk_vis = ir_b[:ab], vis_b[:ab]
        if use_dp:
            from paif_tpu.parallel.mesh import shard_batch

            label, atk_ir, atk_vis = shard_batch(mesh, (label, atk_ir, atk_vis))
        model_r = PAIFJoint(
            backbone="mit_b3",
            num_classes=9,
            fusion=lambda: FusionNetSearched(32, PAIF_GENOTYPE),
            # No remat: with the dense depthwise routing + fused Pallas
            # boxes in the analytic GF backward, no-remat b16 fits for the
            # first time and wins the round-4 sweep (5.88 vs 5.71 full-remat
            # pairs/s; b24/b32 OOM at every remat scope —
            # bench_logs/r4/pgd_sweep_densedw.log). It also compiles in
            # ~1 min where the full-remat attack program takes 7-19 min.
            remat=False,
        )
        atk = make_attack_both(
            lambda v, i, s: model_r.apply(v, i, s), AttackConfig(iters=1 if smoke else 5)
        )

        def make_atk_body(reps):
            @jax.jit
            def body(v, i, s, lab, key):
                acc = jnp.float32(0)
                for r in range(reps):
                    d_ir, d_vis = atk(v, i, s, lab, jax.random.fold_in(key, r))
                    t = jnp.sum(d_ir.astype(jnp.float32)) + jnp.sum(d_vis.astype(jnp.float32))
                    acc = acc + t
                    i = i + (t * 0).astype(i.dtype)
                return acc

            return body

        atk1 = make_atk_body(1)
        t0 = time.perf_counter()
        float(atk1(variables_b, atk_ir, atk_vis, label, jax.random.PRNGKey(0)))
        log(f"pgd-5 compile+run: {time.perf_counter() - t0:.1f}s")
        if smoke:
            # plumbing check only: skip the second (chained) attack body —
            # its compile dominates the off-chip smoke run
            t0 = time.perf_counter()
            float(atk1(variables_b, atk_ir, atk_vis, label, jax.random.PRNGKey(1)))
            dt_atk = time.perf_counter() - t0
        else:
            atk2 = make_atk_body(2)
            float(atk2(variables_b, atk_ir, atk_vis, label, jax.random.PRNGKey(0)))
            ta = tb = None
            for k in range(2):
                t0 = time.perf_counter()
                float(atk1(variables_b, atk_ir, atk_vis, label, jax.random.PRNGKey(k)))
                ta = min(ta or 1e9, time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(atk2(variables_b, atk_ir, atk_vis, label, jax.random.PRNGKey(k)))
                tb = min(tb or 1e9, time.perf_counter() - t0)
            dt_atk = tb - ta  # steady-state per-batch (fixed sync overhead cancels)
            if dt_atk <= 0:
                log("attack slope non-positive — using single-dispatch")
                dt_atk = ta
            log(
                f"pgd-5: steady {dt_atk * 1e3:.1f} ms/batch of {ab} -> "
                f"{ab * 5 / dt_atk:.2f} attack steps/s, {ab / dt_atk:.2f} attacked pairs/s"
                f" (single-dispatch {ta * 1e3:.1f} ms -> {ab / ta:.2f})"
            )
    except Exception as e:  # diagnostics must not sink the headline metric
        log(f"pgd bench skipped: {type(e).__name__}: {e}")

    print(
        json.dumps(
            {
                "metric": "fused_pairs_per_sec",
                "value": round(pairs_per_sec, 3),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
