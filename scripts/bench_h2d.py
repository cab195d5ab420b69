"""H2D transfer probe for the axon tunnel (round-4 session 4).

eval_e2e_s4 measured 675 ms/batch in the timed span vs ~132 ms device
compute + ~179 ms host decode — something serializes. A B16 uint8 batch
moves ~40 MB (vis u8 14.1 + ir u8 4.7 + label i32 19.7 + valid); if
device_put is synchronous on this tunnel or its bandwidth is low, H2D is
the missing 350+ ms. Measures:
  - device_put wall time per batch (sync: immediately read a scalar back)
  - device_put dispatch time (async: no readback) for overlap potential
  - per-dtype label cost (int32 vs uint8)

Run: python scripts/bench_h2d.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax

from paif_tpu.utils.jax_cache import configure_compile_cache

configure_compile_cache()

import jax.numpy as jnp
import numpy as np


def main():
    print(f"devices: {jax.devices()}", flush=True)
    B, H, W = 16, 480, 640
    rng = np.random.default_rng(0)
    vis = rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8)
    ir = rng.integers(0, 255, (B, H, W, 1), dtype=np.uint8)
    lab32 = rng.integers(0, 9, (B, H, W)).astype(np.int32)
    lab8 = lab32.astype(np.uint8)
    valid = np.ones((B,), np.bool_)

    touch = jax.jit(lambda *ts: sum(jnp.sum(t.astype(jnp.float32)) for t in ts))

    def sync_put(name, *arrs):
        mb = sum(a.nbytes for a in arrs) / 1e6
        # warm
        d = jax.device_put(arrs)
        float(touch(*d))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            d = jax.device_put(arrs)
            float(touch(*d))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{name:28s} {mb:7.1f} MB  put+touch {best * 1e3:7.1f} ms  "
              f"({mb / best:6.0f} MB/s incl ~122ms sync)", flush=True)
        return best

    def dispatch_put(name, *arrs):
        # how long device_put BLOCKS the host (dispatch only, no readback)
        jax.device_put(arrs)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.device_put(arrs)
            ts.append(time.perf_counter() - t0)
        print(f"{name:28s} dispatch-only {min(ts) * 1e3:7.1f} ms", flush=True)

    sync_put("full batch (i32 labels)", vis, ir, lab32, valid)
    sync_put("full batch (u8 labels)", vis, ir, lab8, valid)
    sync_put("vis only (u8)", vis)
    sync_put("labels only (i32)", lab32)
    dispatch_put("full batch (i32 labels)", vis, ir, lab32, valid)
    dispatch_put("full batch (u8 labels)", vis, ir, lab8, valid)

    # chained: 5 puts back to back, then one touch — does the tunnel
    # pipeline transfers or serialize them?
    t0 = time.perf_counter()
    ds = [jax.device_put((vis, ir, lab8, valid)) for _ in range(5)]
    for d in ds:
        float(touch(*d))
    print(f"5 overlapped put+touch: {(time.perf_counter() - t0) * 1e3:7.1f} ms total", flush=True)


if __name__ == "__main__":
    main()
