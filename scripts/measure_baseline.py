"""Measure the PyTorch reference's throughput on this host (BASELINE.md).

Builds the reference joint model (random weights — throughput doesn't depend
on weight values) exactly as robust_test.py does: Network_MM_Searched with
the searched genotype and mit_b3, batch 1, CPU, no compilation. Reports
clean-forward pairs/sec and PGD-5 attacked pairs/sec.

Run from the repo root: python scripts/measure_baseline.py [--iters 5]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "tests")
sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import torch  # noqa: E402

from tests.reference_stubs import install_reference_stubs  # noqa: E402

install_reference_stubs()

from collections import namedtuple  # noqa: E402

RefGenotype = namedtuple(
    "Genotype", "normal_1 normal_1_concat normal_2 normal_2_concat normal_3 normal_3_concat"
)

GENOTYPE = RefGenotype(
    normal_1=[("Denseblocks_3_1", 0), ("DilConv_3_2", 1)],
    normal_1_concat=[1, 2],
    normal_2=[("Denseblocks_3_1", 0), ("Denseblocks_3_1", 1)],
    normal_2_concat=[1, 2],
    normal_3=[("ECAattention_3", 0), ("Residualblocks_7_1", 1)],
    normal_3_concat=[1, 2],
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--pgd", action="store_true", help="also measure PGD-5 attack")
    args = ap.parse_args()

    from core.model_fusion_auto import Network_MM_Searched

    torch.manual_seed(0)
    model = Network_MM_Searched(32, GENOTYPE, None, None, "mit_b3", num_classes=9).eval()
    n_params = sum(p.numel() for p in model.parameters())
    print(f"params: {n_params / 1e6:.1f}M")

    rng = np.random.default_rng(0)
    ir = torch.from_numpy(rng.uniform(0, 1, (1, 1, 480, 640)).astype(np.float32))
    vis = torch.from_numpy(rng.uniform(0, 1, (1, 3, 480, 640)).astype(np.float32))

    with torch.no_grad():
        model(ir, vis)  # warmup
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            model(ir, vis)
            times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"clean forward: best {best:.3f}s/pair -> {1.0 / best:.4f} pairs/s")

    if args.pgd:
        from attack.attack import attack_both

        label = torch.from_numpy(rng.integers(0, 9, (1, 480, 640)).astype(np.int64))
        t0 = time.perf_counter()
        attack_both(model, X_vis=vis, X_ir=ir, label=label, attack_iters=5)
        dt = time.perf_counter() - t0
        print(f"pgd-5 attack: {dt:.3f}s/pair -> {5 / dt:.4f} attack steps/s")


if __name__ == "__main__":
    main()
