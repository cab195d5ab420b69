"""Fusion-cell architecture search CLI (the reference's unreleased NAS
capability — its published genotype literal implies a DARTS-style search over
the operations_m.py candidate pool; see search/darts.py).

Runs bilevel (default) or single-level DARTS over the supernet on a coupled
(ir, vis, mask) dataset — or synthetic fixtures — and writes the derived
genotype as YAML-loadable JSON (utils/config accepts it via
model.genotype).

    python -m paif_tpu.cli.search --synthetic --steps 50 --out genotype.json
"""

from __future__ import annotations

import argparse
import json
import logging

import numpy as np

log = logging.getLogger(__name__)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ir_path")
    ap.add_argument("--vi_path")
    ap.add_argument("--mask_path")
    ap.add_argument("--synthetic", action="store_true", help="synthetic fixture pairs")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--crop", type=int, default=64, help="square train crop")
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--bilevel", action=argparse.BooleanOptionalAction, default=True)
    ap.add_argument(
        "--seg_weight",
        type=float,
        default=0.0,
        help="perception-aware search: weight of a jointly-trained seg-probe "
        "CE term in the objective (the reference couples 0.1*fusion + 4*seg, "
        "model_fusion_auto.py:1093-1100); needs labels (--label_path or "
        "--synthetic)",
    )
    ap.add_argument("--label_path", help="seg labels for --seg_weight on real data")
    ap.add_argument("--num_classes", type=int, default=9)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="genotype.json")
    a = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from paif_tpu.losses import fusion_loss6
    from paif_tpu.search import (
        SuperFusionNet,
        create_search_state,
        derive_genotype,
        make_bilevel_search_step,
        make_search_step,
    )

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    rng = np.random.default_rng(a.seed)
    hw = (a.crop, a.crop)

    want_labels = a.seg_weight > 0
    if a.synthetic or not (a.ir_path and a.vi_path):
        from paif_tpu.data.synthetic import SyntheticFusionDataset

        ds = SyntheticFusionDataset(n=max(2 * a.batch_size, 8), hw=(128, 128), seed=a.seed)
        items = [(vis, ir, lab) for vis, ir, lab, _n in ds.items]
        log.info("search on %d synthetic pairs", len(items))
    else:
        from paif_tpu.data.datasets import FusionDataset

        fd = FusionDataset(a.ir_path, a.vi_path, a.label_path)
        items = []
        for i in range(len(fd)):
            vis, ir, label, _name = fd[i]
            items.append((vis, ir, label))
        if want_labels and not a.label_path:
            raise SystemExit("--seg_weight needs --label_path (or --synthetic)")
        log.info("search on %d pairs from %s", len(items), a.vi_path)

    def batch(key):
        idx = rng.integers(0, len(items), a.batch_size)
        vis = np.stack([items[i][0] for i in idx])
        ir = np.stack([items[i][1] for i in idx])
        h0 = int(rng.integers(0, vis.shape[1] - hw[0] + 1))
        w0 = int(rng.integers(0, vis.shape[2] - hw[1] + 1))
        vis = vis[:, h0 : h0 + hw[0], w0 : w0 + hw[1]]
        ir = ir[:, h0 : h0 + hw[0], w0 : w0 + hw[1]]
        # mask target: per-pixel max of the two luminances (Fusionloss6's
        # saliency surrogate when no mask labels exist)
        mask = np.maximum(ir[..., :1], vis[..., :1])
        out = (jnp.asarray(ir), jnp.asarray(vis[..., :1]), jnp.asarray(mask))
        if want_labels:
            lab = np.stack([items[i][2] for i in idx])
            lab = lab[:, h0 : h0 + hw[0], w0 : w0 + hw[1]]
            out = (*out, jnp.asarray(lab.astype(np.int32)))
        return out

    model = SuperFusionNet(
        features=a.channels, seg_classes=a.num_classes if want_labels else 0
    )
    b0 = batch(0)
    variables = model.init(jax.random.PRNGKey(a.seed), b0[0], b0[1])
    state = create_search_state(model, variables, lr=a.lr)

    # both step factories return already-jitted fns
    if a.bilevel:
        step = make_bilevel_search_step(model, fusion_loss6, a.seg_weight)
    else:
        step = make_search_step(model, fusion_loss6, a.seg_weight)

    for it in range(a.steps):
        if a.bilevel:
            state, tl, vl = step(state, batch(it), batch(-it - 1))
            if it % 20 == 0 or it == a.steps - 1:
                log.info("step %d  train %.4f  val %.4f", it, float(tl), float(vl))
        else:
            state, tl = step(state, *batch(it))
            if it % 20 == 0 or it == a.steps - 1:
                log.info("step %d  loss %.4f", it, float(tl))

    genotype = derive_genotype(state.params)
    with open(a.out, "w") as f:
        json.dump(genotype.to_dict(), f, indent=2)
    log.info("derived genotype -> %s", a.out)
    log.info("normal_1=%s", genotype.ops("normal_1"))
    log.info("normal_2=%s", genotype.ops("normal_2"))
    log.info("normal_3=%s", genotype.ops("normal_3"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
