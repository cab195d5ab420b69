"""Batched evaluation harness: clean and adversarially-robust joint-model
evaluation with on-device metrics.

Replaces the reference's per-image python loops (test_original.py
val_segformer_robust2 :98-258, robust_test.py val_segformer_robust :95-239)
with ONE jitted step per batch: [PGD attack ->] forward -> upsample ->
argmax -> confusion-matrix bincount, sharded over the mesh when given.
Only final images (optional) and the 9x9 matrix reach the host.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from paif_tpu.attack.pgd import AttackConfig, make_attack_both, make_attack_single
from paif_tpu.data.pipeline import PrefetchLoader, batch_iterator, device_prefetch
from paif_tpu.eval.metrics import confusion_matrix, compute_results, summarize
from paif_tpu.eval.palette import colorize
from paif_tpu.ops.color import clip01, recombine_chroma, rgb_to_ycrcb, ycrcb_to_rgb
from paif_tpu.ops.resize import resize_bilinear
from paif_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from paif_tpu.utils.profiler import StepTimer


@dataclass
class EvalConfig:
    batch_size: int = 8
    num_classes: int = 9
    attack: Optional[AttackConfig] = None  # None -> clean eval
    save_dir: Optional[str] = None  # write fused/seg/attacked PNGs if set
    strategy: str = "meta_final"
    use_mesh: bool = True
    seed: int = 0
    input_dtype: str = "float32"  # 'bfloat16' pairs with bf16-cast params
    extra: dict = field(default_factory=dict)


def fused_to_uint8(fused_y: jnp.ndarray, vis_rgb: jnp.ndarray) -> jnp.ndarray:
    """The reference's fused-image save chain (robust_test.py:181-200):
    recombine chroma -> RGB -> clip [0,1] -> scale to uint8 -> min-max over
    the uint8 values -> uint8 again. Per-image (batch-1 parity)."""
    rgb = clip01(ycrcb_to_rgb(recombine_chroma(fused_y, rgb_to_ycrcb(vis_rgb))))
    u8 = jnp.floor(rgb * 255.0)
    lo = jnp.min(u8, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(u8, axis=(1, 2, 3), keepdims=True)
    out = (u8 - lo) / jnp.maximum(hi - lo, 1.0)
    return (out * 255.0).astype(jnp.uint8)


def make_eval_step(model, cfg: EvalConfig):
    """Jitted fn(variables, ir, vis, label, valid, key) -> outputs dict."""

    apply_fn = lambda v, i, s: model.apply(v, i, s)  # noqa: E731
    attacker = None
    if cfg.attack is not None:
        if cfg.attack.mode == "both":
            attacker = make_attack_both(apply_fn, cfg.attack)
        else:
            attacker = make_attack_single(apply_fn, cfg.attack, target=cfg.attack.mode)

    work_dt = jnp.bfloat16 if cfg.input_dtype == "bfloat16" else jnp.float32

    def _step_body(variables, ir, vis, label, valid, key):
        # uint8 host path (single-core host: decode-only is 2x cheaper than
        # decode+f32, and H2D moves 4-6x fewer bytes): normalize on device.
        # f32 /255 then cast == the host path's numerics exactly.
        if ir.dtype == jnp.uint8:
            ir = (ir.astype(jnp.float32) / 255.0).astype(work_dt)
        if vis.dtype == jnp.uint8:
            vis = (vis.astype(jnp.float32) / 255.0).astype(work_dt)
        label = label.astype(jnp.int32)
        if attacker is not None:
            if cfg.attack.mode == "both":
                d_ir, d_vis = attacker(variables, ir, vis, label, key)
                ir = ir + d_ir
                vis = vis + d_vis
            elif cfg.attack.mode == "ir":
                ir = ir + attacker(variables, ir, vis, label, key)
            else:
                vis = vis + attacker(variables, ir, vis, label, key)
        fused, seg = apply_fn(variables, ir, vis)
        logits = resize_bilinear(seg, label.shape[1:3], align_corners=False)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # padded rows must not pollute the confusion matrix
        masked_label = jnp.where(valid[:, None, None], label, 255)
        conf = confusion_matrix(masked_label, pred, cfg.num_classes)
        if cfg.save_dir is None:
            # metric-only runs: image outputs would be dead compute AND pin
            # ~100 MB/batch of HBM per in-flight step in the async loop
            return {"conf": conf}
        return {
            "conf": conf,
            "pred": pred,
            "fused_u8": fused_to_uint8(fused, vis),
            "ir_attacked": ir,
            "vis_attacked": vis,
        }

    step = jax.jit(_step_body)

    @jax.jit
    def step_combined(variables, buf, valid, key):
        # PAIF_COMBINED_H2D: the host packs (vis3 | ir1 | label1) into ONE
        # (B,H,W,5) uint8 buffer so each batch is a single device_put —
        # fewer tunnel round trips on the one-core host (A/B: r5 h2d bench).
        vis = buf[..., 0:3]
        ir = buf[..., 3:4]
        label = buf[..., 4].astype(jnp.int32)
        return _step_body(variables, ir, vis, label, valid, key)

    step.combined = step_combined
    return step


def _save_outputs(cfg: EvalConfig, out: Dict, names, valid: np.ndarray) -> None:
    from PIL import Image

    root = cfg.save_dir
    dirs = {
        "fused": os.path.join(root, "fused_attacked" if cfg.attack else "fused"),
        "seg": os.path.join(root, "seg_attacked" if cfg.attack else "seg"),
    }
    if cfg.attack is not None:
        dirs["ir"] = os.path.join(root, "ir_attacked")
        dirs["vis"] = os.path.join(root, "vis_attacked")
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    fused = np.asarray(out["fused_u8"])
    pred = np.asarray(out["pred"])
    ir_a = np.asarray(out["ir_attacked"])
    vis_a = np.asarray(out["vis_attacked"])
    for k, name in enumerate(names):
        if not valid[k]:
            continue
        Image.fromarray(fused[k]).save(os.path.join(dirs["fused"], name))
        Image.fromarray(colorize(pred[k])).save(os.path.join(dirs["seg"], name))
        if cfg.attack is not None:
            Image.fromarray((ir_a[k, ..., 0] * 255).astype(np.uint8)).save(
                os.path.join(dirs["ir"], name)
            )
            Image.fromarray((vis_a[k] * 255).astype(np.uint8)).save(
                os.path.join(dirs["vis"], name)
            )


def run_eval(model, variables, dataset, cfg: EvalConfig) -> Dict[str, float]:
    """Evaluate over a (vis, ir, label, name) dataset; returns summary metrics
    and (optionally) writes images + the reference-format report txt."""
    # shard over the largest device count that divides the batch
    n_dev = len(jax.devices())
    n_use = 1
    if cfg.use_mesh:
        n_use = max(d for d in range(1, n_dev + 1) if cfg.batch_size % d == 0)
    mesh = make_mesh(devices=jax.devices()[:n_use]) if n_use > 1 else None
    if mesh is not None:
        variables = replicate(mesh, variables)
    step = make_eval_step(model, cfg)
    key = jax.random.PRNGKey(cfg.seed)

    conf_dev = None  # device-side running confusion; one host sync at the end
    loader = PrefetchLoader(lambda: batch_iterator(dataset, cfg.batch_size))
    timer = StepTimer(warmup=1)

    in_dt = np.dtype(jnp.bfloat16) if cfg.input_dtype == "bfloat16" else np.float32
    # PAIF_COMBINED_H2D=1: pack the whole uint8 batch into ONE (B,H,W,5)
    # buffer -> a single device_put per batch instead of four (each put is
    # a separate tunnel transaction; measured in bench_logs/r5/h2d.log).
    combined_ok = os.environ.get("PAIF_COMBINED_H2D", "0") not in ("0", "false", "off")

    def put(batch):
        ir, vis, label = batch["ir"], batch["vis"], batch["label"]
        if (
            combined_ok
            and ir.dtype == np.uint8
            and vis.dtype == np.uint8
            and label.dtype == np.uint8
        ):
            buf = np.concatenate([vis, ir, label[..., None]], axis=-1)
            arrays = (buf, batch["valid"])
        else:
            if ir.dtype != np.uint8:  # uint8 host path: normalize on device
                ir = ir.astype(in_dt)
                vis = vis.astype(in_dt)
            if label.dtype == np.int64:  # halve the label H2D bytes
                label = label.astype(np.int32)
            arrays = (ir, vis, label, batch["valid"])
        if mesh is not None:
            arrays = shard_batch(mesh, arrays)
        else:
            arrays = jax.device_put(arrays)
        return arrays, batch

    # host decode overlaps via the loader thread; H2D overlaps via the
    # device-prefetch queue (one batch in flight ahead of compute)
    # A host readback costs ~122 ms of fixed sync latency through the axon
    # tunnel (measured round 3, scripts/bench_steady_state.py). Accumulating
    # the per-batch confusion ON DEVICE keeps the loop async — dispatches
    # pipeline back-to-back and the single sync happens after the last
    # batch. Saving images forces per-batch transfers, so that path keeps
    # its natural sync; the timed metric path stays fully pipelined.
    pairs_timed = 0
    t_steady = None
    flush_every = None  # set from the first batch's pixel count
    conf_host = np.zeros((cfg.num_classes, cfg.num_classes), dtype=np.int64)
    # PAIF_PUT_IN_LOADER=1: run device_put inside the prefetch THREAD so the
    # tunnel transfer wait overlaps the consumer's dispatch work (on this
    # one-core host the two cannot overlap as CPU, but a blocking put is
    # mostly network wait — a thread hides it).
    if os.environ.get("PAIF_PUT_IN_LOADER", "0") not in ("0", "false", "off"):
        loader = PrefetchLoader(
            lambda it=loader: (put(b) for b in it), prefetch=2
        )
        feed = device_prefetch(loader, lambda x: x, depth=1)
    else:
        feed = device_prefetch(loader, put, depth=2)
    for bidx, (arrays, batch) in enumerate(feed):
        label_shape = batch["label"].shape
        with timer:
            if len(arrays) == 2:  # combined single-buffer path
                out = step.combined(variables, *arrays, jax.random.fold_in(key, bidx))
            else:
                out = step(variables, *arrays, jax.random.fold_in(key, bidx))
            conf_dev = out["conf"] if conf_dev is None else conf_dev + out["conf"]
            if cfg.save_dir:
                _save_outputs(cfg, out, batch["name"], np.asarray(batch["valid"]))
        if bidx == 0:
            # The device confusion is int32 (jnp.bincount): a single cell
            # overflows after ~2^31 pixels. Flush to the int64 host total
            # well before that — the flush is also the loop's backpressure
            # bound (at most `flush_every` dispatches in flight).
            px = int(np.prod(label_shape))
            flush_every = max(1, min(64, (2**31 - 1) // (2 * px)))
        if bidx == 0 and not cfg.save_dir:
            # Sync once after the first batch (absorbs compile + warmup) via
            # a scalar readback — block_until_ready is unreliable on the
            # axon tunnel — then time the rest of the run as one async span.
            float(jnp.sum(conf_dev.astype(jnp.float32)))
            t_steady = time.perf_counter()
        else:
            pairs_timed += int(label_shape[0])
        if flush_every and (bidx + 1) % flush_every == 0:
            conf_host += np.asarray(conf_dev).astype(np.int64)
            conf_dev = None
    if conf_dev is not None:
        conf_host += np.asarray(conf_dev).astype(np.int64)  # end-of-run sync
    conf_total = conf_host
    t_end = time.perf_counter()

    metrics = summarize(conf_total)
    if t_steady is not None and pairs_timed:
        # steady-state throughput: post-warmup batches, pipelined dispatch,
        # closed by the conf_total transfer above
        metrics["pairs_per_sec"] = pairs_timed / (t_end - t_steady)
    elif timer.times:
        metrics["pairs_per_sec"] = cfg.batch_size / timer.mean
    print_report(conf_total, cfg.strategy)
    if cfg.save_dir:
        _write_report(cfg, conf_total)
    return metrics


def print_report(conf_total: np.ndarray, strategy: str) -> None:
    """Per-class table on stdout (the reference prints the same shape of
    report, robust_test.py:234-239), with class names for readability."""
    from paif_tpu.eval.palette import CLASS_NAMES

    precision, _recall, iou = compute_results(conf_total)
    print(f"strategy: {strategy}")
    print(f"{'class':<12}{'precision':>12}{'iou':>12}")
    for i, name in enumerate(CLASS_NAMES[: len(iou)]):
        print(f"{name:<12}{precision[i]:>12.6f}{iou[i]:>12.6f}")
    print(
        f"{'mean':<12}{np.mean(np.nan_to_num(precision)):>12.6f}"
        f"{np.mean(np.nan_to_num(iou)):>12.6f}"
    )
    print(
        f"{'mean w/o bg':<12}{np.mean(np.nan_to_num(precision[1:])):>12.6f}"
        f"{np.mean(np.nan_to_num(iou[1:])):>12.6f}"
    )


def _write_report(cfg: EvalConfig, conf_total: np.ndarray) -> None:
    """Reference report format (robust_test.py:217-231)."""
    precision, _recall, iou = compute_results(conf_total)
    a = cfg.attack or AttackConfig(iters=0, epsilon=0.0, alpha=0.0)
    name = f"{cfg.strategy}_PGD{a.iters}_{int(a.epsilon * 255)}_{int(a.alpha * 255)}.txt"
    os.makedirs(cfg.save_dir, exist_ok=True)
    with open(os.path.join(cfg.save_dir, name), "w") as f:
        print("\n strategy :" + cfg.strategy, file=f)
        print(
            f"\n Attack Loss{a.loss}, Attack way{a.way}, Attack iters{a.iters}, "
            f"epsilon={int(a.epsilon * 255)}, alpha={int(a.alpha * 255)}",
            file=f,
        )
        fmt = lambda v: "\t".join("%.6f" % x for x in v)  # noqa: E731
        print("*precision_per_class: \n    " + fmt(precision) + "\t%.6f" % np.mean(np.nan_to_num(precision)), file=f)
        print("* iou per class: \n    " + fmt(iou) + "\t%.6f" % np.mean(np.nan_to_num(iou)), file=f)
        print(
            "* average values (np.mean(np.nan_to_num(x))) remove unlabel: \n ACC: %.6f, iou: %.6f"
            % (np.mean(np.nan_to_num(precision[1:])), np.mean(np.nan_to_num(iou[1:]))),
            file=f,
        )
