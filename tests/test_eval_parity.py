"""End-to-end eval parity: the batched TPU harness must reproduce the
reference's per-image evaluation protocol (forward -> bilinear upsample ->
argmax -> confusion matrix -> compute_results) on identical weights/data."""

import numpy as np
import torch
import torch.nn.functional as F

import jax

from tests.reference_stubs import install_reference_stubs

install_reference_stubs()

from paif_tpu.eval.harness import EvalConfig, run_eval  # noqa: E402
from paif_tpu.eval.metrics import summarize  # noqa: E402
from paif_tpu.genotype import PAIF_GENOTYPE  # noqa: E402
from paif_tpu.io.torch_import import joint_entries, to_flax_variables  # noqa: E402
from paif_tpu.models import FusionNetSearched, PAIFJoint  # noqa: E402
from tests.test_torch_parity import to_ref_genotype, torch_state  # noqa: E402

H = W = 64
N = 5  # odd count exercises batch padding


class _ArrayDataset:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_clean_eval_matches_reference_protocol(rng):
    from sklearn.metrics import confusion_matrix as sk_confusion

    from core.model_fusion_auto import Network_MM_Searched
    from util.util import compute_results as ref_compute

    torch.manual_seed(0)
    ref = Network_MM_Searched(
        8, to_ref_genotype(PAIF_GENOTYPE), None, None, "mit_b0", num_classes=9
    ).eval()

    items = []
    for i in range(N):
        vis = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
        ir = rng.uniform(0, 1, (H, W, 1)).astype(np.float32)
        label = rng.integers(0, 9, (H, W)).astype(np.int64)
        items.append((vis, ir, label, f"{i}.png"))

    # --- reference protocol: batch-1 loop, interpolate, argmax, sklearn ---
    conf_ref = np.zeros((9, 9))
    with torch.no_grad():
        for vis, ir, label, _ in items:
            t_ir = torch.from_numpy(ir.transpose(2, 0, 1))[None]
            t_vis = torch.from_numpy(vis.transpose(2, 0, 1))[None]
            _, seg = ref(t_ir, t_vis)
            out = F.interpolate(seg, size=(H, W), mode="bilinear", align_corners=False)
            pred = out.argmax(1).numpy().flatten()
            conf_ref += sk_confusion(label.flatten(), pred, labels=list(range(9)))
    ref_metrics = ref_compute(conf_ref)
    ref_iou_mean = float(np.mean(np.nan_to_num(ref_metrics[2])))

    # --- this framework: batched harness on imported weights ---
    model = PAIFJoint(
        backbone="mit_b0", num_classes=9, fusion=lambda: FusionNetSearched(8, PAIF_GENOTYPE)
    )
    variables = to_flax_variables(torch_state(ref), joint_entries(PAIF_GENOTYPE, "mit_b0"))
    metrics = run_eval(
        model, variables, _ArrayDataset(items), EvalConfig(batch_size=2, use_mesh=False)
    )
    assert abs(metrics["iou_mean"] - ref_iou_mean) < 1e-3, (metrics["iou_mean"], ref_iou_mean)

    # the mesh path must give the identical result
    if len(jax.devices()) > 1:
        metrics_mesh = run_eval(
            model, variables, _ArrayDataset(items), EvalConfig(batch_size=2, use_mesh=True)
        )
        assert abs(metrics_mesh["iou_mean"] - metrics["iou_mean"]) < 1e-9
