"""FCOS detection-loss parity vs the reference implementations (torch CPU)."""

import numpy as np
import torch
import jax.numpy as jnp

from tests.reference_stubs import install_reference_stubs

install_reference_stubs()

from paif_tpu.losses.detection import (  # noqa: E402
    compute_cls_loss,
    compute_cnt_loss,
    compute_reg_loss,
    gen_targets,
)

B, M, C = 2, 3, 9
STRIDES = (8, 16)
LIMITS = ((0, 64), (64, 128))
HWS = ((8, 10), (4, 5))


def _data(rng):
    boxes = np.zeros((B, M, 4), np.float32)
    for b in range(B):
        for m in range(M):
            x0, y0 = rng.uniform(0, 40, 2)
            w, h = rng.uniform(10, 60, 2)
            boxes[b, m] = [x0, y0, x0 + w, y0 + h]
    classes = rng.integers(1, C + 1, (B, M)).astype(np.int64)
    cls_preds = [rng.normal(0, 1, (B, h, w, C)).astype(np.float32) for h, w in HWS]
    cnt_preds = [rng.normal(0, 1, (B, h, w, 1)).astype(np.float32) for h, w in HWS]
    reg_preds = [rng.uniform(1, 50, (B, h, w, 4)).astype(np.float32) for h, w in HWS]
    return boxes, classes, cls_preds, cnt_preds, reg_preds


def test_detection_stack_matches_reference(rng):
    from core import loss as ref

    boxes, classes, cls_p, cnt_p, reg_p = _data(rng)

    gen = ref.GenTargets(strides=list(STRIDES), limit_range=[list(l) for l in LIMITS])
    t_cls_p = [torch.from_numpy(p.transpose(0, 3, 1, 2)) for p in cls_p]
    t_cnt_p = [torch.from_numpy(p.transpose(0, 3, 1, 2)) for p in cnt_p]
    t_reg_p = [torch.from_numpy(p.transpose(0, 3, 1, 2)) for p in reg_p]
    with torch.no_grad():
        rt_cls, rt_cnt, rt_reg = gen(
            [[t_cls_p, t_cnt_p, t_reg_p], torch.from_numpy(boxes), torch.from_numpy(classes)]
        )
        mask_pos = (rt_cnt > -1).squeeze(-1)
        r_cls = ref.compute_cls_loss(t_cls_p, rt_cls, mask_pos).numpy()
        r_cnt = ref.compute_cnt_loss(t_cnt_p, rt_cnt, mask_pos).numpy()
        r_reg = ref.compute_reg_loss(t_reg_p, rt_reg, mask_pos).numpy()

    j_cls_t, j_cnt_t, j_reg_t = gen_targets(
        HWS, jnp.asarray(boxes), jnp.asarray(classes), STRIDES, LIMITS
    )
    np.testing.assert_allclose(np.asarray(j_cls_t), rt_cls.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_cnt_t), rt_cnt.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_reg_t), rt_reg.numpy(), atol=1e-4)

    mask = np.asarray(j_cnt_t > -1)[..., 0]
    g_cls = compute_cls_loss([jnp.asarray(p) for p in cls_p], j_cls_t, jnp.asarray(mask))
    g_cnt = compute_cnt_loss([jnp.asarray(p) for p in cnt_p], j_cnt_t, jnp.asarray(mask))
    g_reg = compute_reg_loss([jnp.asarray(p) for p in reg_p], j_reg_t, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(g_cls), r_cls, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_cnt), r_cnt, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_reg), r_reg, rtol=1e-4, atol=1e-5)
