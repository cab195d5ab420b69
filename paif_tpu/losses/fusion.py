"""Image-fusion losses (core/loss.py:386-633), NHWC.

Conventions: `image_ir`, `image_vis` and `mask` may carry extra channels; all
losses use channel 0 (the reference slices [:, :1]). `generate_img` is the
fused luminance (B,H,W,1). `image_vis` is in YCrCb (channel 0 = Y) wherever
the reference feeds vis_ycrcb.

The reference's lap_loss module is absent from its own repo (core/loss.py:11
imports a file that does not exist); laplacian_pyramid_loss here is the
standard L1 over Laplacian pyramid levels of the fused image vs
max(ir, vis_y).
"""

from __future__ import annotations

import jax.numpy as jnp

from paif_tpu.ops.resize import resize_bilinear
from paif_tpu.ops.sobel import sobel_xy
from paif_tpu.ops.ssim import ssim
from paif_tpu.ops.entropy import patch_entropy


def _y(x: jnp.ndarray) -> jnp.ndarray:
    return x[..., 0:1]


def _l1(a, b):
    return jnp.mean(jnp.abs(a - b))


def _mse(a, b):
    return jnp.mean((a - b) ** 2)


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return x[:, : h // 2 * 2, : w // 2 * 2, :].reshape(b, h // 2, 2, w // 2, 2, c).mean((2, 4))


def laplacian_pyramid_loss(gen: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray, levels: int = 3) -> jnp.ndarray:
    """L1 over Laplacian pyramid levels of gen vs max(a, b)."""
    target = jnp.maximum(a, b)

    def pyr(x):
        out = []
        for _ in range(levels):
            down = _avg_pool2(x)
            up = resize_bilinear(down, x.shape[1:3], align_corners=False)
            out.append(x - up)
            x = down
        out.append(x)
        return out

    return sum(_l1(pg, pt) for pg, pt in zip(pyr(gen), pyr(target)))


def fusion_loss(image_ir, image_vis, generate_img, mask=None):
    """Fusionloss (:423-440): L1(max(Y,IR), gen) + 8*L1(max grad, grad gen)."""
    y, ir = _y(image_vis), _y(image_ir)
    loss_in = _l1(jnp.maximum(y, ir), generate_img)
    grad_joint = jnp.maximum(sobel_xy(y), sobel_xy(ir))
    loss_grad = _l1(grad_joint, sobel_xy(generate_img))
    return loss_in + 8.0 * loss_grad


def fusion_loss2(image_ir, image_vis, generate_img, mask):
    """Fusionloss2 (:441-457): L1 against the decomposition mask target."""
    return _l1(_y(mask), generate_img)


def fusion_loss3(image_ir, image_vis, generate_img, mask):
    """Fusionloss3 (:459-474): mask L1 + gradient match."""
    return _l1(_y(mask), generate_img) + _l1(sobel_xy(_y(mask)), sobel_xy(generate_img))


def fusion_loss_grad(image_ir, image_vis, generate_img, mask):
    """Fusionloss_grad (:477-488): mask L1 + 0.8 * Laplacian-pyramid loss."""
    return _l1(_y(mask), generate_img) + 0.8 * laplacian_pyramid_loss(
        generate_img, _y(image_ir), _y(image_vis)
    )


def fusion_loss_grad2(image_ir, image_vis, generate_img, mask):
    """Fusionloss_grad2 (:490-502) — the robust_test criterion:
    L1(mask, gen) + 1.1*(1 - SSIM(gen, mask))."""
    m = _y(mask)
    return _l1(m, generate_img) + 1.1 * (1.0 - ssim(generate_img, m))


def fusion_loss_grad3(image_ir, image_vis, generate_img, mask):
    """Fusionloss_grad3 (:504-515): MSE + 1.1*(1 - SSIM)."""
    m = _y(mask)
    return _mse(m, generate_img) + 1.1 * (1.0 - ssim(generate_img, m))


def fusion_loss6(image_ir, image_vis, generate_img, mask):
    """Fusionloss6 (:516-535)."""
    y, ir, m = _y(image_vis), _y(image_ir), _y(mask)
    loss_in = _l1(m, generate_img)
    loss_in2 = _l1(y + ir, generate_img)
    grad_joint = jnp.maximum(sobel_xy(y), sobel_xy(ir))
    loss_grad = _l1(grad_joint, sobel_xy(generate_img))
    return 0.5 * loss_in + 0.5 * loss_in2 + 6.0 * loss_grad


def fusion_loss4(image_ir, image_vis, generate_img, mask=None):
    """Fusionloss4 (:537-552): average-target intensity + gradient."""
    y, ir = _y(image_vis), _y(image_ir)
    syn = (y + ir) / 2.0
    return _l1(syn, generate_img) + 4.0 * _l1(sobel_xy(syn), sobel_xy(generate_img))


def fusion_loss_add(image_ir, image_vis, generate_img, mask=None):
    """Fusionloss_add (:554-571): weighted-sum target."""
    y, ir = _y(image_vis), _y(image_ir)
    loss_in = _l1(0.4 * y + 0.6 * ir, generate_img)
    grad_joint = jnp.maximum(sobel_xy(y), sobel_xy(ir))
    loss_grad = _l1(grad_joint, sobel_xy(generate_img))
    return 1.5 * loss_in + 5.0 * loss_grad


def new_loss_sobel(ir, vis, mask_ir, fused):
    """new_loss_sobel (:386-397). Faithful to the reference, including its
    quirk: after the first two terms, mask_ir/mask_vis have been REBOUND to
    scalar losses, so the gradient terms scale Sobel maps by those scalars
    (and 'L1loss' is actually MSE)."""
    mask_vis = jnp.abs(1.0 - mask_ir)
    m_ir = _mse(mask_ir * fused, mask_ir * ir)
    m_vis = _mse(mask_vis * fused, mask_vis * vis)
    m_ir2 = _mse(m_ir * sobel_xy(fused), m_ir * sobel_xy(ir))
    m_vis2 = _mse(m_vis * sobel_xy(fused), m_vis * sobel_xy(vis))
    return (m_vis + m_vis2) * 1.0 + (m_ir + m_ir2) * 0.85


def total_fusion_loss(image_ir, image_vis, mask, generate_img):
    """Total_fusion_loss (:573-582): 1.2*Fusionloss + 0.85*new_loss_sobel."""
    y, ir = _y(image_vis), _y(image_ir)
    return fusion_loss(ir, y, generate_img) * 1.2 + new_loss_sobel(ir, y, mask, generate_img) * 0.85


def total_fusion_loss2(image_ir, image_vis, mask, generate_img):
    """Total_fusion_loss2 (:585-593)."""
    return new_loss_sobel(_y(image_ir), _y(image_vis), mask, generate_img)


def total_fusion_loss3(image_ir, image_vis, mask, generate_img):
    """Total_fusion_loss3 (:595-603)."""
    return fusion_loss(_y(image_ir), _y(image_vis), generate_img) * 3.0


def iqa_loss(lr, vis, mask):
    """IQALoss (:605-633): entropy/std weights are computed (and discarded,
    as in the reference); the returned value is MSE + gradient MSE against
    the mask split."""
    lr, vis, m = _y(lr), _y(vis), _y(mask)
    inv = jnp.abs(1.0 - m)
    _ = patch_entropy(m), patch_entropy(inv)  # reference computes these too
    mse = 0.5 * _mse(lr, m) + 0.5 * _mse(vis, inv)
    grad = 0.5 * _mse(sobel_xy(lr), sobel_xy(m)) + 0.5 * _mse(sobel_xy(vis), sobel_xy(inv))
    return mse + grad


FUSION_LOSSES = {
    "fusion": fusion_loss,
    "fusion2": fusion_loss2,
    "fusion3": fusion_loss3,
    "fusion4": fusion_loss4,
    "fusion6": fusion_loss6,
    "fusion_add": fusion_loss_add,
    "grad": fusion_loss_grad,
    "grad2": fusion_loss_grad2,
    "grad3": fusion_loss_grad3,
}
