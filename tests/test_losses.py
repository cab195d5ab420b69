"""Loss parity against the reference implementations (torch CPU)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from tests.reference_stubs import install_reference_stubs

install_reference_stubs()

from paif_tpu.losses import (  # noqa: E402
    fusion_loss,
    fusion_loss4,
    fusion_loss6,
    fusion_loss_add,
    fusion_loss_grad2,
    fusion_loss_grad3,
    normal_loss,
    ohem_ce_loss,
    softmax_focal_loss,
)

B, H, W = 2, 16, 16


@pytest.fixture
def imgs(rng):
    ir = rng.uniform(0, 1, (B, 1, H, W)).astype(np.float32)
    vis = rng.uniform(0, 1, (B, 1, H, W)).astype(np.float32)
    gen = rng.uniform(0, 1, (B, 1, H, W)).astype(np.float32)
    mask = rng.uniform(0, 1, (B, 1, H, W)).astype(np.float32)
    return ir, vis, gen, mask


def j(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


def t(x):
    return torch.from_numpy(x)


def test_fusion_losses_parity(imgs):
    from core import loss as ref

    ir, vis, gen, mask = imgs
    cases = [
        (fusion_loss, ref.Fusionloss(), False),
        (fusion_loss_grad2, ref.Fusionloss_grad2(), True),
        (fusion_loss_grad3, ref.Fusionloss_grad3(), True),
        (fusion_loss6, ref.Fusionloss6(), True),
        (fusion_loss4, ref.Fusionloss4(), True),
        (fusion_loss_add, ref.Fusionloss_add(), False),
    ]
    for mine, theirs, with_mask in cases:
        with torch.no_grad():
            if with_mask:
                want = float(theirs(t(ir), t(vis), t(gen), t(mask)))
            else:
                want = float(theirs(t(ir), t(vis), t(gen)))
        got = float(mine(j(ir), j(vis), j(gen), j(mask)))
        assert abs(got - want) < 5e-5, f"{mine.__name__}: {got} vs {want}"


def test_seg_losses_parity(rng):
    from core import loss as ref

    logits = rng.normal(0, 2, (B, 9, H, W)).astype(np.float32)
    labels = rng.integers(0, 9, (B, H, W)).astype(np.int64)
    labels[0, :2, :] = 255

    with torch.no_grad():
        want_normal = float(ref.NormalLoss()(t(logits), t(labels)))
        want_focal = float(ref.SoftmaxFocalLoss(gamma=2.0)(t(logits), t(labels)))
        want_ohem = float(ref.OhemCELoss(thresh=0.7, n_min=40)(t(logits), t(labels)))
        want_ohem_hi = float(ref.OhemCELoss(thresh=0.05, n_min=40)(t(logits), t(labels)))

    jl = jnp.asarray(logits.transpose(0, 2, 3, 1))
    jlab = jnp.asarray(labels)
    assert abs(float(normal_loss(jl, jlab)) - want_normal) < 1e-5
    assert abs(float(softmax_focal_loss(jl, jlab, 2.0)) - want_focal) < 1e-5
    assert abs(float(ohem_ce_loss(jl, jlab, 0.7, 40)) - want_ohem) < 1e-5
    # high threshold (-log(.05) large) -> top-n_min branch
    assert abs(float(ohem_ce_loss(jl, jlab, 0.05, 40)) - want_ohem_hi) < 1e-5


def test_fusion_loss_variants_parity(imgs):
    """VERDICT r1 partial #31: new_loss_sobel / Fusionloss2/3 /
    Total_fusion_loss{,2,3} / IQALoss value parity (incl. the reference's
    scalar-rebinding quirk in new_loss_sobel)."""
    from core import loss as ref

    from paif_tpu.losses import (
        fusion_loss2,
        fusion_loss3,
        iqa_loss,
        new_loss_sobel,
        total_fusion_loss,
        total_fusion_loss2,
        total_fusion_loss3,
    )

    ir, vis, gen, mask = imgs

    with torch.no_grad():
        cases = [
            (new_loss_sobel(j(ir), j(vis), j(mask), j(gen)),
             ref.new_loss_sobel()(t(ir), t(vis), t(mask), t(gen))),
            (fusion_loss2(j(ir), j(vis), j(gen), j(mask)),
             ref.Fusionloss2()(t(ir), t(vis), t(gen), t(mask))),
            (fusion_loss3(j(ir), j(vis), j(gen), j(mask)),
             ref.Fusionloss3()(t(ir), t(vis), t(gen), t(mask))),
            (total_fusion_loss(j(ir), j(vis), j(mask), j(gen)),
             ref.Total_fusion_loss()(t(ir), t(vis), t(mask), t(gen))),
            (total_fusion_loss2(j(ir), j(vis), j(mask), j(gen)),
             ref.Total_fusion_loss2()(t(ir), t(vis), t(mask), t(gen))),
            (total_fusion_loss3(j(ir), j(vis), j(mask), j(gen)),
             ref.Total_fusion_loss3()(t(ir), t(vis), t(mask), t(gen))),
            (iqa_loss(j(ir), j(vis), j(mask)),
             ref.IQALoss()(t(ir), t(vis), t(mask))),
        ]
    for i, (got, want) in enumerate(cases):
        assert abs(float(got) - float(want)) < 5e-5, f"case {i}: {float(got)} vs {float(want)}"
