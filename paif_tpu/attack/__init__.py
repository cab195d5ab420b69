"""Adversarial attack engine: jit-compiled PGD-family input perturbations."""

from paif_tpu.attack.pgd import (
    AttackConfig,
    make_attack_both,
    make_attack_single,
    make_fusion_pgd,
    make_fgsm_ir,
    seg_attack_loss,
)

__all__ = [
    "AttackConfig",
    "make_attack_both",
    "make_attack_single",
    "make_fusion_pgd",
    "make_fgsm_ir",
    "seg_attack_loss",
]
