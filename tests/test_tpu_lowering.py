"""TPU (Mosaic) front-end lowering of the Pallas kernels WITHOUT a chip:
jax.export with platforms=['tpu'] runs the full StableHLO+Mosaic-MLIR
lowering, catching block-spec/grid/index-map/kernel-structure errors that
interpret-mode tests cannot (the residual on-chip risk is only the Mosaic
backend compile + VMEM fit). Flagship shapes."""

import jax
import jax.numpy as jnp
import pytest
from jax import export

import paif_tpu.ops.pallas.box_filter as bf
from paif_tpu.ops.guided_filter import _gf_forward


@pytest.fixture(autouse=True)
def _tpu_trace(monkeypatch):
    # the kernels pick interpret mode off default_backend at trace time;
    # force the real-kernel branch for the lowering-only trace
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("PAIF_PALLAS_BOX", "1")
    monkeypatch.setenv("PAIF_FUSED_GF_BOX", "1")


X = jnp.zeros((16, 240, 320, 128), jnp.bfloat16)
G4 = jnp.zeros((16, 240, 320, 4), jnp.bfloat16)


def _lower(fn, *args):
    return export.export(jax.jit(fn), platforms=["tpu"])(*args)


def test_single_box_lowers():
    _lower(lambda a: bf._box_fwd_impl(a, 4), X)


def test_fused_pair_prod_lowers():
    _lower(lambda a, b: bf._pair_prod_impl(a, b, 4), X, X)


def test_fused_multi_lowers_k2_and_k4(monkeypatch):
    _lower(lambda a, b: bf._multi_box_impl((a, b), 4), X, X)
    monkeypatch.setenv("PAIF_FUSED_GF_K", "4")
    _lower(lambda a, b: bf._multi_box_impl((a, b, a, b), 4), X, X)


def test_fused_per_scratch_lowers(monkeypatch):
    monkeypatch.setenv("PAIF_FUSED_GF_SCRATCH", "per")
    _lower(lambda a, b: bf._pair_prod_impl(a, b, 4), X, X)


def test_fused_r2_lowers():
    x2 = jnp.zeros((16, 120, 160, 128), jnp.bfloat16)
    _lower(lambda a, b: bf._multi_box_impl((a, b), 2), x2, x2)


def test_full_fused_gf_forward_lowers():
    _lower(lambda g, s: _gf_forward(True, 4, (1e-3, 1e-4), g, s)[0], G4, X)


def test_optin_research_kernels_lower(monkeypatch):
    """The opt-in kernels (zconv, SR-attention) must keep lowering for TPU
    even while defaulted off — they are measured research paths the next
    round may re-enable."""
    monkeypatch.setenv("PAIF_PALLAS_ZCONV", "1")
    from paif_tpu.ops.pallas.sr_attention import sr_attention
    from paif_tpu.ops.pallas.zconv import zconv

    w = jnp.zeros((3, 3, 32, 32), jnp.bfloat16)
    _lower(lambda a, ww: zconv(a, ww), X, w)
    q = jnp.zeros((16, 19200, 64), jnp.bfloat16)
    kv = jnp.zeros((16, 300, 64), jnp.bfloat16)
    _lower(lambda a, b, c: sr_attention(a, b, c, 0.125), q, kv, kv)


def test_gf_grad_box_diff_lowers(monkeypatch):
    """The PAIF_PALLAS_BOX_DIFF config — fused Pallas boxes inside the
    DIFFERENTIATED guided filter (custom-vjp fwd + analytic bwd), the
    round-4 attack-leg candidate — must lower front-to-back for TPU
    (grad graph included). Backend compile + VMEM fit stay chip-gated."""
    monkeypatch.setenv("PAIF_PALLAS_BOX_DIFF", "1")
    from paif_tpu.ops.guided_filter import guided_filter_multi_eps
    from paif_tpu.ops.packed import packed_mode

    def loss(g, s):
        with packed_mode():
            outs = guided_filter_multi_eps(g, s, 4, (1e-3, 1e-4))
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    _lower(jax.grad(loss, argnums=(0, 1)), G4, X)
