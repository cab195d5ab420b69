"""Differentiable fusion-cell search (DARTS-style) over the reference's
candidate pool.

Search space: the commented PRIMITIVES_BLOCK list (operations_m.py:19-28).
The supernet mirrors FusionNetSearched's topology (stems, decomposition cell
with two chains, cross-modal gate, refinement chain, output head) but every
chain slot is a SuperMixedOp: sum_i softmax(alpha)_i * op_i(x). Architecture
parameters live in a separate 'arch' collection so the weight/arch updates
can be split (bilevel) or joint (single-level; default here).

All ops run every step (a dense mixture) — on TPU this is throughput-
friendly: the candidates are independent convs XLA schedules back-to-back;
no dynamic control flow enters the graph.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from paif_tpu.genotype import Genotype
from paif_tpu.nn.cells import CrossModalSpatialGate, decompose
from paif_tpu.nn.layers import Conv, PReLU
from paif_tpu.nn.ops_registry import make_op

# operations_m.py:19-28 (the reference's commented search-space list)
PRIMITIVES_BLOCK: Tuple[str, ...] = (
    "Residualblocks_3_2",
    "Residualblocks_5_2",
    "Residualblocks_7_2",
    "Denseblocks_3_2",
    "Denseblocks_5_2",
    "Denseblocks_7_1",
    "ECAattention_3",
    "SPAattention_3",
)


class SuperMixedOp(nn.Module):
    """Softmax-weighted mixture over the candidate primitives."""

    features: int
    primitives: Tuple[str, ...] = PRIMITIVES_BLOCK

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        alpha = self.param(
            "alpha",
            lambda key, shape: 1e-3 * jax.random.normal(key, shape),
            (len(self.primitives),),
        )
        # expose alphas under their own collection for bilevel optimization
        self.sow("arch", "alpha", alpha)
        w = jax.nn.softmax(alpha.astype(x.dtype))
        outs = [
            make_op(self.features, p, name=f"cand{i}")(x, train)
            for i, p in enumerate(self.primitives)
        ]
        return sum(w[i] * o for i, o in enumerate(outs))


class SuperChain(nn.Module):
    """Sequential SuperMixedOps with the CellChain outer residual."""

    features: int
    steps: int = 2
    primitives: Tuple[str, ...] = PRIMITIVES_BLOCK

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        s = x
        for i in range(self.steps):
            s = SuperMixedOp(self.features, self.primitives, name=f"op{i}")(s, train)
        return x + s


class SegProbe(nn.Module):
    """Tiny jointly-trained segmentation head on the fused output — the
    perception term of the search objective. The paper's premise is
    perception-AWARE fusion (the coupled loss surface is the reference's
    _loss = 0.1*fusion + 4*seg CE, model_fusion_auto.py:1093-1100); adding
    this probe's CE to the DARTS val objective makes the architecture
    gradient see segmentation utility, not just reconstruction."""

    num_classes: int
    width: int = 32

    @nn.compact
    def __call__(self, fused: jnp.ndarray) -> jnp.ndarray:
        x = PReLU(name="act")(Conv(self.width, 3, name="conv1")(fused))
        return Conv(self.num_classes, 1, use_bias=True, name="cls")(x)


class SuperFusionNet(nn.Module):
    """FusionNetSearched topology with searchable chains.

    seg_classes > 0 attaches a SegProbe to the fused output and returns
    (fused, seg_logits) instead of fused — the perception-aware search
    configuration (cli/search.py --seg_weight)."""

    features: int = 32
    steps: int = 2
    primitives: Tuple[str, ...] = PRIMITIVES_BLOCK
    seg_classes: int = 0

    @nn.compact
    def __call__(self, ir: jnp.ndarray, vis: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.features
        ir = ir[..., 0:1]
        vis = vis[..., 0:1]
        fir = PReLU(name="stem_1_act")(Conv(c, 3, name="stem_1")(ir))
        fvis = PReLU(name="stem_2_act")(Conv(c, 3, name="stem_2")(vis))

        lf_ir, hf_ir = decompose(fir)
        lf_vis, hf_vis = decompose(fvis)
        lf = Conv(c, 1, use_bias=True, name="conv1x1_lf")(jnp.concatenate([lf_ir, hf_ir], -1))
        hf = Conv(c, 1, use_bias=True, name="conv1x1_hf")(jnp.concatenate([lf_vis, hf_vis], -1))
        lf_re = SuperChain(c, self.steps, self.primitives, name="chain1")(lf, train) + fir
        hf_re = SuperChain(c, self.steps, self.primitives, name="chain2")(hf, train) + fvis

        gate = CrossModalSpatialGate(name="spa")(lf_re, hf_re, train)
        agg = gate * lf_re + (1.0 - gate) * hf_re
        refined = SuperChain(c, self.steps, self.primitives, name="chain3")(agg, train)
        out = Conv(c // 2, 3, name="stem_out_0")(refined)
        out = Conv(1, 3, name="stem_out_1")(out)
        fused = jnp.tanh(PReLU(name="stem_out_act")(out))
        if self.seg_classes:
            return fused, SegProbe(self.seg_classes, name="seg_probe")(fused)
        return fused


def _collect_alphas(params: Any) -> dict:
    """{chain_name: {op_name: alpha array}} from the supernet params."""
    out = {}
    for chain in ("chain1", "chain2", "chain3"):
        chain_params = params[chain]
        out[chain] = {
            op: chain_params[op]["alpha"] for op in sorted(chain_params) if op.startswith("op")
        }
    return out


def derive_genotype(params: Any, primitives: Sequence[str] = PRIMITIVES_BLOCK) -> Genotype:
    """Argmax over each slot's alphas -> reference-schema Genotype
    (chain1 -> normal_1, chain2 -> normal_2, chain3 -> normal_3)."""
    alphas = _collect_alphas(params)

    def entries(chain):
        es = []
        for i, (op, a) in enumerate(sorted(alphas[chain].items())):
            es.append((primitives[int(jnp.argmax(a))], i))
        return tuple(es)

    return Genotype(
        normal_1=entries("chain1"),
        normal_2=entries("chain2"),
        normal_3=entries("chain3"),
    )


class SearchState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def param_labels(params: Any) -> Any:
    """'arch' for the SuperMixedOp alpha leaves, 'weights' elsewhere."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: "arch" if str(p[-1].key if hasattr(p[-1], "key") else p[-1]) == "alpha"
        and not any("cand" in str(q) for q in p)
        else "weights",
        params,
    )


def create_search_state(
    model: SuperFusionNet, variables, lr: float = 1e-3, arch_lr_mult: float = 3.0
) -> SearchState:
    """Adam over weights + a faster Adam over the alpha parameters."""
    labels = param_labels(variables["params"])
    tx = optax.multi_transform(
        {"weights": optax.adam(lr), "arch": optax.adam(lr * arch_lr_mult)}, labels
    )
    return SearchState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )


def _search_loss(model, fusion_loss_fn, seg_weight, params, batch_stats, batch):
    """Search objective: fusion loss, plus seg_weight * probe CE when the
    supernet carries a SegProbe (batch then includes labels)."""
    out, mut = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch[0],
        batch[1],
        True,
        mutable=["batch_stats", "arch"],
    )
    if seg_weight:
        from paif_tpu.ops.losses import cross_entropy_ignore

        ir, vis, mask, labels = batch
        fused, seg = out
        loss = fusion_loss_fn(ir, vis, fused, mask) + seg_weight * cross_entropy_ignore(
            seg, labels
        )
    else:
        ir, vis, mask = batch
        loss = fusion_loss_fn(ir, vis, out, mask)
    return loss, mut["batch_stats"]


def make_search_step(model: SuperFusionNet, fusion_loss_fn, seg_weight: float = 0.0):
    """Single-level DARTS: one Adam step over weights AND alphas against the
    search objective. fn(state, *batch) -> (state, loss)."""

    def loss_fn(params, state, *batch):
        return _search_loss(model, fusion_loss_fn, seg_weight, params, state.batch_stats, batch)

    @jax.jit
    def step(state: SearchState, *batch):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, *batch
        )
        updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=params, batch_stats=new_bs, opt_state=opt_state),
            loss,
        )

    return step


def make_bilevel_search_step(model: SuperFusionNet, fusion_loss_fn, seg_weight: float = 0.0):
    """First-order bilevel DARTS (Liu et al. 2019, the practical xi=0 rule):
    weights step on the TRAIN split with alphas frozen, alphas step on the
    VAL split with weights frozen. Realized as one fused jitted update —
    both gradient passes run back-to-back on device and a single
    multi_transform update consumes the merged gradient tree (train grads
    for 'weights' leaves, val grads for 'arch' leaves), so the two-split
    recipe costs one XLA dispatch per step.

    With seg_weight > 0 both objectives carry the SegProbe CE term — the
    VAL gradient (which drives the alphas) then optimizes perception, the
    paper's actual premise (coupled loss: model_fusion_auto.py:1093-1100).

    fn(state, train_batch, val_batch) -> (state, train_loss, val_loss);
    batches are (ir, vis, mask) or (ir, vis, mask, labels) with seg_weight.
    """

    def loss_fn(params, state, *batch):
        return _search_loss(model, fusion_loss_fn, seg_weight, params, state.batch_stats, batch)

    @jax.jit
    def step(state: SearchState, train_batch, val_batch):
        (train_loss, new_bs), g_train = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, *train_batch
        )
        (val_loss, _), g_val = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, *val_batch
        )
        labels = param_labels(state.params)
        grads = jax.tree_util.tree_map(
            lambda lbl, gt, gv: gv if lbl == "arch" else gt, labels, g_train, g_val
        )
        updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1, params=params, batch_stats=new_bs, opt_state=opt_state
            ),
            train_loss,
            val_loss,
        )

    return step
