"""PyTorch state-dict -> flax variables importer.

The reference ships .pth checkpoints (test_original.py:715, robust_test.py:259)
whose weights must produce bit-comparable outputs here. We generate, from the
model configuration, an explicit (flax_path <- torch_key, transform) table —
this doubles as executable documentation of the architecture correspondence —
then materialize the flax variables dict.

Weight layout transforms:
  * conv:      torch OIHW      -> flax HWIO (works for depthwise too)
  * dense:     torch (out,in)  -> flax (in,out)
  * conv1d:    torch (1,1,k)   -> flax (k,1,1)
  * raw:       PReLU alpha / LayerNorm / BatchNorm vectors unchanged
BatchNorm running stats land in the 'batch_stats' collection.

The reference robust checkpoint loads with strict=False (robust_test.py:263);
this importer likewise tolerates and reports missing/unused keys.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Dict, Iterable, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from paif_tpu.genotype import Genotype
from paif_tpu.models.mit import MIT_CONFIGS
from paif_tpu.nn.ops_registry import parse_op_string

log = logging.getLogger(__name__)

CONV, DENSE, CONV1D, DECONV, RAW = "conv", "dense", "conv1d", "deconv", "raw"


@dataclass(frozen=True)
class Entry:
    collection: str  # 'params' | 'batch_stats'
    flax_path: Tuple[str, ...]
    torch_key: str
    kind: str = RAW


def _transform(kind: str, w: np.ndarray) -> np.ndarray:
    if kind == CONV:
        return np.transpose(w, (2, 3, 1, 0))
    if kind == DENSE:
        return np.transpose(w, (1, 0))
    if kind == CONV1D:
        return np.transpose(w, (2, 1, 0))
    if kind == DECONV:
        # ConvTranspose2d weight (in, out, kh, kw) -> lhs-dilated-conv HWIO
        # with spatially flipped taps (see nn.support.ConvTranspose2dTorch)
        return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()
    return w


def _bn(flax_prefix: Tuple[str, ...], torch_prefix: str) -> List[Entry]:
    return [
        Entry("params", flax_prefix + ("scale",), torch_prefix + ".weight"),
        Entry("params", flax_prefix + ("bias",), torch_prefix + ".bias"),
        Entry("batch_stats", flax_prefix + ("mean",), torch_prefix + ".running_mean"),
        Entry("batch_stats", flax_prefix + ("var",), torch_prefix + ".running_var"),
    ]


def _ln(flax_prefix: Tuple[str, ...], torch_prefix: str) -> List[Entry]:
    return [
        Entry("params", flax_prefix + ("scale",), torch_prefix + ".weight"),
        Entry("params", flax_prefix + ("bias",), torch_prefix + ".bias"),
    ]


def _dense(flax_prefix: Tuple[str, ...], torch_prefix: str, bias: bool = True) -> List[Entry]:
    out = [Entry("params", flax_prefix + ("kernel",), torch_prefix + ".weight", DENSE)]
    if bias:
        out.append(Entry("params", flax_prefix + ("bias",), torch_prefix + ".bias"))
    return out


def _conv(flax_prefix: Tuple[str, ...], torch_prefix: str, bias: bool = False) -> List[Entry]:
    out = [Entry("params", flax_prefix + ("kernel",), torch_prefix + ".weight", CONV)]
    if bias:
        out.append(Entry("params", flax_prefix + ("bias",), torch_prefix + ".bias"))
    return out


def op_entries(primitive: str, fp: Tuple[str, ...], tp: str) -> List[Entry]:
    """Entries for one genotype op. fp: flax prefix; tp: torch MixedOp._op prefix."""
    name, _k, _d = parse_op_string(primitive)
    e: List[Entry] = []
    if name == "Denseblocks":
        for i in (1, 2, 3):
            e += _conv(fp + (f"conv{i}", "conv"), f"{tp}.conv{i}.conv")
        e.append(Entry("params", fp + ("act", "alpha"), f"{tp}.lrelu.weight"))
    elif name == "Residualblocks":
        e += _conv(fp + ("conv_a", "conv"), f"{tp}.op.0.conv")
        e += _conv(fp + ("conv_b",), f"{tp}.op.1")
        e += _conv(fp + ("conv_c",), f"{tp}.op.2")
        e += _bn(fp + ("norm",), f"{tp}.op.3")
        e.append(Entry("params", fp + ("act", "alpha"), f"{tp}.op.4.weight"))
    elif name == "ECAattention":
        e += _conv(fp + ("conv1",), f"{tp}.conv1")
        e += _conv(fp + ("conv2", "conv"), f"{tp}.conv2.conv")
        e.append(Entry("params", fp + ("se", "conv1d", "kernel"), f"{tp}.se.conv.weight", CONV1D))
        e.append(Entry("params", fp + ("act", "alpha"), f"{tp}.relu.weight"))
    elif name == "SPAattention":
        e += _conv(fp + ("conv1",), f"{tp}.conv1")
        e += _conv(fp + ("conv2", "conv"), f"{tp}.conv2.conv")
        e += _conv(fp + ("se", "spatial", "conv"), f"{tp}.se.spatial.conv")
        e.append(Entry("params", fp + ("act", "alpha"), f"{tp}.relu.weight"))
    elif name == "DilConv":
        e += _conv(fp + ("dw", "conv"), f"{tp}.op.1.conv")
        e += _conv(fp + ("pw",), f"{tp}.op.2")
        e += _bn(fp + ("norm",), f"{tp}.op.3")
    elif name == "SepConv":
        for j, (dw, pw, norm) in enumerate((("dw0", "pw0", "norm0"), ("dw1", "pw1", "norm1"))):
            base = 1 + 4 * j
            e += _conv(fp + (dw,), f"{tp}.op.{base}")
            e += _conv(fp + (pw,), f"{tp}.op.{base + 1}")
            e += _bn(fp + (norm,), f"{tp}.op.{base + 2}")
    elif name == "SelAttention":
        e += _conv(fp + ("conv_in",), f"{tp}.conv", bias=True)
        e += _conv(fp + ("conv_out",), f"{tp}.conv2", bias=True)
        e += _dense(fp + ("to_qkv",), f"{tp}.cross_attn.to_qkv", bias=False)
        e += _dense(fp + ("to_out",), f"{tp}.cross_attn.to_out.0")
        e += _ln(fp + ("norm",), f"{tp}.norm1")
        e.append(Entry("params", fp + ("act", "alpha"), f"{tp}.prelu.weight"))
    else:  # pragma: no cover
        raise KeyError(name)
    return e


def chain_entries(ops: Sequence[str], fp: Tuple[str, ...], tp: str) -> List[Entry]:
    """CellChain: flax op{i} <- torch _ops.{i}._op."""
    e: List[Entry] = []
    for i, primitive in enumerate(ops):
        e += op_entries(primitive, fp + (f"op{i}",), f"{tp}._ops.{i}._op")
    return e


def fusion_entries(
    genotype: Genotype, fp: Tuple[str, ...] = (), tp: str = ""
) -> List[Entry]:
    """Network_Fusion_Searched <-> FusionNetSearched correspondence."""
    p = tp  # torch prefix like "enhance_net." or ""
    e: List[Entry] = []
    e += _conv(fp + ("stem_1",), f"{p}stem_1.0")
    e.append(Entry("params", fp + ("stem_1_act", "alpha"), f"{p}stem_1.1.weight"))
    e += _conv(fp + ("stem_2",), f"{p}stem_2.0")
    e.append(Entry("params", fp + ("stem_2_act", "alpha"), f"{p}stem_2.1.weight"))
    e += _conv(fp + ("stem_out_0",), f"{p}stem_out.0")
    e += _conv(fp + ("stem_out_1",), f"{p}stem_out.1")
    e.append(Entry("params", fp + ("stem_out_act", "alpha"), f"{p}stem_out.2.weight"))
    e += _conv(fp + ("spa", "spatial", "conv"), f"{p}spa.spatial.conv")
    e += _conv(fp + ("decompation", "conv1x1_lf"), f"{p}decompation.conv1x1_lf", bias=True)
    e += _conv(fp + ("decompation", "conv1x1_hf"), f"{p}decompation.conv1x1_hf", bias=True)
    e += chain_entries(genotype.ops("normal_1"), fp + ("decompation", "chain"), f"{p}decompation.chain")
    e += chain_entries(genotype.ops("normal_2"), fp + ("decompation", "chain2"), f"{p}decompation.chain2")
    e += chain_entries(genotype.ops("normal_3"), fp + ("chain",), f"{p}chain")
    return e


def segformer_entries(
    backbone: str = "mit_b3", fp: Tuple[str, ...] = (), tp: str = ""
) -> List[Entry]:
    """WeTr (encoder+decoder) <-> SegFormer correspondence."""
    _dims, _heads, depths, srs, _mlp, _dp = MIT_CONFIGS[backbone]
    p = tp
    e: List[Entry] = []
    for s in range(1, 5):
        pe = fp + ("encoder", f"patch_embed{s}")
        e += _conv(pe + ("proj",), f"{p}encoder.patch_embed{s}.proj", bias=True)
        e += _ln(pe + ("norm",), f"{p}encoder.patch_embed{s}.norm")
        for i in range(depths[s - 1]):
            bf = fp + ("encoder", f"block{s}_{i}")
            bt = f"{p}encoder.block{s}.{i}"
            e += _ln(bf + ("norm1",), f"{bt}.norm1")
            e += _ln(bf + ("norm2",), f"{bt}.norm2")
            e += _dense(bf + ("attn", "q"), f"{bt}.attn.q")
            e += _dense(bf + ("attn", "kv"), f"{bt}.attn.kv")
            e += _dense(bf + ("attn", "proj"), f"{bt}.attn.proj")
            if srs[s - 1] > 1:
                e += _conv(bf + ("attn", "sr"), f"{bt}.attn.sr", bias=True)
                e += _ln(bf + ("attn", "sr_norm"), f"{bt}.attn.norm")
            e += _dense(bf + ("mlp", "fc1"), f"{bt}.mlp.fc1")
            e += _conv(bf + ("mlp", "dwconv"), f"{bt}.mlp.dwconv.dwconv", bias=True)
            e += _dense(bf + ("mlp", "fc2"), f"{bt}.mlp.fc2")
        e += _ln(fp + ("encoder", f"norm{s}"), f"{p}encoder.norm{s}")
    for k in range(1, 5):
        e += _dense(fp + ("decoder", f"linear_c{k}"), f"{p}decoder.linear_c{k}.proj")
    e += _conv(fp + ("decoder", "linear_fuse"), f"{p}decoder.linear_fuse.conv")
    e += _bn(fp + ("decoder", "fuse_norm"), f"{p}decoder.linear_fuse.bn")
    e += _conv(fp + ("decoder", "linear_pred"), f"{p}decoder.linear_pred", bias=True)
    return e


def joint_entries(genotype: Genotype, backbone: str = "mit_b3") -> List[Entry]:
    """Network_MM_Searched / Network_MM_CompModel <-> PAIFJoint."""
    return fusion_entries(genotype, ("enhance_net",), "enhance_net.") + segformer_entries(
        backbone, ("denoise_net",), "denoise_net."
    )


def to_flax_variables(
    state_dict: Mapping[str, np.ndarray],
    entries: Iterable[Entry],
    template: Optional[dict] = None,
) -> dict:
    """Materialize {'params': ..., 'batch_stats': ...} from a torch state dict.

    Missing torch keys are skipped with a log line (strict=False reference
    semantics); unused torch keys are reported. If `template` (a variables
    dict from model.init) is given, imported leaves must match its shapes and
    any template leaves NOT covered by entries are kept as initialized.
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    used = set()
    missing = []
    for ent in entries:
        w = state_dict.get(ent.torch_key)
        if w is None:
            missing.append(ent.torch_key)
            continue
        used.add(ent.torch_key)
        flat[(ent.collection,) + ent.flax_path] = _transform(ent.kind, np.asarray(w))

    unused = [
        k
        for k in state_dict
        if k not in used and not k.endswith("num_batches_tracked")
    ]
    if missing:
        log.warning("torch checkpoint missing %d keys (strict=False): %s...", len(missing), missing[:5])
    if unused:
        log.info("ignoring %d unused torch keys: %s...", len(unused), unused[:5])

    if template is not None:
        tflat = flatten_dict(template)
        for path, w in flat.items():
            if path not in tflat:
                raise KeyError(f"imported path {'/'.join(path)} not in model variables")
            if tuple(tflat[path].shape) != tuple(w.shape):
                raise ValueError(
                    f"shape mismatch at {'/'.join(path)}: model {tflat[path].shape} vs torch {w.shape}"
                )
        merged = dict(tflat)
        merged.update({p: w.astype(np.asarray(tflat[p]).dtype) for p, w in flat.items()})
        return unflatten_dict(merged)
    return unflatten_dict(flat)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file into numpy arrays (torch required only here)."""
    import torch  # local import: torch is NOT a runtime dependency

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
