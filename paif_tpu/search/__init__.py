"""Architecture search for the fusion cells.

The reference released only the searched result (the genotype literal) and
the searchable op library — its search code is unreleased (README.md:47-48).
This module rebuilds that capability TPU-first: a supernet whose chain slots
hold softmax-weighted mixtures over the candidate primitives
(operations_m.py:19-28 PRIMITIVES_BLOCK), differentiable architecture
parameters optimized jointly (single-level) or on a held-out split
(first-order bilevel DARTS, make_bilevel_search_step), and genotype
derivation by argmax.
"""

from paif_tpu.search.darts import (
    PRIMITIVES_BLOCK,
    SuperMixedOp,
    SuperChain,
    SuperFusionNet,
    derive_genotype,
    make_search_step,
    make_bilevel_search_step,
    SearchState,
    create_search_state,
)

__all__ = [
    "PRIMITIVES_BLOCK",
    "SuperMixedOp",
    "SuperChain",
    "SuperFusionNet",
    "derive_genotype",
    "make_search_step",
    "make_bilevel_search_step",
    "SearchState",
    "create_search_state",
]
