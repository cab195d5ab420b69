"""Genotype description of the NAS-searched fusion cell structure.

The reference encodes a genotype as a namedtuple of (op_string, index) pairs
plus concat lists (robust_test.py:253-257). The indices and concat lists are
vestigial — Cell_Chain applies its ops strictly sequentially
(model_fusion_auto.py:439-445) — but we keep them in the schema so reference
genotype literals round-trip through configs unchanged.

PAIF_GENOTYPE is the published searched architecture
(robust_test.py:255-257 == test_original.py:711-713).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

OpEntry = Tuple[str, int]


@dataclass(frozen=True)
class Genotype:
    normal_1: Tuple[OpEntry, ...]  # low-frequency chain (inside Cell_Decom)
    normal_2: Tuple[OpEntry, ...]  # high-frequency chain (inside Cell_Decom)
    normal_3: Tuple[OpEntry, ...]  # post-aggregation refinement chain
    normal_1_concat: Tuple[int, ...] = (1, 2)
    normal_2_concat: Tuple[int, ...] = (1, 2)
    normal_3_concat: Tuple[int, ...] = (1, 2)

    def ops(self, which: str) -> Tuple[str, ...]:
        """Ordered op strings for chain 'normal_1' | 'normal_2' | 'normal_3'."""
        entries: Sequence[OpEntry] = getattr(self, which)
        return tuple(name for name, _idx in entries)

    def to_dict(self) -> dict:
        return {
            k: [list(e) for e in getattr(self, k)]
            if k.startswith("normal") and not k.endswith("concat")
            else list(getattr(self, k))
            for k in (
                "normal_1",
                "normal_1_concat",
                "normal_2",
                "normal_2_concat",
                "normal_3",
                "normal_3_concat",
            )
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Genotype":
        def entries(v: List) -> Tuple[OpEntry, ...]:
            return tuple((str(name), int(idx)) for name, idx in v)

        return cls(
            normal_1=entries(d["normal_1"]),
            normal_2=entries(d["normal_2"]),
            normal_3=entries(d["normal_3"]),
            normal_1_concat=tuple(d.get("normal_1_concat", (1, 2))),
            normal_2_concat=tuple(d.get("normal_2_concat", (1, 2))),
            normal_3_concat=tuple(d.get("normal_3_concat", (1, 2))),
        )


PAIF_GENOTYPE = Genotype(
    normal_1=(("Denseblocks_3_1", 0), ("DilConv_3_2", 1)),
    normal_2=(("Denseblocks_3_1", 0), ("Denseblocks_3_1", 1)),
    normal_3=(("ECAattention_3", 0), ("Residualblocks_7_1", 1)),
)
