"""LogUp lookup relations: channel-drawn randomness + tuple combination.

Counterpart of stwo's ``relation!`` macro / ``LookupElements`` (drawn at
`/root/reference/prover/src/machine.rs:239-240`, registry at
`/root/reference/prover/src/components/lookups.rs:37-57`): a relation is
a named tuple shape; the channel draws (z, alpha) per relation and a
tuple (v_0..v_{w-1}) combines to the LogUp denominator

    combine(v) = sum_j alpha^j * v_j  -  z        (all QM31)

Every component emitting or consuming a tuple of the relation adds the
fraction  mult / combine(v)  to its LogUp column set; the grand sum over
all components must be zero (multiset equality).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..ops.field import np_qm31_mul, np_qm31
from .expr import Felt

__all__ = ["LookupElements", "draw_relations"]


@dataclass
class LookupElements:
    name: str
    width: int
    z: np.ndarray            # (4,) uint64
    alpha_pows: np.ndarray   # (width, 4) uint64: alpha^0 .. alpha^(w-1)

    @classmethod
    def draw(cls, channel, name: str, width: int) -> "LookupElements":
        z = np.asarray(channel.draw_felt(), np.uint64)
        alpha = np.asarray(channel.draw_felt(), np.uint64)
        pows = [np_qm31(np.uint64(1))]
        for _ in range(width - 1):
            pows.append(np_qm31_mul(pows[-1], alpha))
        return cls(name=name, width=width, z=z,
                   alpha_pows=np.stack(pows, axis=0))

    @classmethod
    def dummy(cls, name: str, width: int) -> "LookupElements":
        """Deterministic stand-in for shape-collection (info) runs."""
        z = np_qm31(np.uint64(2), np.uint64(3), np.uint64(5), np.uint64(7))
        pows = [np_qm31(np.uint64(1))]
        alpha = np_qm31(np.uint64(11), np.uint64(13), np.uint64(17),
                        np.uint64(19))
        for _ in range(width - 1):
            pows.append(np_qm31_mul(pows[-1], alpha))
        return cls(name=name, width=width, z=z,
                   alpha_pows=np.stack(pows, axis=0))

    def combine(self, values, be) -> Felt:
        """values: list[Felt] (len <= width) -> QM31 denominator Felt."""
        assert len(values) <= self.width, \
            f"relation {self.name}: tuple wider than {self.width}"
        acc = None
        for j, v in enumerate(values):
            if not isinstance(v, Felt):
                v = Felt.const(int(v), be)
            # alpha^0 = 1: skip the multiply (big graph saving for the
            # many width-1 range-check relations)
            term = v if j == 0 else \
                Felt.qconst(self.alpha_pows[j], be) * v
            acc = term if acc is None else acc + term
        return acc - Felt.qconst(self.z, be)


def draw_relations(channel, widths: dict) -> dict:
    """Draw all relations in canonical (sorted-name) order."""
    return {name: LookupElements.draw(channel, name, widths[name])
            for name in sorted(widths)}
