"""Prover configuration — this framework's frozen protocol constants.

Reference analogue: ``PcsConfig::default()`` of stwo rev 0790eba,
consumed at `/root/reference/prover/src/machine.rs:184`. The reference
pins its constants inside the (out-of-tree) stwo crate; ours are fixed
here: conjectured soundness ~ n_queries * log_blowup + pow_bits bits.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..ops.fri import FriConfig

__all__ = ["PcsConfig"]


@dataclass(frozen=True)
class PcsConfig:
    pow_bits: int = 16
    fri: FriConfig = field(default_factory=FriConfig)

    @property
    def security_bits(self) -> int:
        return self.pow_bits + self.fri.log_blowup * self.fri.n_queries
