"""AIR constraint framework: Felt algebra, components, LogUp lookups.

The TPU-native counterpart of stwo's constraint framework
(`FrameworkEval` / `EvalAtRow` / `LogupTraceGenerator`, consumed at
`/root/reference/prover/src/components/mod.rs:3` and
`/root/reference/prover/src/traits.rs:16`): a component's single
``evaluate`` method is the one source of truth, executed by three
interchangeable contexts — interaction-trace generation (vectorized
device arrays), composition evaluation on the extended domain, and the
verifier's out-of-domain point check (host scalars).
"""

from .expr import Felt, JNP, NP
from .lookups import LookupElements
from .component import (
    Component, ComponentInfo, component_info, GenContext,
    DomainEvalContext, PointEvalContext, generate_interaction,
)
