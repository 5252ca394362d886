"""Felt: field-element expressions over a dual M31/QM31, device/host backend.

AIR constraints are written once against ``Felt`` operator overloading
and run in three places (see `air/component.py`):

* prover interaction-gen / composition eval — payloads are jnp arrays
  over all rows (M31 shape ``(M,)``, QM31 shape ``(M, 4)``),
* verifier OODS check — payloads are numpy scalars (``()`` / ``(4,)``).

Mixed-kind arithmetic picks the cheap path (``qm31 * m31`` is 4 modular
multiplies, not a full QM31 product). ``deg`` tracks the algebraic
degree of the expression in committed columns so ``constraint()`` can
enforce the composition degree bound (reference analogue:
``LOG_CONSTRAINT_DEGREE = 2`` at
`/root/reference/prover/src/components/mod.rs:13-67`).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..ops import field as F

__all__ = ["Felt", "JNP", "NP"]


class _JnpBackend:
    name = "jnp"

    @staticmethod
    def m31_add(a, b):
        return F.m31_add(a, b)

    @staticmethod
    def m31_sub(a, b):
        return F.m31_sub(a, b)

    @staticmethod
    def m31_mul(a, b):
        return F.m31_mul(a, b)

    @staticmethod
    def m31_neg(a):
        return F.m31_neg(a)

    @staticmethod
    def qm31_mul(a, b):
        return F.qm31_mul(a, b)

    @staticmethod
    def qm31_mul_m31(q, m):
        return F.qm31_mul_m31(q, m)

    @staticmethod
    def embed(m):
        return F.qm31_from_m31(m)

    @staticmethod
    def const(x):
        return jnp.uint32(int(x) % F.P)

    @staticmethod
    def qconst(x):
        return jnp.asarray(x).astype(jnp.uint32)


class _NpBackend:
    name = "np"

    @staticmethod
    def m31_add(a, b):
        return F.np_m31_add(np.asarray(a, np.uint64), np.asarray(b, np.uint64))

    @staticmethod
    def m31_sub(a, b):
        return F.np_m31_sub(np.asarray(a, np.uint64), np.asarray(b, np.uint64))

    @staticmethod
    def m31_mul(a, b):
        return F.np_m31_mul(np.asarray(a, np.uint64), np.asarray(b, np.uint64))

    @staticmethod
    def m31_neg(a):
        return F.np_m31_neg(np.asarray(a, np.uint64))

    @staticmethod
    def qm31_mul(a, b):
        return F.np_qm31_mul(a, b)

    @staticmethod
    def qm31_mul_m31(q, m):
        return F.np_m31_mul(np.asarray(q, np.uint64),
                            np.asarray(m, np.uint64)[..., None])

    @staticmethod
    def embed(m):
        return F.np_qm31(np.asarray(m, np.uint64))

    @staticmethod
    def const(x):
        return np.uint64(int(x) % F.P)

    @staticmethod
    def qconst(x):
        return np.asarray(x, np.uint64)


JNP = _JnpBackend()
NP = _NpBackend()


@dataclass
class Felt:
    v: object          # jnp/np payload
    kind: str          # 'm31' | 'qm31'
    be: object         # JNP or NP
    deg: int = 1       # algebraic degree in committed columns

    # -- constructors --------------------------------------------------
    @staticmethod
    def const(x: int, be) -> "Felt":
        return Felt(be.const(x), "m31", be, deg=0)

    @staticmethod
    def qconst(x, be) -> "Felt":
        return Felt(be.qconst(x), "qm31", be, deg=0)

    def _coerce(self, o) -> "Felt":
        if isinstance(o, Felt):
            return o
        return Felt.const(int(o), self.be)

    # -- arithmetic ----------------------------------------------------
    def _addsub(self, o, fn):
        o = self._coerce(o)
        a, b = self, o
        if a.kind == b.kind:
            v = fn(a.v, b.v)
            kind = a.kind
        elif a.kind == "m31":
            v = fn(self.be.embed(a.v), b.v)
            kind = "qm31"
        else:
            v = fn(a.v, self.be.embed(b.v))
            kind = "qm31"
        return Felt(v, kind, self.be, max(a.deg, b.deg))

    def __add__(self, o):
        return self._addsub(o, self.be.m31_add)

    def __radd__(self, o):
        return self._coerce(o).__add__(self)

    def __sub__(self, o):
        return self._addsub(o, self.be.m31_sub)

    def __rsub__(self, o):
        return self._coerce(o).__sub__(self)

    def __neg__(self):
        return Felt(self.be.m31_neg(self.v), self.kind, self.be, self.deg)

    def __mul__(self, o):
        o = self._coerce(o)
        a, b = self, o
        deg = a.deg + b.deg
        if a.kind == "m31" and b.kind == "m31":
            return Felt(self.be.m31_mul(a.v, b.v), "m31", self.be, deg)
        if a.kind == "qm31" and b.kind == "qm31":
            return Felt(self.be.qm31_mul(a.v, b.v), "qm31", self.be, deg)
        q, m = (a, b) if a.kind == "qm31" else (b, a)
        return Felt(self.be.qm31_mul_m31(q.v, m.v), "qm31", self.be, deg)

    def __rmul__(self, o):
        return self.__mul__(o)

    def as_qm31(self) -> "Felt":
        if self.kind == "qm31":
            return self
        return Felt(self.be.embed(self.v), "qm31", self.be, self.deg)
