"""secp256k1 base and scalar fields (host-side python-int arithmetic).

Twins of reference field/src/secp256k1_base.rs and secp256k1_scalar.rs —
present for ECDSA-gadget ecosystems; not used by the Goldilocks proving path
(same status as in the reference).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PrimeFieldParams:
    order: int
    two_adicity: int
    multiplicative_group_generator: int
    power_of_two_generator: int


SECP256K1_BASE = PrimeFieldParams(
    # p = 2^256 - 2^32 - 977 (secp256k1_base.rs)
    order=0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F,
    two_adicity=1,
    multiplicative_group_generator=3,
    power_of_two_generator=0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2E,
)

SECP256K1_SCALAR = PrimeFieldParams(
    # n = group order (secp256k1_scalar.rs)
    order=0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141,
    two_adicity=6,
    multiplicative_group_generator=7,
    power_of_two_generator=0x0C1DC060E7A91986DF9879A3FBC483A898BDEAB680756045992F4B5402B052F2,
)


class Fp:
    """A field element modulo params.order (minimal Field-trait surface)."""

    __slots__ = ("v", "params")

    def __init__(self, v: int, params: PrimeFieldParams):
        self.params = params
        self.v = v % params.order

    def _wrap(self, v: int) -> "Fp":
        return Fp(v, self.params)

    def __add__(self, o):
        return self._wrap(self.v + o.v)

    def __sub__(self, o):
        return self._wrap(self.v - o.v)

    def __mul__(self, o):
        return self._wrap(self.v * o.v)

    def __neg__(self):
        return self._wrap(-self.v)

    def inv(self) -> "Fp":
        assert self.v != 0
        return self._wrap(pow(self.v, self.params.order - 2, self.params.order))

    def pow(self, e: int) -> "Fp":
        return self._wrap(pow(self.v, e, self.params.order))

    def __eq__(self, o):
        return isinstance(o, Fp) and self.v == o.v and self.params is o.params

    def __repr__(self):
        return f"Fp({self.v:#x})"


def base(v: int) -> Fp:
    return Fp(v, SECP256K1_BASE)


def scalar(v: int) -> Fp:
    return Fp(v, SECP256K1_SCALAR)


def primitive_root_of_unity(params: PrimeFieldParams, n_log: int) -> int:
    assert 0 <= n_log <= params.two_adicity
    g = params.power_of_two_generator
    for _ in range(params.two_adicity - n_log):
        g = (g * g) % params.order
    return g
