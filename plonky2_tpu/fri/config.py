"""FRI configuration (twin of reference fri/mod.rs:19-110 and
fri/reduction_strategies.rs:13-56)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class FriReductionStrategy:
    """Only Fixed and ConstantArityBits are used by the demo configs."""

    kind: str  # "fixed" | "constant_arity"
    arity_bits: tuple = ()
    final_poly_bits: int = 0

    @staticmethod
    def fixed(arities) -> "FriReductionStrategy":
        return FriReductionStrategy("fixed", tuple(arities))

    @staticmethod
    def constant_arity(arity_bits: int, final_poly_bits: int) -> "FriReductionStrategy":
        return FriReductionStrategy("constant_arity", (arity_bits,), final_poly_bits)

    def reduction_arity_bits(
        self, degree_bits: int, rate_bits: int, cap_height: int
    ) -> list[int]:
        if self.kind == "fixed":
            return list(self.arity_bits)
        # ConstantArityBits (reference reduction_strategies.rs:39-50)
        (arity_bits,) = self.arity_bits
        result = []
        d = degree_bits
        while d > self.final_poly_bits and d + rate_bits - arity_bits >= cap_height:
            assert d >= arity_bits
            result.append(arity_bits)
            d -= arity_bits
        return result


@dataclass(frozen=True)
class FriConfig:
    """reference fri/mod.rs:19"""

    rate_bits: int
    cap_height: int
    proof_of_work_bits: int
    reduction_strategy: FriReductionStrategy
    num_query_rounds: int

    def num_cap_elements(self) -> int:
        return 1 << self.cap_height

    def fri_params(self, degree_bits: int, hiding: bool = False) -> "FriParams":
        arities = self.reduction_strategy.reduction_arity_bits(
            degree_bits, self.rate_bits, self.cap_height
        )
        return FriParams(self, hiding, degree_bits, tuple(arities))


def standard_fri_config() -> FriConfig:
    """The FRI half of standard_recursion_config (plonk/circuit_data.rs:72)."""
    return FriConfig(
        rate_bits=3,
        cap_height=4,
        proof_of_work_bits=16,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=28,
    )


@dataclass(frozen=True)
class FriParams:
    """reference fri/mod.rs:62"""

    config: FriConfig
    hiding: bool
    degree_bits: int
    reduction_arity_bits: tuple

    def total_arities(self) -> int:
        return sum(self.reduction_arity_bits)

    def lde_bits(self) -> int:
        return self.degree_bits + self.config.rate_bits

    def lde_size(self) -> int:
        return 1 << self.lde_bits()

    def final_poly_bits(self) -> int:
        return self.degree_bits - self.total_arities()

    def final_poly_len(self) -> int:
        return 1 << self.final_poly_bits()
