"""Hierarchical wall-clock scopes (TPU twin of reference util/timing.rs:8).

Usage:
    timing = TimingTree("prove")
    with timing.scope("compute wire polynomials"):
        ...
    timing.print()

Unlike the reference's `timed!` macro (compiled out without the `timing`
feature), scopes here are always recorded but cost only a perf_counter call.
Device work is asynchronous under JAX; call `block(x)` on a result inside a
scope to attribute device time correctly.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax


def block(x):
    """Block until device computation for x is done (for honest timings)."""
    return jax.block_until_ready(x)


class TimingTree:
    def __init__(self, name: str = "root"):
        self.name = name
        self.start = time.perf_counter()
        self.end = None
        self.children: list[TimingTree] = []
        self._stack = [self]

    @contextmanager
    def scope(self, name: str):
        node = TimingTree(name)
        parent = self._stack[-1]
        parent.children.append(node)
        self._stack.append(node)
        try:
            yield node
        finally:
            node.end = time.perf_counter()
            self._stack.pop()

    def close(self):
        if self.end is None:
            self.end = time.perf_counter()

    def duration(self) -> float:
        end = self.end if self.end is not None else time.perf_counter()
        return end - self.start

    def lines(self, depth: int = 0):
        yield f"{'  ' * depth}{self.duration()*1e3:9.3f}ms  {self.name}"
        for c in self.children:
            yield from c.lines(depth + 1)

    def print(self):
        self.close()
        for line in self.lines():
            print(line)

    def as_dict(self):
        return {
            "name": self.name,
            "ms": self.duration() * 1e3,
            "children": [c.as_dict() for c in self.children],
        }
