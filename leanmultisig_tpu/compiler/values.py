"""Compile-time value model for the zkDSL compiler.

During compilation every expression evaluates to one of:
  * int            — compile-time constant (folded)
  * Slot           — runtime value in the current frame (offset from fp)
  * CTArray        — const array (nested python lists, compile-time only)
  * CTDynArray     — DynArray (compile-time structure, runtime elements)
  * tuple          — multiple return values
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Slot:
    offset: int


class CTArray:
    """Immutable const array (may be ragged / nested)."""

    def __init__(self, items):
        self.items = list(items)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


class CTDynArray:
    """Compile-time dynamic array; elements are values (int or Slot)."""

    def __init__(self, items):
        self.items = list(items)

    def push(self, v):
        self.items.append(v)

    def pop(self):
        assert self.items, "pop on empty DynArray"
        self.items.pop()

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


class CompileError(Exception):
    pass
