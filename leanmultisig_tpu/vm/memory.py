"""Write-once VM memory (mirrors crates/lean_vm/src/execution/memory.rs)."""

from __future__ import annotations

from ..field.constants import P
from .isa import DIMENSION, MAX_LOG_MEMORY_SIZE


class RunnerError(Exception):
    pass


class UndefinedMemory(RunnerError):
    def __init__(self, index):
        super().__init__(f"undefined memory at {index}")
        self.index = index


class Memory:
    """Vec<Option<F>> with write-once semantics. Values: Python ints < P."""

    __slots__ = ("cells",)

    def __init__(self, public_memory):
        self.cells: list[int | None] = list(int(v) for v in public_memory)

    def try_get(self, index: int) -> int | None:
        if 0 <= index < len(self.cells):
            return self.cells[index]
        return None

    def get(self, index: int) -> int:
        v = self.try_get(index)
        if v is None:
            raise UndefinedMemory(index)
        return v

    def set(self, index: int, value: int) -> None:
        value = int(value) % P
        if index >= len(self.cells):
            if index >= 1 << MAX_LOG_MEMORY_SIZE:
                raise RunnerError("out of memory")
            self.cells.extend([None] * (index + 1 - len(self.cells)))
        existing = self.cells[index]
        if existing is not None:
            if existing != value:
                raise RunnerError(
                    f"memory already set at {index}: {existing} != {value}")
        else:
            self.cells[index] = value

    def get_slice(self, start: int, n: int) -> list[int]:
        return [self.get(start + i) for i in range(n)]

    def set_slice(self, start: int, values) -> None:
        for i, v in enumerate(values):
            self.set(start + i, int(v))

    def get_ef(self, index: int) -> list[int]:
        return self.get_slice(index, DIMENSION)

    def set_ef(self, index: int, coeffs) -> None:
        self.set_slice(index, coeffs)

    def make_slices_equal_and_defined(self, ptr_0: int, ptr_1: int,
                                      n: int) -> None:
        """(memory.rs:40-62)"""
        for i in range(n):
            v0 = self.try_get(ptr_0 + i)
            v1 = self.try_get(ptr_1 + i)
            if v0 is not None and v1 is not None:
                if v0 != v1:
                    raise RunnerError(f"not equal: {v0} != {v1}")
            elif v0 is not None:
                self.set(ptr_1 + i, v0)
            elif v1 is not None:
                self.set(ptr_0 + i, v1)
            else:
                self.set(ptr_0 + i, 0)
                self.set(ptr_1 + i, 0)
