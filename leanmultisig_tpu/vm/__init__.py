from .isa import (Bytecode, CodeEntry, Computation, Constant, Deref,
                  ExtensionOpArgs, FpRel, Jump, MemAfterFp, Poseidon16Args,
                  Precompile, field_representation)
from .memory import Memory, RunnerError
from .runner import ExecutionResult, ExecutionWitness, execute_bytecode
from .trace_gen import ExecutionTrace, get_execution_trace

__all__ = [
    "Bytecode", "CodeEntry", "Computation", "Constant", "Deref",
    "ExtensionOpArgs", "FpRel", "Jump", "MemAfterFp", "Poseidon16Args",
    "Precompile", "field_representation", "Memory", "RunnerError",
    "ExecutionResult", "ExecutionWitness", "execute_bytecode",
    "ExecutionTrace", "get_execution_trace",
]
