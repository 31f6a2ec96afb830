from .codegen import CompileError, compile_program

__all__ = ["compile_program", "CompileError"]
