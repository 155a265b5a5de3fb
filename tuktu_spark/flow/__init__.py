from .compiler import FlowError, compile_flow, run_flow

__all__ = ["FlowError", "compile_flow", "run_flow"]
