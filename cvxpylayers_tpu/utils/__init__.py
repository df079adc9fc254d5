from .profiling import PhaseTimer, problem_summary, trace_annotation

__all__ = ["PhaseTimer", "problem_summary", "trace_annotation"]
