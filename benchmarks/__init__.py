"""Benchmark harnesses (real-TPU wall clock + device traces).

Run as modules from the repo root so `cutrace_tpu` resolves without any
path munging:

    python -m benchmarks.frames
    python -m benchmarks.bigscene --levels 4
    python -m benchmarks.scaling
"""
