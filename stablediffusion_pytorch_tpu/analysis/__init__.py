"""Evaluation and analysis: FID, size/ops analyzers, energy reports,
profiling."""
