"""Deterministic scalar/aggregate function library (Spark Column expressions)."""
