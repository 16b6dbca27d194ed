"""Scalar function layer: extraction, cleaning, canonicalization, hashing.

Pure string transforms live here as plain Python (unit-testable without
Spark); the Spark bindings wrap them as vectorized pandas UDFs or, wherever
possible, as pure Catalyst column expressions (no Python at all).
"""
