"""Scalar/vector/text function library — all JVM-side Column expressions
unless noted; the training-data-pipeline toolkit (dedup, similarity, text
quality) lives here too."""
