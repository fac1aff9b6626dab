"""Operator library: validation, quality suite, CDC apply,
sessionization, dedup, similarity search, text analysis, multimodal.

Everything here is built from native ``pyspark.sql.functions``
expressions unless vectorized Python is genuinely required (SURVEY §2.8
"no UDFs until forced") — native expressions stay inside whole-stage
codegen and remain Catalyst-optimizable.
"""
