"""Pure-Python Readability kernel (no Spark imports).

A from-scratch implementation of the main-content extraction algorithm of
Mozilla Readability.js as specified by the behavior of
jbl2024/readability_ex (reference at /root/reference, read-only; file:line
citations in docstrings refer to it). Designed for batched execution
inside Arrow/pandas UDFs: pure functions, per-document node index with
precomputed stats, sequential per-document ids (deterministic — unlike
the reference's System.unique_integer, index.ex:54), no globals, no I/O.
"""

from readability_ex_spark.kernel.api import parse

__all__ = ["parse"]
