"""readability_ex_spark — a PySpark-native main-content extraction engine.

A from-scratch implementation of the capabilities of jbl2024/readability_ex
(an Elixir port of Mozilla Readability.js), re-expressed Spark-first:

- ``kernel``   — pure-Python, dependency-free Readability kernel (DOM parse,
  node index, candidate scoring, boilerplate cleaning). No Spark imports;
  runs inside Arrow-batched ``mapInPandas``.
- ``operators`` — relational/dataflow operators around the kernel: dedup
  windows, anti-join resume, salting, lineage counters, plus the
  training-data operator family (MinHash-LSH dedup, SimHash, ANN search,
  language id, quality scoring).
- ``pipeline`` — the end-to-end extraction job (scan -> filter -> dedup ->
  repartition(xxhash64(url)) -> mapInPandas(kernel) -> sink + metrics).
- ``sources`` — readers for the web-page table (parquet dev path; Iceberg
  at scale) and synthetic page generation for tests/bench.

Design notes are in SURVEY.md; the conformance oracle is the reference's
fixture corpus (test/fixtures/readability-test-pages).
"""

__version__ = "0.1.0"
