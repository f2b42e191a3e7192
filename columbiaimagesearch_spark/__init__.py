"""columbiaimagesearch_spark — a PySpark-native analytics & similarity-search engine.

A from-scratch rebuild of the query and data-processing capabilities of
ColumbiaDVMM/ColumbiaImageSearch (DARPA MEMEX image/face similarity search:
ingestion -> feature extraction -> LOPQ ANN index -> sub-second search),
re-expressed as idiomatic Spark DataFrame / SQL / Structured Streaming programs.

Layout
------
- ``session``    : tuned SparkSession factory (local testing; cluster-shaped confs)
- ``sources``    : table loaders (TPC-H-ish test tables, domain fixtures, file sources)
- ``operators``  : relational operator library (scans/filters/joins/aggs/top-k),
                   dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
                   text analysis, similarity search
- ``functions``  : scalar & vector column function library (C1-C10 of SURVEY §2.7)
- ``lopq``       : Locally Optimized Product Quantization: model, encode, ADC search
- ``streaming``  : Structured Streaming ingestion (count-or-time batching, dedup, ledger)
- ``multimodal`` : binary image columns: header sniffing, decode/resize plumbing
- ``plans``      : physical-plan assertions (pushdown / broadcast / codegen checks)

Design stance (SURVEY §7.0): DataFrame-first, no RDDs; numerics via Arrow
pandas_udfs with broadcast model state; every relational operator is
DuckDB-oracle checkable; shuffles carry ids+codes, never raw vectors, so the
same plans hold at 100 TB.
"""

__version__ = "0.1.0"
