"""discogsography_spark — a PySpark-native full-text inverted-index + BM25 engine.

A from-scratch re-expression (NOT a port) of the query and data-processing
capabilities of SimplicityGuy/discogsography on Apache Spark:

- full-text indexing + BM25 top-k (the reference's PostgreSQL GIN/tsvector and
  Neo4j/Lucene fulltext engines, /root/reference/schema-init/postgres_schema.py:66-83
  and /root/reference/schema-init/neo4j_schema.py:112-137) becomes a
  DataFrame-built inverted index with delta+varbyte posting lists, block-max
  metadata, and a deterministic BM25 scorer;
- the extractor's checkpoint/resume state marker
  (/root/reference/extractor/src/state_marker.rs) becomes atomic per-segment
  JSON manifests with lineage + metrics;
- the insights pre-aggregation pattern
  (/root/reference/graphinator/graphinator.py:572-701) becomes materialized
  corpus-stats tables (N, avgdl, DF) used by the scorer.

Everything is DataFrame/Catalyst-first; Python appears only in Arrow-vectorized
pandas UDFs (tokenize, posting codec) — never row-at-a-time.
"""

__version__ = "0.1.0"

from discogsography_spark.analysis import TOKEN_RE, tokenize_py
from discogsography_spark.params import BM25Params

__all__ = ["TOKEN_RE", "tokenize_py", "BM25Params", "__version__"]

# Allocator tuning runs in EVERY process that imports the package — driver
# AND pyspark worker processes (the import happens when UDF pickles resolve).
# This VM handles first-touch page faults ~100x slower than memory bandwidth
# (firecracker EPT) and fault throughput HALVES under 4-way process
# concurrency (measured: 0.126 -> 0.062 GB-alloc-passes/s); retaining freed
# glibc arenas keeps the Arrow/numpy hot loops off the fault path, which is
# what makes multi-executor throughput scale.
from discogsography_spark.mem import tune_allocator as _tune_allocator

_tune_allocator()
