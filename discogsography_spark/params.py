"""Engine-wide constants and BM25 parameters.

BM25 uses the Lucene formulation (the reference's Neo4j fulltext indexes are
Lucene BM25, /root/reference/api/queries/neo4j_queries.py:120-129):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfnorm(t,d) = tf / (tf + k1 * (1 - b + b * dl/avgdl))
    score(q,d)  = sum over t in q of idf(t) * tfnorm(t, d)

Determinism contract (rank-identity with the pure-Python oracle):
- all floats are float64;
- idf and avgdl are computed ONCE driver-side in Python and injected as
  literals, so JVM `Math.log` rounding can never diverge from CPython;
- per-doc scores sum the per-term partials in SORTED TERM ORDER — both the
  oracle and the Spark engine build the sum as `p(t1) + p(t2) + ...` with
  terms sorted lexicographically, making the IEEE addition order identical;
- ties break on (score DESC, doc_id ASC) — the reference's `rank DESC,
  data_id` discipline (/root/reference/api/queries/search_queries.py:132-134).
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass(frozen=True)
class BM25Params:
    k1: float = 1.2
    b: float = 0.75

    def idf(self, n_docs: int, df: int) -> float:
        """Lucene BM25 idf, computed in CPython float64."""
        return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


# Posting-list block size: postings are delta+varbyte encoded in blocks of
# this many docs; each block restarts deltas at an absolute docID and carries
# (last_doc, max_tfnorm_bound) metadata for block-skip / block-max pruning.
BLOCK_SIZE = 128

# A term whose document frequency exceeds this is a "head term" (the
# reference's "Rock" problem, /root/reference/docs/query-performance-optimizations.md:347-356)
# and is built via the salted two-phase merge instead of a single group.
HEAD_TERM_DF_THRESHOLD = 50_000

# Number of salt buckets for head-term posting construction. Salts are
# contiguous docID ranges, so the phase-2 merge is pure concatenation.
HEAD_TERM_SALTS = 16

# Number of hash-partitioned index segments (term-sharded). Scale knob: at
# 10^12 turns this becomes thousands; locally small keeps file counts sane.
DEFAULT_NUM_SEGMENTS = 8
