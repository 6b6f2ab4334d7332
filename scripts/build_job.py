"""spark-submit entry point for the index build — the cluster-mode analog of
the reference's `uv run extractor` (/root/reference/extractor/src/main.rs).

    spark-submit --master local[N] --py-files dist/discogsography_spark.zip \
        scripts/build_job.py <transcripts_parquet> <index_dir> [num_segments]

Prints one JSON line with build metrics (turns/sec) for the scaling harness.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    transcripts_path, index_dir = sys.argv[1], sys.argv[2]
    num_segments = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    with_positions = len(sys.argv) > 4 and sys.argv[4] == "positions"

    spark = SparkSession.builder.appName("index_build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from discogsography_spark.index.builder import IndexBuilder

    transcripts = spark.read.parquet(transcripts_path)
    n_turns = transcripts.count()
    t0 = time.time()
    builder = IndexBuilder(
        index_dir,
        num_segments=num_segments,
        head_df_threshold=max(2000, min(100_000, n_turns // 20)),  # absolute cap: per-group size must stay bounded as the corpus grows
        with_positions=with_positions,
    )
    res = builder.build(transcripts)
    elapsed = time.time() - t0
    print(
        json.dumps(
            {
                "n_turns": n_turns,
                "n_docs": res.n_docs,
                "build_sec": round(elapsed, 3),
                "turns_per_sec": round(n_turns / elapsed, 1),
                "segments_built": len(res.segments_built),
                "timings": res.timings,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
