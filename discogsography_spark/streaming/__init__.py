from discogsography_spark.streaming.incremental import (
    DeltaIndexWriter,
    MergedSearcher,
    compact,
)

__all__ = ["DeltaIndexWriter", "MergedSearcher", "compact"]
