from discogsography_spark.query.engine import DistributedQueryEngine, LocalSearcher

__all__ = ["DistributedQueryEngine", "LocalSearcher"]
