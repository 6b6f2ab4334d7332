from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.index.manifest import Manifest

__all__ = ["IndexBuilder", "Manifest"]
