from discogsography_spark.sources.loaders import load_transcripts, write_transcripts

__all__ = ["load_transcripts", "write_transcripts"]
