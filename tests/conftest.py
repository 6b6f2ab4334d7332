from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from discogsography_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    from discogsography_spark.corpus import write_corpus

    d = tmp_path_factory.mktemp("corpus")
    write_corpus(str(d), n_conversations=300, mean_turns=8, vocab_size=800)
    return str(d)


@pytest.fixture(scope="session")
def built_index(spark, corpus_dir, tmp_path_factory):
    from discogsography_spark.index.builder import IndexBuilder

    idx_dir = str(tmp_path_factory.mktemp("index") / "idx")
    transcripts = spark.read.parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    builder = IndexBuilder(idx_dir, num_segments=4, head_df_threshold=200, head_salts=4)
    builder.build(transcripts)
    return idx_dir


@pytest.fixture(scope="session")
def oracle_index(corpus_dir):
    import pandas as pd

    from discogsography_spark.oracle import build_oracle_index

    tdf = pd.read_parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    rows = list(zip(tdf["conv_id"], tdf["turn_idx"], tdf["text"]))
    return build_oracle_index(rows)
