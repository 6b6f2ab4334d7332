"""Pre-bucketed ANN storage: write_lsh_bucketed / write_ivf materialize the
embedding table partitioned by cell, and the stored probes must (a) return
results identical to the full-scan paths and (b) show PARTITION pruning in
the plan — directory elimination, not a per-row filter over a full scan."""

from __future__ import annotations

import pytest

from discogsography_spark.operators.similarity import (
    ivf_topk,
    ivf_topk_stored,
    lsh_bucketed_topk,
    lsh_bucketed_topk_stored,
    write_ivf,
    write_lsh_bucketed,
)
from discogsography_spark.plans.inspect import explain_str

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def qvec(emb):
    row = emb.orderBy("vec_id").first()
    return [float(x) for x in row["embedding"]]


@pytest.fixture(scope="module")
def lsh_store(emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lshstore") / "emb")
    write_lsh_bucketed(emb, path, n_planes=6)
    return path


@pytest.fixture(scope="module")
def ivf_store(spark, emb, tmp_path_factory):
    import numpy as np

    from discogsography_spark.operators.similarity import train_ivf_centroids

    sample = np.array(
        emb.limit(256).toPandas()["embedding"].tolist(), dtype=np.float64
    )
    cents = train_ivf_centroids(sample, nlist=8)
    path = str(tmp_path_factory.mktemp("ivfstore") / "emb")
    write_ivf(emb, path, cents)
    return path, cents


def test_lsh_stored_identical_to_scan(spark, emb, lsh_store, qvec):
    scan = lsh_bucketed_topk(emb, qvec, k=10, n_planes=6, multiprobe_bits=1).collect()
    stored = lsh_bucketed_topk_stored(
        spark, lsh_store, qvec, k=10, n_planes=6, multiprobe_bits=1
    ).collect()
    assert [(r["vec_id"], r["cosine"]) for r in scan] == [
        (r["vec_id"], r["cosine"]) for r in stored
    ]
    assert len(scan) == 10


def test_lsh_stored_plan_prunes_partitions(spark, lsh_store, qvec):
    df = lsh_bucketed_topk_stored(spark, lsh_store, qvec, k=10, n_planes=6)
    s = explain_str(df, "simple")
    assert "PartitionFilters" in s, s
    part_section = s.split("PartitionFilters", 1)[1][:300]
    assert "bucket" in part_section, part_section
    # the bucket predicate must NOT fall into the data-filter section
    pushed = s.split("PushedFilters", 1)[1][:200] if "PushedFilters" in s else ""
    assert "bucket" not in pushed, pushed


def test_ivf_stored_identical_to_scan(spark, emb, ivf_store, qvec):
    path, cents = ivf_store
    scan = ivf_topk(emb, qvec, cents, k=10, nprobe=3).collect()
    stored = ivf_topk_stored(spark, path, qvec, cents, k=10, nprobe=3).collect()
    assert [(r["vec_id"], r["cosine"]) for r in scan] == [
        (r["vec_id"], r["cosine"]) for r in stored
    ]
    assert len(scan) == 10


def test_ivf_stored_plan_prunes_partitions(spark, ivf_store, qvec):
    path, cents = ivf_store
    df = ivf_topk_stored(spark, path, qvec, cents, k=10, nprobe=3)
    s = explain_str(df, "simple")
    assert "PartitionFilters" in s, s
    assert "ivf_cell" in s.split("PartitionFilters", 1)[1][:300]


def test_stored_entry_matches_adhoc_entry(spark):
    import __spark_entry__ as m

    q = m.queries()
    a = q["embedding_ivf_topk"](spark, SF_DIR).toPandas()
    b = q["embedding_ivf_topk_stored"](spark, SF_DIR).toPandas()
    assert a.equals(b)
