"""Dataset-assembly operators: deterministic sampling, source mixing,
benchmark decontamination — the pretraining pipeline stages between dedup
and tokenization."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from discogsography_spark.operators.sampling import (
    decontaminate,
    deterministic_sample,
    mix_sources,
    rate_threshold_hex,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"src{i % 4}", f"document number {i} with some unique words w{i} "
                           f"plus shared filler alpha beta gamma delta")
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_rate_threshold_hex_bounds():
    assert rate_threshold_hex(0.0) == "000000"
    assert rate_threshold_hex(1.0) == "gggggg"  # above every hex digit
    assert rate_threshold_hex(0.25) == "400000"
    with pytest.raises(ValueError):
        rate_threshold_hex(1.5)


def test_deterministic_sample_matches_python_hash(spark, docs):
    got = sorted(
        r["doc_id"] for r in deterministic_sample(docs, 0.3, "text").collect()
    )
    pdf = docs.toPandas()
    want = sorted(
        int(d)
        for d, t in zip(pdf["doc_id"], pdf["text"])
        if hashlib.sha256(t.encode()).hexdigest()[:6] < rate_threshold_hex(0.3)
    )
    assert got == want
    # rate sanity: ~30% within binomial slack
    assert 0.2 * 400 < len(got) < 0.4 * 400
    # stability: same verdicts on a repartitioned frame
    again = sorted(
        r["doc_id"]
        for r in deterministic_sample(docs.repartition(13), 0.3, "text").collect()
    )
    assert again == got


def test_mix_sources_rates_and_allowlist(spark, docs):
    mixed = mix_sources(
        docs, {"src0": 1.0, "src1": 0.5}, default_rate=0.0
    ).toPandas()
    by_src = mixed.groupby("source").size().to_dict()
    assert by_src.get("src0") == 100  # rate 1.0 keeps everything
    assert 25 <= by_src.get("src1", 0) <= 75
    assert "src2" not in by_src and "src3" not in by_src  # allowlist drop


def test_decontaminate_planted_overlap(spark):
    bench = "what is the capital of france paris obviously yes"
    rows = [
        (0, "clean document about spark joins and shuffles with many tokens here"),
        (1, f"prefix words then {bench} then suffix words"),  # contains the 8-gram
        (2, "short doc"),  # < 8 tokens → always kept
        (3, "another clean one about window aggregation partitions and codegen"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    probe = spark.createDataFrame([(99, bench)], "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in decontaminate(df, probe, n=8).collect())
    assert kept == [0, 2, 3]


def test_decontaminate_short_probe_still_filters(spark):
    """A probe SHORTER than n must still decontaminate: the corpus side is
    additionally shingled at the short probe's width, so any doc containing
    the m-token probe as a CONSECUTIVE run is dropped — while docs carrying
    the same tokens non-consecutively (or in another order) are kept."""
    probe = spark.createDataFrame(
        [(9, "tiny probe text"), (10, "solo")], "doc_id long, text string"
    )
    df = spark.createDataFrame(
        [
            (0, "a long enough clean document with eight plus tokens in it"),
            # contains the 3-token probe consecutively inside a long doc →
            # the old n-gram-only matching silently kept it
            (1, "preamble words then tiny probe text and a long suffix here"),
            (2, "tiny probe of text separated so no consecutive run exists"),
            (3, "text probe tiny reversed order must not match either way"),
            (4, "the solo keyword appears within this longer document body"),
            (5, "tiny probe text"),  # doc == probe exactly
        ],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in decontaminate(df, probe, n=8).collect())
    assert kept == [0, 2, 3]

    # no short probes at all → no extra explode widths, same result shape
    long_probe = spark.createDataFrame(
        [(9, "one two three four five six seven eight nine")],
        "doc_id long, text string",
    )
    kept2 = sorted(
        r["doc_id"] for r in decontaminate(df, long_probe, n=8).collect()
    )
    assert kept2 == [0, 1, 2, 3, 4, 5]


def _expected_stratified(pdf, quotas):
    out = []
    for s, n in quotas.items():
        grp = pdf[pdf["source"] == s].copy()
        grp["_h"] = grp["text"].map(lambda t: hashlib.sha256(t.encode()).hexdigest())
        grp = grp.sort_values(["_h", "doc_id"]).head(n)
        out.extend(grp["doc_id"].tolist())
    return sorted(out)


def test_stratified_exact_quotas(spark, docs):
    from discogsography_spark.operators.sampling import stratified_sample_exact

    quotas = {"src0": 30, "src1": 7, "src2": 55}
    got = stratified_sample_exact(docs, quotas)
    rows = got.collect()
    # unlisted strata dropped entirely
    assert {r["source"] for r in rows} <= set(quotas)
    assert sorted(r["doc_id"] for r in rows) == _expected_stratified(
        docs.toPandas(), quotas
    )
    # schema preserved
    assert got.columns == docs.columns


def test_stratified_quota_exceeds_stratum(spark, docs):
    from discogsography_spark.operators.sampling import stratified_sample_exact

    # 400 docs over 4 sources → 100 per src; quota 150 keeps all 100
    got = stratified_sample_exact(docs, {"src1": 150}).collect()
    assert len(got) == 100


def test_stratified_tiny_oversample_still_exact(spark, docs):
    # oversample < 1 forces the under-fill fallback path for every stratum
    from discogsography_spark.operators.sampling import stratified_sample_exact

    quotas = {"src0": 40, "src3": 12}
    got = stratified_sample_exact(docs, quotas, oversample=0.05)
    assert sorted(r["doc_id"] for r in got.collect()) == _expected_stratified(
        docs.toPandas(), quotas
    )


def test_stratified_stable_under_repartition(spark, docs):
    from discogsography_spark.operators.sampling import stratified_sample_exact

    quotas = {"src0": 9, "src2": 3}
    a = sorted(
        r["doc_id"] for r in stratified_sample_exact(docs, quotas).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in stratified_sample_exact(docs.repartition(17), quotas).collect()
    )
    assert a == b


def test_plan_mixture_rates_and_budget_mix(spark, docs):
    import re as _re

    from discogsography_spark.operators.sampling import (
        mix_sources,
        mix_to_token_budgets,
        plan_mixture,
    )

    pdf = docs.toPandas()
    pdf["ntok"] = pdf["text"].map(lambda t: len(_re.findall(r"[a-z0-9]+", t.lower())))
    totals = pdf.groupby("source")["ntok"].sum().to_dict()
    budgets = {"src0": 10**9, "src1": int(totals["src1"] * 0.4), "src2": 37}
    rates = plan_mixture(docs, budgets)
    assert rates["src0"] == 1.0
    assert abs(rates["src1"] - budgets["src1"] / totals["src1"]) < 1e-12
    assert abs(rates["src2"] - 37 / totals["src2"]) < 1e-12

    got = sorted(r["doc_id"] for r in mix_to_token_budgets(docs, budgets).collect())
    want = sorted(
        r["doc_id"]
        for r in mix_sources(docs, rates, default_rate=0.0).collect()
    )
    assert got == want
    # src3 has no budget → dropped
    assert not any(pdf.set_index("doc_id").loc[got]["source"] == "src3")
