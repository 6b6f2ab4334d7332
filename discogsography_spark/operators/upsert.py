"""Hash-gated incremental upsert + stale-row purge — the consumer write path
of the reference as corpus-scale Spark operators:

- upsert_changed: the `ON CONFLICT DO UPDATE ... WHERE hash != EXCLUDED.hash`
  conditional upsert (/root/reference/tableinator/tableinator.py:764-784) /
  bulk hash-diff batch write (/root/reference/tableinator/batch_processor.py:429-499):
  rows whose content hash is unchanged are skipped (no write amplification);
  changed/new rows replace their predecessors. Expressed as an anti-join on
  (id, hash) + union — the MERGE INTO shape for Iceberg sinks.

- purge_stale: the post-`extraction_complete` stale-row delete with BOTH
  safety guards (/root/reference/tableinator/tableinator.py:497-616):
  zero-new-records skip, and a max-delete-fraction veto (default 90%) that
  refuses implausible mass deletions (the reference added this after a
  resumed-run watermark bug mass-deleted fresh rows).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_hash(df: DataFrame, payload_cols: list[str], out: str = "hash") -> DataFrame:
    """SHA-256 over the canonical concatenation of payload columns — the
    content-identity hash (/root/reference/extractor/src/types.rs:163-168).
    Column order is fixed by the caller's list → deterministic."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in payload_cols]
    return df.withColumn(out, F.sha2(F.concat_ws("", *parts), 256))


@dataclass
class UpsertStats:
    incoming: int
    unchanged_skipped: int
    written: int


def upsert_changed(
    current: DataFrame,
    incoming: DataFrame,
    id_col: str = "data_id",
    hash_col: str = "hash",
    version_col: str | None = None,
) -> tuple[DataFrame, UpsertStats]:
    """Return (new_snapshot, stats). Rows in `incoming` with an identical
    (id, hash) already in `current` are skipped; otherwise incoming wins.
    current rows not present in incoming are retained (append/update, no
    delete — deletes are purge_stale's job).

    ON CONFLICT semantics keep exactly ONE row per key: duplicate ids inside
    `incoming` are collapsed first — the winner is the max `version_col` (a
    timestamp/sequence column) with `hash_col` as the deterministic
    tiebreak; without a version column the max hash wins. Stats come from a
    single cached pass over the joined lineage, not two recomputations."""
    from pyspark.sql import Window as W

    order = (
        [F.col(version_col).desc_nulls_last()] if version_col else []
    ) + [F.col(hash_col).desc()]
    w = W.partitionBy(id_col).orderBy(*order)
    deduped = (
        incoming.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    changed = deduped.join(
        current.select(id_col, hash_col), [id_col, hash_col], "left_anti"
    )
    # localCheckpoint, not cache(): materializes once (stats + the two
    # snapshot reads share the blocks) AND the blocks are released by the
    # ContextCleaner when the DataFrame is garbage-collected — an explicit
    # cache() here leaked executor storage for the session lifetime under
    # repeated calls (e.g. GraphSink upserting every micro-batch).
    changed = changed.localCheckpoint(eager=True)
    n_in = incoming.count()
    n_changed = changed.count()
    kept = current.join(changed.select(id_col), id_col, "left_anti")
    snapshot = kept.unionByName(changed)
    return snapshot, UpsertStats(
        incoming=n_in, unchanged_skipped=n_in - n_changed, written=n_changed
    )


def purge_stale(
    snapshot: DataFrame,
    started_at,
    updated_col: str = "updated_at",
    records_processed: int = 0,
    max_delete_fraction: float = 0.9,
) -> tuple[DataFrame, dict]:
    """Delete rows older than the run watermark, with the reference's two
    safety guards. Returns (kept_df, report)."""
    total = snapshot.count()
    if records_processed == 0:
        # guard 1: a run that processed nothing must not delete anything
        # (tableinator.py:548-560 semantics)
        return snapshot, {"purged": 0, "skipped_reason": "zero_records_processed", "total": total}
    stale_cond = F.col(updated_col) < F.lit(started_at)
    n_stale = snapshot.filter(stale_cond).count()
    if total > 0 and n_stale / total >= max_delete_fraction:
        # guard 2: implausible mass deletion veto (tableinator.py:562-585)
        return snapshot, {
            "purged": 0,
            "skipped_reason": "delete_fraction_veto",
            "stale": n_stale,
            "total": total,
        }
    return snapshot.filter(~stale_cond), {"purged": n_stale, "total": total}
