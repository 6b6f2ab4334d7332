"""Index integrity checker (`cli fsck`) — validates every stored
invariant of an index directory (and its committed delta tails) straight
from the parquet files, independently of the query-time readers.

The reference stack leans on PostgreSQL/Lucene to police storage
invariants (CRCs, checkVals); an immutable segment layout needs its own
fsck so corruption (truncated blob, bad offset directory, mis-routed
term) fails loudly at ops time instead of as a silently wrong answer.
Complements the query-time guards (`_delta_positions`' stream check,
`recover_compact`'s idempotent swap repair).

Checked per term row:
- doc/tf blobs decode; docIDs strictly ascending; count == stored df
- dl blob decodes to exactly df values
- block_last_doc equals the decoded docID at each block boundary;
  block_doc/tf/dl_off are monotone and end at the blob lengths
- champion arrays (when present) are equal-length and champion docs are
  a subset of the posting list
- positions (when the manifest says with_positions): flat stream length
  == sum(tf); positions 0-based ascending WITHIN each posting and below
  the posting's dl; block_pos_off (when present) is monotone, has
  nblocks+1 entries, and ends at len(pos_blob)
- the term hashes to the segment directory that stores it

Checked per directory: docmap row count and distinct (conv_id, turn_idx)
count against the manifest/stats n_docs; every decoded docID inside the
directory's id range.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow.parquet as pq

from discogsography_spark.codec import decode_postings, varbyte_decode
from discogsography_spark.index.builder import term_segment


def _check_term_row(
    row: dict,
    seg: int,
    num_segments: int,
    block_size: int,
    with_positions: bool,
    id_lo: int,
    id_hi: int | None,
    errors: list[str],
) -> None:
    t = row["term"]

    def err(msg: str) -> None:
        errors.append(f"seg={seg} term={t!r}: {msg}")

    if term_segment(t, num_segments) != seg:
        err(f"routed to wrong segment (expected {term_segment(t, num_segments)})")
    try:
        docs, tfs = decode_postings(row["doc_blob"], row["tf_blob"])
        dls = varbyte_decode(row["dl_blob"]).astype(np.int64)
    except Exception as e:  # truncated / malformed blob
        err(f"blob decode failed: {e}")
        return
    df = int(row["df"])
    if docs.size != df or tfs.size != df or dls.size != df:
        err(f"df={df} but decoded sizes {docs.size}/{tfs.size}/{dls.size}")
        return
    if df and not (np.diff(docs) > 0).all():
        err("docIDs not strictly ascending")
    if df and (int(docs[0]) < id_lo or (id_hi is not None and int(docs[-1]) >= id_hi)):
        err(f"docID outside directory range [{id_lo}, {id_hi})")
    if df and (tfs <= 0).any():
        err("non-positive tf")
    if df and (tfs > dls).any():
        err("tf exceeds doc length")

    bld = np.asarray(row.get("block_last_doc") or [], dtype=np.int64)
    if bld.size:
        nblocks = (df + block_size - 1) // block_size
        if bld.size != nblocks:
            err(f"block_last_doc has {bld.size} entries, expected {nblocks}")
        else:
            ends = np.minimum(np.arange(1, nblocks + 1) * block_size, df) - 1
            if not np.array_equal(bld, docs[ends]):
                err("block_last_doc mismatches decoded block boundaries")
    nblocks = (df + block_size - 1) // block_size
    for col, blob in (
        ("block_doc_off", row["doc_blob"]),
        ("block_tf_off", row["tf_blob"]),
        ("block_dl_off", row["dl_blob"]),
    ):
        # block-START byte offsets (nblocks entries, first 0), not
        # boundary+end form — see codec.encode_blocked
        off = np.asarray(row.get(col) or [], dtype=np.int64)
        if off.size:
            if off.size != nblocks:
                err(f"{col} has {off.size} entries, expected {nblocks}")
            if (np.diff(off) < 0).any():
                err(f"{col} not monotone")
            if int(off[0]) != 0 or int(off[-1]) > len(blob):
                err(f"{col} offsets outside [0, {len(blob)}]")

    cd = np.asarray(row.get("champ_doc") or [], dtype=np.int64)
    if cd.size:
        ct = np.asarray(row.get("champ_tf") or [], dtype=np.int64)
        cl = np.asarray(row.get("champ_dl") or [], dtype=np.int64)
        if not (cd.size == ct.size == cl.size):
            err("champion arrays have mismatched lengths")
        pos = np.searchsorted(docs, np.sort(cd))
        ok = pos < docs.size
        if not ok.all() or not np.array_equal(docs[pos[ok]], np.sort(cd)[ok]):
            err("champion docs not a subset of the posting list")

    if with_positions:
        pos_blob = row.get("pos_blob") or b""
        try:
            flat = varbyte_decode(pos_blob).astype(np.int64)
        except Exception as e:
            err(f"pos_blob decode failed: {e}")
            return
        cf = int(tfs.sum())
        if flat.size != cf:
            err(f"positional stream length {flat.size} != sum(tf) {cf}")
            return
        voff = np.concatenate(([0], np.cumsum(tfs)))
        if cf:
            d = np.diff(flat)
            mask = np.ones(d.size, dtype=bool)
            bnd = voff[1:-1] - 1
            mask[bnd] = False
            if d.size and not (d[mask] > 0).all():
                err("positions not strictly ascending within a posting")
            last = flat[voff[1:] - 1]
            if (last >= dls).any() or (flat < 0).any():
                err("position outside [0, dl)")
        bpo = np.asarray(row.get("block_pos_off") or [], dtype=np.int64)
        if bpo.size:
            nblocks = (df + block_size - 1) // block_size
            if bpo.size != nblocks + 1:
                err(f"block_pos_off has {bpo.size} entries, expected {nblocks + 1}")
            if (np.diff(bpo) < 0).any():
                err("block_pos_off not monotone")
            if int(bpo[-1]) != len(pos_blob):
                err(
                    f"block_pos_off final {int(bpo[-1])} != pos_blob length "
                    f"{len(pos_blob)}"
                )


def _check_dir(
    seg_root: str,
    docs_root: str,
    n_docs_expected: int | None,
    num_segments: int,
    block_size: int,
    with_positions: bool,
    id_lo: int,
    id_hi: int | None,
    errors: list[str],
    sample: int = 1,
) -> dict:
    terms_checked = 0
    files = 0
    seq = 0
    for seg_dir in sorted(glob.glob(os.path.join(seg_root, "seg=*"))):
        seg = int(seg_dir.rsplit("=", 1)[1])
        for f in sorted(glob.glob(os.path.join(seg_dir, "*.parquet"))):
            files += 1
            tbl = pq.read_table(f)
            for row in tbl.to_pylist():
                seq += 1
                if sample > 1 and seq % sample:
                    continue
                _check_term_row(
                    row, seg, num_segments, block_size, with_positions,
                    id_lo, id_hi, errors,
                )
                terms_checked += 1
    n_docmap = 0
    if os.path.isdir(docs_root):
        import pandas as pd

        dfs = [
            pd.read_parquet(f, columns=["doc_id", "conv_id", "turn_idx"])
            for f in glob.glob(os.path.join(docs_root, "**", "*.parquet"),
                               recursive=True)
        ]
        if dfs:
            dm = pd.concat(dfs, ignore_index=True)
            n_docmap = len(dm)
            if dm["doc_id"].nunique() != n_docmap:
                errors.append(f"{docs_root}: duplicate doc_ids in docmap")
    if n_docs_expected is not None and n_docmap != n_docs_expected:
        errors.append(
            f"{docs_root}: docmap rows {n_docmap} != stats n_docs "
            f"{n_docs_expected}"
        )
    return {"terms": terms_checked, "segment_files": files, "docmap_rows": n_docmap}


def fsck_index(
    index_dir: str, check_deltas: bool = True, sample: int = 1
) -> dict:
    """Validate an index directory (and, by default, its committed delta
    tails). `sample=N` checks every Nth term row (deterministic) — the
    10^12-scale mode, where a full decode of every posting list per fsck
    run is not the plan; docmap counts stay exact either way. Returns a
    report dict; report['errors'] empty == clean."""
    from discogsography_spark.query.engine import IndexMeta
    from discogsography_spark.streaming.incremental import list_deltas

    meta = IndexMeta(index_dir)
    with_positions = bool(meta.stats.get("with_positions", False))
    errors: list[str] = []
    report: dict = {"index_dir": index_dir, "with_positions": with_positions}
    report["sample"] = sample
    report["base"] = _check_dir(
        os.path.join(index_dir, "segments"),
        os.path.join(index_dir, "docs"),
        meta.n_docs,
        meta.num_segments,
        meta.block_size,
        with_positions,
        0,
        meta.n_docs,
        errors,
        sample=sample,
    )
    if check_deltas:
        lo = meta.n_docs
        deltas = []
        for d in list_deltas(index_dir):
            with open(os.path.join(d, "stats.json")) as f:
                ds = json.load(f)
            n = int(ds["n_docs"])
            deltas.append(
                {
                    "delta": os.path.basename(d),
                    **_check_dir(
                        os.path.join(d, "segments"),
                        os.path.join(d, "docs"),
                        None,  # tombstone-only deltas have no new docs
                        meta.num_segments,
                        meta.block_size,
                        with_positions,
                        lo,
                        lo + n,
                        errors,
                        sample=sample,
                    ),
                }
            )
            lo += n
        report["deltas"] = deltas
    report["errors"] = errors
    return report
