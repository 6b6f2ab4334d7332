"""Conversation-context retrieval: the turns surrounding a search hit.

A transcript-search UI never shows a bare turn — it shows the hit WITH its
neighbors so the user can read the exchange (the reference UI resolves a
search hit to its full entity page via the by-id queries behind
api/routers/search.py; for transcripts the analog is the surrounding
conversation window). Semantics: all ALIVE turns of the hit's conversation
with |turn_idx - hit_turn_idx| <= window, ordered by turn_idx — turn
DISTANCE, not docID adjacency, so deleted or never-indexed turns leave a
visible gap instead of silently pulling in neighbors from further away.

ContextIndex builds once per service from the docmap's (conv_id, turn_idx)
columns — one lexsort + two searchsorted per lookup, O(log n) per hit with
no assumption that a conversation's docIDs are contiguous (on the live
merged view an upserted turn lives in a delta far from its base siblings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["ContextIndex"]


class ContextIndex:
    """doc -> conversation-window lookup over a docmap frame.

    `pdf` carries (doc_id, conv_id, turn_idx); rows already filtered to
    the ALIVE corpus by the caller (the merged service drops tombstoned
    ids). docIDs may be any subset of [0, id_space) in any order.
    """

    def __init__(self, pdf: pd.DataFrame, id_space: int):
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        convs = pdf["conv_id"].astype(str).to_numpy(dtype=object)
        turns = pdf["turn_idx"].to_numpy(dtype=np.int64)
        cats, codes = np.unique(convs, return_inverse=True)
        order = np.lexsort((turns, codes))
        self._ids = ids[order]
        self._codes = codes[order]
        self._turns = turns[order]
        self._cats = cats
        # doc -> position in the sorted view (absent/dead ids stay -1)
        self._pos = np.full(id_space, -1, dtype=np.int64)
        self._pos[self._ids] = np.arange(self._ids.size)
        # conversation ranges in the sorted view
        self._starts = np.searchsorted(self._codes, np.arange(cats.size))
        self._ends = np.append(self._starts[1:], self._codes.size)

    def window(
        self, doc_id: int, window: int = 2
    ) -> list[tuple[int, str, int]]:
        """(doc_id, conv_id, turn_idx) for every alive turn of the hit's
        conversation within `window` turn indexes, turn-ASC (the hit row
        included). Unknown/dead doc_id -> []."""
        p = int(self._pos[doc_id]) if 0 <= doc_id < self._pos.size else -1
        if p < 0:
            return []
        code = self._codes[p]
        t = int(self._turns[p])
        lo, hi = int(self._starts[code]), int(self._ends[code])
        conv_turns = self._turns[lo:hi]
        a = lo + int(np.searchsorted(conv_turns, t - window, side="left"))
        b = lo + int(np.searchsorted(conv_turns, t + window, side="right"))
        conv = str(self._cats[code])
        return [
            (int(self._ids[i]), conv, int(self._turns[i]))
            for i in range(a, b)
        ]
