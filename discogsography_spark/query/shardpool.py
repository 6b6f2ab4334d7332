"""Per-shard worker processes: the shared-nothing shard-serving tier.

`ShardedSearcher(parallel=True)` fans queries out to one forked worker
process per shard. Each worker owns a complete `LocalSearcher` over its
shard — its own posting caches, membership bitmaps, and trigram index —
and answers small (method, kwargs) → top-k messages over a pipe. This is
the in-sandbox model of the real deployment (one serving node per shard,
one RPC per probe): the coordinator's per-query work is O(k · n_shards)
merge, and every kernel runs with no shared state whatsoever.

Why processes, not threads: the per-shard probe is hundreds of short numpy
calls glued by interpreter bytecode, so CPython threads serialize on the
GIL — measured here, a thread pool is SLOWER than the sequential loop at
every shard count (p95 27→70 ms from 8→16 shards vs 17→20 sequential),
while the process pool holds p95 flat (3.9 ms at 8 shards, 3.6 ms at 16 —
sub-linear in shard count, the design requirement). A real RPC tier has the
same property for the same reason: the per-shard work happens on another
node's CPU.

Protocol: request = (method_name, kwargs) pickled over a Pipe; response =
(ok, result). `term_stats` is the one coordinator-specific method — it
returns {term: df} so the coordinator can derive GLOBAL idfs without
shipping posting blobs. Worker exceptions come back as (False, repr) and
re-raise in the coordinator with the shard index attached.
"""

from __future__ import annotations

import multiprocessing as mp
import os


def _worker_main(conn, shard_dir: str, live: bool = False) -> None:
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    if live:
        from discogsography_spark.streaming.incremental import MergedSearcher

        searcher = MergedSearcher(shard_dir)
    else:
        from discogsography_spark.query.engine import LocalSearcher

        searcher = LocalSearcher(shard_dir)
    while True:
        try:
            msg = conn.recv()
        except (EOFError, OSError):
            break
        if msg is None:
            break
        method, kwargs = msg
        try:
            # per-query budget rides the RPC as a reserved kwarg: the
            # worker arms its searcher's deadline for just this call
            bm = kwargs.pop("_budget_ms", None) if kwargs else None
            if method == "term_stats":
                out = searcher.term_dfs(kwargs["terms"])
            elif bm is not None:
                with searcher.deadline(bm):
                    out = getattr(searcher, method)(**kwargs)
            else:
                out = getattr(searcher, method)(**kwargs)
            conn.send((True, out))
        except Exception as e:  # ship, don't kill the worker
            conn.send((False, (type(e).__name__, str(e))))
        # KeyboardInterrupt/SystemExit deliberately NOT caught: a Ctrl-C
        # to the process group must terminate workers, not be swallowed
        # and reported as a shard query failure


def _pick_start_method() -> str:
    """fork is fastest (workers inherit the imported package), but forking
    a multithreaded process — e.g. a live PySpark driver with JVM socket
    threads and Arrow state — is unsafe: a thread can hold a lock at fork
    time and deadlock the child. Workers rebuild their LocalSearcher from
    shard_dir regardless, so spawn only costs startup time; pick it
    whenever this process has more than the main thread AND __main__ can be
    re-executed from a file (spawn's prepare step runs the parent's main
    script under ``__mp_main__``; a ``python -c``/stdin parent has no file
    and would crash every worker). In the remaining corner — multithreaded
    parent without a runnable __main__ — fall back to fork with a warning:
    the workers only touch freshly-rebuilt state, so the residual risk is a
    lock held across fork inside an unrelated library."""
    import sys
    import threading

    if threading.active_count() <= 1:
        return "fork"
    main_mod = sys.modules.get("__main__")
    main_file = getattr(main_mod, "__file__", None)
    if main_file and os.path.exists(main_file):
        return "spawn"
    import warnings

    warnings.warn(
        "ShardWorkerPool: multithreaded parent without a re-runnable "
        "__main__ — forking anyway; pass start_method='spawn' from a "
        "script entry point for full safety",
        RuntimeWarning,
        stacklevel=3,
    )
    return "fork"


def _rebuild_error(method: str, shard: int, err) -> BaseException:
    """Re-raise a worker-side failure as the SAME exception type when it is
    one of the engine's contract errors — `parallel=True` must not change
    which exceptions a caller can catch vs the sequential loop. Unknown
    types fall back to RuntimeError with the shard attached."""
    type_name, msg = err if isinstance(err, tuple) else (None, str(err))
    text = f"shard {shard} failed in {method}: {msg}"
    known: dict[str, type[BaseException]] = {
        "ValueError": ValueError,
        "KeyError": KeyError,
        "NotImplementedError": NotImplementedError,
        "FileNotFoundError": FileNotFoundError,
    }
    try:
        from discogsography_spark.query.boolquery import BoolQueryError

        known["BoolQueryError"] = BoolQueryError
    except ImportError:  # pragma: no cover
        pass
    try:
        from discogsography_spark.query.engine import QueryBudgetExceeded

        known["QueryBudgetExceeded"] = QueryBudgetExceeded
    except ImportError:  # pragma: no cover
        pass
    cls = known.get(type_name, RuntimeError)
    return cls(text)


class ShardWorkerPool:
    """One forked worker per shard; requests fan out, responses gather in
    shard order. Single-coordinator use (calls are not thread-safe)."""

    def __init__(
        self,
        shard_dirs: list[str],
        start_method: str | None = None,
        live: bool = False,
    ):
        self._dirs = list(shard_dirs)
        self._live = live  # workers open MergedSearcher (base+deltas+tombs)
        self._ctx = mp.get_context(start_method or _pick_start_method())
        self._conns = []
        self._procs = []
        for i in range(len(shard_dirs)):
            self._conns.append(None)
            self._procs.append(None)
            self._spawn(i)

    def _spawn(self, i: int) -> None:
        parent, child = self._ctx.Pipe()
        p = self._ctx.Process(
            target=_worker_main,
            args=(child, self._dirs[i], self._live),
            daemon=True,
        )
        p.start()
        child.close()
        old = self._conns[i]
        if old is not None:
            try:
                old.close()
            except OSError:
                pass
        self._conns[i] = parent
        self._procs[i] = p

    def call(self, method: str, kwargs_list: list[dict | None]) -> list:
        """Invoke `method` on every shard whose kwargs is not None
        (None = shard skipped, e.g. a conjunctive term it lacks); returns
        per-shard results in shard order with None at skipped slots.

        A dead worker (EOF/broken pipe — the process was killed or OOMed)
        is respawned from its shard directory and the request retried ONCE
        — the restart policy of a real per-shard serving node; a second
        failure raises."""
        live = [i for i, kw in enumerate(kwargs_list) if kw is not None]
        out: list = [None] * len(kwargs_list)
        retry: list[int] = []
        first_err: tuple[int, object] | None = None
        for i in live:
            try:
                self._conns[i].send((method, kwargs_list[i]))
            except (BrokenPipeError, OSError):
                self._spawn(i)
                retry.append(i)
        # ALWAYS drain every pending response before raising anything —
        # leaving an unread response in a pipe would desync the protocol
        # and make every later call on this pool return the previous
        # query's payloads
        for i in live:
            if i in retry:
                continue
            try:
                ok, r = self._conns[i].recv()
            except (EOFError, OSError):
                self._spawn(i)
                retry.append(i)
                continue
            if not ok and first_err is None:
                first_err = (i, r)
            elif ok:
                out[i] = r
        for i in retry:
            self._conns[i].send((method, kwargs_list[i]))
            ok, r = self._conns[i].recv()  # second death propagates
            if not ok and first_err is None:
                first_err = (i, r)
            elif ok:
                out[i] = r
        if first_err is not None:
            raise _rebuild_error(method, *first_err)
        return out

    def close(self) -> None:
        for c in self._conns:
            try:
                c.send(None)
                c.close()
            except OSError:
                pass
        for p in self._procs:
            p.join(timeout=5)
        self._conns, self._procs = [], []

    def __del__(self):  # best-effort; workers are daemons regardless
        try:
            self.close()
        except Exception:
            pass
