"""Cross-batch stateful streaming operators.

Ray Data has no event-time windows or watermarks; the streaming shape
here is the partitioned-log pattern: the input is spooled ONCE
(distributed pass) as a hive-partitioned log ``chunk=<t>/bucket=<h>/``
— chunks are disjoint time ranges processed in order, buckets are a
hash partition of the key space — and a pool of **stateful actors**
(one per bucket) consumes its bucket's rows chunk by chunk, carrying
open-window state between chunks in actor memory.  This mirrors the
reference's long-lived service processes holding in-flight state
between poll rounds (/root/reference/pmocr.sh:1906-1969 service loop),
lifted to per-key windows.

Scale shape: the spool pass is one map + partitioned write (no
driver materialization); each round every actor reads only its own
``chunk/bucket`` files; state per actor is bounded by *open* windows
in its key range, not by history.  Closed windows stream back per
round (they are the small output, like verified pairs in the dedup
family).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd


@ray.remote
class SessionBucket:
    """One key-hash bucket's session state, fed chronological chunks.

    ``feed`` sessionizes its chunk per user (vectorized gap/cumsum, the
    same kernel as the batch ``sessionize``), stitches the first
    within-chunk session onto a carried open session when the gap
    allows, emits every session that can no longer grow, and keeps the
    last one open.  ``flush`` closes the remainder.
    """

    def __init__(self, gap_minutes: int = 30) -> None:
        import pandas as pd

        self.gap = pd.Timedelta(minutes=gap_minutes)
        # user_id -> (session_start, session_end, n_events)
        self.open: dict[int, tuple] = {}

    def feed(self, paths: list[str]) -> pa.Table:
        import pandas as pd

        frames = [pq.read_table(p, columns=["user_id", "ts", "event_id"])
                  .to_pandas() for p in paths]
        closed: list[tuple] = []
        if frames:
            # ONE boundary-aware sessionization over the whole chunk
            # (the per-user pandas groupby+agg this replaces cost
            # ~0.5 ms per user); per-user work below is only the
            # open-state dict traffic and the carried-stitch scalar
            # compare — the inherently keyed part of the operator.
            t = (pd.concat(frames)
                 .sort_values(["user_id", "ts", "event_id"],
                              kind="mergesort"))
            brk = (t["user_id"].ne(t["user_id"].shift())
                   | (t["ts"].diff() > self.gap))
            agg = t.groupby(brk.cumsum()).agg(
                user_id=("user_id", "first"), start=("ts", "min"),
                end=("ts", "max"), n=("event_id", "count"))
            users = agg["user_id"].to_numpy()
            starts = list(agg["start"])
            ends = list(agg["end"])
            ns = agg["n"].to_numpy(dtype="int64")
            firsts = np.concatenate([[True], users[1:] != users[:-1]])
            lasts = np.concatenate([users[1:] != users[:-1], [True]])
            n_add = np.zeros(len(agg), np.int64)
            for j in np.flatnonzero(firsts):
                carried = self.open.pop(int(users[j]), None)
                if carried is None:
                    continue
                c_start, c_end, c_n = carried
                if starts[j] - c_end <= self.gap:
                    starts[j] = c_start
                    n_add[j] = c_n
                else:
                    closed.append((int(users[j]), c_start, c_end, c_n))
            ns = ns + n_add
            for j in range(len(agg)):
                row = (int(users[j]), starts[j], ends[j], int(ns[j]))
                if lasts[j]:
                    self.open[row[0]] = row[1:]
                else:
                    closed.append(row)
        return _sessions_table(closed)

    def flush(self) -> pa.Table:
        closed = [(uid, s, e, n)
                  for uid, (s, e, n) in sorted(self.open.items())]
        self.open.clear()
        return _sessions_table(closed)


def _ts_bounds_us(events: rd.Dataset) -> tuple[int, int] | None:
    """Global (min, max) of the ts column in µs — ONE aggregate pass.
    ``None`` on an empty input (callers return their typed empty
    result, matching the batch operators they claim parity with)."""
    from ray.data.aggregate import Max, Min

    r = events.aggregate(Min("ts", alias_name="lo"),
                         Max("ts", alias_name="hi"))
    if not r or r.get("lo") is None:
        return None
    return (int(np.datetime64(r["lo"], "us").astype(np.int64)),
            int(np.datetime64(r["hi"], "us").astype(np.int64)))


def _resolve_spool(spool_dir: str | None, prefix: str) -> tuple[str, bool]:
    """Resolve a run's spool directory.  ``None`` (the default) makes a
    fresh private tempdir, so two concurrent runs can NEVER clobber
    each other — a fixed shared path + rmtree would silently delete
    the other run's spool mid-rounds and yield partial results (the
    per-round reader treats a missing chunk/bucket dir as a sparse
    partition, which is normal).  A caller-supplied path is cleared
    and reused: the caller owns its uniqueness and its lifetime.
    Returns (path, owned); owned spools are deleted after a
    successful run (kept on error, for debugging)."""
    if spool_dir is None:
        import tempfile

        return tempfile.mkdtemp(prefix=prefix), True
    shutil.rmtree(spool_dir, ignore_errors=True)
    return spool_dir, False


def _sessions_table(rows: list[tuple]) -> pa.Table:
    import pandas as pd

    return pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "session_start": pa.array(
            pd.to_datetime([r[1] for r in rows]), pa.timestamp("us")),
        "session_end": pa.array(
            pd.to_datetime([r[2] for r in rows]), pa.timestamp("us")),
        "n_events": pa.array([r[3] for r in rows], pa.int64()),
    })


@ray.remote
class WindowBucket:
    """Per-bucket tumbling-window counts with watermark-gated emission.

    Windows are complete — and emitted — once the watermark passes
    ``window_end + max_delay`` (the bounded-disorder assumption every
    watermark system rests on: an event's arrival trails its event
    time by at most ``max_delay``).  Late rows (arrival after
    ``window_end + lateness``) are counted per window before emission,
    so emitted rows are final.
    """

    def __init__(self, window_us: int, lateness_us: int,
                 max_delay_us: int) -> None:
        self.window_us = window_us
        self.lateness_us = lateness_us
        self.max_delay_us = max_delay_us
        self.acc: dict[int, list] = {}  # win_start -> [n_events, n_late]
        self.done: set[int] = set()

    def feed(self, paths: list[str], watermark_us: int) -> pa.Table:
        for p in paths:
            t = pq.read_table(p, columns=["ts_us", "arrival_us"])
            ts = np.asarray(t["ts_us"].to_numpy(), np.int64)
            arr = np.asarray(t["arrival_us"].to_numpy(), np.int64)
            win = ts // self.window_us * self.window_us
            late = arr > win + self.window_us + self.lateness_us
            for w in np.unique(win):
                if int(w) in self.done:
                    # not an assert: must hold under python -O and on
                    # real data, else an already-emitted 'final' window
                    # would silently re-accumulate and emit twice
                    raise ValueError(
                        f"window {int(w)} already emitted: an arrival "
                        f"violated the max_delay={self.max_delay_us}us "
                        "contract; raise max_delay or route late rows "
                        "to a side output")
                m = win == w
                a = self.acc.setdefault(int(w), [0, 0])
                a[0] += int(m.sum())
                a[1] += int(late[m].sum())
        ready = sorted(
            w for w in self.acc
            if w + self.window_us + self.max_delay_us <= watermark_us)
        rows = [(w, *self.acc.pop(w)) for w in ready]
        self.done.update(w for w, _, _ in rows)
        return _windows_table(rows)

    def flush(self) -> pa.Table:
        rows = [(w, *self.acc[w]) for w in sorted(self.acc)]
        self.acc.clear()
        return _windows_table(rows)


def _windows_table(rows: list[tuple]) -> pa.Table:
    return pa.table({
        "ws_us": pa.array([r[0] for r in rows], pa.int64()),
        "n_events": pa.array([r[1] for r in rows], pa.int64()),
        "n_late": pa.array([r[2] for r in rows], pa.int64()),
    })


def streaming_windows(
    events: rd.Dataset,
    *,
    window_minutes: int = 60,
    lateness_minutes: int = 3,
    watermark_lag_minutes: int = 30,
    max_delay_minutes: int = 7,
    n_chunks: int = 4,
    n_buckets: int = 4,
    spool_dir: str | None = None,
) -> pa.Table:
    """Event-time tumbling windows with a watermark, streaming-shaped:
    rows are spooled in ARRIVAL order (chunk = arrival-time range,
    bucket = window hash — a window's rows always meet the same
    actor), the watermark after each chunk is that chunk's arrival
    upper bound minus the configured lag, and complete windows are
    emitted incrementally.  Arrival = ts + (event_id % 7) minutes (the
    same synthetic disorder as the batch ``late_data_window``); the
    final row set is identical to the batch operator for any chunking
    because late classification depends only on (ts, arrival)."""
    import pyarrow.compute as pc

    US_MIN = 60_000_000
    window_us = window_minutes * US_MIN
    lateness_us = lateness_minutes * US_MIN
    lag_us = watermark_lag_minutes * US_MIN
    max_delay_us = max_delay_minutes * US_MIN

    def with_arrival(t: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        delay = pc.multiply(
            pc.subtract(t["event_id"],
                        pc.multiply(pc.divide(t["event_id"], 7), 7)),
            US_MIN)
        return pa.table({"ts_us": ts,
                         "arrival_us": pc.add(ts, pc.cast(delay,
                                                          pa.int64()))})

    tagged = events.map_batches(with_arrival, batch_format="pyarrow")

    empty = pa.table({
        "window_start": pa.array([], pa.timestamp("us")),
        "n_events": pa.array([], pa.int64()),
        "n_late": pa.array([], pa.int64()),
        "status": pa.array([], pa.string()),
    })

    from ray.data.aggregate import Max, Min
    lohi = tagged.aggregate(Min("arrival_us", alias_name="lo"),
                            Max("arrival_us", alias_name="hi"))
    if not lohi or lohi.get("lo") is None:
        return empty
    lo, hi = int(lohi["lo"]), int(lohi["hi"])
    span = max(hi - lo + 1, 1)

    def spool_tag(t: pa.Table) -> pa.Table:
        arr = np.asarray(t["arrival_us"].to_numpy(), np.int64)
        chunk = ((arr - lo) * n_chunks // span).astype(np.int64)
        win_idx = np.asarray(t["ts_us"].to_numpy(), np.int64) // window_us
        return (t.append_column("chunk", pa.array(chunk))
                .append_column("bucket",
                               pa.array(win_idx % n_buckets)))

    spool_dir, own_spool = _resolve_spool(spool_dir, "pmocr_wspool_")
    (tagged.map_batches(spool_tag, batch_format="pyarrow")
     .write_parquet(spool_dir, partition_cols=["chunk", "bucket"]))

    actors = [WindowBucket.remote(window_us, lateness_us, max_delay_us)
              for _ in range(n_buckets)]
    parts: list[pa.Table] = []
    for chunk in range(n_chunks):
        # arrival upper bound of this chunk → the advancing watermark
        wm = lo + span * (chunk + 1) // n_chunks - lag_us
        futures = []
        for b, actor in enumerate(actors):
            d = os.path.join(spool_dir, f"chunk={chunk}", f"bucket={b}")
            if not os.path.isdir(d):
                continue
            paths = sorted(os.path.join(d, f) for f in os.listdir(d)
                           if f.endswith(".parquet"))
            futures.append(actor.feed.remote(paths, wm))
        parts.extend(ray.get(futures))
    parts.extend(ray.get([a.flush.remote() for a in actors]))
    if own_spool:
        shutil.rmtree(spool_dir, ignore_errors=True)
    parts = [t for t in parts if t.num_rows]
    if not parts:
        return empty
    allw = pa.concat_tables(parts)
    final_wm = hi - lag_us
    closed = pc.less_equal(pc.add(allw["ws_us"], window_us),
                           pa.scalar(final_wm, pa.int64()))
    return pa.table({
        "window_start": pc.cast(allw["ws_us"], pa.timestamp("us")),
        "n_events": allw["n_events"],
        "n_late": allw["n_late"],
        "status": pc.if_else(closed, "closed", "open"),
    })


@ray.remote
class SeenIndexBucket:
    """Shared mutable membership index, one shard per key-hash bucket —
    the raw-actor pattern the Dataset API can't express (a growing
    index consulted AND updated by every chunk in order).  ``feed``
    returns each chunk's first-seen (key, day) pairs; keys already in
    the index are absorbed silently.
    """

    def __init__(self) -> None:
        self.seen: set[int] = set()

    def feed(self, paths: list[str]) -> pa.Table:
        import pandas as pd

        frames = [pq.read_table(p, columns=["user_id", "day"]).to_pandas()
                  for p in paths]
        if not frames:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "day": pa.array([], pa.int64())})
        t = pd.concat(frames).sort_values(["day", "user_id"])
        first = t.groupby("user_id", sort=True)["day"].min()
        fresh = [(int(u), int(d)) for u, d in first.items()
                 if int(u) not in self.seen]
        self.seen.update(u for u, _ in fresh)
        return pa.table({
            "user_id": pa.array([u for u, _ in fresh], pa.int64()),
            "day": pa.array([d for _, d in fresh], pa.int64()),
        })


def streaming_first_seen(
    events: rd.Dataset,
    *,
    n_chunks: int = 4,
    n_buckets: int = 4,
    spool_dir: str | None = None,
) -> pa.Table:
    """Per-day new-user counts via a streaming first-seen index: events
    spool as (chunk=time-range, bucket=user-hash) and each bucket's
    index actor absorbs its chunks in order, emitting only
    never-seen-before keys.  Equivalent to the batch min-day rollup
    (``new_users_curve``) for any chunking because chunks are processed
    in global time order.  The per-actor state is the key set of its
    bucket — the streaming analogue of the done-manifest anti-join."""
    import pyarrow.compute as pc

    empty = pa.table({"day": pa.array([], pa.int64()),
                      "n_new": pa.array([], pa.int64()),
                      "cum_users": pa.array([], pa.int64())})
    bounds = _ts_bounds_us(events)
    if bounds is None:
        return empty
    lo64, hi64 = bounds
    span = max(hi64 - lo64 + 1, 1)

    def tag(t: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                                pa.int64()).to_numpy())
        uid = np.asarray(t["user_id"].to_numpy(zero_copy_only=False),
                         np.int64)
        return pa.table({
            "user_id": pa.array(uid),
            "day": pa.array(ts // 86_400_000_000),
            "chunk": pa.array((ts - lo64) * n_chunks // span),
            "bucket": pa.array(uid % n_buckets),
        })

    spool_dir, own_spool = _resolve_spool(spool_dir, "pmocr_fspool_")
    (events.select_columns(["user_id", "ts"])
     .map_batches(tag, batch_format="pyarrow")
     .write_parquet(spool_dir, partition_cols=["chunk", "bucket"]))

    actors = [SeenIndexBucket.remote() for _ in range(n_buckets)]
    parts: list[pa.Table] = []
    for chunk in range(n_chunks):
        futures = []
        for b, actor in enumerate(actors):
            d = os.path.join(spool_dir, f"chunk={chunk}", f"bucket={b}")
            if not os.path.isdir(d):
                continue
            paths = sorted(os.path.join(d, f) for f in os.listdir(d)
                           if f.endswith(".parquet"))
            futures.append(actor.feed.remote(paths))
        parts.extend(ray.get(futures))  # ordered rounds, parallel fan-out
    if own_spool:
        shutil.rmtree(spool_dir, ignore_errors=True)
    parts = [t for t in parts if t.num_rows]
    if not parts:
        return empty
    firsts = pa.concat_tables(parts)
    # tiny driver rollup: (day → n_new) + running total over day support
    import pandas as pd

    df = (firsts.to_pandas().groupby("day").size()
          .rename("n_new").reset_index().sort_values("day"))
    df["cum_users"] = df["n_new"].cumsum()
    return pa.Table.from_pandas(
        df.astype({"day": "int64", "n_new": "int64",
                   "cum_users": "int64"}), preserve_index=False)


def streaming_sessionize(
    events: rd.Dataset,
    *,
    gap_minutes: int = 30,
    n_chunks: int = 4,
    n_buckets: int = 4,
    spool_dir: str | None = None,
) -> pa.Table:
    """Sessionize via the stateful-streaming path; result equals the
    batch ``sessionize`` for ANY (n_chunks, n_buckets) because chunks
    are processed in global time order and state is carried per user.

    One distributed pass assigns ``chunk`` (equal time ranges from the
    global [min, max] — two scalars) and ``bucket`` (user hash) and
    spools the hive-partitioned log; then each round feeds every
    bucket actor its own files concurrently (rounds are ordered, the
    intra-round fan-out is parallel)."""
    import pyarrow.compute as pc

    bounds = _ts_bounds_us(events)
    if bounds is None:
        return _sessions_table([])
    lo64, hi64 = bounds
    span = max(hi64 - lo64 + 1, 1)

    def tag(t: pa.Table) -> pa.Table:
        # normalize to µs before the int view — pandas-sourced columns
        # arrive as timestamp[ns], parquet-sourced as timestamp[us]
        ts = np.asarray(pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                                pa.int64()).to_numpy())
        chunk = ((ts - lo64) * n_chunks // span).astype(np.int64)
        bucket = (np.asarray(t["user_id"].to_numpy(zero_copy_only=False),
                             np.int64) % n_buckets)
        return (t.append_column("chunk", pa.array(chunk))
                .append_column("bucket", pa.array(bucket)))

    spool_dir, own_spool = _resolve_spool(spool_dir, "pmocr_spool_")
    (events.select_columns(["user_id", "ts", "event_id"])
     .map_batches(tag, batch_format="pyarrow")
     .write_parquet(spool_dir, partition_cols=["chunk", "bucket"]))

    actors = [SessionBucket.remote(gap_minutes) for _ in range(n_buckets)]
    out: list[pa.Table] = []
    for chunk in range(n_chunks):
        futures = []
        for b, actor in enumerate(actors):
            d = os.path.join(spool_dir, f"chunk={chunk}", f"bucket={b}")
            if not os.path.isdir(d):
                continue
            paths = sorted(os.path.join(d, f) for f in os.listdir(d)
                           if f.endswith(".parquet"))
            futures.append(actor.feed.remote(paths))
        out.extend(ray.get(futures))  # barrier: next chunk needs state
    out.extend(ray.get([a.flush.remote() for a in actors]))
    if own_spool:
        shutil.rmtree(spool_dir, ignore_errors=True)
    out = [t for t in out if t.num_rows]
    return pa.concat_tables(out) if out else _sessions_table([])
