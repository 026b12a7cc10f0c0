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
            t = pd.concat(frames).sort_values(["ts", "event_id"])
            for uid, g in t.groupby("user_id", sort=False):
                sess_id = (g["ts"].diff() > self.gap).cumsum()
                agg = g.groupby(sess_id).agg(
                    start=("ts", "min"), end=("ts", "max"),
                    n=("event_id", "count"))
                rows = list(agg.itertuples(index=False))
                carried = self.open.pop(int(uid), None)
                if carried is not None:
                    c_start, c_end, c_n = carried
                    if rows and rows[0].start - c_end <= self.gap:
                        first = rows[0]
                        rows[0] = type(first)(c_start, first.end,
                                              first.n + c_n)
                    else:
                        closed.append((int(uid), c_start, c_end, c_n))
                for r in rows[:-1]:
                    closed.append((int(uid), r.start, r.end, int(r.n)))
                last = rows[-1]
                self.open[int(uid)] = (last.start, last.end, int(last.n))
        return _sessions_table(closed)

    def flush(self) -> pa.Table:
        closed = [(uid, s, e, n)
                  for uid, (s, e, n) in sorted(self.open.items())]
        self.open.clear()
        return _sessions_table(closed)


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


def streaming_sessionize(
    events: rd.Dataset,
    *,
    gap_minutes: int = 30,
    n_chunks: int = 4,
    n_buckets: int = 4,
    spool_dir: str = "/tmp/pmocr_ray_stream_spool",
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

    lo = events.min("ts")
    hi = events.max("ts")
    lo64 = np.datetime64(lo, "us").astype(np.int64)
    hi64 = np.datetime64(hi, "us").astype(np.int64)
    span = max(int(hi64 - lo64) + 1, 1)

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

    shutil.rmtree(spool_dir, ignore_errors=True)
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
    return pa.concat_tables([t for t in out if t.num_rows])
