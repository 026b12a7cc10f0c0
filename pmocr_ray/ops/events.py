"""Windowed aggregates over the events stream table.

Ray Data has no event-time windows; a tumbling window is a derived
bucket column + groupby, and per-key ordered windows are
``groupby(key).map_groups`` over ts-sorted groups (ordering assumption:
within one group, rows are sorted before use — stated per the guide).

Float discipline: sums over float64 are order-dependent under
distribution, so monetary values are aggregated as exact integer cents
(the input values are exact 2-decimal doubles) — distributed results
are then bit-equal to any oracle regardless of reduction order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def add_hour_bucket(batch: pa.Table) -> pa.Table:
    """Tumbling 1h window bucket (vectorized floor to hour)."""
    return batch.append_column("hour", pc.floor_temporal(batch["ts"], unit="hour"))


def add_value_cents(batch: pa.Table) -> pa.Table:
    """Exact integer cents from 2-decimal doubles (rint is exact here —
    no value lands on a .5 cent boundary)."""
    cents = np.rint(np.asarray(batch["value"].to_numpy(zero_copy_only=False)) * 100
                    ).astype(np.int64)
    return batch.append_column("value_cents", pa.array(cents, pa.int64()))


def events_window(events: rd.Dataset) -> rd.Dataset:
    """Tumbling 1-hour window per event_type: count + min/max value.

    Pattern: cheap vectorized bucket column, then ONE small groupby
    (the aggregate fan-in is tiny: hours × types)."""
    ds = events.map_batches(add_hour_bucket, batch_format="pyarrow")
    return ds.groupby(["hour", "event_type"]).aggregate(
        Count(alias_name="n_events"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
    )


def top_users_by_value(events: rd.Dataset, k: int = 10) -> pa.Table:
    """Top-k users by exact total cents; ties by user_id ascending.

    Pre-aggregates cents per user per batch (combiner) before the
    global groupby, then a distributed ``sort().limit(k)`` over the
    per-user rollup — only k rows ever reach the driver (scale-safe at
    any user-key cardinality)."""
    def partial(batch: pa.Table) -> pa.Table:
        b = add_value_cents(batch)
        g = b.select(["user_id", "value_cents"]).group_by("user_id").aggregate(
            [("value_cents", "sum")]
        )
        return pa.table({"user_id": g["user_id"],
                         "cents": g["value_cents_sum"]})

    per_user = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("cents", alias_name="total_cents"))
    )
    top = (per_user.sort(["total_cents", "user_id"], descending=[True, False])
           .limit(k).take_all())
    return pa.Table.from_pylist(top).select(["user_id", "total_cents"])


def sessionize(events: rd.Dataset, gap_minutes: int = 30) -> rd.Dataset:
    """Session windows per user: a new session starts after a gap of
    ``gap_minutes`` of inactivity.  Per-user ordered scan inside
    ``map_groups`` (rows ts-sorted within the group before use)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        new_session = (g["ts"].diff() > gap).cumsum()
        out = g.groupby(new_session).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "count"),
        )
        return out.reset_index(drop=True)

    return events.groupby("user_id").map_groups(per_user, batch_format="pandas")


def asof_join(events: rd.Dataset, left_type: str = "click",
              right_type: str = "view") -> rd.Dataset:
    """Per-user as-of join: attach to every ``left_type`` event the
    timestamp of the most recent strictly-preceding ``right_type``
    event by the same user (canonical order: ``(ts, event_id)``).

    Ray Data has no as-of join; the semantics are a per-key ordered
    scan, so one ``groupby(user).map_groups`` expresses it without an
    all-pairs range join: inside each (ts-sorted) group the preceding
    right-side timestamp is a vectorized shift+ffill — O(group), no
    per-row search.  Partitioning assumption: one user's events fit in
    a worker (same as :func:`sessionize`); a pathological single-user
    stream would need ts-bucket salting with boundary stitching.
    """
    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        right_ts = g["ts"].where(g["event_type"].eq(right_type))
        prev = right_ts.shift(1).ffill()
        out = g.loc[g["event_type"].eq(left_type),
                    ["event_id", "user_id", "ts"]].copy()
        out["prev_ts"] = prev[out.index]
        return out

    return events.groupby("user_id").map_groups(per_user, batch_format="pandas")
