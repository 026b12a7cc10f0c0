"""Broadcast semi/anti join helpers — the small-side join primitives.

Reference parity: pmOCR's only join-like operation is the anti-join of
discovered candidates against the done/failed sets, encoded as ``find``
exclusion predicates (/root/reference/pmocr.sh:2126-2144,2183).  Here
the small side is broadcast once (``ray.put``) and each batch filters
vectorized with ``pc.is_in`` — no shuffle.  For two large sides use
``Dataset.join`` (hash-partitioned; see ``__ray_entry__`` query
``orders_by_segment``).
"""

from __future__ import annotations

from collections.abc import Iterable

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def _key_array(keys: Iterable) -> pa.Array:
    return keys if isinstance(keys, pa.Array) else pa.array(list(keys))


def broadcast_semi_join(ds: rd.Dataset, key: str, keys: Iterable) -> rd.Dataset:
    """Keep rows whose ``key`` is in the broadcast key set."""
    ref = ray.put(_key_array(keys))

    def fn(t: pa.Table) -> pa.Table:
        value_set = ray.get(ref)  # zero-copy from the local object store
        return t.filter(pc.is_in(t[key], value_set=value_set))

    return ds.map_batches(fn, batch_format="pyarrow")


def broadcast_anti_join(ds: rd.Dataset, key: str, keys: Iterable) -> rd.Dataset:
    """Drop rows whose ``key`` is in the broadcast key set (the
    done-manifest exclusion shape)."""
    ref = ray.put(_key_array(keys))

    def fn(t: pa.Table) -> pa.Table:
        value_set = ray.get(ref)
        mask = pc.is_in(t[key], value_set=value_set)
        return t.filter(pc.invert(mask))

    return ds.map_batches(fn, batch_format="pyarrow")


def broadcast_lookup(ds: rd.Dataset, key: str, mapping: dict,
                     out_column: str, default=None) -> rd.Dataset:
    """Map-side dimension lookup: append ``out_column`` =
    ``mapping[key]`` per row (broadcast dict, no shuffle)."""
    ref = ray.put(mapping)

    def fn(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        vals = [m.get(k, default) for k in t[key].to_pylist()]
        return t.append_column(out_column, pa.array(vals))

    return ds.map_batches(fn, batch_format="pyarrow")


def hash_anti_join(left: rd.Dataset, right: rd.Dataset, on: str,
                   right_on: str | None = None,
                   num_partitions: int = 16) -> rd.Dataset:
    """Distributed anti join for two LARGE sides (neither fits a
    broadcast): hash-partitioned ``left_outer`` join against the
    right side's per-key rollup, keep rows with no match.

    The right side is pre-aggregated to one row per key *before* the
    join, so the exchange moves distinct keys (plus a marker), never
    the right table's payload — the same shrink-before-shuffle
    discipline as the aggregate-before-join star queries.
    """
    from ray.data.aggregate import Count

    r_on = right_on or on
    marker = (right.select_columns([r_on])
              .groupby(r_on).aggregate(Count(alias_name="__m")))
    joined = left.join(marker, join_type="left_outer",
                       num_partitions=num_partitions,
                       on=(on,), right_on=(r_on,))
    def keep_unmatched(t: pa.Table) -> pa.Table:
        out = t.filter(pc.is_null(t["__m"]))
        drop = [c for c in ("__m", r_on if r_on != on else None)
                if c in out.column_names]
        return out.drop_columns(drop)

    return joined.map_batches(keep_unmatched, batch_format="pyarrow")
