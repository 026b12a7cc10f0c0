"""Vectorized hash-bucketed groupby-aggregate.

Ray Data's ``groupby().aggregate()`` reduce step applies per-group
Python logic in the reducer (~180 µs/group measured on this host),
which is fine for rollups with dozens of groups but catastrophic for
corpus-scale group counts: the MinHash/SRP candidate-pair distinct over
140 k pair rows spent ~27 s in a single-partition reduce, and the exact
hash-shuffle strategy (``ShuffleStrategy.HASH_SHUFFLE``) only trims
that to ~7 s because the per-group cost remains.

This helper keeps identical semantics for the *decomposable* aggregates
(count / sum / min / max / mean) while running both the combine and the
reduce through Arrow's C++ hash aggregation:

1. per-batch partial ``Table.group_by`` (the combiner — one row per
   group per upstream block),
2. a deterministic hash-bucket column over the key tuple,
3. a sort shuffle on the small int bucket key only (the payload at this
   point is already combiner-sized, never the corpus), and
4. one vectorized Arrow ``group_by`` merge per bucket.

Measured on the candidate-pair distinct micro (140 k rows → 75 k
groups, 16 CPUs): 8.6 s → 0.23 s.

Scale contract: one bucket = one task, so ``num_buckets`` must be sized
so the largest bucket's distinct groups fit in one worker's heap.  The
default scales with the cluster (2× total CPUs, floor 32), so the
merge neither caps parallelism nor packs an outsized share of the
group universe into one worker.  Bucket assignment is deterministic across processes
(splitmix-style integer mix / pandas' fixed-key siphash), which is what
guarantees every partial of a group meets in exactly one bucket.

The per-group reduce cost this routes around mirrors the reference's
own move away from per-file shell dispatch to batched engine calls
(/root/reference/pmocr.sh:1485-1560 runs one engine process per file;
the batch CLI amortizes it) — same amortization, applied to the
reducer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

__all__ = ["grouped_aggregate", "distinct", "ray_aggregate"]


def _default_buckets() -> int:
    """One bucket ≈ one reduce task: scale with the cluster so the
    merge neither caps parallelism below the core count nor packs an
    outsized share of the group universe into one worker.  2× total
    CPUs (floor 32) keeps two waves of reduce tasks per slot."""
    try:
        import ray

        return max(32, 2 * int(ray.cluster_resources().get("CPU", 16)))
    except Exception:  # pragma: no cover - ray not initialised
        return 32

# splitmix64 constants — fixed, process-independent
_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)
_GOLD = np.uint64(0x9E3779B97F4A7C15)
_FNV = np.uint64(1099511628211)


def _hash_column(col: pa.ChunkedArray) -> np.ndarray:
    """Deterministic vectorized uint64 hash of one key column."""
    if pa.types.is_integer(col.type) and col.null_count == 0:
        arr = col.combine_chunks()
        if pa.types.is_unsigned_integer(arr.type):
            # full-range uint64 (e.g. MinHash buckets) would overflow an
            # int64 cast — widen within the unsigned family instead
            v = arr.cast(pa.uint64()).to_numpy(
                zero_copy_only=False).astype(np.uint64, copy=False)
        else:
            v = arr.cast(pa.int64()).to_numpy(
                zero_copy_only=False).view(np.uint64)
        h = (v + _GOLD)
        h ^= h >> np.uint64(33)
        h *= _MIX1
        h ^= h >> np.uint64(33)
        h *= _MIX2
        h ^= h >> np.uint64(33)
        return h
    # strings / nullable / other types: pandas' fixed-key siphash.
    # Nulls all hash to one sentinel — only BUCKET placement depends on
    # the hash, so colliding null with the sentinel string is harmless.
    s = col.to_pandas()
    if s.isna().any():
        s = s.astype(object).where(s.notna(), "\x00__null__")
    return pd.util.hash_array(
        s.to_numpy(), categorize=False).astype(np.uint64)


def _bucket_of(t: pa.Table, keys: list[str], num_buckets: int) -> pa.Array:
    h = np.full(len(t), _GOLD, dtype=np.uint64)
    for k in keys:
        h = h * _FNV ^ _hash_column(t[k])
    return pa.array((h % np.uint64(num_buckets)).astype(np.int64))


# agg fn → (partial arrow spec builder, merge arrow fn, needs_cast_back)
_SUPPORTED = ("count", "sum", "min", "max", "mean")


def grouped_aggregate(
    ds: rd.Dataset,
    keys: list[str] | str,
    aggs: list[tuple[str | None, str, str]],
    *,
    num_buckets: int | None = None,
    seed_schema: pa.Schema | None = None,
) -> rd.Dataset:
    """``ds.groupby(keys).aggregate(...)`` for decomposable aggregates,
    executed entirely through Arrow hash aggregation (see module doc).

    ``aggs`` is a list of ``(column, fn, alias)`` with fn one of
    ``count | sum | min | max | mean``; for ``count`` the column is
    ignored (row count, like Ray's ``Count()``).  ``aggs=[]`` is a
    pure distinct over the keys.  Null handling matches Ray/SQL:
    sum/min/max/mean skip nulls; count counts rows.

    A fully-empty input leaves a schema-less empty dataset (the merge
    fn never runs); pass ``seed_schema`` — the OUTPUT schema (keys then
    aliases, in order) — to union a typed zero-row seed so downstream
    selects/joins still see real columns.  It must be statically known
    by the caller: deriving it here would force ``ds.schema()``, which
    partially executes lazy upstreams (a double-execution tax on the
    expensive pipelines this helper exists to speed up).
    """
    if isinstance(keys, str):
        keys = [keys]
    if num_buckets is None:
        num_buckets = _default_buckets()
    for _, fn, _a in aggs:
        if fn not in _SUPPORTED:
            raise ValueError(f"unsupported agg fn {fn!r}; "
                             f"use one of {_SUPPORTED}")

    # unique partial specs — (col, arrow_fn) → partial column name
    partial_specs: dict[tuple, str] = {}

    def _need(col: str | None, arrow_fn: str) -> str:
        spec = (col, arrow_fn)
        if spec not in partial_specs:
            partial_specs[spec] = (
                "count_all" if arrow_fn == "count_all"
                else f"{col}_{arrow_fn}")
        return partial_specs[spec]

    plans = []  # (alias, kind, partial col names)
    for col, fn, alias in aggs:
        if fn == "count":
            plans.append((alias, "count", [_need(None, "count_all")]))
        elif fn == "mean":
            plans.append((alias, "mean",
                          [_need(col, "sum"), _need(col, "count")]))
        else:
            plans.append((alias, fn, [_need(col, fn)]))

    arrow_partials = [
        (([] if c is None else c), f) for (c, f) in partial_specs
    ]

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(arrow_partials)
        g = g.append_column("_bkt", _bucket_of(g, keys, num_buckets))
        return g

    # merge fns per partial column: counts re-sum, the rest are
    # idempotent under their own fn
    merge_specs = []
    for (col, fn), pname in partial_specs.items():
        merge_fn = "sum" if fn in ("count_all", "count", "sum") else fn
        merge_specs.append((pname, merge_fn))

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(merge_specs)
        cols = {k: g[k] for k in keys}
        for alias, kind, pnames in plans:
            if kind == "count":
                cols[alias] = pc.cast(g[f"{pnames[0]}_sum"], pa.int64())
            elif kind == "mean":
                s = pc.cast(g[f"{pnames[0]}_sum"], pa.float64())
                n = pc.cast(g[f"{pnames[1]}_sum"], pa.float64())
                cols[alias] = pc.divide(s, n)
            else:
                mf = "sum" if kind == "sum" else kind
                cols[alias] = g[f"{pnames[0]}_{mf}"]
        return pa.table(cols)

    merged = (ds.map_batches(combine, batch_format="pyarrow")
              .groupby("_bkt")
              .map_groups(merge, batch_format="pyarrow"))

    if seed_schema is not None:
        seed = pa.Table.from_arrays(
            [pa.array([], f.type) for f in seed_schema],
            schema=seed_schema)

        # Ray's groupby machinery emits SCHEMA-LESS (zero-column) empty
        # blocks on empty input; a typed seed union alone is not enough
        # for downstream hash joins, whose per-partition acero join
        # crashes on any block lacking the key column.  Coerce those
        # blocks to the seed schema so every block is typed.
        def _coerce(t: pa.Table) -> pa.Table:
            return seed if t.num_columns == 0 else t

        merged = merged.map_batches(_coerce, batch_format="pyarrow")
        merged = merged.union(rd.from_arrow(seed))
        # NOTE: the seed union preserves Dataset.schema() and typed
        # blocks for downstream Ray consumers, but this Ray version's
        # to_pandas()/iter_batches() still drop a ZERO-ROW dataset's
        # schema entirely (even plain from_arrow(empty_typed_table)
        # yields a zero-column frame).  Callers that hand a possibly-
        # empty result to pandas must re-type the empty frame
        # themselves (see _q_rare_term_pairs).
    return merged


def distinct(ds: rd.Dataset, keys: list[str] | str, *,
             num_buckets: int | None = None,
             seed_schema: pa.Schema | None = None) -> rd.Dataset:
    """Distinct key tuples — ``grouped_aggregate`` with no aggregates."""
    return grouped_aggregate(ds, keys, [], num_buckets=num_buckets,
                             seed_schema=seed_schema)


def ray_aggregate(ds: rd.Dataset, keys: list[str] | str, *aggs,
                  num_buckets: int | None = None,
                  seed_schema: pa.Schema | None = None) -> rd.Dataset:
    """Drop-in for ``ds.groupby(keys).aggregate(*ray_aggs)`` over the
    decomposable Ray aggregate objects (Count/Sum/Min/Max/Mean) —
    introspects each aggregate's target column and alias and routes
    through :func:`grouped_aggregate`.  Raises on aggregates this
    module cannot reproduce exactly (so a silent semantics change is
    impossible); use Ray's native groupby for those."""
    spec = []
    for a in aggs:
        kind = type(a).__name__.lower()
        if kind not in _SUPPORTED:
            raise ValueError(
                f"{type(a).__name__} is not decomposable here; "
                "use Ray's native groupby().aggregate()")
        col = getattr(a, "_target_col_name", None)
        if kind == "count" and (col is not None
                                or getattr(a, "_ignore_nulls", False)):
            raise ValueError("only bare row-count Count() is supported")
        spec.append((col, kind, a.name))
    return grouped_aggregate(ds, keys, spec, num_buckets=num_buckets,
                             seed_schema=seed_schema)
