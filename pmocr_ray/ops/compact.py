"""Upsert compaction: latest row per key — the CDC/changelog collapse.

A corpus re-crawl or changelog stream carries many versions of a key;
training-data builds want exactly the newest.  Shape: per-batch LOCAL
argmax per key (the global latest for a key is the latest among
per-batch latests — same subset argument as top-n-per-group), then the
exact argmax inside ``groupby(key).map_groups``.  The shuffle moves at
most one row per (key, batch) — collapse happens before the exchange,
so a hot key re-crawled 10⁶ times still ships O(n_batches) rows, not
10⁶.

Reference parity: the reference's done-suffix rename makes reprocessing
idempotent per file (/root/reference/pmocr.sh:2088-2096); compaction is
the keyed-row generalization: newest version wins, order total.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd


def compact_latest(ds: rd.Dataset, key: str, order_cols: list[str],
                   descending: list[bool] | None = None) -> rd.Dataset:
    """Keep exactly one row per ``key``: the first under ``order_cols``
    sorted with ``descending`` flags (default: all descending — i.e.
    the row with the greatest (version, …) wins; ties must be broken
    by including a unique column last)."""
    desc = descending if descending is not None else [True] * len(order_cols)
    ascending = [not d for d in desc]

    def local_cap(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values([key, *order_cols],
                            ascending=[True, *ascending])
        return pa.Table.from_pandas(df.groupby(key, sort=False).head(1),
                                    preserve_index=False)

    def exact(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_cols, ascending=ascending).head(1)

    return (ds.map_batches(local_cap, batch_format="pyarrow")
            .groupby(key)
            .map_groups(exact, batch_format="pandas"))
