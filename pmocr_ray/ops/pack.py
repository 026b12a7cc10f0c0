"""GPT-style sequence packing: concat-then-chunk over a document corpus.

The LM-training data layout: all documents' tokens are concatenated in
one deterministic global order and cut into fixed-size blocks; each
document is assigned the [start_block, end_block] span its tokens fall
into (documents straddle block boundaries by design — no padding).

The scale problem is the GLOBAL ORDERED PREFIX SUM of token counts.
Shape here is the classic two-pass distributed scan:

1. partition the key space into contiguous ranges (``part = doc_id //
   part_size`` — order-preserving by construction, no shuffle of rows);
2. one tiny groupby computes per-part token totals; the driver turns
   the ≤ n_parts totals into exclusive prefix offsets and broadcasts
   them (``ray.put``) — the only driver-side state is one int per part;
3. a per-part ``map_groups`` sorts its own rows by key, takes a local
   cumsum, adds the part's offset, and emits block spans — vectorized,
   O(part) memory, embarrassingly parallel across parts.

No stage ever materializes the corpus; the all-to-all is limited to the
(part, rows) co-location groupby that any per-part op needs.

Reference parity: the reference has no packing (it converts files 1:1,
/root/reference/pmocr.sh:2546-2593); this is one of the
beyond-the-reference training-data operators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Sum


def pack_sequences(docs: rd.Dataset, block_tokens: int,
                   key: str = "doc_id", column: str = "text",
                   part_size: int = 1000) -> rd.Dataset:
    """Assign each doc its token span and block span under
    concat-then-chunk packing in ascending ``key`` order.

    Returns (key, n_tokens, tok_start, block_start, block_end) where
    ``tok_start`` is the exclusive prefix sum of whitespace-token
    counts, ``block_start = tok_start // block_tokens`` and
    ``block_end = (tok_start + n_tokens - 1) // block_tokens`` (empty
    docs get ``block_end = block_start - 1``... they carry no tokens;
    we emit ``block_end = block_start`` and ``n_tokens = 0`` instead so
    the span stays well-formed).
    """
    def count_tokens(batch: pa.Table) -> pa.Table:
        # null text = zero tokens (a null would poison the cumsum)
        n = pc.fill_null(
            pc.count_substring_regex(batch[column], r"\S+").cast(pa.int64()), 0)
        part = pc.divide(batch[key], part_size).cast(pa.int64())
        return pa.table({key: batch[key], "part": part, "n_tokens": n})

    counted = docs.map_batches(count_tokens, batch_format="pyarrow")

    # pass 1: per-part totals -> exclusive prefix offsets (≤ n_parts ints)
    totals = (counted.select_columns(["part", "n_tokens"])
              .groupby("part").aggregate(Sum("n_tokens", alias_name="t"))
              .take_all())
    totals.sort(key=lambda r: r["part"])
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["part"]] = acc
        acc += r["t"]
    offsets_ref = ray.put(offsets)

    # pass 2: local ordered cumsum + broadcast offset, per part
    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offsets_ref)[int(g["part"].iloc[0])]
        g = g.sort_values(key)
        n = g["n_tokens"].to_numpy()
        start = off + np.cumsum(n) - n
        block_start = start // block_tokens
        block_end = np.where(n > 0, (start + np.maximum(n, 1) - 1)
                             // block_tokens, block_start)
        return pd.DataFrame({
            key: g[key].to_numpy(),
            "n_tokens": n,
            "tok_start": start,
            "block_start": block_start,
            "block_end": block_end,
        })

    return (counted.groupby("part")
            .map_groups(per_part, batch_format="pandas"))


def hash_shuffle_rank(docs: rd.Dataset, key: str = "doc_id",
                      column: str = "text") -> rd.Dataset:
    """Deterministic pseudo-shuffle with an explicit GLOBAL rank:
    documents ordered by ``(md5(text), key)`` — the reproducible,
    seed-free order randomization used for training-data interleaving
    (sorting by a cryptographic hash decorrelates neighbors exactly
    like a seeded shuffle, but is partition-invariant and resumable).

    The global rank reuses the two-pass distributed scan from
    :func:`pack_sequences` on a different partitioning: the hash's
    first byte gives 256 CONTIGUOUS ranges of the sort order, so
    per-part counts → broadcast exclusive offsets → per-part local
    sort + arange.  No stage holds more than one part.
    """
    import hashlib as _hl

    def with_hash(batch: pa.Table) -> pa.Table:
        hs = pa.array(
            [_hl.md5((t or "").encode("utf-8")).hexdigest()
             for t in batch[column].to_pylist()], pa.string())
        part = pc.cast(pa.array(
            [int(h[:2], 16) for h in hs.to_pylist()], pa.int64()), pa.int64())
        return pa.table({key: batch[key], "h": hs, "part": part})

    hashed = docs.map_batches(with_hash, batch_format="pyarrow")

    from ray.data.aggregate import Count
    totals = (hashed.select_columns(["part"])
              .groupby("part").aggregate(Count(alias_name="n")).take_all())
    totals.sort(key=lambda r: r["part"])
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["part"]] = acc
        acc += r["n"]
    offsets_ref = ray.put(offsets)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offsets_ref)[int(g["part"].iloc[0])]
        g = g.sort_values(["h", key])
        return pd.DataFrame({
            key: g[key].to_numpy(),
            "h": g["h"].to_numpy(),
            "rank": off + np.arange(1, len(g) + 1, dtype=np.int64),
        })

    return hashed.groupby("part").map_groups(per_part, batch_format="pandas")


def ntile_buckets(docs: rd.Dataset, k: int, order_col: str = "n_chars",
                  key: str = "doc_id", part_width: int = 16) -> rd.Dataset:
    """Equal-frequency bucket assignment: SQL ``NTILE(k) OVER (ORDER BY
    order_col, key)`` as a distributed operator.

    Third reuse of the two-pass ordered scan (see
    :func:`pack_sequences`): partition the sort ORDER into contiguous
    ranges (``part = order_col // part_width`` — order-preserving), per
    -part counts → broadcast exclusive offsets → per-part local sort +
    ``arange`` gives the exact global rank; the NTILE boundary formula
    is then a pure per-row computation against the broadcast total.

    ``part_width`` bounds per-part memory at the cost of balance; at
    scale, replace the fixed width with sampled order-statistic range
    boundaries (same shape as ``ops/knn.kmeans_cells`` sampling) so
    parts stay even under any value distribution.  Emits
    (key, order_col, rnk [1-based], bucket [1-based NTILE semantics:
    the first ``N % k`` buckets get the extra row]).
    """
    from ray.data.aggregate import Count

    def keyed(batch: pa.Table) -> pa.Table:
        part = pc.divide(batch[order_col], part_width).cast(pa.int64())
        return pa.table({key: batch[key], order_col: batch[order_col],
                         "part": part})

    keyed_ds = docs.map_batches(keyed, batch_format="pyarrow")
    totals = (keyed_ds.select_columns(["part"])
              .groupby("part").aggregate(Count(alias_name="n")).take_all())
    totals.sort(key=lambda r: r["part"])
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["part"]] = acc
        acc += r["n"]
    n_total = acc
    offsets_ref = ray.put(offsets)

    size, rem = divmod(n_total, k)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offsets_ref)[int(g["part"].iloc[0])]
        g = g.sort_values([order_col, key])
        r0 = off + np.arange(len(g), dtype=np.int64)  # 0-based global rank
        cut = (size + 1) * rem  # ranks below this fall in the fat buckets
        bucket = np.where(
            r0 < cut,
            r0 // (size + 1) if size + 1 > 0 else 0,
            rem + (np.maximum(r0 - cut, 0) // size if size > 0 else 0),
        ).astype(np.int64) + 1
        return pd.DataFrame({
            key: g[key].to_numpy(),
            order_col: g[order_col].to_numpy(),
            "rnk": r0 + 1,
            "bucket": bucket,
        })

    return keyed_ds.groupby("part").map_groups(per_part,
                                               batch_format="pandas")


def chunk_tokens(docs: rd.Dataset, window: int, stride: int,
                 key: str = "doc_id", column: str = "text") -> rd.Dataset:
    """Sliding-window token chunking (the RAG / long-context prep op):
    each document's whitespace tokens are cut into chunks of
    ``window`` tokens every ``stride`` tokens (overlapping when
    stride < window, gap-sampling when stride > window; the final
    chunk may be short, and chunk starts always fall inside the
    document — no empty or negative-length chunks in either regime).
    Emits (key, chunk_idx, n_tokens, chunk_text) — a flat-map explode.

    Map-only and fully vectorized: tokens are flattened once per
    batch; chunk token indices are built with numpy repeat/arange
    arithmetic and gathered with one ``take``; chunk texts come from a
    rebuilt ListArray + ``binary_join``.  No per-row Python loop, no
    shuffle, no state — scales as a pure map stage.
    """
    if window < 1 or stride < 1:
        raise ValueError(
            f"chunk_tokens needs window >= 1 and stride >= 1 "
            f"(got window={window}, stride={stride})")

    def explode(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.fill_null(batch[column], ""), r"\s+")
        # drop empty strings produced by leading/trailing whitespace
        flat_all = pc.list_flatten(toks)
        parent_all = pc.list_parent_indices(toks)
        nonempty = pc.not_equal(flat_all, "")
        flat = flat_all.filter(nonempty)
        parent = parent_all.filter(nonempty).to_numpy(zero_copy_only=False)
        n_rows = batch.num_rows
        t_cnt = np.bincount(parent, minlength=n_rows).astype(np.int64)
        row_off = np.concatenate([[0], np.cumsum(t_cnt)])[:-1]

        # two regimes, one count: the cover-minimal start count (last
        # start >= t-window; exact for stride <= window) capped by the
        # number of stride-multiple starts INSIDE the document (the
        # binding bound when stride > window, where the cover formula
        # would emit starts past the end — negative-length chunks)
        n_cover = np.where(t_cnt <= window, 1,
                           (t_cnt - window + stride - 1) // stride + 1)
        n_inside = (np.maximum(t_cnt, 1) - 1) // stride + 1
        n_chunks = np.where(t_cnt == 0, 0,
                            np.minimum(n_cover, n_inside))
        total_chunks = int(n_chunks.sum())
        if total_chunks == 0:
            return pa.table({key: pa.array([], batch[key].type),
                             "chunk_idx": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "chunk_text": pa.array([], pa.string())})
        chunk_row = np.repeat(np.arange(n_rows), n_chunks)
        # chunk index within its row
        first_chunk = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
        chunk_idx = np.arange(total_chunks) - np.repeat(first_chunk, n_chunks)
        starts = chunk_idx * stride
        lens = np.minimum(starts + window, t_cnt[chunk_row]) - starts
        # token indices: repeat each chunk's (flat start) len times + intra
        tok_total = int(lens.sum())
        intra = (np.arange(tok_total)
                 - np.repeat(np.concatenate([[0], np.cumsum(lens)])[:-1],
                             lens))
        gather = np.repeat(row_off[chunk_row] + starts, lens) + intra
        chunk_tok = flat.take(pa.array(gather, pa.int64()))
        offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        chunk_list = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int64()),
            chunk_tok.combine_chunks() if isinstance(chunk_tok,
                                                     pa.ChunkedArray)
            else chunk_tok)
        text = pc.binary_join(chunk_list, " ")
        return pa.table({
            key: batch[key].take(pa.array(chunk_row, pa.int64())),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "n_tokens": pa.array(lens, pa.int64()),
            "chunk_text": text,
        })

    return docs.map_batches(explode, batch_format="pyarrow")


def zorder_values(ds: rd.Dataset, x_col: str = "n_chars",
                  cat_col: str = "lang", key: str = "doc_id",
                  bits: int = 16, bucket_shift: int = 20) -> rd.Dataset:
    """Z-order (Morton) layout key over (numeric, category): interleave
    the low ``bits`` of the numeric column with the category's dense
    alphabetical code — the multi-dimensional data-layout key that
    keeps rows close in BOTH dimensions close in the written file
    order, so either predicate prunes row groups.  Emits
    (key, zvalue, file_bucket = zvalue >> bucket_shift).

    The category dictionary is a tiny groupby rollup (bounded by
    |categories|), broadcast; the interleave itself is a map-only
    numpy bit pass (vectorized per bit position, no per-row loop).
    Writing sorted-by-zvalue partitioned files is then
    ``ds.sort("zvalue").write_parquet(...)`` — kept separate so the
    key derivation stays oracle-checkable.
    """
    cats = sorted(
        r[cat_col]
        for r in ds.groupby(cat_col).count().select_columns([cat_col])
        .take_all())

    def z(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64) \
            & ((1 << bits) - 1)
        # dense code = index into the sorted category list — one Arrow
        # index_in kernel instead of a per-row dict lookup
        y = pc.index_in(batch[cat_col], value_set=pa.array(cats)) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        zv = np.zeros(len(x), np.int64)
        for i in range(bits):
            zv |= ((x >> i) & 1) << (2 * i)
            zv |= ((y >> i) & 1) << (2 * i + 1)
        return pa.table({key: batch[key],
                         "zvalue": pa.array(zv, pa.int64()),
                         "file_bucket": pa.array(zv >> bucket_shift,
                                                 pa.int64())})

    return ds.select_columns([key, x_col, cat_col]).map_batches(
        z, batch_format="pyarrow")


def zorder_write(ds: rd.Dataset, out_dir: str, *, x_col: str = "n_chars",
                 cat_col: str = "lang", key: str = "doc_id",
                 bits: int = 16, bucket_shift: int = 12) -> None:
    """Write the dataset hive-partitioned by Z-order file bucket, with a
    per-bucket (min,max) zone-map manifest — the layout that makes
    EITHER predicate dimension prunable at the read (the same
    locality-at-rest story as :func:`pmocr_ray.ops.knn.ivf_build_index`,
    for relational predicates instead of vector cells).

    The full rows are written (zvalue carried as a column); the zone
    map is a tiny per-bucket rollup (min/max of the numeric dim plus
    the category set) persisted beside the data.
    """
    import os

    import pyarrow.parquet as pq
    from ray.data.aggregate import Max, Min

    cats = sorted(
        r[cat_col]
        for r in ds.groupby(cat_col).count().select_columns([cat_col])
        .take_all())

    def z(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64) \
            & ((1 << bits) - 1)
        # dense code = index into the sorted category list — one Arrow
        # index_in kernel instead of a per-row dict lookup
        y = pc.index_in(batch[cat_col], value_set=pa.array(cats)) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        zv = np.zeros(len(x), np.int64)
        for i in range(bits):
            zv |= ((x >> i) & 1) << (2 * i)
            zv |= ((y >> i) & 1) << (2 * i + 1)
        return (batch.append_column("zvalue", pa.array(zv, pa.int64()))
                .append_column("zbucket", pa.array(zv >> bucket_shift,
                                                   pa.int64())))

    keyed = ds.map_batches(z, batch_format="pyarrow")
    keyed.write_parquet(os.path.join(out_dir, "data"),
                        partition_cols=["zbucket"])
    zones = (keyed.groupby("zbucket")
             .aggregate(Min(x_col, alias_name="x_min"),
                        Max(x_col, alias_name="x_max"),
                        Min(cat_col, alias_name="cat_min"),
                        Max(cat_col, alias_name="cat_max"))
             .take_all())
    pq.write_table(
        pa.table({
            "zbucket": pa.array([r["zbucket"] for r in zones], pa.int64()),
            "x_min": pa.array([r["x_min"] for r in zones], pa.int64()),
            "x_max": pa.array([r["x_max"] for r in zones], pa.int64()),
            "cat_min": pa.array([r["cat_min"] for r in zones]),
            "cat_max": pa.array([r["cat_max"] for r in zones]),
        }),
        os.path.join(out_dir, "zones.parquet"))


def zorder_pruned_buckets(out_dir: str, *, x_range=None, cat=None):
    """Zone-map pruning decision (exposed for tests/audit): the bucket
    ids whose (min,max) zones overlap the predicate."""
    import os

    import pyarrow.parquet as pq

    zones = pq.read_table(os.path.join(out_dir, "zones.parquet"))
    keep = np.ones(zones.num_rows, bool)
    if x_range is not None:
        lo, hi = x_range
        keep &= (zones["x_max"].to_numpy() >= lo) \
            & (zones["x_min"].to_numpy() <= hi)
    if cat is not None:
        cmin = zones["cat_min"].to_pylist()
        cmax = zones["cat_max"].to_pylist()
        keep &= np.array([a <= cat <= b for a, b in zip(cmin, cmax)])
    return sorted(int(b) for b in
                  zones["zbucket"].to_numpy()[keep])


def zorder_read(out_dir: str, *, x_col: str = "n_chars",
                cat_col: str = "lang", x_range=None,
                cat=None) -> rd.Dataset:
    """Predicate-pruned read over a :func:`zorder_write` layout: only
    bucket directories whose zone overlaps the predicate are opened
    (directory-level pruning, like the IVF probed-cells read), then the
    exact filter runs map-only over the survivors."""
    import os

    import glob

    files = [f
             for b in zorder_pruned_buckets(out_dir, x_range=x_range,
                                            cat=cat)
             for f in sorted(glob.glob(os.path.join(
                 out_dir, "data", f"zbucket={b}", "*.parquet")))]
    if not files:
        raise ValueError("predicate prunes every bucket")
    ds = rd.read_parquet(files)

    def exact(t: pa.Table) -> pa.Table:
        m = np.ones(t.num_rows, bool)
        if x_range is not None:
            xv = t[x_col].to_numpy(zero_copy_only=False)
            m &= (xv >= x_range[0]) & (xv <= x_range[1])
        if cat is not None:
            m &= pc.fill_null(pc.equal(t[cat_col], cat), False) \
                .to_numpy(zero_copy_only=False)
        return t.filter(pa.array(m))

    return ds.map_batches(exact, batch_format="pyarrow")


def pps_systematic_sample(ds: rd.Dataset, n_samples: int,
                          weight_col: str = "n_chars",
                          key: str = "doc_id",
                          part_size: int = 1000) -> rd.Dataset:
    """Probability-proportional-to-size SYSTEMATIC sampling, fully
    deterministic and exact-integer: with total weight W and stride
    s = W // n_samples, a row is selected iff its cumulative-weight
    interval (cum_before, cum_after] crosses a multiple of s — the
    classic PPS systematic rule, so heavier rows are proportionally
    likelier, zero-weight rows never selected, and the draw is
    reproducible under any partitioning (unlike random_sample).

    Same two-pass distributed ordered prefix-sum as
    :func:`pack_sequences`: contiguous key-range parts → per-part
    totals (≤ n_parts ints to the driver) → broadcast exclusive
    offsets → per-part vectorized cumsum + boundary test.
    """
    def weights(batch: pa.Table) -> pa.Table:
        w = pc.fill_null(pc.cast(batch[weight_col], pa.int64()), 0)
        part = pc.divide(batch[key], part_size).cast(pa.int64())
        return pa.table({key: batch[key], "part": part, "w": w})

    counted = ds.select_columns([key, weight_col]).map_batches(
        weights, batch_format="pyarrow")
    totals = (counted.select_columns(["part", "w"])
              .groupby("part").aggregate(Sum("w", alias_name="t"))
              .take_all())
    totals.sort(key=lambda r: r["part"])
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["part"]] = acc
        acc += r["t"]
    stride = max(acc // n_samples, 1)
    offsets_ref = ray.put(offsets)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offsets_ref)[int(g["part"].iloc[0])]
        g = g.sort_values(key)
        w = g["w"].to_numpy()
        after = off + np.cumsum(w)
        before = after - w
        sel = (after // stride) > (before // stride)
        return pd.DataFrame({key: g[key].to_numpy()[sel],
                             "weight": w[sel]})

    return (counted.groupby("part")
            .map_groups(per_part, batch_format="pandas"))


def bucketed_write(ds: rd.Dataset, out_dir: str, *, key: str,
                   n_buckets: int = 16) -> str:
    """Write a dataset hash-bucketed by ``key`` into hive-style
    ``bucket=`` directories — the co-located storage layout that lets
    equi-joins on ``key`` run WITHOUT a shuffle (both sides' bucket i
    hold exactly the keys with ``hash(key) % n == i``).

    The bucket id is a vectorized int64 mix of the key (splitmix-style
    constant), computed identically for every table written with the
    same ``n_buckets`` — the layout contract :func:`bucketed_join`
    relies on.
    """
    import numpy as np

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t[key].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        z = (k + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        b = (z % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    (ds.map_batches(add_bucket, batch_format="pyarrow")
     .write_parquet(out_dir, partition_cols=["bucket"]))
    return out_dir


def bucketed_join(dir_a: str, dir_b: str, *, key_a: str, key_b: str,
                  n_buckets: int = 16,
                  hot_bucket_bytes: int = 256 << 20) -> rd.Dataset:
    """Shuffle-free equi-join of two directories written by
    :func:`bucketed_write` with the same ``n_buckets``: one task per
    bucket id reads BOTH sides' bucket partition and hash-joins
    locally (Arrow-native ``pa.Table.join`` — no pandas copy) — keys
    are co-located by the layout, so no all-to-all exchange ever
    runs.  This is the bucketed-table join every warehouse uses to
    amortize one shuffle (at write time) across every future join on
    the key.

    **Hot-bucket handling** (skew discipline, same as the dedup
    family's hot-bucket splits): a driver-side METADATA scan (file
    sizes only, no data read) sizes each bucket; a bucket whose larger
    side exceeds ``hot_bucket_bytes`` on disk is star-split across
    ``ceil(bytes / hot_bucket_bytes)`` tasks — each sub-task reads a
    disjoint row-group slice of the LARGER side (row-group-granular,
    so the hot side is never fully materialized in one worker) and
    joins it against the full smaller side.  Row-slicing (not
    key-hashing) is what makes a single mega-key splittable: each
    left-slice × full-right is a disjoint part of the inner join.
    Memory bound per task: smaller side + one row-group slice + its
    join output.  If BOTH sides of one bucket are huge, raise
    ``n_buckets`` at write time (the smaller side is the hash-table
    side and is read whole per sub-task).

    Returns the joined rows (left columns + right columns; when the
    key names differ the right key is re-attached as a copy of the
    left key, matching SQL ``JOIN ... ON a = b`` output).  Missing
    bucket directories (empty buckets) contribute nothing.
    """
    import glob
    import math
    import os

    import pyarrow.parquet as pq_

    def _files(d: str, b: int) -> list:
        return sorted(glob.glob(os.path.join(d, f"bucket={b}", "*.parquet")))

    # schema-stable empty result: derive the joined shape from one
    # file of each side (driver-side metadata read only)
    fa = sorted(glob.glob(os.path.join(dir_a, "bucket=*", "*.parquet")))
    fb = sorted(glob.glob(os.path.join(dir_b, "bucket=*", "*.parquet")))
    if not fa or not fb:
        # an empty bucketed dataset wrote zero files — there is no
        # schema to join against; fail loudly (repo loud-guard rule)
        # instead of IndexError deep in the schema read
        missing = dir_a if not fa else dir_b
        raise ValueError(
            f"bucketed_join: no bucket parquet files under {missing!r} "
            f"(was the side empty when bucketed_write ran?)")
    sch_a, sch_b = pq_.read_schema(fa[0]), pq_.read_schema(fb[0])

    def _join(ta: pa.Table, tb: pa.Table) -> pa.Table:
        if tb.schema.field(key_b).type != ta.schema.field(key_a).type:
            tb = tb.set_column(
                tb.column_names.index(key_b), key_b,
                pc.cast(tb[key_b], ta.schema.field(key_a).type))
        overlap = (set(ta.column_names) & set(tb.column_names)) \
            - {key_a, key_b}
        if overlap:
            # pa.Table.join would emit duplicate fields for shared
            # non-key names and the later select() would see the field
            # twice; disambiguate with SQL-style suffixes up front.
            for name in sorted(overlap):
                ta = ta.rename_columns(
                    [f"{c}_x" if c == name else c for c in ta.column_names])
                tb = tb.rename_columns(
                    [f"{c}_y" if c == name else c for c in tb.column_names])
        j = ta.join(tb, keys=key_a, right_keys=key_b, join_type="inner")
        if key_b != key_a and key_b not in j.column_names:
            # Arrow coalesces the right key away; re-attach it
            # (zero-copy reference to the left key — equal by the
            # inner-join predicate) so both key columns survive as in
            # SQL SELECT *.
            j = j.append_column(key_b, j[key_a])
        return j

    empty = _join(sch_a.empty_table(), sch_b.empty_table())

    # ---- driver metadata scan: size buckets, plan star-splits ----
    items = []
    for b in range(n_buckets):
        files_a, files_b = _files(dir_a, b), _files(dir_b, b)
        if not files_a or not files_b:
            continue  # empty bucket on either side joins to nothing
        bytes_a = sum(os.path.getsize(f) for f in files_a)
        bytes_b = sum(os.path.getsize(f) for f in files_b)
        split_a = bytes_a >= bytes_b
        n_subs = max(1, math.ceil(max(bytes_a, bytes_b) / hot_bucket_bytes))
        for s in range(n_subs):
            items.append({"bucket": b, "sub": s, "n_subs": n_subs,
                          "split_a": split_a})

    if not items:
        return rd.from_arrow(empty)

    def _read_bucket(d: str, b: int, schema: pa.Schema,
                     sub: int = 0, n_subs: int = 1) -> pa.Table:
        files = _files(d, b)
        if n_subs == 1:
            if not files:
                return schema.empty_table()
            # select() guards against pq.read_table inferring the hive
            # `bucket=` path key as an extra column (it does, even for
            # an explicit file list)
            return pq_.read_table(files).select(schema.names)
        # row-group-granular slice: list (file, row_group) units in
        # deterministic order, take every n_subs-th starting at sub —
        # a disjoint, exhaustive partition of the bucket's rows that
        # never materializes the full hot side in one task
        units = []
        for f in files:
            units.extend((f, i)
                         for i in range(pq_.ParquetFile(f).num_row_groups))
        mine = units[sub::n_subs]
        if not mine:
            return schema.empty_table()
        parts = [pq_.ParquetFile(f).read_row_group(i) for f, i in mine]
        return pa.concat_tables(parts, promote_options="default")

    def join_buckets(batch: pa.Table) -> pa.Table:
        out = [empty]
        for row in batch.to_pylist():
            b, s, n = row["bucket"], row["sub"], row["n_subs"]
            sa, na = (s, n) if row["split_a"] else (0, 1)
            sb, nb = (0, 1) if row["split_a"] else (s, n)
            ta = _read_bucket(dir_a, b, sch_a, sa, na)
            tb = _read_bucket(dir_b, b, sch_b, sb, nb)
            if ta.num_rows and tb.num_rows:
                out.append(_join(ta, tb))
        j = pa.concat_tables(out, promote_options="default")
        return j.select(empty.column_names)

    ids = rd.from_items(items)
    # batch_size=1 → one task per (bucket, sub): per-bucket AND
    # per-hot-slice parallelism with no shuffle anywhere
    return ids.map_batches(join_buckets, batch_format="pyarrow",
                           batch_size=1)


def token_budget_trim(ds: rd.Dataset, *, group_col: str = "source",
                      weight_col: str = "n_chars", key: str = "doc_id",
                      budget: int = 10_000) -> rd.Dataset:
    """Per-source token-budget curation: keep each source's documents
    in priority order (weight desc, key asc) until the cumulative
    weight would exceed ``budget`` — the data-mixing trim every
    pre-training recipe applies per domain.

    Prefix-window semantics (SQL-exact): a doc is kept iff the
    cumulative weight INCLUDING it is ≤ budget, evaluated in the
    global priority order — one doc heavier than the budget is never
    kept AND blocks everything behind it (strict prefix, the
    SQL-window rule; greedy knapsack would be partition-stable too but
    has no SQL form), and the rule is deterministic under any
    partitioning.
    Shape: ONE shuffle on ``group_col``; inside each group a vectorized
    sort + cumsum.  Partitioning assumption: one source's doc LIST
    (key + weight only — trimmed columns ride along but the group is
    whole) fits a worker; salt + two-pass prefix-sum (see
    ``pps_systematic_sample``) is the swap-in for a single mega-source.
    """
    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([weight_col, key], ascending=[False, True])
        keep = g[weight_col].cumsum() <= budget
        return g.loc[keep]

    return ds.groupby(group_col).map_groups(per_group,
                                            batch_format="pandas")


def range_partition_write(ds: rd.Dataset, out_dir: str, *, key: str,
                          n_parts: int = 8) -> str:
    """Range-partitioned layout: exact key quantiles (from the bounded
    per-key value-counts rollup — see ``ops/text.length_quantiles``)
    become split points; rows land in hive ``krange=i`` directories and
    a JSON manifest records each partition's [lo, hi) bounds.  The
    range analogue of :func:`bucketed_write` — point/range lookups
    then open only overlapping partitions (:func:`range_lookup`).

    The quantile rollup moves (key_value, count) pairs — bounded by
    key cardinality, not rows; split-point selection on the driver is
    O(distinct keys) and documented as the sampled-quantile swap-in
    point for ultra-high-cardinality keys.
    """
    import json
    import os

    import numpy as np

    from ray.data.aggregate import Sum

    def vc(t: pa.Table) -> pa.Table:
        g = t.select([key]).group_by(key).aggregate([([], "count_all")])
        return pa.table({"k": pc.cast(g[key], pa.int64()),
                         "n": pc.cast(g["count_all"], pa.int64())})

    from pmocr_ray.ops.vecagg import grouped_aggregate

    rows = sorted((r["k"], r["n"]) for r in
                  grouped_aggregate(
                      ds.map_batches(vc, batch_format="pyarrow"),
                      ["k"], [("n", "sum", "n")])
                  .take_all())
    ks = np.array([k for k, _ in rows], np.int64)
    cum = np.cumsum([n for _, n in rows])
    total = int(cum[-1])
    splits = []
    for i in range(1, n_parts):
        target = i * total // n_parts
        splits.append(int(ks[int(np.searchsorted(cum, target,
                                                 side="left"))]))
    splits = sorted(set(splits))
    bounds = [int(ks[0])] + splits + [int(ks[-1]) + 1]
    sp = np.array(splits, np.int64)

    def assign(t: pa.Table) -> pa.Table:
        k = t[key].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        part = np.searchsorted(sp, k, side="right").astype(np.int64)
        return t.append_column("krange", pa.array(part))

    (ds.map_batches(assign, batch_format="pyarrow")
     .write_parquet(out_dir, partition_cols=["krange"]))
    manifest = {"key": key,
                "parts": [{"id": i, "lo": bounds[i], "hi": bounds[i + 1]}
                          for i in range(len(bounds) - 1)]}
    with open(os.path.join(out_dir, "_range_manifest.json"), "w") as f:
        json.dump(manifest, f)
    return out_dir


def range_lookup(dir_: str, *, lo: int, hi: int) -> rd.Dataset:
    """Read only the partitions whose [lo, hi) bounds overlap the query
    range (manifest-pruned scan), with the exact residual filter
    applied — the primary-key range query over the layout above."""
    import json
    import os

    with open(os.path.join(dir_, "_range_manifest.json")) as f:
        manifest = json.load(f)
    key = manifest["key"]
    dirs = [os.path.join(dir_, f"krange={p['id']}")
            for p in manifest["parts"]
            if p["lo"] < hi and p["hi"] > lo and
            os.path.isdir(os.path.join(dir_, f"krange={p['id']}"))]
    if not dirs:
        return rd.from_items([])
    import glob as _glob
    files = sorted(f for d in dirs
                   for f in _glob.glob(os.path.join(d, "*.parquet")))
    ds = rd.read_parquet(files)

    def residual(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key], pa.int64())
        return t.filter(pc.and_(pc.greater_equal(k, lo), pc.less(k, hi)))

    return ds.map_batches(residual, batch_format="pyarrow")


def byte_balanced_blocks(ds: rd.Dataset, *, key: str = "doc_id",
                         bytes_col: str = "n_chars",
                         target_bytes: int = 1 << 20,
                         part_size: int = 1000) -> rd.Dataset:
    """Assign every row a byte-balanced block id: rows in ascending
    ``key`` order are packed so each block holds ~``target_bytes`` of
    payload — the explicit answer to giant-row skew (a 2 GB page gets
    a block to itself; a million 1 KB pages share blocks) that
    byte-blind row-count repartitioning cannot give.

    Same two-pass distributed ordered prefix-sum as
    :func:`pack_sequences` (its fifth reuse): per-part totals (ONE tiny
    rollup reaching the driver, ≤ n_parts ints) → broadcast exclusive
    offsets → local ordered cumsum per part.  block_id =
    (cumulative_bytes_before_row) // target_bytes — deterministic
    under any partitioning.  Emits (key, row_bytes, block_id).
    """
    def count_bytes(batch: pa.Table) -> pa.Table:
        b = pc.fill_null(pc.cast(batch[bytes_col], pa.int64()), 0)
        part = pc.divide(batch[key], part_size).cast(pa.int64())
        return pa.table({key: batch[key], "part": part, "row_bytes": b})

    counted = ds.map_batches(count_bytes, batch_format="pyarrow")
    totals = (counted.select_columns(["part", "row_bytes"])
              .groupby("part").aggregate(Sum("row_bytes", alias_name="t"))
              .take_all())
    totals.sort(key=lambda r: r["part"])
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["part"]] = acc
        acc += r["t"]
    offsets_ref = ray.put(offsets)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offsets_ref)[int(g["part"].iloc[0])]
        g = g.sort_values(key)
        b = g["row_bytes"].to_numpy(np.int64)
        start = off + np.cumsum(b) - b
        return pd.DataFrame({
            key: g[key].to_numpy(),
            "row_bytes": b,
            "block_id": (start // target_bytes).astype(np.int64),
        })

    return counted.groupby("part").map_groups(per_part,
                                              batch_format="pandas")
