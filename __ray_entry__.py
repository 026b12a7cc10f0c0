"""Driver contract for the pmocr_ray engine.

``entry()`` runs the flagship extraction pipeline on sf0.001.
``queries()`` exposes one callable per implemented operator/pipeline
(SURVEY.md §2 + the training-data ops); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible one.

The extraction-family oracles do NOT re-run the extractor: the pages
fixture is a pure arithmetic function of the ``documents`` table
(pmocr_ray/schema.py row-class rules), so the SQL reconstructs the
expected extracted text independently — true golden spans.

Ray is initialised by the caller; nothing here calls ray.init/shutdown.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq

from pmocr_ray.ops.joins import parts_for_rows, sized_for_join


def _dense_i64_lut(mapping: dict, default: int = -1) -> "np.ndarray":
    """Dense int64 lookup array for a small dict with dense int keys
    (suppkey→nationkey etc.) — broadcast ONCE via ray.put and gathered
    with one numpy index per batch, replacing a per-row Python dict
    lookup in fact-table scans.  ``default`` marks absent keys."""
    hi = max(mapping) + 1
    arr = np.full(hi, default, np.int64)
    arr[np.fromiter(mapping.keys(), np.int64, len(mapping))] = \
        np.fromiter(mapping.values(), np.int64, len(mapping))
    return arr


def _vgb(ds, keys, *aggs):
    """groupby().aggregate() for KEY-SCALE group counts — routed through
    the Arrow-bucketed aggregate (pmocr_ray.ops.vecagg.ray_aggregate),
    which avoids Ray's per-group Python reduce cost.  Bounded rollups
    (langs, days, status classes) stay on Ray's native groupby."""
    from pmocr_ray.ops.vecagg import ray_aggregate

    return ray_aggregate(ds, keys, *aggs)


def _i64(col) -> "np.ndarray":
    import pyarrow as pa

    return col.combine_chunks().cast(pa.int64()).to_numpy(
        zero_copy_only=False)


def _lut_gather(lut: "np.ndarray", idx: "np.ndarray",
                default: int = -1) -> "np.ndarray":
    """Bounds-safe dense-LUT gather: keys outside the LUT (a FILTERED
    mapping's array only spans its own max key) map to ``default``
    instead of raising/garbage."""
    safe = (idx >= 0) & (idx < len(lut))
    out = np.full(len(idx), default, np.int64)
    out[safe] = lut[idx[safe]]
    return out

REPS = 8  # pages per document row; must match the SQL below


# ------------------------------------------------------------------ helpers

_extract_cache: dict[str, str] = {}


def _pages(sf_dir: str):
    from pmocr_ray.fixtures import ensure_pages_fixture

    return ensure_pages_fixture(sf_dir, reps=REPS)


def _extraction_output_dir(sf_dir: str) -> str:
    """Run the flagship pipeline once per sf_dir; serve the family of
    extraction queries from its parquet output (cached, deterministic)."""
    if sf_dir in _extract_cache:
        return _extract_cache[sf_dir]
    from pmocr_ray.fixtures import fixture_dir
    from pmocr_ray.pipeline import run_extraction

    pages_dir, manifest = _pages(sf_dir)
    out_dir = os.path.join(fixture_dir(sf_dir, REPS), "extract_out")
    if not os.path.exists(os.path.join(out_dir, "_DONE")):
        ds = run_extraction(pages_dir, manifest, run_id="driver-run")
        tmp = out_dir + ".tmp"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        ds.write_parquet(tmp)
        os.replace(tmp, out_dir)
        with open(os.path.join(out_dir, "_DONE"), "w") as f:
            f.write("ok")
    _extract_cache[sf_dir] = out_dir
    return out_dir


def _read_output(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(_extraction_output_dir(sf_dir))


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def _pq_parts(sf_dir: str, table: str, cap: int = 8) -> int:
    """Join-partition count for a BASE-table operand, sized from the
    parquet file's metadata row count — no execution, no pinning of
    the table in the object store (unlike ``sized_for_join``, which is
    for derived rollups)."""
    n = pq.ParquetFile(os.path.join(sf_dir, f"{table}.parquet")).metadata.num_rows
    return parts_for_rows(n, cap)


def _sel(ds, cols, flt=None):
    if flt is not None:
        ds = ds.map_batches(lambda t: t.filter(flt(t)), batch_format="pyarrow")
    return ds.select_columns(cols)


# ---------------------------------------------------------------- entry


def entry() -> Any:
    """Flagship pipeline over sf0.001 (driver smoke check)."""
    pages_dir, manifest = _pages("/root/testdata/sf0.001")
    from pmocr_ray.pipeline import run_extraction

    return run_extraction(pages_dir, manifest, run_id="entry-run")


# --------------------------------------------------------------- queries


def _q_pages_gen(sf_dir: str):
    import ray.data as rd

    pages_dir, _ = _pages(sf_dir)
    return rd.read_parquet(pages_dir, columns=["url", "warc_ts", "lang"])


def _q_sniff_route(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.stages import sniff_stage

    pages_dir, _ = _pages(sf_dir)
    ds = rd.read_parquet(pages_dir, columns=["url", "html"])
    return ds.map_batches(sniff_stage, batch_format="pyarrow").select_columns(
        ["url", "content_type"]
    )


def _q_pages_lang_en(sf_dir: str):
    """Predicate pushdown demo: the lang filter is applied AT THE READ
    (pyarrow dataset expression → row-group pruning + row filtering),
    so non-matching rows never enter the pipeline."""
    import ray.data as rd

    pages_dir, _ = _pages(sf_dir)
    ds = rd.read_parquet(pages_dir, columns=["url", "lang"],
                         filter=(pc.field("lang") == "en"))
    return ds


def _q_distinct_langs(sf_dir: str):
    """Distinct values via Dataset.unique (a shuffle — tiny key domain)."""
    import pyarrow as pa

    langs = sorted(_docs(sf_dir).unique("lang"))
    return pa.table({"lang": pa.array(langs, pa.string())})


def _q_flagship(sf_dir: str):
    return _sel(
        _read_output(sf_dir),
        ["url", "lang", "content_type", "status", "attempts", "extracted_text"],
    )


def _q_extract_html(sf_dir: str):
    return _sel(
        _read_output(sf_dir), ["url", "extracted_text"],
        lambda t: pc.and_(pc.equal(t["content_type"], "html"),
                          pc.equal(t["status"], "done")),
    )


def _q_extract_pdf(sf_dir: str):
    return _sel(
        _read_output(sf_dir), ["url", "extracted_text"],
        lambda t: pc.and_(pc.equal(t["content_type"], "pdf"),
                          pc.equal(t["status"], "done")),
    )


def _q_skip_existing(sf_dir: str):
    return _sel(
        _read_output(sf_dir), ["url", "status", "extracted_text"],
        lambda t: pc.equal(t["status"], "skipped_existing_text"),
    )


def _q_quarantine(sf_dir: str):
    return _sel(
        _read_output(sf_dir), ["url", "content_type", "status", "attempts"],
        lambda t: pc.equal(t["status"], "failed"),
    )


def _q_done_skip(sf_dir: str):
    return _sel(
        _read_output(sf_dir), ["url", "status"],
        lambda t: pc.equal(t["status"], "skipped_suffix"),
    )


def _q_status_counts(sf_dir: str):
    from pmocr_ray.pipeline import status_counts

    counts = status_counts(_read_output(sf_dir))
    import pyarrow as pa

    items = sorted(counts.items())
    return pa.table({
        "status": pa.array([k for k, _ in items], pa.string()),
        "n": pa.array([v for _, v in items], pa.int64()),
    })


def _q_csv_hack(sf_dir: str):
    import pyarrow as pa

    from pmocr_ray.stages import csv_hack

    def prep(t: pa.Table) -> pa.Table:
        joined = pc.binary_join_element_wise(
            t["text"], t["lang"], t["source"], "   "
        )
        return pa.table({"doc_id": t["doc_id"], "extracted_text": joined})

    ds = _docs(sf_dir).map_batches(prep, batch_format="pyarrow")
    ds = ds.map_batches(csv_hack, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "csv_text"])


def _q_text_stats(sf_dir: str):
    from pmocr_ray.ops.text import text_stats

    ds = _docs(sf_dir).map_batches(text_stats, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "n_tokens", "n_chars_total", "n_chars_nospace"])


def _q_fingerprint(sf_dir: str):
    from pmocr_ray.ops.text import fingerprint

    ds = _docs(sf_dir).map_batches(fingerprint, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "fp"])


def _q_dedup_exact(sf_dir: str):
    from pmocr_ray.ops.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir))


def _q_dedup_pairs_exact(sf_dir: str):
    import pandas as pd

    from pmocr_ray.ops.dedup import exact_dup_pairs

    out = exact_dup_pairs(_docs(sf_dir)).to_pandas()
    if out.empty:  # schema-stable empty result (all-singleton corpora)
        out = pd.DataFrame({"a": pd.Series(dtype="int64"),
                            "b": pd.Series(dtype="int64")})
    return out[["a", "b"]]


def _q_knn(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.knn import knn_cosine

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    q0 = np.asarray(
        q.filter(pc.equal(q["vec_id"], 0))["embedding"].to_pylist(), dtype=np.float64
    )
    out = knn_cosine(rd.read_parquet(emb_path), q0, k=10)
    return out.select(["vec_id", "rank"])


def _q_knn_multi(sf_dir: str):
    """Batched ANN: FIVE query vectors broadcast as one matrix — each
    batch does a single (5, D) x (D, B) matmul (the realistic
    batched-query shape; per-query partial top-k, tiny merge)."""
    import ray.data as rd

    from pmocr_ray.ops.knn import knn_cosine

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    q = q.filter(pc.less(q["vec_id"], 5)).sort_by("vec_id")
    qmat = np.asarray(q["embedding"].to_pylist(), dtype=np.float64)
    out = knn_cosine(rd.read_parquet(emb_path), qmat, k=10)
    return out.select(["query_idx", "vec_id", "rank"])


def _q_len_histogram(sf_dir: str):
    """Document-length distribution: vectorized bucket + combiner."""
    from pmocr_ray.ops.text import length_histogram

    return length_histogram(_docs(sf_dir).select_columns(["n_chars"]),
                            column="n_chars", width=100)


def _q_knn_ivf(sf_dir: str):
    """IVF kNN pinned to its EXACT regime for the oracle gate:
    ``n_probe = n_cells`` probes every cell, so the candidate set is
    the whole corpus and the result equals the brute-force top-k —
    recall 1 by construction, same SQL twin as ``knn_cosine``.  The
    approximate production regime (n_probe=4) is benchmarked
    separately in bench.py (``knn_ivf_probe``)."""
    import ray.data as rd

    from pmocr_ray.ops.knn import knn_cosine_ivf

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    q = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    q0 = np.asarray(
        q.filter(pc.equal(q["vec_id"], 0))["embedding"].to_pylist(), dtype=np.float64
    )
    out = knn_cosine_ivf(rd.read_parquet(emb_path), q0, k=10,
                         n_cells=16, n_probe=16)
    return out.select(["vec_id", "rank"])


def _q_knn_ivf_indexed(sf_dir: str):
    """kNN over the persisted cell-partitioned IVF index, pinned to
    the exact regime (``n_probe = n_cells`` → every cell directory is
    read → identical to brute force, oracle-checkable).  The
    partition-pruning value of the index is exercised by the
    approximate bench regime, not the correctness gate."""
    import shutil

    import ray.data as rd

    from pmocr_ray.fixtures import fixture_dir
    from pmocr_ray.ops.knn import ivf_build_index, knn_cosine_ivf_indexed

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    idx = os.path.join(fixture_dir(sf_dir, REPS), "ivf_index")
    if not os.path.exists(os.path.join(idx, "centroids.parquet")):
        shutil.rmtree(idx, ignore_errors=True)
        ivf_build_index(rd.read_parquet(emb_path), idx, n_cells=16)
    q = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    q0 = np.asarray(
        q.filter(pc.equal(q["vec_id"], 0))["embedding"].to_pylist(),
        dtype=np.float64)
    out = knn_cosine_ivf_indexed(idx, q0, k=10, n_probe=16)
    return out.select(["vec_id", "rank"])


def _q_events_window(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.events import events_window

    return events_window(rd.read_parquet(os.path.join(sf_dir, "events.parquet")))


def _q_top_users(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.events import top_users_by_value

    return top_users_by_value(
        rd.read_parquet(os.path.join(sf_dir, "events.parquet")), k=10
    )


def _q_sessionize(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.events import sessionize

    return sessionize(rd.read_parquet(os.path.join(sf_dir, "events.parquet")))


def _q_props_agg(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.events import props_value_agg

    return props_value_agg(rd.read_parquet(os.path.join(sf_dir, "events.parquet")))


def _q_top_events_per_user(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.events import top_events_per_user

    return top_events_per_user(
        rd.read_parquet(os.path.join(sf_dir, "events.parquet")), n=3
    )


def _q_window_distinct_users(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.events import window_distinct_users

    return window_distinct_users(
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    )


def _q_event_pivot(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.events import event_type_pivot

    return event_type_pivot(rd.read_parquet(os.path.join(sf_dir, "events.parquet")))


def _q_hopping_window(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.events import hopping_window_value

    return hopping_window_value(
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    )


def _q_customers_no_f_orders(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.joins import hash_anti_join

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"],
    )
    # right side pruned AT THE READ: only the join key column of the
    # 'F' rows ever leaves storage
    f_orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderstatus"],
    ).filter(expr="o_orderstatus == 'F'")
    return hash_anti_join(cust, f_orders, on="c_custkey",
                          right_on="o_custkey", num_partitions=8)


def _q_customers_no_f_orders_native(sf_dir: str):
    """Third anti-join physical plan: Ray's native ``left_anti`` join
    (ops/joins.native_anti_join) — same oracle as the left_outer+filter
    and Bloom-prefilter variants, so the driver gate proves all three
    plans agree."""
    import ray.data as rd

    from pmocr_ray.ops.joins import native_anti_join

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"],
    )
    f_orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderstatus"],
    ).filter(expr="o_orderstatus == 'F'")
    return native_anti_join(cust, f_orders, on="c_custkey",
                            right_on="o_custkey", num_partitions=8)


def _q_customers_no_f_orders_bloom(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.joins import bloom_anti_join

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"],
    )
    f_orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderstatus"],
    ).filter(expr="o_orderstatus == 'F'")
    return bloom_anti_join(cust, f_orders, on="c_custkey",
                           right_on="o_custkey", n_bits=1 << 20,
                           num_partitions=8)


def _q_lang_len_quantiles(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.text import grouped_length_quantiles

    return grouped_length_quantiles(
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                        columns=["lang", "n_chars"]))


def _q_label_centroids(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.knn import label_centroid_fixedpoint

    return label_centroid_fixedpoint(
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet")))


def _q_orders_running_total(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.events import orders_running_total

    return orders_running_total(
        rd.read_parquet(os.path.join(sf_dir, "orders.parquet")))


def _q_pack_sequences(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.pack import pack_sequences

    return pack_sequences(
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"]),
        block_tokens=512)


def _q_shuffle_rank(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.pack import hash_shuffle_rank

    return hash_shuffle_rank(
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"]))


def _q_events_value_stats(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.events import events_value_stats

    return events_value_stats(
        rd.read_parquet(os.path.join(sf_dir, "events.parquet")))


def _q_kmv_sketch(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.text import kmv_sketch

    return kmv_sketch(
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                        columns=["text"]), k=64)


def _q_clean_text(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.text import clean_text

    return (rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
            .map_batches(clean_text, batch_format="pyarrow")
            .select_columns(["doc_id", "text_clean"]))


def _q_dedup_incremental(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.dedup import incremental_exact_dedup

    import pyarrow.compute as _pc

    def _parity(t, odd: bool):
        m = _pc.equal(_pc.bit_wise_and(t["doc_id"], 1), 1 if odd else 0)
        return t.filter(m)

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    new = docs.map_batches(_parity, fn_kwargs={"odd": True},
                           batch_format="pyarrow")
    history = docs.map_batches(_parity, fn_kwargs={"odd": False},
                               batch_format="pyarrow")
    return incremental_exact_dedup(new, history)


def _q_lang_label_mix(sf_dir: str):
    """Cross-modal enrichment: documents ⋈ embeddings on id (two large
    sides — hash-partitioned join, payload pruned at the read to the
    three columns used), then the (lang, label) composition rollup via
    the usual per-batch combiner + tiny global groupby."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "lang", "n_chars"])
    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "label"])
    parts = _pq_parts(sf_dir, "documents", cap=8)
    j = docs.join(emb, join_type="inner", num_partitions=parts,
                  on=("doc_id",), right_on=("vec_id",))

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        g = (t.select(["lang", "label", "n_chars"])
             .group_by(["lang", "label"])
             .aggregate([("n_chars", "sum"), ([], "count_all")]))
        return pa.table({"lang": g["lang"],
                         "label": _pc.cast(g["label"], pa.int64()),
                         "sum_chars": g["n_chars_sum"],
                         "n_docs": g["count_all"]})

    return (j.map_batches(partial, batch_format="pyarrow")
            .groupby(["lang", "label"])
            .aggregate(Sum("sum_chars", alias_name="sum_chars"),
                       Sum("n_docs", alias_name="n_docs")))


def _q_cc_chain(sf_dir: str):
    """Distributed connected components on a chain graph derived from
    doc ids (edges i→i+1 within blocks of 10): 10-hop chains force the
    min-label propagation loop through real multi-hop convergence —
    the closed-form oracle (label = id - id%10) checks the fixpoint."""
    import pyarrow as pa
    import pyarrow.compute as _pc

    import ray.data as rd

    from pmocr_ray.ops.graph import connected_components_distributed

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id"])

    def chain_edges(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        m = _pc.not_equal(_pc.subtract(ids, _pc.multiply(
            _pc.divide(ids, 10), 10)), 9)
        a = ids.filter(m)
        return pa.table({"a": a, "b": _pc.add(a, 1)})

    edges = docs.map_batches(chain_edges, batch_format="pyarrow")
    return connected_components_distributed(edges, num_partitions=4)


def _q_latest_order(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.compact import compact_latest

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
    return compact_latest(orders, key="o_custkey",
                          order_cols=["o_orderdate", "o_orderkey"])


def _q_trending_terms(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.text import top_terms_by_group

    return top_terms_by_group(
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                        columns=["lang", "text"]), group_col="lang", k=5)


def _q_len_percentile(sf_dir: str):
    """Annotate every doc with the cume_dist of its length: the global
    CDF is a value-counts rollup (bounded by distinct lengths, not
    rows), broadcast once; the annotate pass is a map-only
    searchsorted."""
    import numpy as np
    import pyarrow as pa

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "n_chars"])

    def counts(t: pa.Table) -> pa.Table:
        g = t.select(["n_chars"]).group_by("n_chars").aggregate(
            [([], "count_all")])
        return pa.table({"value": g["n_chars"], "n": g["count_all"]})

    rollup = (docs.map_batches(counts, batch_format="pyarrow")
              .groupby("value").aggregate(Sum("n", alias_name="n"))
              .sort("value").take_all())
    values = np.array([r["value"] for r in rollup], np.int64)
    cum = np.cumsum([r["n"] for r in rollup]).astype(np.int64)
    total = int(cum[-1])
    ref = ray.put((values, cum))

    def annotate(t: pa.Table) -> pa.Table:
        v, c = ray.get(ref)
        idx = np.searchsorted(v, t["n_chars"].to_numpy(zero_copy_only=False))
        pct = c[idx].astype(np.float64) / total
        return pa.table({"doc_id": t["doc_id"],
                         "pct": pa.array(pct, pa.float64())})

    return docs.map_batches(annotate, batch_format="pyarrow")


def _q_lm_score(sf_dir: str):
    """Char-bigram LM quality scoring (train-then-score; no SQL oracle —
    the model is corpus-trained; determinism and ordering are
    pytest-verified)."""
    import ray.data as rd

    from pmocr_ray.ops.text import lm_score

    return (lm_score(rd.read_parquet(
                os.path.join(sf_dir, "documents.parquet"),
                columns=["doc_id", "text"]))
            .select_columns(["doc_id", "lm_logprob"]))


def _q_lm_bigram_counts(sf_dir: str):
    """The corpus-scale half of ``lm_score`` made oracle-checkable:
    the trained char-bigram count matrix as (prev_ch, next_ch, n) rows
    with non-top-64 chars folded to ``<oov>``.  All integers — the
    distributed combiner + groupby is exact, so DuckDB can recompute
    it with a per-char lateral unnest.  Only the final per-doc float
    mean (``lm_score`` itself) stays rows-only."""
    import numpy as np
    import pyarrow as pa

    from pmocr_ray.ops.text import train_char_bigram_lm

    model = train_char_bigram_lm(_docs(sf_dir))
    chars, counts = model["chars"], model["counts"] - 1  # un-smooth
    labels = list(chars) + ["<oov>"]
    i, j = np.nonzero(counts)
    return pa.table({
        "prev_ch": pa.array([labels[x] for x in i], pa.string()),
        "next_ch": pa.array([labels[x] for x in j], pa.string()),
        "n": pa.array(counts[i, j], pa.int64()),
    })


def _q_quantize_embeddings(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.knn import quantize_embeddings

    return quantize_embeddings(
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"]))


def _q_span_extract(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.text import regex_explode

    return regex_explode(
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"]),
        r"scan \w+")


def _q_kmeans_assign1(sf_dir: str):
    """The k-means assignment kernel pinned to an SQL-reproducible
    regime: centroids = the first k=8 vectors by vec_id (deterministic
    init, no RNG), one assignment pass, per-vector cell emitted.  The
    argmax is float-safe against engine ULP differences: the minimum
    best-vs-second margin on the fixture is ~1e-4 (measured), ten
    orders above any dot-product reassociation error, and exact ties
    break to the lowest centroid index on both sides (numpy argmax
    picks the first maximum; the SQL twin orders by s DESC, idx ASC).
    The iterative production path (``kmeans_cells``) stays rows-only."""
    import numpy as np
    import pyarrow as pa

    import ray
    import ray.data as rd

    from pmocr_ray.ops.knn import _normalize, list_matrix

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])

    # first-8-by-vec_id via a bounded combiner (8 rows per batch reach
    # the driver), not sort().limit() — a global sort shuffles the
    # whole corpus for 8 rows
    def first8(t: pa.Table) -> pa.Table:
        idx = np.argsort(t["vec_id"].to_numpy(zero_copy_only=False),
                         kind="stable")[:8]
        return t.take(pa.array(idx))

    partials = emb.map_batches(first8, batch_format="pyarrow").take_all()
    first = sorted(partials, key=lambda r: r["vec_id"])[:8]
    cent = _normalize(np.asarray([r["embedding"] for r in first],
                                 np.float64))
    ref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        mat = list_matrix(t["embedding"])
        a = np.argmax(mat @ c.T, axis=1).astype(np.int64)
        return pa.table({"vec_id": t["vec_id"],
                         "cell": pa.array(a, pa.int64())})

    return emb.map_batches(assign, batch_format="pyarrow")


def _q_kmeans_cells(sf_dir: str):
    """Full-corpus Lloyd k-means (iterative — no SQL oracle; fixed-point
    determinism is pytest-verified bit-identical across partitionings);
    returns the final cell membership counts."""
    import numpy as np
    import pyarrow as pa

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from pmocr_ray.ops.knn import _normalize, kmeans_distributed

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["embedding"])
    cent = kmeans_distributed(emb, k=8, iters=5)
    ref = ray.put(cent)

    def assign_counts(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        mat = _normalize(np.asarray(t["embedding"].to_pylist(),
                                    dtype=np.float64))
        a = np.argmax(mat @ c.T, axis=1)
        uniq, counts = np.unique(a, return_counts=True)
        return pa.table({"cell": pa.array(uniq, pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    return (emb.map_batches(assign_counts, batch_format="pyarrow")
            .groupby("cell").aggregate(Sum("n", alias_name="n")))


def _q_events_with_session(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.events import events_with_session

    return events_with_session(
        rd.read_parquet(os.path.join(sf_dir, "events.parquet")))


def _q_len_bucket(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.text import range_bucket

    return range_bucket(
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "n_chars"]))


def _q_funnel_stages(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.events import funnel_stages

    return funnel_stages(
        rd.read_parquet(os.path.join(sf_dir, "events.parquet")))


def _q_hourly_retention(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.events import hourly_retention

    return hourly_retention(
        rd.read_parquet(os.path.join(sf_dir, "events.parquet")))


def _q_webdataset_audit(sf_dir: str):
    """WebDataset tar export (side effect under /tmp) returning the
    per-shard audit rows; the oracle replays the md5 shard rule."""
    import ray.data as rd

    from pmocr_ray.ops.export import webdataset_export

    out = f"/tmp/pmocr_wds/{os.path.basename(os.path.normpath(sf_dir))}"
    audit = webdataset_export(
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"]),
        out, n_shards=8)
    return audit.select_columns(["shard", "n_members"])


def _q_tfidf(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.text import tfidf_terms

    return tfidf_terms(
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"]),
        vocab_k=50)


def _q_lineitem_agg(sf_dir: str):
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    def partial(t: pa.Table) -> pa.Table:
        qty = t["l_quantity"].cast(pa.int64())
        tt = pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty": qty,
        })
        g = tt.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("qty", "count")]
        )
        return pa.table({
            "l_returnflag": g["l_returnflag"],
            "l_linestatus": g["l_linestatus"],
            "qty": g["qty_sum"],
            "cnt": g["qty_count"],
        })

    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    ).map_batches(partial, batch_format="pyarrow")
    return ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty", alias_name="sum_qty"), Sum("cnt", alias_name="n")
    )


def _q_top_docs_by_len(sf_dir: str):
    """Global sort + limit: top 20 documents by length (ties by id)."""
    out = (
        _docs(sf_dir)
        .select_columns(["doc_id", "n_chars"])
        .sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(20)
    )
    return out


def _q_top_terms(sf_dir: str):
    """Global top-20 vocabulary terms: per-batch local count (combiner),
    groupby-sum, distributed sort+limit."""
    from pmocr_ray.ops.text import top_terms

    return top_terms(_docs(sf_dir).select_columns(["text"]), k=20)


def _q_host_stats(sf_dir: str):
    """Per-host page rollup over the extraction output's url column."""
    from pmocr_ray.ops.text import host_stats

    return host_stats(_read_output(sf_dir))


def _q_doc_freq(sf_dir: str):
    """Top-50 terms by document frequency (the DF side of TF-IDF)."""
    from pmocr_ray.ops.text import doc_frequency

    return doc_frequency(_docs(sf_dir).select_columns(["text"]), k=50)


def _q_host_cap(sf_dir: str):
    """Per-domain quota: keep at most 3 pages per host (url-ordered)."""
    import pyarrow as pa

    from pmocr_ray.ops.text import quota_by_key

    def add_host(t: pa.Table) -> pa.Table:
        host = pc.struct_field(
            pc.extract_regex(t["url"], r"^[a-z+]+://(?P<host>[^/]+)"), "host")
        return pa.table({"host": host, "url": t["url"]})

    ds = _read_output(sf_dir).map_batches(add_host, batch_format="pyarrow")
    return quota_by_key(ds, "host", 3, "url").select_columns(["host", "url"])


def _q_asof_click_view(sf_dir: str):
    """As-of join: each click annotated with the latest preceding view
    by the same user."""
    import ray.data as rd

    from pmocr_ray.ops.events import asof_join

    out = asof_join(rd.read_parquet(os.path.join(sf_dir, "events.parquet")))
    return out.select_columns(["event_id", "user_id", "ts", "prev_ts"])


def _q_mirror_hosts(sf_dir: str):
    """Edit-distance-1 mirror-host pairs over the crawl's host domain
    (``www1``/``www2``-style crawl mirrors) — the FastSS deletion-
    neighborhood fuzzy self-join with an exact levenshtein==1 verify;
    never a cross join."""
    import pyarrow as pa

    from pmocr_ray.ops.joins import edit1_pairs

    def hosts(t: "pa.Table") -> "pa.Table":
        h = pc.extract_regex(t["url"], r"^[a-z+]+://(?P<host>[^/]+)")
        return pa.table({"host": pc.struct_field(h, "host")})

    return edit1_pairs(
        _read_output(sf_dir).select_columns(["url"]).map_batches(
            hosts, batch_format="pyarrow"),
        "host")


def _q_hash_sample(sf_dir: str):
    """Deterministic md5-prefix sample of documents (~10% of rows),
    stable across runs and partitionings."""
    from pmocr_ray.ops.text import hash_sample

    return hash_sample(_docs(sf_dir).select_columns(["doc_id", "text"]),
                       column="text",
                       prefix_lt="1a").select_columns(["doc_id"])


def _q_orders_by_segment(sf_dir: str):
    """Distributed hash join (Dataset.join, partitioned on the key) +
    grouped exact-cents aggregate: order volume per market segment."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(t["o_totalprice"].to_numpy(zero_copy_only=False))
                    * 100).astype(np.int64)
        return pa.table({"o_custkey": t["o_custkey"],
                         "price_cents": pa.array(c, pa.int64())})

    orders = orders.map_batches(cents, batch_format="pyarrow")
    customer = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(customer, join_type="inner", num_partitions=8,
                         on=("o_custkey",), right_on=("c_custkey",))
    return joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"),
        Sum("price_cents", alias_name="total_cents"),
    )


def _q_revenue_by_nation(sf_dir: str):
    """Three-table star query: lineitem ⋈ orders ⋈ customer → nation
    rollup.  The scale pattern, in order: (1) pre-aggregate lineitem
    revenue per order INSIDE map_batches before any join (combiner —
    the join left side shrinks to ~|orders| rows), (2) two
    hash-partitioned ``Dataset.join``s on the narrowing keys,
    (3) the 25-row nation dimension as a broadcast lookup (no shuffle),
    (4) exact integer arithmetic end-to-end (revenue in 1e-4 dollar
    units: cents × (100 - discount%), both exact 2-decimals)."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from pmocr_ray.ops.joins import broadcast_lookup

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])

    def rev_per_order(t: pa.Table) -> pa.Table:
        ext = np.rint(np.asarray(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        disc = np.rint(np.asarray(
            t["l_discount"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        tt = pa.table({"l_orderkey": t["l_orderkey"],
                       "rev": pa.array(ext * (100 - disc), pa.int64())})
        g = tt.group_by("l_orderkey").aggregate([("rev", "sum")])
        return pa.table({"l_orderkey": g["l_orderkey"], "rev": g["rev_sum"]})

    per_order = (_vgb(li.map_batches(rev_per_order, batch_format="pyarrow"), "l_orderkey", Sum("rev", alias_name="rev")))
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_custkey"])
    j1 = per_order.join(orders, join_type="inner", num_partitions=8,
                        on=("l_orderkey",), right_on=("o_orderkey",))
    customer = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey", "c_nationkey"])
    j2 = j1.join(customer, join_type="inner", num_partitions=8,
                 on=("o_custkey",), right_on=("c_custkey",))
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    n_map = dict(zip(nation["n_nationkey"].to_pylist(),
                     nation["n_name"].to_pylist()))
    out = broadcast_lookup(j2, "c_nationkey", n_map, "n_name")
    return out.groupby("n_name").aggregate(
        Count(alias_name="n_orders"),
        Sum("rev", alias_name="revenue"),
    )


def _q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape — two LARGE-large hash joins (no broadcast dim):
    lineitem revenue pre-aggregated per order INSIDE map_batches
    (combiner) with the shipdate filter applied before any shuffle;
    orders date-filtered at the scan; segment-filtered customers join
    as a semi-join side; exact 1e-4-dollar int64 revenue; distributed
    ``sort().limit(10)`` so only 10 rows reach the driver."""
    import datetime

    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd
    from ray.data.aggregate import Sum

    cut = pa.scalar(datetime.datetime(1998, 1, 1), pa.timestamp("us"))

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])

    def rev_per_order(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], cut))
        ext = np.rint(np.asarray(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        disc = np.rint(np.asarray(
            t["l_discount"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        tt = pa.table({"l_orderkey": t["l_orderkey"],
                       "rev": pa.array(ext * (100 - disc), pa.int64())})
        g = tt.group_by("l_orderkey").aggregate([("rev", "sum")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "rev": g["rev_sum"]})

    per_order = (_vgb(li.map_batches(rev_per_order, batch_format="pyarrow"), "l_orderkey", Sum("rev", alias_name="revenue_e4")))
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"]).map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], cut)),
        batch_format="pyarrow")
    j1 = per_order.join(orders, join_type="inner", num_partitions=8,
                        on=("l_orderkey",), right_on=("o_orderkey",))
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    ).filter(expr="c_mktsegment == 'BUILDING'").select_columns(
        ["c_custkey"])
    j2 = j1.join(cust, join_type="inner", num_partitions=8,
                 on=("o_custkey",), right_on=("c_custkey",))
    return (j2.select_columns(
                ["l_orderkey", "revenue_e4", "o_orderdate",
                 "o_orderpriority"])
            .sort(["revenue_e4", "l_orderkey"], descending=[True, False])
            .limit(10))


def _q_zorder(sf_dir: str):
    """Z-order (Morton) layout key over (n_chars, lang) + file bucket."""
    from pmocr_ray.ops.pack import zorder_values

    return zorder_values(_docs(sf_dir))


def _q_keyword_search(sf_dir: str):
    """Exact multi-term keyword retrieval: top-20 docs by (distinct
    query terms matched, total term hits), deterministic tie-break."""
    from pmocr_ray.ops.text import keyword_search

    return keyword_search(_docs(sf_dir),
                          ("hash", "merge", "sort", "window", "spark"),
                          k=20)


def _q_heavy_hitters(sf_dir: str):
    """Misra-Gries token heavy-hitter sketch (k=64).  The corpus
    vocabulary (31) is below k, so no counter is ever trimmed and the
    sketch is provably EXACT here — letting the approximate operator
    carry a full SQL oracle (its guarantee degrades gracefully to
    superset-with-bounded-undercount above k)."""
    from pmocr_ray.ops.text import heavy_hitters

    return heavy_hitters(_docs(sf_dir).select_columns(["text"]), k=64)


_zorder_cache: dict[str, str] = {}


def _q_zorder_scan(sf_dir: str):
    """End-to-end Z-order layout: hive write partitioned by Morton
    bucket + zone-map manifest, then a predicate-pruned read (only
    overlapping bucket directories are opened) with the exact residual
    filter."""
    import tempfile

    from pmocr_ray.ops.pack import zorder_read, zorder_write

    if sf_dir not in _zorder_cache:
        out = tempfile.mkdtemp(prefix="pmocr_zorder_")
        zorder_write(_docs(sf_dir).select_columns(
            ["doc_id", "n_chars", "lang"]), out, bucket_shift=12)
        _zorder_cache[sf_dir] = out
    return zorder_read(_zorder_cache[sf_dir], x_range=(100, 300),
                       cat="en").select_columns(
        ["doc_id", "n_chars", "lang"])


def _q_pps_sample(sf_dir: str):
    """Deterministic PPS systematic sample of 50 docs weighted by
    n_chars (two-pass distributed prefix sum, exact ints)."""
    from pmocr_ray.ops.pack import pps_systematic_sample

    return pps_systematic_sample(_docs(sf_dir), n_samples=50)


def _q_distinct_by_type(sf_dir: str):
    """Per-group KMV distinct-count sketch pinned EXACT at any scale:
    k is sized past the per-group distinct bound (user ids are dense,
    so max+1 bounds the distinct count — one column-pruned max scan).
    A fixed k=256 was exact at sf0.01 (≤150 users/type) but silently
    approximate at sf0.1 (1,500 users/type) — the sf0.1 heavy-tail
    pass caught the hash drift.  The approximation regime itself is
    exercised by the ``kmv_sketch`` query."""
    import ray.data as rd

    from pmocr_ray.ops.text import group_distinct_kmv

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "user_id"])
    k = max(256, int(ev.max("user_id")) + 2)
    return group_distinct_kmv(ev, "event_type", "user_id", k=k)


def _q_curate(sf_dir: str):
    """Composed curation pipeline: lang-ID + quality + near-dup dedup
    over the documents table (rows-only: heuristic + approximate)."""
    from pmocr_ray.pipelines import curate

    out = curate(_docs(sf_dir), min_quality=0.0, dedup_threshold=0.8)
    return out.select_columns(["doc_id", "lang_pred", "quality", "keep"])


def _q_corpus_build(sf_dir: str):
    """The flagship end-to-end corpus build: the extraction output's
    done rows (url parsed back to the page's int key = seq) → exact
    dedup → curate (lang-ID + quality + near-dup) → 512-token packing.
    Every stage is exactly recomputable, so the whole composition has
    one chained SQL twin — the reference's full batch story
    (/root/reference/pmocr.sh:2546-2593 per-target dispatch over
    discover→skip→convert→archive) as ONE streaming dataflow."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pmocr_ray.pipelines import corpus_build

    def to_corpus(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["status"], "done"))
        m = pc.extract_regex(t["url"], r"page/(?P<d>\d+)-(?P<r>\d+)$")
        d = pc.cast(pc.struct_field(m, "d"), pa.int64())
        r = pc.cast(pc.struct_field(m, "r"), pa.int64())
        return pa.table({
            "doc_id": pc.add(pc.multiply(d, pa.scalar(REPS, pa.int64())), r),
            "text": t["extracted_text"],
        })

    ds = _read_output(sf_dir).map_batches(to_corpus, batch_format="pyarrow")
    return corpus_build(ds)


def _q_media_meta(sf_dir: str):
    import pyarrow as pa

    from pmocr_ray.ops.media import MediaDecodeStage, encode_fake_image

    def attach(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        media = [
            encode_fake_image(d % 640 + 16, d % 480 + 16, d % 3 + 1, seed=d)
            for d in ids
        ]
        return pa.table({"doc_id": t["doc_id"], "media": pa.array(media, pa.binary())})

    ds = _docs(sf_dir).map_batches(attach, batch_format="pyarrow")
    ds = ds.map_batches(MediaDecodeStage, batch_format="pyarrow",
                        batch_size=64, concurrency=2,
                        fn_constructor_kwargs={"column": "media"})
    return ds.select_columns(["doc_id", "width", "height", "channels", "media_bytes"])


def _q_media_resize(sf_dir: str):
    """Resize stage over the synthetic media column: new binary payload
    at 64x48 + typed out-dims (SQL verifies the metadata contract)."""
    import pyarrow as pa

    from pmocr_ray.ops.media import MediaResizeStage, encode_fake_image

    def attach(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        media = [
            encode_fake_image(d % 640 + 16, d % 480 + 16, d % 3 + 1, seed=d)
            for d in ids
        ]
        return pa.table({"doc_id": t["doc_id"], "media": pa.array(media, pa.binary())})

    ds = _docs(sf_dir).map_batches(attach, batch_format="pyarrow")
    ds = ds.map_batches(MediaResizeStage, batch_format="pyarrow",
                        batch_size=64, concurrency=2,
                        fn_constructor_kwargs={"column": "media"})
    return ds.select_columns(["doc_id", "out_width", "out_height", "out_bytes"])


def _q_media_resize_real(sf_dir: str):
    """REAL raster decode → nearest-neighbor resize → re-encode,
    oracle-gated at the PIXEL level: each doc gets a raster whose
    pixel values are an arithmetic function of (doc_id, y, x, c) —
    packaged as binary PPM for even doc_ids and as REAL zlib-deflated
    PNG for odd ones, so the compressed-format codec sits inside the
    gate too — the actor stage resizes it to 4×3 through the real
    codecs (ops/media.decode_raster → resize_nearest → encode_ppm),
    and the query emits the SUM of the output pixel bytes — which
    DuckDB recomputes exactly from the same arithmetic + the same
    nearest-index formula ``src = (dst * in_dim) // out_dim``
    (container-independent, so ONE SQL covers both formats).  A
    byte-level functional gate on the real media path, not just the
    metadata contract."""
    import numpy as np
    import pyarrow as pa

    from pmocr_ray.ops.media import (MediaResizeStage, decode_ppm,
                                     encode_png, encode_ppm)

    def attach(t: pa.Table) -> pa.Table:
        media = []
        for d in t["doc_id"].to_pylist():
            w, h = 8 + d % 5, 6 + d % 4
            y, x, c = np.meshgrid(np.arange(h), np.arange(w),
                                  np.arange(3), indexing="ij")
            px = ((d + y * 31 + x * 7 + c * 3) % 256).astype(np.uint8)
            media.append(encode_ppm(px) if d % 2 == 0 else encode_png(px))
        return pa.table({"doc_id": t["doc_id"],
                         "media": pa.array(media, pa.binary())})

    def checksum(t: pa.Table) -> pa.Table:
        sums = [int(decode_ppm(p).astype(np.int64).sum())
                for p in t["media"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "out_width": t["out_width"],
                         "out_height": t["out_height"],
                         "pixel_sum": pa.array(sums, pa.int64())})

    ds = (_docs(sf_dir).select_columns(["doc_id"])
          .map_batches(attach, batch_format="pyarrow")
          .map_batches(MediaResizeStage, batch_format="pyarrow",
                       batch_size=64, concurrency=2,
                       fn_constructor_kwargs={"column": "media",
                                              "out_width": 4,
                                              "out_height": 3})
          .map_batches(checksum, batch_format="pyarrow"))
    return ds


def _q_media_png_real(sf_dir: str):
    """REAL PNG codec gated on its NON-RGB path: each doc gets a
    2-channel (gray+alpha) arithmetic-pixel PNG, the resize stage
    decodes/resizes it and — channels ≠ 3 — re-encodes the OUTPUT as
    PNG too (ops/media.MediaResizeStage), and the query decodes that
    output PNG to emit the pixel sum, which SQL recomputes from the
    same arithmetic + nearest-index formula.  Exercises encode→decode
    →resize→encode→decode entirely through the zlib codec."""
    import numpy as np
    import pyarrow as pa

    from pmocr_ray.ops.media import (MediaResizeStage, decode_png,
                                     encode_png)

    def attach(t: pa.Table) -> pa.Table:
        media = []
        for d in t["doc_id"].to_pylist():
            w, h = 8 + d % 5, 6 + d % 4
            y, x, c = np.meshgrid(np.arange(h), np.arange(w),
                                  np.arange(2), indexing="ij")
            px = ((d + y * 31 + x * 7 + c * 3) % 256).astype(np.uint8)
            media.append(encode_png(px))
        return pa.table({"doc_id": t["doc_id"],
                         "media": pa.array(media, pa.binary())})

    def checksum(t: pa.Table) -> pa.Table:
        sums = [int(decode_png(p).astype(np.int64).sum())
                for p in t["media"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "out_width": t["out_width"],
                         "out_height": t["out_height"],
                         "pixel_sum": pa.array(sums, pa.int64())})

    return (_docs(sf_dir).select_columns(["doc_id"])
            .map_batches(attach, batch_format="pyarrow")
            .map_batches(MediaResizeStage, batch_format="pyarrow",
                         batch_size=64, concurrency=2,
                         fn_constructor_kwargs={"column": "media",
                                                "out_width": 5,
                                                "out_height": 4})
            .map_batches(checksum, batch_format="pyarrow"))


def _q_media_jpeg_real(sf_dir: str):
    """REAL baseline-JPEG codec gated at the PIXEL level: each doc
    gets a grayscale JPEG of uniform 8×8 tiles whose values are an
    arithmetic function of (doc_id, tile_y, tile_x), encoded with
    all-ones quant tables — DC-only blocks round-trip BIT-EXACTLY
    through the Huffman/IDCT pipeline (ops/jpeg.py) — the resize
    stage decodes/resizes it (gray output re-encodes as PNG), and the
    query emits the output pixel SUM, which SQL recomputes from the
    same tile arithmetic + nearest-index formula.  Real entropy-coded
    JPEG bytes, exact integer oracle."""
    import numpy as np
    import pyarrow as pa

    from pmocr_ray.ops.jpeg import encode_jpeg
    from pmocr_ray.ops.media import MediaResizeStage, decode_png

    def attach(t: pa.Table) -> pa.Table:
        media = []
        for d in t["doc_id"].to_pylist():
            th, tw = 3 + d % 3, 4 + d % 2
            ty, tx = np.meshgrid(np.arange(th), np.arange(tw),
                                 indexing="ij")
            tiles = ((d + ty * 31 + tx * 7) % 256).astype(np.uint8)
            img = np.repeat(np.repeat(tiles, 8, 0), 8, 1)
            media.append(encode_jpeg(img, quant_scale=0))
        return pa.table({"doc_id": t["doc_id"],
                         "media": pa.array(media, pa.binary())})

    def checksum(t: pa.Table) -> pa.Table:
        sums = [int(decode_png(p).astype(np.int64).sum())
                for p in t["media"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "out_width": t["out_width"],
                         "out_height": t["out_height"],
                         "pixel_sum": pa.array(sums, pa.int64())})

    return (_docs(sf_dir).select_columns(["doc_id"])
            .map_batches(attach, batch_format="pyarrow")
            .map_batches(MediaResizeStage, batch_format="pyarrow",
                         batch_size=64, concurrency=2,
                         fn_constructor_kwargs={"column": "media",
                                                "out_width": 5,
                                                "out_height": 4})
            .map_batches(checksum, batch_format="pyarrow"))


def _q_media_gif_real(sf_dir: str):
    """REAL GIF codec (pure-Python LZW) gated at the PIXEL level:
    each doc gets a palette GIF whose palette AND index plane are
    arithmetic functions of doc_id, the resize stage LZW-decodes and
    nearest-resizes it (RGB output re-encodes as PPM), and the query
    emits the output pixel SUM — GIF is lossless, so SQL recomputes
    it exactly from the same arithmetic."""
    import numpy as np
    import pyarrow as pa

    from pmocr_ray.ops.gif import encode_gif
    from pmocr_ray.ops.media import MediaResizeStage, decode_ppm

    def attach(t: pa.Table) -> pa.Table:
        media = []
        for d in t["doc_id"].to_pylist():
            i = np.arange(24)
            pal = np.stack([(d + i * 7) % 256, (d * 3 + i * 11) % 256,
                            (d * 5 + i * 13) % 256], -1).astype(np.uint8)
            h, w = 6 + d % 4, 8 + d % 5
            y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            idx = ((d + y * 5 + x * 3) % 24).astype(np.uint8)
            media.append(encode_gif(idx, pal))
        return pa.table({"doc_id": t["doc_id"],
                         "media": pa.array(media, pa.binary())})

    def checksum(t: pa.Table) -> pa.Table:
        sums = [int(decode_ppm(p).astype(np.int64).sum())
                for p in t["media"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "out_width": t["out_width"],
                         "out_height": t["out_height"],
                         "pixel_sum": pa.array(sums, pa.int64())})

    return (_docs(sf_dir).select_columns(["doc_id"])
            .map_batches(attach, batch_format="pyarrow")
            .map_batches(MediaResizeStage, batch_format="pyarrow",
                         batch_size=64, concurrency=2,
                         fn_constructor_kwargs={"column": "media",
                                                "out_width": 4,
                                                "out_height": 3})
            .map_batches(checksum, batch_format="pyarrow"))


def _q_media_tiff_real(sf_dir: str):
    """REAL TIFF codec (the reference's own input format) gated at the
    PIXEL level: arithmetic RGB pixels packaged as PackBits-compressed
    TIFF for even doc_ids and literal-LZW TIFF for odd ones, decoded
    and resized through the raster dispatch — TIFF is lossless in both
    modes, so SQL recomputes the resized pixel SUM exactly (same
    arithmetic + nearest-index formula as media_resize_real)."""
    import numpy as np
    import pyarrow as pa

    from pmocr_ray.ops.media import MediaResizeStage, decode_ppm
    from pmocr_ray.ops.tiff import encode_tiff

    def attach(t: pa.Table) -> pa.Table:
        media = []
        for d in t["doc_id"].to_pylist():
            w, h = 8 + d % 5, 6 + d % 4
            y, x, c = np.meshgrid(np.arange(h), np.arange(w),
                                  np.arange(3), indexing="ij")
            px = ((d + y * 31 + x * 7 + c * 3) % 256).astype(np.uint8)
            media.append(encode_tiff(
                px, compression="packbits" if d % 2 == 0 else "lzw"))
        return pa.table({"doc_id": t["doc_id"],
                         "media": pa.array(media, pa.binary())})

    def checksum(t: pa.Table) -> pa.Table:
        sums = [int(decode_ppm(p).astype(np.int64).sum())
                for p in t["media"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "out_width": t["out_width"],
                         "out_height": t["out_height"],
                         "pixel_sum": pa.array(sums, pa.int64())})

    return (_docs(sf_dir).select_columns(["doc_id"])
            .map_batches(attach, batch_format="pyarrow")
            .map_batches(MediaResizeStage, batch_format="pyarrow",
                         batch_size=64, concurrency=2,
                         fn_constructor_kwargs={"column": "media",
                                                "out_width": 4,
                                                "out_height": 3})
            .map_batches(checksum, batch_format="pyarrow"))


def _q_gif_frames_real(sf_dir: str):
    """Animated-GIF frame sampling through the REAL LZW codec: each
    doc gets n = 2 + d%3 full-canvas 8×8 frames with arithmetic
    palette/indices, FrameSampleStage (step 2) explodes composed RGB
    frames, and the query emits each sampled frame's byte SUM —
    SQL-recomputable exactly (lossless codec, opaque frames)."""
    import numpy as np
    import pyarrow as pa

    from pmocr_ray.ops.gif import encode_gif
    from pmocr_ray.ops.media import FrameSampleStage

    def attach(t: pa.Table) -> pa.Table:
        media = []
        for d in t["doc_id"].to_pylist():
            i = np.arange(16)
            pal = np.stack([(d + i * 7) % 256, (d * 3 + i * 11) % 256,
                            (d * 5 + i * 13) % 256], -1).astype(np.uint8)
            frames = []
            for f in range(2 + d % 3):
                y, x = np.meshgrid(np.arange(8), np.arange(8),
                                   indexing="ij")
                frames.append(((d + f * 9 + y * 3 + x) % 16
                               ).astype(np.uint8))
            media.append(encode_gif(frames, pal))
        return pa.table({"doc_id": t["doc_id"],
                         "media": pa.array(media, pa.binary())})

    def sums(t: pa.Table) -> pa.Table:
        s = [int(np.frombuffer(f, np.uint8).astype(np.int64).sum())
             for f in t["frame"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "frame_idx": t["frame_idx"],
                         "byte_sum": pa.array(s, pa.int64())})

    return (_docs(sf_dir).select_columns(["doc_id"])
            .map_batches(attach, batch_format="pyarrow")
            .map_batches(FrameSampleStage, batch_format="pyarrow",
                         batch_size=64, concurrency=2,
                         fn_constructor_kwargs={"column": "media",
                                                "key_column": "doc_id",
                                                "step": 2})
            .map_batches(sums, batch_format="pyarrow"))


def _audio_payloads(t):
    """Deterministic WAV-per-doc: n = 64 + d%37 mono s16 samples at
    rate 8000 + (d%3)*4000, sample[i] = ((d*7 + i*13) % 4001) - 2000 —
    arithmetic the SQL oracles recompute exactly."""
    import numpy as np
    import pyarrow as pa

    from pmocr_ray.ops.media import encode_wav

    media = []
    for d in t["doc_id"].to_pylist():
        n = 64 + d % 37
        rate = 8000 + (d % 3) * 4000
        i = np.arange(n, dtype=np.int64)
        x = ((d * 7 + i * 13) % 4001 - 2000).astype(np.int16)
        media.append(encode_wav(x, rate))
    return pa.table({"doc_id": t["doc_id"],
                     "media": pa.array(media, pa.binary())})


def _q_audio_meta(sf_dir: str):
    """REAL WAV decode (RIFF/PCM s16le, pure numpy) gated at the
    SIGNAL level: integer-exact statistics (sum |x|, sum x², zero
    crossings) over arithmetic payloads, recomputed by SQL."""
    from pmocr_ray.ops.media import AudioDecodeStage

    return (_docs(sf_dir).select_columns(["doc_id"])
            .map_batches(_audio_payloads, batch_format="pyarrow")
            .map_batches(AudioDecodeStage, batch_format="pyarrow",
                         batch_size=64, concurrency=2,
                         fn_constructor_kwargs={"column": "media"}))


def _q_audio_g711_real(sf_dir: str):
    """REAL G.711 companded-audio decode (μ-law for even docs, A-law
    for odd), gated at the SAMPLE level: payload bytes are arithmetic,
    the decode stage expands them through the codec lookup tables, and
    SQL recomputes the CCITT expansion formulas exactly (integer
    arithmetic only) to rebuild sum |x| / sum x² / zero crossings."""
    import numpy as np
    import pyarrow as pa

    from pmocr_ray.ops.media import AudioDecodeStage, encode_wav_g711

    def attach(t: pa.Table) -> pa.Table:
        media = []
        for d in t["doc_id"].to_pylist():
            n = 48 + d % 17
            b = ((d * 13 + np.arange(n) * 7) % 256).astype(np.uint8)
            media.append(encode_wav_g711(
                b, 8000, law="mulaw" if d % 2 == 0 else "alaw"))
        return pa.table({"doc_id": t["doc_id"],
                         "media": pa.array(media, pa.binary())})

    return (_docs(sf_dir).select_columns(["doc_id"])
            .map_batches(attach, batch_format="pyarrow")
            .map_batches(AudioDecodeStage, batch_format="pyarrow",
                         batch_size=64, concurrency=2,
                         fn_constructor_kwargs={"column": "media"}))


def _q_audio_resample_real(sf_dir: str):
    """REAL nearest-index resample to 4 kHz through the WAV codec:
    the output sample SUM is recomputed by SQL from the same
    ``src = (dst * n_in) // n_out`` formula."""
    import pyarrow as pa

    from pmocr_ray.ops.media import AudioResampleStage

    ds = (_docs(sf_dir).select_columns(["doc_id"])
          .map_batches(_audio_payloads, batch_format="pyarrow")
          .map_batches(AudioResampleStage, batch_format="pyarrow",
                       batch_size=64, concurrency=2,
                       fn_constructor_kwargs={"column": "media",
                                              "target_rate": 4000}))
    return ds.select_columns(["doc_id", "out_rate", "out_samples",
                              "sample_sum"])


def _q_frame_sample_real(sf_dir: str):
    """REAL video frame sampling through the Y4M (YUV4MPEG2 Cmono)
    codec: arithmetic luma frames, every-3rd sampling, per-frame byte
    SUM recomputed by SQL."""
    import numpy as np
    import pyarrow as pa

    from pmocr_ray.ops.media import FrameSampleStage, encode_y4m

    def attach(t: pa.Table) -> pa.Table:
        media = []
        for d in t["doc_id"].to_pylist():
            n = 1 + d % 10
            f, y, x = np.meshgrid(np.arange(n), np.arange(4), np.arange(5),
                                  indexing="ij")
            frames = ((d + f * 7 + y * 5 + x) % 256).astype(np.uint8)
            media.append(encode_y4m(frames))
        return pa.table({"doc_id": t["doc_id"],
                         "media": pa.array(media, pa.binary())})

    def sums(t: pa.Table) -> pa.Table:
        import numpy as _np
        fs = [int(_np.frombuffer(f, _np.uint8).astype(_np.int64).sum())
              for f in t["frame"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "frame_idx": t["frame_idx"],
                         "frame_sum": pa.array(fs, pa.int64())})

    return (_docs(sf_dir).select_columns(["doc_id"])
            .map_batches(attach, batch_format="pyarrow")
            .map_batches(FrameSampleStage, batch_format="pyarrow",
                         batch_size=64, concurrency=2,
                         fn_constructor_kwargs={"column": "media",
                                                "step": 3})
            .map_batches(sums, batch_format="pyarrow"))


def _q_frame_sample(sf_dir: str):
    """Flat-map-shaped frame sampling: one output row per sampled frame
    (every 3rd) of each synthetic video payload."""
    import pyarrow as pa

    from pmocr_ray.ops.media import FrameSampleStage, encode_fake_video

    def attach(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        media = [encode_fake_video(d % 10 + 1, frame_size=32, seed=d)
                 for d in ids]
        return pa.table({"doc_id": t["doc_id"], "media": pa.array(media, pa.binary())})

    ds = _docs(sf_dir).map_batches(attach, batch_format="pyarrow")
    ds = ds.map_batches(FrameSampleStage, batch_format="pyarrow",
                        batch_size=64, concurrency=2,
                        fn_constructor_kwargs={"column": "media"})
    return ds.select_columns(["doc_id", "frame_idx"])


def _q_lang_id(sf_dir: str):
    from pmocr_ray.ops.text import LangIdStage

    ds = _docs(sf_dir).map_batches(LangIdStage, batch_format="pyarrow",
                                   concurrency=2)
    return ds.select_columns(["doc_id", "lang_pred"])


def _q_quality(sf_dir: str):
    from pmocr_ray.ops.text import quality_score

    ds = _docs(sf_dir).map_batches(quality_score, batch_format="pyarrow")
    return ds.select_columns(
        ["doc_id", "punct_ratio", "stopword_ratio", "mean_token_len", "quality"]
    )


def _q_jsonl_format(sf_dir: str):
    """Derived JSONL target: one compact JSON object per row (the
    multi-format fan-out's jsonl sink, byte-compatible with DuckDB's
    to_json so the format itself is oracle-checked)."""
    from pmocr_ray.targets import json_row_transform

    ds = _read_output(sf_dir).map_batches(json_row_transform,
                                          batch_format="pyarrow")
    return ds.select_columns(["url", "json_row"])


def _q_retry_redrive(sf_dir: str):
    """--retry-failed semantics end-to-end: run 1 quarantines the poison
    rows (attempts=2) and folds into the done manifest; run 2 re-drives
    exactly those with the counter carried forward (attempts=3) and
    skips everything else.  Returns run 2's (url, status, attempts)."""
    import shutil

    import ray.data as rd

    from pmocr_ray.fixtures import fixture_dir
    from pmocr_ray.pipeline import run_extraction
    from pmocr_ray.state.manifest import update_done_manifest

    pages_dir, seed_manifest = _pages(sf_dir)
    root = os.path.join(fixture_dir(sf_dir, REPS), "retry_demo")
    out2 = os.path.join(root, "run2")
    if not os.path.exists(os.path.join(root, "_DONE")):
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root)
        done = os.path.join(root, "done.parquet")
        shutil.copy(seed_manifest, done)
        out1 = os.path.join(root, "run1")
        run_extraction(pages_dir, done, run_id="rr1").write_parquet(out1)
        update_done_manifest(out1, done, run_id="rr1")
        run_extraction(pages_dir, done, run_id="rr2",
                       retry_failed=True).write_parquet(out2)
        with open(os.path.join(root, "_DONE"), "w") as f:
            f.write("ok")
    return rd.read_parquet(out2).select_columns(["url", "status", "attempts"])


def _q_dedup_minhash(sf_dir: str):
    from pmocr_ray.ops.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(_docs(sf_dir), threshold=0.8)


def _q_dedup_ngram(sf_dir: str):
    """Char-5-gram Jaccard near-dup pairs: LSH candidates verified with
    character-level n-gram Jaccard (robust to word-boundary edits)."""
    from pmocr_ray.ops.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(_docs(sf_dir), threshold=0.8,
                               char_level_verify=True, shingle_size=5)


def _q_dedup_simhash(sf_dir: str):
    """SimHash near-dup pinned to its EXACT regime: the 4×16-bit
    pigeonhole banding is complete for Hamming ≤ 3, and
    ``word_hash="md5"`` (little-endian first 8 digest bytes =
    DuckDB's ``md5_number_upper``) makes the 64-bit signatures — and
    therefore the full pair set — recomputable by the SQL oracle's
    brute-force ``bit_count(xor(sig_a, sig_b)) <= 3`` self-join.
    ``max_bucket`` is raised past the corpus size so the hot-bucket
    cap (a scale guard, exercised in pytest) cannot truncate the
    oracle-checked set."""
    from pmocr_ray.ops.dedup import simhash_dedup_pairs

    return simhash_dedup_pairs(_docs(sf_dir), max_distance=3,
                               word_hash="md5", max_bucket=1 << 20)


def _q_dedup_embedding(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.dedup import embedding_dedup_pairs

    return embedding_dedup_pairs(
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet")),
        threshold=0.45,
    ).select_columns(["a", "b"])


def _q_semdedup(sf_dir: str):
    """SemDeDup (cluster-then-prune semantic dedup) pinned to the
    SQL-reproducible regime: centroids = the first k=8 vectors by
    vec_id (deterministic init, no RNG), one assignment pass, pairwise
    keep-first prune at cosine ≥ 0.45.  Float safety: assignment
    argmax margins are the kmeans_assign1 regime's (min ~1e-4 on the
    fixture) and the prune threshold margin is ≥ 5.5e-4 — both ten
    orders above dot-product reassociation error; exact ties break the
    same way on both sides (argmax → first max; SQL orders s DESC,
    idx ASC)."""
    import ray.data as rd

    from pmocr_ray.ops.dedup import semdedup

    return semdedup(
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"]),
        k=8, threshold=0.45,
    )


def _q_dedup_embedding_lsh(sf_dir: str):
    """SRP-LSH near-dup pinned to a DENSE regime (5 planes × 64
    tables) that is candidate-complete on the fixture corpus, so the
    exact-cosine verify emits exactly the brute-force threshold pairs
    and the brute-force SQL twin applies.  The math: at cosine 0.45
    (these fixtures' pairs sit right at the threshold) a plane agrees
    w.p. 1-acos(0.45)/π ≈ 0.649, so a 5-plane table catches a pair
    w.p. 0.649⁵ ≈ 0.115 and 64 tables miss it w.p. (1-0.115)⁶⁴ ≈
    4e-4 — and the planes are seeded, so the observed complete
    candidate set is reproducible bit-for-bit.  ``max_bucket`` is
    raised past the corpus size (same pinning as ``dedup_simhash``):
    5-plane tables have only 32 buckets, so at sf0.1 (2 k vectors,
    mean occupancy 62.5) the default hot-bucket star emit silently
    dropped 3/144 pairs — the sf0.1 heavy-tail selfcheck caught it.
    The sparse production regime (16 planes × 8 tables, for
    thresholds ≥0.9 where the plane-agreement contrast is strong) is
    benchmarked separately in bench.py (``dedup_embedding_lsh_fast``)."""
    import ray.data as rd

    from pmocr_ray.ops.dedup import embedding_dedup_pairs_lsh

    return embedding_dedup_pairs_lsh(
        rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet")),
        threshold=0.45, n_planes=5, n_tables=64, max_bucket=1 << 20,
    ).select_columns(["a", "b"])


# injected-PII suffix shared by the Ray query and the oracle so the
# redaction pass has real matches to scrub on the synthetic corpus
def _inject_pii(t):
    import pyarrow as pa

    did = pc.cast(t["doc_id"], pa.string())
    mod = pc.cast(pa.array(np.mod(t["doc_id"].to_numpy(zero_copy_only=False),
                                  200)), pa.string())
    txt = pc.binary_join_element_wise(
        t["text"], " contact user", did, "@mail.example or 10.0.", mod,
        ".7 now", "")
    return pa.table({"doc_id": t["doc_id"], "text": txt})


def _q_redact_pii(sf_dir: str):
    from pmocr_ray.ops.text import redact_pii

    return (_docs(sf_dir).select_columns(["doc_id", "text"])
            .map_batches(_inject_pii, batch_format="pyarrow")
            .map_batches(redact_pii, batch_format="pyarrow")
            .select_columns(["doc_id", "text_redacted"]))


def _q_repetition_stats(sf_dir: str):
    from pmocr_ray.ops.text import repetition_stats

    return _docs(sf_dir).map_batches(repetition_stats, batch_format="pyarrow")


_STRAT_THRESHOLDS = {"en": "4", "de": "c"}  # keep ~25% en, ~75% de; rest all


def _q_stratified_sample(sf_dir: str):
    from pmocr_ray.ops.text import stratified_sample

    return stratified_sample(
        _docs(sf_dir), "lang", _STRAT_THRESHOLDS, key_column="text"
    ).select_columns(["doc_id", "lang"])


def _q_len_quantiles(sf_dir: str):
    from pmocr_ray.ops.text import length_quantiles

    return length_quantiles(_docs(sf_dir), column="n_chars",
                            qs=(0.5, 0.9, 0.99))


def _q_line_dedup(sf_dir: str):
    from pmocr_ray.ops.dedup import line_dedup

    return line_dedup(_docs(sf_dir).select_columns(["doc_id", "text"]),
                      width=10)


def _q_decontaminate(sf_dir: str):
    """Benchmark set = every 97th doc (a deterministic stand-in for an
    eval corpus); flag training docs sharing any 13-gram with it."""
    import pyarrow as pa

    from pmocr_ray.ops.dedup import benchmark_shingles, decontaminate

    def is_bench(t: pa.Table) -> pa.Table:
        mask = np.mod(t["doc_id"].to_numpy(zero_copy_only=False), 97) == 0
        return t.filter(pa.array(mask))

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    shingles = benchmark_shingles(
        docs.map_batches(is_bench, batch_format="pyarrow"), n=13)
    return decontaminate(docs, shingles, n=13)


def _q_shard_counts(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.export import shard_counts

    pages_dir, _ = _pages(sf_dir)
    return shard_counts(rd.read_parquet(pages_dir, columns=["url"]),
                        key="url", n_shards=16)


def _q_chunk_tokens(sf_dir: str):
    """Sliding-window token chunking (window 64, stride 48): flat-map
    explode, numpy-indexed gather, ListArray+binary_join reassembly."""
    from pmocr_ray.ops.pack import chunk_tokens

    return chunk_tokens(_docs(sf_dir).select_columns(["doc_id", "text"]),
                        window=64, stride=48)


def _q_line_self_dedup(sf_dir: str):
    """Within-document line dedup over the derived multi-line view
    (newline every 8 words, same derivation as c4_filter)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pmocr_ray.ops.dedup import line_self_dedup

    def derive_lines(t: pa.Table) -> pa.Table:
        t2 = pc.replace_substring_regex(
            t["text"], r"((?:\S+ ){7}\S+) ", "\\1\n")
        return pa.table({"doc_id": t["doc_id"], "text": t2})

    return line_self_dedup(
        _docs(sf_dir).select_columns(["doc_id", "text"])
        .map_batches(derive_lines, batch_format="pyarrow"))


def _q_split_assign(sf_dir: str):
    """Deterministic 80/10/10 train/val/test assignment by md5 bucket."""
    from pmocr_ray.ops.text import split_assign

    return split_assign(_docs(sf_dir).select_columns(["doc_id", "lang"]))


def _q_dup_spans(sf_dir: str):
    """Cross-document duplicate 8-gram span detection (word-level
    exact-substring dedup signal): per-doc distinct-gram totals and
    how many grams recur elsewhere in the corpus."""
    from pmocr_ray.ops.dedup import dup_span_stats

    return dup_span_stats(_docs(sf_dir).select_columns(["doc_id", "text"]),
                          n=8)


def _q_remove_dup_spans(sf_dir: str):
    """Exact duplicated-span removal (train-data substring dedup,
    word-window form): drop every duplicated 8-gram occurrence except
    its globally first one and rewrite each document's text without
    the covered words."""
    from pmocr_ray.ops.dedup import remove_dup_spans

    return remove_dup_spans(
        _docs(sf_dir).select_columns(["doc_id", "text"]), n=8)


def _q_event_transitions(sf_dir: str):
    """User-journey Markov rollup: (from_type, to_type, n) over each
    user's (ts, event_id)-ordered event sequence."""
    import ray.data as rd

    from pmocr_ray.ops.events import event_transitions

    return event_transitions(
        rd.read_parquet(os.path.join(sf_dir, "events.parquet")))


def _q_inter_arrival(sf_dir: str):
    """Per-user inter-arrival gap stats in exact int64 microseconds."""
    import ray.data as rd

    from pmocr_ray.ops.events import inter_arrival_stats

    return inter_arrival_stats(
        rd.read_parquet(os.path.join(sf_dir, "events.parquet")))


def _q_incremental_near_dedup(sf_dir: str):
    """Crawl-over-crawl near-dup dedup: new docs (doc_id % 5 != 0)
    kept only if no history doc (doc_id % 5 == 0) has word-shingle
    Jaccard >= 0.8 against them."""
    import pyarrow as pa

    from pmocr_ray.ops.dedup import incremental_minhash_dedup

    docs = _docs(sf_dir).select_columns(["doc_id", "lang", "text"])
    new = _sel(docs, ["doc_id", "lang", "text"],
               lambda t: pa.array(
                   t["doc_id"].to_numpy(zero_copy_only=False) % 5 != 0))
    hist = _sel(docs, ["doc_id", "text"],
                lambda t: pa.array(
                    t["doc_id"].to_numpy(zero_copy_only=False) % 5 == 0))
    return (incremental_minhash_dedup(new, hist, threshold=0.8)
            .select_columns(["doc_id", "lang"]))


def _q_clip_outliers(sf_dir: str):
    """Winsorize n_chars at exact p5/p95 (broadcast bounds, map-only)."""
    from pmocr_ray.ops.text import clip_outliers

    return clip_outliers(_docs(sf_dir).select_columns(
        ["doc_id", "n_chars"]))


def _q_bpe_pairs(sf_dir: str):
    """Top-50 adjacent char-pair frequencies weighted by word counts
    (the BPE first-merge statistic)."""
    from pmocr_ray.ops.text import bpe_pair_counts

    return bpe_pair_counts(_docs(sf_dir).select_columns(["text"]), k=50)


def _q_domain_reweight(sf_dir: str):
    """Uniform-mix rebalancing: per-group counts (tiny groupby) →
    broadcast integer thresholds → deterministic md5-bucket filter."""
    from pmocr_ray.ops.text import domain_reweight

    return domain_reweight(_docs(sf_dir).select_columns(["doc_id", "lang"]))


def _q_dsir_weights(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023): hashed word-bigram
    features, target = lang='en' slice, Laplace-smoothed log-ratio
    score per document.  Text never shuffles; the ≤4096-row bucket
    rollup is the only driver materialization (the model), then
    broadcast for the map-side scoring pass."""
    from pmocr_ray.ops.text import dsir_weights

    return dsir_weights(_docs(sf_dir))


def _q_posting_lists(sf_dir: str):
    """Inverted-index export: exact df + first-20 posting list per
    term; per-batch capped candidates bound the shuffle at vocab×cap."""
    from pmocr_ray.ops.text import posting_lists

    return posting_lists(_docs(sf_dir).select_columns(["doc_id", "text"]))


def _q_gopher_quality(sf_dir: str):
    """Gopher-style document shape rules (arXiv:2112.11446 §A1.1) as a
    map-only vectorized Arrow stage; integer cross-multiplied
    thresholds so the verdict is exactly SQL-reproducible."""
    from pmocr_ray.ops.filters import gopher_quality

    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        gopher_quality, batch_format="pyarrow")


def _q_c4_filter(sf_dir: str):
    """C4-style line filter (arXiv:1910.10683 §2.2) over a derived
    multi-line view of the corpus (newline every 8 words — the raw
    fixture is single-line prose, so the strict terminal-punctuation
    rule would be degenerate; the line rule here keeps lines
    containing the token 'table' with ≥8 words).  Exercises the full
    machinery: split → per-line vectorized mask → ListArray rebuild →
    binary_join reassembly → doc verdict."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pmocr_ray.ops.filters import c4_line_filter

    def derive_lines(t: pa.Table) -> pa.Table:
        t2 = pc.replace_substring_regex(
            t["text"], r"((?:\S+ ){7}\S+) ", "\\1\n")
        return pa.table({"doc_id": t["doc_id"], "text": t2})

    return (_docs(sf_dir).select_columns(["doc_id", "text"])
            .map_batches(derive_lines, batch_format="pyarrow")
            .map_batches(lambda t: c4_line_filter(
                t, line_keep_re=r"(?:^|[ \t])table(?:[ \t]|$)",
                min_line_words=8, min_kept_lines=2),
                batch_format="pyarrow"))


def _q_ntile_buckets(sf_dir: str):
    """Equal-frequency NTILE(8) bucketing over (n_chars, doc_id) order
    — distributed two-pass ordered scan, exact SQL NTILE semantics."""
    import ray.data as rd

    from pmocr_ray.ops.pack import ntile_buckets

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "n_chars"])
    return ntile_buckets(ds, 8)


def _q_rollup_orders(sf_dir: str):
    """GROUP BY ROLLUP(segment, nation) in one pass: pre-aggregate
    orders per customer INSIDE map_batches (combiner), one hash join
    to customer, one fine-grained groupby — then the coarser rollup
    levels are derived from the ≤ |segments|×|nations| fine rows (a
    bounded-size result, safe to fold on the driver at any corpus
    scale).  Rolled-up keys use 'ALL' / -1 sentinels (COALESCE'd the
    same way in the oracle) so the three levels union into one
    hash-stable table."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey", "o_totalprice"])

    def per_cust_partial(t: pa.Table) -> pa.Table:
        cents = np.rint(np.asarray(
            t["o_totalprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        g = pa.table({"o_custkey": t["o_custkey"],
                      "cents": pa.array(cents, pa.int64())}) \
            .group_by("o_custkey").aggregate([("cents", "sum"),
                                              ([], "count_all")])
        return pa.table({"o_custkey": g["o_custkey"],
                         "cents": g["cents_sum"],
                         "n": g["count_all"]})

    per_cust = (_vgb(orders.map_batches(per_cust_partial, batch_format="pyarrow"), "o_custkey", Sum("cents", alias_name="cents"), Sum("n", alias_name="n")))
    customer = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey", "c_mktsegment",
                                        "c_nationkey"])
    joined = per_cust.join(customer, join_type="inner", num_partitions=8,
                           on=("o_custkey",), right_on=("c_custkey",))
    fine = joined.groupby(["c_mktsegment", "c_nationkey"]).aggregate(
        Sum("n", alias_name="n_orders"),
        Sum("cents", alias_name="total_cents"))
    rows = fine.take_all()  # bounded: |segments| x |nations|
    out = [{"seg": r["c_mktsegment"], "nationkey": r["c_nationkey"],
            "n_orders": r["n_orders"], "total_cents": r["total_cents"]}
           for r in rows]
    seg_level: dict[str, list[int]] = {}
    for r in rows:
        a = seg_level.setdefault(r["c_mktsegment"], [0, 0])
        a[0] += r["n_orders"]; a[1] += r["total_cents"]
    for seg, (n, c) in seg_level.items():
        out.append({"seg": seg, "nationkey": -1, "n_orders": n,
                    "total_cents": c})
    out.append({"seg": "ALL", "nationkey": -1,
                "n_orders": sum(r["n_orders"] for r in rows),
                "total_cents": sum(r["total_cents"] for r in rows)})
    return pa.Table.from_pylist(out, schema=pa.schema([
        ("seg", pa.string()), ("nationkey", pa.int64()),
        ("n_orders", pa.int64()), ("total_cents", pa.int64())]))


def _mod(arr, d: int):
    """Vectorized non-negative integer modulo (this pyarrow build ships
    no modulo kernel): x - (x // d) * d via integer divide."""
    return pc.subtract(arr, pc.multiply(pc.divide(arr, d), d))


def _q_collocations(sf_dir: str):
    """Adjacent-bigram collocations in the top-200 vocabulary: exact
    pair + unigram counts (broadcast-vocab combiner, one shuffle)."""
    from pmocr_ray.ops.text import collocation_pairs

    return collocation_pairs(_docs(sf_dir), vocab_k=200, min_count=2)


def _derive_snapshot_b(docs):
    """Deterministic snapshot B for the CDC diff: drop doc_id%7==0,
    revise text for doc_id%5==0, add +1e9-keyed rows for doc_id%11==0.
    Pure Arrow arithmetic so the oracle derives the same table in SQL."""
    import pyarrow as pa

    def mutate(t: pa.Table) -> pa.Table:
        did = t["doc_id"]
        keep = pc.not_equal(_mod(did, 7), 0)
        t = t.filter(keep)
        did = t["doc_id"]
        revised = pc.binary_join_element_wise(t["text"], " [rev2]", "")
        text = pc.if_else(pc.equal(_mod(did, 5), 0), revised, t["text"])
        return pa.table({"doc_id": did, "text": text})

    def added(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(_mod(t["doc_id"], 11), 0))
        new_id = pc.add(t["doc_id"], 1_000_000_000)
        text = pc.binary_join_element_wise(
            "new page ", pc.cast(t["doc_id"], pa.string()), "")
        return pa.table({"doc_id": new_id, "text": text})

    base = docs.select_columns(["doc_id", "text"])
    return (base.map_batches(mutate, batch_format="pyarrow")
            .union(base.map_batches(added, batch_format="pyarrow")))


def _q_snapshot_diff(sf_dir: str):
    """CDC diff A→B (added/removed/changed) via tagged union + one
    groupby — full-outer-join semantics without a join."""
    from pmocr_ray.ops.compact import snapshot_diff

    docs = _docs(sf_dir)
    return snapshot_diff(docs, _derive_snapshot_b(docs))


def _q_dup_cluster_hist(sf_dir: str):
    """Exact-duplicate cluster-size histogram over a corpus with
    injected duplicate buckets (doc_id%10<3 collapse to 50 contents)."""
    import pyarrow as pa

    from pmocr_ray.ops.dedup import dup_cluster_histogram

    def inject(t: pa.Table) -> pa.Table:
        dup = pc.binary_join_element_wise(
            "dup bucket ", pc.cast(_mod(t["doc_id"], 50), pa.string()),
            "")
        text = pc.if_else(pc.less(_mod(t["doc_id"], 10), 3),
                          dup, t["text"])
        return pa.table({"doc_id": t["doc_id"], "text": text})

    ds = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        inject, batch_format="pyarrow")
    return dup_cluster_histogram(ds)


def _pagerank_edges(sf_dir: str):
    """Deterministic host-graph edge list from doc_id arithmetic
    (211-node graph, multi-edges collapsed): src = doc_id%211,
    dst = (13·doc_id+7)%211, self-loops dropped."""
    import pyarrow as pa

    def edges_fn(t: pa.Table) -> pa.Table:
        did = t["doc_id"]
        src = _mod(did, 211)
        dst = _mod(pc.add(pc.multiply(did, 13), 7), 211)
        tab = pa.table({"src": src, "dst": dst}).filter(
            pc.not_equal(src, dst))
        return tab.group_by(["src", "dst"]).aggregate([])  # local distinct

    from ray.data.aggregate import Count
    return (_vgb(_docs(sf_dir).select_columns(["doc_id"])
            .map_batches(edges_fn, batch_format="pyarrow"), ["src", "dst"], Count(alias_name="_n"))
            .select_columns(["src", "dst"]))


def _q_pagerank(sf_dir: str):
    """3-iteration fixed-point integer PageRank over the derived host
    graph — bit-identical to the unrolled SQL oracle."""
    from pmocr_ray.ops.graph import pagerank

    return pagerank(_pagerank_edges(sf_dir), iters=3)


def _q_attribution(sf_dir: str):
    """Clicks within the preceding 60 min of each purchase, per user."""
    import ray.data as rd

    from pmocr_ray.ops.events import attribution_window

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    return attribution_window(ev)


def _q_host_blocklist(sf_dir: str):
    """Broadcast host-blocklist gate over the pages fixture: two exact
    hosts plus every host ending '3.example' are dropped."""
    import ray.data as rd

    from pmocr_ray.ops.filters import host_blocklist_filter

    pages_dir, _ = _pages(sf_dir)
    pages = rd.read_parquet(pages_dir, columns=["url", "lang"])
    kept = host_blocklist_filter(
        pages, exact={"site7.example", "site13.example"},
        suffixes=("3.example",))
    return kept.select_columns(["url", "lang"])


def _q_host_mirror(sf_dir: str):
    """Host pairs serving identical extracted content (mirror
    detection) over the done rows of the flagship output."""
    import pyarrow as pa

    from pmocr_ray.ops.dedup import host_mirror_pairs

    ds = _read_output(sf_dir)

    def done_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["status"], "done"))

    done = ds.map_batches(done_only, batch_format="pyarrow").select_columns(
        ["url", "extracted_text"])
    return host_mirror_pairs(done)


def _q_cheapest_supplier(sf_dir: str):
    """Per part: the supplier with the lowest total extended price
    (grouped argmin over a combiner rollup; ties break min suppkey).
    Reuses compact_latest as the generic exact per-key argmin."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    from pmocr_ray.ops.compact import compact_latest

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_partkey", "l_suppkey",
                                  "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.rint(np.asarray(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        g = (pa.table({"p_partkey": t["l_partkey"],
                       "s_suppkey": t["l_suppkey"],
                       "total_cents": pa.array(cents)})
             .group_by(["p_partkey", "s_suppkey"])
             .aggregate([("total_cents", "sum")]))
        return pa.table({"p_partkey": g["p_partkey"],
                         "s_suppkey": g["s_suppkey"],
                         "total_cents": g["total_cents_sum"]})

    rollup = (_vgb(li.map_batches(partial, batch_format="pyarrow"), ["p_partkey", "s_suppkey"], Sum("total_cents", alias_name="total_cents")))
    best = compact_latest(rollup, key="p_partkey",
                          order_cols=["total_cents", "s_suppkey"],
                          descending=[False, False])
    return best.select_columns(["p_partkey", "s_suppkey", "total_cents"])


def _q_local_supplier_revenue(sf_dir: str):
    """TPC-H Q5 shape: revenue per nation for ASIA where customer and
    supplier share the nation.  Scale order: region→nation pruning
    broadcast FIRST (the suppkey→nationkey side filtered to ASIA
    before any join), lineitem revenue attached to supplier nation via
    a broadcast lookup (supplier ≪ lineitem; the hash-join form is the
    swap-in at 10⁹ suppliers), partial (orderkey, s_nat) pre-agg
    BEFORE the two large-large hash joins (orders, customer), then the
    same-nation filter and a 5-row rollup.  Exact 1e-4-dollar int64."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    asia_key = region.filter(
        pc.equal(region["r_name"], "ASIA"))["r_regionkey"][0].as_py()
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    asia_nations = nation.filter(
        pc.equal(pc.cast(nation["n_regionkey"], pa.int64()), asia_key))
    n_map = dict(zip(asia_nations["n_nationkey"].to_pylist(),
                     asia_nations["n_name"].to_pylist()))
    supplier = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                             columns=["s_suppkey", "s_nationkey"])
    s_map = {k: v for k, v in zip(supplier["s_suppkey"].to_pylist(),
                                  supplier["s_nationkey"].to_pylist())
             if v in n_map}  # region pruning pushed into the broadcast

    import ray
    s_ref = ray.put(_dense_i64_lut(s_map))  # region-pruned: absent = -1

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])

    def rev_by_order_nat(t: pa.Table) -> pa.Table:
        lut = ray.get(s_ref)
        nat = _lut_gather(lut, _i64(t["l_suppkey"]))  # vectorized, bounds-safe
        t = (t.append_column("s_nat", pa.array(nat, pa.int64()))
             .filter(pa.array(nat >= 0)))
        ext = np.rint(np.asarray(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        disc = np.rint(np.asarray(
            t["l_discount"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        tt = pa.table({"l_orderkey": t["l_orderkey"], "s_nat": t["s_nat"],
                       "rev": pa.array(ext * (100 - disc), pa.int64())})
        g = tt.group_by(["l_orderkey", "s_nat"]).aggregate([("rev", "sum")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "s_nat": g["s_nat"], "rev": g["rev_sum"]})

    from pmocr_ray.ops.vecagg import grouped_aggregate

    # order-scale groups — Arrow-bucketed merge (see ops/vecagg.py)
    per_order = grouped_aggregate(
        li.map_batches(rev_by_order_nat, batch_format="pyarrow"),
        ["l_orderkey", "s_nat"], [("rev", "sum", "rev")])
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_custkey"])
    j1 = per_order.join(orders, join_type="inner", num_partitions=8,
                        on=("l_orderkey",), right_on=("o_orderkey",))
    customer = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey", "c_nationkey"])
    j2 = j1.join(customer, join_type="inner", num_partitions=8,
                 on=("o_custkey",), right_on=("c_custkey",))

    n_ref = ray.put(n_map)

    def same_nation(t: pa.Table) -> pa.Table:
        nmap = ray.get(n_ref)
        keep = pc.equal(pc.cast(t["c_nationkey"], pa.int64()), t["s_nat"])
        t = t.filter(pc.fill_null(keep, False))
        names = pa.array([nmap[k] for k in t["s_nat"].to_pylist()],
                         pa.string())
        return pa.table({"n_name": names, "rev": t["rev"]})

    return (j2.map_batches(same_nation, batch_format="pyarrow")
            .groupby("n_name").aggregate(Sum("rev",
                                             alias_name="revenue_e4")))


def _q_late_data_window(sf_dir: str):
    """Event-time hourly windows with a watermark: synthetic arrival
    delay (event_id % 7 minutes), watermark = max(arrival) − 30 min (a
    single tiny global aggregate, broadcast as one int), per-window
    on-time/late split (allowed lateness 3 min) and open/closed status
    relative to the watermark.  All int64 microsecond arithmetic."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "ts"])

    US_MIN = 60_000_000
    US_HOUR = 3_600_000_000

    def with_arrival(t: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        delay = pc.multiply(_mod(t["event_id"], 7), US_MIN)
        return pa.table({"ts_us": ts, "arrival_us": pc.add(ts, delay)})

    tagged = ev.map_batches(with_arrival, batch_format="pyarrow")
    wm = tagged.aggregate(Max("arrival_us", alias_name="m"))["m"] - 30 * US_MIN

    def per_window_partial(t: pa.Table) -> pa.Table:
        win = pc.multiply(pc.divide(t["ts_us"], US_HOUR), US_HOUR)
        win_end = pc.add(win, US_HOUR)
        late = pc.greater(t["arrival_us"], pc.add(win_end, 3 * US_MIN))
        tt = pa.table({
            "window_start": win,
            "one": pa.array(np.ones(len(t), np.int64)),
            "late": pc.cast(late, pa.int64()),
        })
        g = tt.group_by("window_start").aggregate(
            [("one", "sum"), ("late", "sum")])
        return pa.table({"window_start": g["window_start"],
                         "n_events": g["one_sum"], "n_late": g["late_sum"]})

    agg = (tagged.map_batches(per_window_partial, batch_format="pyarrow")
           .groupby("window_start")
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Sum("n_late", alias_name="n_late")))

    def finish(t: pa.Table) -> pa.Table:
        ws = pc.cast(t["window_start"], pa.int64())
        closed = pc.less_equal(pc.add(ws, US_HOUR), wm)
        return pa.table({
            "window_start": pc.cast(ws, pa.timestamp("us")),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "n_late": pc.cast(t["n_late"], pa.int64()),
            "status": pc.if_else(closed, "closed", "open"),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_typo_pairs(sf_dir: str):
    """Edit-distance-1 term pairs in the part-name vocabulary via
    deletion-neighborhood blocking (never a cross join)."""
    import ray.data as rd

    from pmocr_ray.ops.text import typo_pairs

    parts = rd.read_parquet(os.path.join(sf_dir, "part.parquet"),
                            columns=["p_name"])
    return typo_pairs(parts, column="p_name")


def _q_host_lang(sf_dir: str):
    """Dominant language per host (site-level language assignment):
    (host, lang) combiner rollup → compact_latest as grouped argmax
    (n_pages desc, lang asc)."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    from pmocr_ray.ops.compact import compact_latest

    pages_dir, _ = _pages(sf_dir)
    pages = rd.read_parquet(pages_dir, columns=["url", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        host = pc.struct_field(
            pc.extract_regex(t["url"], r"^[a-z+]+://(?P<host>[^/]+)"),
            "host")
        g = (pa.table({"host": host, "lang": t["lang"]})
             .group_by(["host", "lang"]).aggregate([([], "count_all")]))
        return pa.table({"host": g["host"], "lang": g["lang"],
                         "n_pages": pc.cast(g["count_all"], pa.int64())})

    rollup = (_vgb(pages.map_batches(partial, batch_format="pyarrow"), ["host", "lang"], Sum("n_pages", alias_name="n_pages")))
    best = compact_latest(rollup, key="host",
                          order_cols=["n_pages", "lang"],
                          descending=[True, False])
    return best.select_columns(["host", "lang", "n_pages"])


def _q_url_canon_dedup(sf_dir: str):
    """Three deterministic crawl variants per page url (plain, utm
    tracking params, shouty-host + fragment) collapse to one canonical
    form each via strip_tracking_params — the canonical STRINGS are
    what the oracle hash checks."""
    import pyarrow as pa

    import ray.data as rd

    from pmocr_ray.ops.text import canonical_url_counts

    pages_dir, _ = _pages(sf_dir)
    pages = rd.read_parquet(pages_dir, columns=["url"])

    def variants(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        out = []
        for u in urls:
            scheme_host, _, rest = u.partition("/page/")
            out.append(u)
            out.append(u + "?utm_source=feed&utm_campaign=x")
            out.append(scheme_host.upper() + "/page/" + rest + "#frag")
        return pa.table({"url": pa.array(out, pa.string())})

    return canonical_url_counts(
        pages.map_batches(variants, batch_format="pyarrow"))


def _q_incremental_stats(sf_dir: str):
    """Incremental aggregate maintenance: the corpus arrives as two
    partitions (doc_id parity), each folded to an O(groups) rollup
    shard; the merged view equals the batch GROUP BY exactly."""
    import tempfile

    import pyarrow as pa

    from pmocr_ray.ops.compact import fold_rollup_shard, read_rollup

    docs = _docs(sf_dir).select_columns(["doc_id", "lang", "n_chars"])

    def half(keep_even: bool):
        def fn(t: pa.Table) -> pa.Table:
            even = pc.equal(_mod(t["doc_id"], 2), 0)
            return t.filter(even if keep_even else pc.invert(even))
        return fn

    state = tempfile.mkdtemp(prefix="pmocr_rollup_")
    fold_rollup_shard(docs.map_batches(half(True), batch_format="pyarrow"),
                      state, "even", group_col="lang",
                      sum_cols={"total_chars": "n_chars"})
    fold_rollup_shard(docs.map_batches(half(False), batch_format="pyarrow"),
                      state, "odd", group_col="lang",
                      sum_cols={"total_chars": "n_chars"})
    return read_rollup(state, group_col="lang")


def _q_event_debounce(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.events import event_debounce

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "user_id", "event_type",
                                  "ts"])
    return event_debounce(ev, gap_seconds=3600)


def _q_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape: promo vs total revenue share.  lineitem
    pre-aggregated per partkey BEFORE the hash join to part (the fact
    side shrinks to |part| rows); one-row conditional rollup after."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount"])

    def rev_per_part(t: pa.Table) -> pa.Table:
        ext = np.rint(np.asarray(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        disc = np.rint(np.asarray(
            t["l_discount"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        tt = pa.table({"l_partkey": t["l_partkey"],
                       "rev": pa.array(ext * (100 - disc), pa.int64())})
        g = tt.group_by("l_partkey").aggregate([("rev", "sum")])
        return pa.table({"l_partkey": g["l_partkey"], "rev": g["rev_sum"]})

    per_part = (_vgb(li.map_batches(rev_per_part, batch_format="pyarrow"), "l_partkey", Sum("rev",
                                                    alias_name="rev")))
    part = rd.read_parquet(os.path.join(sf_dir, "part.parquet"),
                           columns=["p_partkey", "p_type"])
    j = per_part.join(part, join_type="inner", num_partitions=4,
                      on=("l_partkey",), right_on=("p_partkey",))

    def conditional(t: pa.Table) -> pa.Table:
        promo = pc.if_else(pc.equal(t["p_type"], "PROMO"), t["rev"],
                           pa.scalar(0, pa.int64()))
        return pa.table({
            "promo_e4": pa.array([pc.sum(promo).as_py() or 0], pa.int64()),
            "total_e4": pa.array([pc.sum(t["rev"]).as_py() or 0],
                                 pa.int64()),
        })

    from ray.data.aggregate import Sum as _S
    row = (j.map_batches(conditional, batch_format="pyarrow")
           .aggregate(_S("promo_e4", alias_name="promo_e4"),
                      _S("total_e4", alias_name="total_e4")))
    import pandas as pd
    return pd.DataFrame([{"promo_e4": int(row["promo_e4"]),
                          "total_e4": int(row["total_e4"])}])


def _q_embedding_dim_stats(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.knn import embedding_dim_stats

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["embedding"])
    return embedding_dim_stats(emb)


def _q_triangle_count(sf_dir: str):
    """Global triangle count of the derived host graph (degree-oriented
    wedge join — no hub explosion)."""
    import pandas as pd

    from pmocr_ray.ops.graph import triangle_count

    n = triangle_count(_pagerank_edges(sf_dir))
    return pd.DataFrame([{"n_triangles": int(n)}])


def _q_bucketed_join(sf_dir: str):
    """Shuffle-free bucketed storage join: orders and customer written
    hash-bucketed on the customer key ONCE, then joined bucket-by-
    bucket with no exchange; segment rollup after."""
    import tempfile

    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    from pmocr_ray.ops.pack import bucketed_join, bucketed_write

    base = tempfile.mkdtemp(prefix="pmocr_buckets_")
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_custkey"])
    customer = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey", "c_mktsegment"])
    da = bucketed_write(orders, os.path.join(base, "orders"),
                        key="o_custkey", n_buckets=8)
    db = bucketed_write(customer, os.path.join(base, "customer"),
                        key="c_custkey", n_buckets=8)
    joined = bucketed_join(da, db, key_a="o_custkey", key_b="c_custkey",
                           n_buckets=8)

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["c_mktsegment"]).group_by("c_mktsegment").aggregate(
            [([], "count_all")])
        return pa.table({"c_mktsegment": g["c_mktsegment"],
                         "n_orders": pc.cast(g["count_all"], pa.int64())})

    return (joined.map_batches(partial, batch_format="pyarrow")
            .groupby("c_mktsegment")
            .aggregate(Sum("n_orders", alias_name="n_orders")))


def _q_moving_window(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.events import moving_window_sum

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "ts", "value"])
    return moving_window_sum(ev, trailing_hours=7)


def _q_token_budget(sf_dir: str):
    from pmocr_ray.ops.pack import token_budget_trim

    docs = _docs(sf_dir).select_columns(["doc_id", "source", "n_chars"])
    out = token_budget_trim(docs, group_col="source",
                            weight_col="n_chars", key="doc_id",
                            budget=50_000)
    return out.select_columns(["doc_id", "source", "n_chars"])


def _q_range_scan(sf_dir: str):
    """Range-partitioned orders layout; manifest-pruned range query
    [1000, 3000) with exact residual; one-row rollup."""
    import tempfile

    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from pmocr_ray.ops.pack import range_lookup, range_partition_write

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_totalprice"])
    d = tempfile.mkdtemp(prefix="pmocr_range_")
    range_partition_write(orders, d, key="o_orderkey", n_parts=8)
    hit = range_lookup(d, lo=1000, hi=3000)

    def rollup(t: pa.Table) -> pa.Table:
        cents = np.rint(np.asarray(
            t["o_totalprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        return pa.table({"n_rows": pa.array([len(t)], pa.int64()),
                         "total_cents": pa.array([int(cents.sum())],
                                                 pa.int64())})

    from ray.data.aggregate import Sum
    row = (hit.map_batches(rollup, batch_format="pyarrow")
           .aggregate(Sum("n_rows", alias_name="n_rows"),
                      Sum("total_cents", alias_name="total_cents")))
    return pd.DataFrame([{"n_rows": int(row["n_rows"]),
                          "total_cents": int(row["total_cents"])}])


def _q_skew_join(sf_dir: str):
    """Hot-key-split join: events ⋈ per-user value rollup with a low
    hot threshold so BOTH the broadcast and hash paths execute; the
    result is path-independent (oracle: plain join)."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from pmocr_ray.ops.joins import skew_hash_join

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_type", "value"])

    def cents_partial(t: pa.Table) -> pa.Table:
        cents = np.rint(np.asarray(
            t["value"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        g = (pa.table({"p_user": t["user_id"],
                       "user_cents": pa.array(cents)})
             .group_by("p_user").aggregate([("user_cents", "sum")]))
        return pa.table({"p_user": g["p_user"],
                         "user_cents": g["user_cents_sum"]})

    profile = (_vgb(ev.map_batches(cents_partial, batch_format="pyarrow"), "p_user", Sum("user_cents", alias_name="user_cents")))
    left = ev.select_columns(["user_id", "event_type"])
    joined = skew_hash_join(left, profile, on="user_id",
                            right_on="p_user", hot_threshold=5)
    return joined.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("user_cents", alias_name="total_user_cents"))


def _q_value_trend(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.events import value_trend_components

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "ts", "value"])
    return value_trend_components(ev)


def _q_value_mad(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.events import value_mad

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "value"])
    return value_mad(ev)


def _q_host_churn(sf_dir: str):
    """Per-source churn rollup of the CDC diff: the small diff table
    hash-joins back to documents for the source dimension (added rows
    map via key − 10⁹), then one tiny (source, change) groupby."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count

    from pmocr_ray.ops.compact import snapshot_diff

    docs = _docs(sf_dir)
    diff = snapshot_diff(docs, _derive_snapshot_b(docs))

    def base_key(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.int64())
        base = pc.if_else(pc.greater_equal(did, 1_000_000_000),
                          pc.subtract(did, 1_000_000_000), did)
        return pa.table({"base_id": base, "change": t["change"]})

    keyed = diff.map_batches(base_key, batch_format="pyarrow")
    dims = docs.select_columns(["doc_id", "source"])
    j = keyed.join(dims, join_type="inner", num_partitions=1,
                   on=("base_id",), right_on=("doc_id",))
    return j.groupby(["source", "change"]).aggregate(
        Count(alias_name="n"))


def _q_table_extract(sf_dir: str):
    """Structured HTML-table extraction: deterministic 2×2 table per
    document (cells '{doc_id}-{r}-{c}'), exploded to cell rows — the
    oracle reconstructs the same grid arithmetically."""
    import pyarrow as pa

    from pmocr_ray.extract.table_extractor import table_cells

    def synth(t: pa.Table) -> pa.Table:
        htmls = []
        for d in t["doc_id"].to_pylist():
            rows = "".join(
                "<tr>" + "".join(f"<td> {d}-{r}-{c} </td>"
                                 for c in range(2)) + "</tr>"
                for r in range(2))
            htmls.append(f"<html><body><table>{rows}</table>"
                         f"<p>not a cell</p></body></html>")
        return pa.table({"doc_id": t["doc_id"],
                         "html": pa.array(htmls, pa.string())})

    ds = (_docs(sf_dir).select_columns(["doc_id"])
          .map_batches(synth, batch_format="pyarrow")
          .map_batches(table_cells, batch_format="pyarrow"))
    return ds


def _q_session_sets(sf_dir: str):
    import ray.data as rd

    from pmocr_ray.ops.events import session_event_sets

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])
    return session_event_sets(ev)


def _q_byte_blocks(sf_dir: str):
    from pmocr_ray.ops.pack import byte_balanced_blocks

    docs = _docs(sf_dir).select_columns(["doc_id", "n_chars"])
    return byte_balanced_blocks(docs, target_bytes=4096)


def _q_schema_evolve(sf_dir: str):
    """Two crawl snapshots with drifted schemas (old half lacks lang,
    new half adds crawl_tag) align and union; rollup by lang counts
    the null-lang legacy rows like the oracle's."""
    import pyarrow as pa

    from pmocr_ray.ops.joins import _key_array  # noqa: F401  (parity)
    from pmocr_ray.sources import align_schemas

    docs = _docs(sf_dir)

    def old_half(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(_mod(t["doc_id"], 2), 1))
        return t.select(["doc_id", "text"])  # legacy: no lang column

    def new_half(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(_mod(t["doc_id"], 2), 1))
        t = t.select(["doc_id", "text", "lang"])
        return t.append_column("crawl_tag",
                               pa.array(["c2"] * len(t), pa.string()))

    a = docs.map_batches(old_half, batch_format="pyarrow")
    b = docs.map_batches(new_half, batch_format="pyarrow")
    u = align_schemas([a, b])

    def rollup(t: pa.Table) -> pa.Table:
        lang = pc.fill_null(t["lang"], "<missing>")
        tag = pc.fill_null(t["crawl_tag"], "<none>")
        g = (pa.table({"lang": lang, "crawl_tag": tag})
             .group_by(["lang", "crawl_tag"])
             .aggregate([([], "count_all")]))
        return pa.table({"lang": g["lang"], "crawl_tag": g["crawl_tag"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    from ray.data.aggregate import Sum
    return (u.map_batches(rollup, batch_format="pyarrow")
            .groupby(["lang", "crawl_tag"])
            .aggregate(Sum("n", alias_name="n")))


def _q_rare_term_pairs(sf_dir: str):
    """Doc pairs sharing a rare marker token (df ≤ 3 blocking — the
    rarity filter IS the bucket cap).  The marker modulus scales with
    the corpus (≈ df 3 at any sf): a fixed modulus made every marker
    common at sf0.1, leaving an empty result — and a zero-row Ray
    Dataset cannot carry a schema (from_arrow(empty).schema() is
    empty in this Ray version), so the result is also returned as a
    TYPED pandas frame with an explicit empty-schema fallback."""
    import math

    import pandas as pd
    import pyarrow as pa

    from pmocr_ray.ops.text import rare_term_pairs

    n_docs = _docs(sf_dir).count()
    mod_val = max(149, math.ceil(n_docs / 3))

    def add_marker(t: pa.Table) -> pa.Table:
        mk = pc.binary_join_element_wise(
            t["text"], pc.binary_join_element_wise(
                "mk", pc.cast(_mod(t["doc_id"], mod_val), pa.string()), ""),
            " ")
        return pa.table({"doc_id": t["doc_id"], "text": mk})

    ds = (_docs(sf_dir).select_columns(["doc_id", "text"])
          .map_batches(add_marker, batch_format="pyarrow"))
    df = rare_term_pairs(ds, max_df=3).to_pandas()
    if df.shape[1] == 0:  # Ray dropped the schema with the last row
        df = pd.DataFrame({"a": pd.Series(dtype="int64"),
                           "b": pd.Series(dtype="int64"),
                           "n_shared_terms": pd.Series(dtype="int64")})
    return df


def _q_priority_semi(sf_dir: str):
    """TPC-H Q4 shape: distributed semi-join — lineitem qty>45 filter
    at the scan, distinct-orderkey reduce (combiner), ONE hash join to
    orders, priority rollup.  No EXISTS rescan, no broadcast."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_quantity"])

    def big_qty_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_quantity"], 45.0))
        g = t.select(["l_orderkey"]).group_by("l_orderkey").aggregate([])
        return g

    keys = (_vgb(li.map_batches(big_qty_keys, batch_format="pyarrow"), "l_orderkey", Count(alias_name="_n"))
            .select_columns(["l_orderkey"]))
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_orderpriority"])
    j = keys.join(orders, join_type="inner", num_partitions=4,
                  on=("l_orderkey",), right_on=("o_orderkey",))
    return j.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_orders"))


def _q_priority_semi_native(sf_dir: str):
    """Second semi-join physical plan: Ray's native ``left_semi`` join
    (orders ⋉ qualifying-orderkey set) — same oracle as the
    distinct-keys + inner-join formulation, so the gate proves the two
    plans agree.  The probe side is still reduced to distinct keys
    before the exchange."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_quantity"])

    def big_qty_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_quantity"], 45.0))
        return t.select(["l_orderkey"]).group_by("l_orderkey").aggregate([])

    keys = (_vgb(li.map_batches(big_qty_keys, batch_format="pyarrow"), "l_orderkey", Count(alias_name="_n"))
            .select_columns(["l_orderkey"]))
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_orderpriority"])
    j = orders.join(keys, join_type="left_semi", num_partitions=4,
                    on=("o_orderkey",), right_on=("l_orderkey",))
    return j.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_orders"))


def _q_cust_order_dist(sf_dir: str):
    """TPC-H Q13 shape: distribution of customers by order count,
    INCLUDING zero-order customers — per-cust combiner rollup, one
    LEFT hash join from customer, null→0, then the tiny distribution
    groupby."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([([], "count_all")])
        return pa.table({"o_custkey": g["o_custkey"],
                         "n_orders": pc.cast(g["count_all"], pa.int64())})

    per_cust = (_vgb(orders.map_batches(partial, batch_format="pyarrow"), "o_custkey", Sum("n_orders", alias_name="n_orders")))
    customer = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey"])
    j = customer.join(per_cust, join_type="left_outer", num_partitions=4,
                      on=("c_custkey",), right_on=("o_custkey",))

    def fill0(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.coalesce(t["n_orders"],
                                pa.scalar(0, t["n_orders"].type)),
                    pa.int64())
        # left-joined NaN may arrive float64 via pandas blocks
        return pa.table({"n_orders": n})

    return (j.map_batches(fill0, batch_format="pyarrow")
            .groupby("n_orders").aggregate(Count(alias_name="n_custs")))


def _q_sentence_stats(sf_dir: str):
    """Vectorized sentence segmentation stats per doc: split on
    [.!?]+ runs, count non-blank sentences (Arrow kernels only)."""
    import pyarrow as pa

    def stats(t: pa.Table) -> pa.Table:
        # derive sentence boundaries deterministically (corpus text is
        # unpunctuated word salad): ' batch ' → '. ', same left-to-right
        # non-overlapping replace rule in Arrow and DuckDB
        text = pc.replace_substring(t["text"], " batch ", ". ")
        parts = pc.split_pattern_regex(text, r"[.!?]+")
        flat = pc.utf8_trim_whitespace(pc.list_flatten(parts))
        parent = pc.list_parent_indices(parts)
        keep = pc.not_equal(flat, "")
        counts = pa.table({
            "i": parent.filter(keep)}).group_by("i").aggregate(
            [([], "count_all")])
        n = np.zeros(len(t), np.int64)
        n[counts["i"].to_numpy(zero_copy_only=False)] = \
            counts["count_all"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": t["doc_id"],
                         "n_sentences": pa.array(n)})

    return (_docs(sf_dir).select_columns(["doc_id", "text"])
            .map_batches(stats, batch_format="pyarrow"))


def _q_basket_pairs(sf_dir: str):
    """Market-basket 2-itemsets: part pairs co-purchased in one order,
    support ≥ 3.  Distributed shape: global distinct of
    (orderkey, partkey) via one groupby, then a hash self-join on
    l_orderkey — pair emission stays within the basket (never
    cross-order), and support is one more small groupby.  No per-group
    Python dispatch; every step is a vectorized batch kernel."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from pmocr_ray.ops.vecagg import distinct as _vec_distinct

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_partkey"])
    # order-item-scale distinct — Arrow-bucketed (see ops/vecagg.py)
    items = _vec_distinct(li, ["l_orderkey", "l_partkey"])
    items, parts = sized_for_join(items, cap=16)

    j = items.join(items, join_type="inner", num_partitions=parts,
                   on=("l_orderkey",), right_suffix="_r")

    def to_pairs(t: pa.Table) -> pa.Table:
        keep = pc.less(t["l_partkey"], t["l_partkey_r"])
        t = t.filter(keep)
        return pa.table({"p1": t["l_partkey"], "p2": t["l_partkey_r"],
                         "n": pa.array([1] * len(t), pa.int64())})

    from pmocr_ray.ops.vecagg import grouped_aggregate

    sup = grouped_aggregate(
        j.map_batches(to_pairs, batch_format="pyarrow"),
        ["p1", "p2"], [("n", "sum", "support")])
    return sup.map_batches(
        lambda t: t.filter(pc.greater_equal(t["support"], 3)),
        batch_format="pyarrow")


def _q_scd2_dim(sf_dir: str):
    """Slowly-changing-dimension type 2 build from the CDC diff: one
    versioned row per (doc, validity interval) under fixed version
    stamps v1/v2 — unchanged docs keep their open v1 row, changed docs
    close v1 and open v2, removed close v1, added open at v2."""
    import pyarrow as pa

    from pmocr_ray.ops.compact import snapshot_diff

    docs = _docs(sf_dir)
    diff = snapshot_diff(docs, _derive_snapshot_b(docs))

    def versions(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.int64())
        ch = t["change"]
        added = pc.equal(ch, "added")
        removed = pc.equal(ch, "removed")
        changed = pc.equal(ch, "changed")
        rows_id, rows_from, rows_to = [], [], []
        for i in range(len(t)):
            d = did[i].as_py()
            if added[i].as_py():
                rows_id.append(d); rows_from.append("v2"); rows_to.append(None)
            elif removed[i].as_py():
                rows_id.append(d); rows_from.append("v1"); rows_to.append("v2")
            else:
                rows_id.append(d); rows_from.append("v1"); rows_to.append("v2")
                rows_id.append(d); rows_from.append("v2"); rows_to.append(None)
        return pa.table({"doc_id": pa.array(rows_id, pa.int64()),
                         "valid_from": pa.array(rows_from, pa.string()),
                         "valid_to": pa.array(rows_to, pa.string())})

    versioned = diff.map_batches(versions, batch_format="pyarrow")

    # unchanged docs: anti-join documents against the diff'd ids —
    # broadcast of the CHANGED id set only (diff ≪ corpus)
    changed_ids = pa.array(
        sorted(r["doc_id"] for r in
               diff.select_columns(["doc_id"]).take_all()), pa.int64())
    import ray as _ray
    ref = _ray.put(changed_ids)

    def open_rows(t: pa.Table) -> pa.Table:
        ids = _ray.get(ref)
        keep = pc.invert(pc.is_in(pc.cast(t["doc_id"], pa.int64()),
                                  value_set=ids))
        t = t.filter(pc.fill_null(keep, True))
        n = len(t)
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "valid_from": pa.array(["v1"] * n, pa.string()),
                         "valid_to": pa.nulls(n, pa.string())})

    unchanged = docs.select_columns(["doc_id"]).map_batches(
        open_rows, batch_format="pyarrow")
    return versioned.union(unchanged)


def _q_returned_top_customers(sf_dir: str):
    """TPC-H Q10 shape: revenue from RETURNED items per customer,
    top 20.  Combiner first (per-order returned revenue inside
    map_batches, exact 1e-4-dollar ints), one hash join to orders,
    per-customer rollup, then a tiny sort+limit — only the ~|customers|
    rollup is ever sorted, with an explicit rank column so the
    order-insensitive driver hash still checks the ordering."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"])

    def rev_per_order(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        ext = np.rint(np.asarray(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        disc = np.rint(np.asarray(
            t["l_discount"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        tt = pa.table({"l_orderkey": t["l_orderkey"],
                       "rev": pa.array(ext * (100 - disc), pa.int64())})
        g = tt.group_by("l_orderkey").aggregate([("rev", "sum")])
        return pa.table({"l_orderkey": g["l_orderkey"], "rev": g["rev_sum"]})

    per_order = (_vgb(li.map_batches(rev_per_order, batch_format="pyarrow"), "l_orderkey", Sum("rev", alias_name="rev")))
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_custkey"])
    j = per_order.join(orders, join_type="inner", num_partitions=8,
                       on=("l_orderkey",), right_on=("o_orderkey",))
    rollup = (_vgb(j, "o_custkey", Sum("rev", alias_name="revenue"), Count(alias_name="n_orders")))
    top = (rollup.sort(["revenue", "o_custkey"],
                       descending=[True, False])
           .limit(20).to_pandas())
    top.insert(0, "rank", np.arange(1, len(top) + 1, dtype=np.int64))
    top = top.rename(columns={"o_custkey": "c_custkey"})
    top["n_orders"] = top["n_orders"].astype("int64")
    return top[["rank", "c_custkey", "n_orders", "revenue"]]


def _q_big_spender_filter(sf_dir: str):
    """Q22 shape: a GLOBAL scalar (mean positive balance) computed as a
    tiny two-int aggregate, broadcast into the filter as the exact
    cross-multiplication cents*n > sum_cents (no float division
    anywhere), then an anti-join against orders (customers who never
    ordered) and a per-segment rollup."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from pmocr_ray.ops.joins import hash_anti_join

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_acctbal", "c_mktsegment"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = np.rint(np.asarray(
            t["c_acctbal"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        return pa.table({"c_custkey": t["c_custkey"],
                         "c_mktsegment": t["c_mktsegment"],
                         "cents": pa.array(cents, pa.int64())})

    base = cust.map_batches(to_cents, batch_format="pyarrow")

    # global scalar: one (sum, count) pair per batch -> driver folds a
    # handful of scalars, never rows
    def partial_stat(t: pa.Table) -> pa.Table:
        pos = t.filter(pc.greater(t["cents"], 0))
        return pa.table({"s": pa.array([pc.sum(pos["cents"]).as_py() or 0],
                                       pa.int64()),
                         "n": pa.array([len(pos)], pa.int64())})

    stats = base.map_batches(partial_stat, batch_format="pyarrow").take_all()
    s = sum(r["s"] for r in stats)
    n = max(1, sum(r["n"] for r in stats))

    rich = base.map_batches(
        lambda t: t.filter(pc.greater(pc.multiply(t["cents"], n), s)),
        batch_format="pyarrow")
    f_orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderstatus"],
    ).filter(expr="o_orderstatus == 'F'")
    no_f = hash_anti_join(rich, f_orders, on="c_custkey",
                          right_on="o_custkey", num_partitions=8)
    out = (no_f.groupby("c_mktsegment")
           .aggregate(Count(alias_name="n_customers"),
                      Sum("cents", alias_name="total_bal_cents"))
           .to_pandas())
    if out.empty:  # schema-stable empty result
        import pandas as pd
        out = pd.DataFrame({"c_mktsegment": pd.Series(dtype=object),
                            "n_customers": pd.Series(dtype="int64"),
                            "total_bal_cents": pd.Series(dtype="int64")})
    out["n_customers"] = out["n_customers"].astype("int64")
    return out


def _q_lineitem_unpivot(sf_dir: str):
    """UNPIVOT/melt: the four lineitem measures stacked into long
    (key, measure, cents) rows — a pure per-batch reshape (4 column
    slices concatenated), no shuffle, exact fixed-point values."""
    import pyarrow as pa

    import ray.data as rd

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"])
    measures = ["quantity", "extendedprice", "discount", "tax"]

    def melt(t: pa.Table) -> pa.Table:
        parts = []
        for m in measures:
            cents = np.rint(np.asarray(
                t[f"l_{m}"].to_numpy(zero_copy_only=False)) * 100
            ).astype(np.int64)
            parts.append(pa.table({
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": pc.cast(t["l_linenumber"], pa.int64()),
                "measure": pa.array([m] * len(t), pa.string()),
                "cents": pa.array(cents, pa.int64())}))
        return pa.concat_tables(parts)

    return li.map_batches(melt, batch_format="pyarrow")


def _q_keep_best_dedup(sf_dir: str):
    """Canonical-document selection: per (lang, source) group keep the
    LONGEST doc, tie-broken by smallest doc_id.  Distributed argmax as
    two small shuffles and one hash join — group max first, join the
    max back, then min-id among the rows that hit the max.  No
    map_groups, no per-group Python dispatch."""
    import pyarrow as pa

    from ray.data.aggregate import Count, Max, Min

    import ray.data as rd

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "source", "n_chars"])
    g = (docs.groupby(["lang", "source"])
         .aggregate(Max("n_chars", alias_name="best_len"),
                    Count(alias_name="n_docs")))
    parts = _pq_parts(sf_dir, "documents", cap=8)
    j = docs.join(g, join_type="inner", num_partitions=parts,
                  on=("lang", "source"))
    hits = j.map_batches(
        lambda t: t.filter(pc.equal(t["n_chars"], t["best_len"])),
        batch_format="pyarrow")
    return (hits.groupby(["lang", "source"])
            .aggregate(Min("doc_id", alias_name="keep_id"),
                       Max("best_len", alias_name="best_len"),
                       Max("n_docs", alias_name="n_docs")))


def _q_wow_change(sf_dir: str):
    """Period-over-period deltas: daily event counts with the lag
    difference vs the previous day.  The corpus-size work is one
    vectorized day-bucket + count; the lag runs on the tiny per-day
    rollup (≤ hundreds of rows) driver-side."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts"])

    def day_of(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        return pa.table({"day": pc.divide(us, 86_400_000_000)})

    rollup = (ev.map_batches(day_of, batch_format="pyarrow")
              .groupby("day").aggregate(Count(alias_name="n"))
              .to_pandas().sort_values("day").reset_index(drop=True))
    n = rollup["n"].astype("int64")
    prev = n.shift(1, fill_value=0).astype("int64")
    return pd.DataFrame({"day": rollup["day"].astype("int64"),
                         "n": n, "delta": (n - prev).astype("int64")})


def _q_supplier_variety(sf_dir: str):
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per part type.  The
    part dimension is broadcast (ray.put once, dict lookup per batch —
    never a shuffle for a dimension table); the fact side is
    pre-distincted per batch before the global distinct, so the
    shuffle moves unique (type, suppkey) pairs, not lineitem rows."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count

    import ray as _ray

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_type"])
    type_map = dict(zip(part["p_partkey"].to_pylist(),
                        part["p_type"].to_pylist()))
    ref = _ray.put(type_map)

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_partkey", "l_suppkey"])

    def local_distinct(t: pa.Table) -> pa.Table:
        m = _ray.get(ref)
        g = t.group_by(["l_partkey", "l_suppkey"]).aggregate([])
        types = pa.array([m.get(x) for x in g["l_partkey"].to_pylist()],
                         pa.string())
        return (pa.table({"p_type": types, "l_suppkey": g["l_suppkey"]})
                .group_by(["p_type", "l_suppkey"]).aggregate([]))

    pairs = (_vgb(li.map_batches(local_distinct, batch_format="pyarrow"), ["p_type", "l_suppkey"], Count()))
    return (pairs.groupby("p_type")
            .aggregate(Count(alias_name="n_suppliers")))


def _q_new_users_curve(sf_dir: str):
    """User-acquisition curve: first-seen day per user (per-batch min
    combiner + one groupby), daily new-user counts, cumulative sum on
    the tiny per-day rollup."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count, Min

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts"])

    def per_batch_min(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), 86_400_000_000)
        tt = pa.table({"user_id": t["user_id"], "day": day})
        g = tt.group_by("user_id").aggregate([("day", "min")])
        return pa.table({"user_id": g["user_id"], "day": g["day_min"]})

    first = (_vgb(ev.map_batches(per_batch_min, batch_format="pyarrow"), "user_id", Min("day", alias_name="day")))
    daily = (first.groupby("day").aggregate(Count(alias_name="n_new"))
             .to_pandas().sort_values("day").reset_index(drop=True))
    n_new = daily["n_new"].astype("int64")
    return pd.DataFrame({"day": daily["day"].astype("int64"),
                         "n_new": n_new,
                         "cum_users": n_new.cumsum().astype("int64")})


def _q_revenue_concentration(sf_dir: str):
    """Global concentration: the revenue share of the top-1% orders.
    Per-order revenue rollup (combiner), distributed sort+limit for the
    top-k slice (ties broken by orderkey so the cut is deterministic),
    two scalar sums — output is ONE row; nothing corpus-sized ever
    reaches the driver.  Share reported as an exact floored ppm ratio."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])

    def rev_per_order(t: pa.Table) -> pa.Table:
        ext = np.rint(np.asarray(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        disc = np.rint(np.asarray(
            t["l_discount"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        tt = pa.table({"l_orderkey": t["l_orderkey"],
                       "rev": pa.array(ext * (100 - disc), pa.int64())})
        g = tt.group_by("l_orderkey").aggregate([("rev", "sum")])
        return pa.table({"l_orderkey": g["l_orderkey"], "rev": g["rev_sum"]})

    per_order = (_vgb(li.map_batches(rev_per_order, batch_format="pyarrow"), "l_orderkey", Sum("rev", alias_name="rev")))
    n = per_order.count()
    k = max(1, n // 100)
    top = per_order.sort(["rev", "l_orderkey"],
                         descending=[True, False]).limit(k)
    top_rev = int(top.sum("rev"))
    total_rev = int(per_order.sum("rev"))
    return pd.DataFrame({"k": pd.Series([k], dtype="int64"),
                         "top_rev": pd.Series([top_rev], dtype="int64"),
                         "total_rev": pd.Series([total_rev], dtype="int64"),
                         "share_ppm": pd.Series(
                             [top_rev * 1_000_000 // total_rev],
                             dtype="int64")})


_DIVISION_TYPES = ("view", "click", "purchase")


def _q_users_all_types(sf_dir: str):
    """Relational division: users who performed EVERY event type in the
    target set.  Per-batch local distinct shrinks the shuffle to unique
    (user, type) pairs; division is then a count==|target| filter on a
    tiny per-user rollup — no joins, no per-user iteration."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_type"])
    want = pa.array(list(_DIVISION_TYPES))

    def local_distinct(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=want))
        return t.group_by(["user_id", "event_type"]).aggregate([])

    pairs = (_vgb(ev.map_batches(local_distinct, batch_format="pyarrow"), ["user_id", "event_type"], Count()))
    per_user = _vgb(pairs, "user_id", Count(alias_name="n_types"))
    return (per_user.map_batches(
        lambda t: t.filter(pc.equal(t["n_types"],
                                    len(_DIVISION_TYPES))),
        batch_format="pyarrow").select_columns(["user_id"]))


def _q_user_top_type(sf_dir: str):
    """Grouped mode: each user's most frequent event type, ties broken
    lexicographically.  Two-phase distributed argmax over the per-user
    count rollup (group max, join back, min-string tie-break) — the
    same shape as keep_best_dedup but arg-maxing a COUNT."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_type"])

    def local_counts(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate(
            [([], "count_all")])
        return pa.table({"user_id": g["user_id"],
                         "event_type": g["event_type"],
                         "n": g["count_all"]})

    counts = (_vgb(ev.map_batches(local_counts, batch_format="pyarrow"), ["user_id", "event_type"], Sum("n", alias_name="n")))
    best = _vgb(counts, "user_id", Max("n", alias_name="best"))
    counts, parts = sized_for_join(counts, cap=8)
    j = counts.join(best, join_type="inner", num_partitions=parts,
                    on=("user_id",))
    hits = j.map_batches(
        lambda t: t.filter(pc.equal(t["n"], t["best"])),
        batch_format="pyarrow")
    return (_vgb(hits, "user_id", Min("event_type", alias_name="top_type"), Max("best", alias_name="n")))


def _q_daily_fill_gaps(sf_dir: str):
    """Date-spine gap fill: daily event counts left-joined onto the
    dense day range, missing days zero-filled.  The corpus pass is one
    vectorized bucket+count; the spine join happens on the tiny per-day
    rollup."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts"])

    def day_of(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        return pa.table({"day": pc.divide(us, 86_400_000_000)})

    rollup = (ev.map_batches(day_of, batch_format="pyarrow")
              .groupby("day").aggregate(Count(alias_name="n"))
              .to_pandas())
    lo, hi = int(rollup["day"].min()), int(rollup["day"].max())
    spine = pd.DataFrame({"day": np.arange(lo, hi + 1, dtype=np.int64)})
    out = spine.merge(rollup, on="day", how="left")
    out["n"] = out["n"].fillna(0).astype("int64")
    return out


def _pareto_scan(pts: "np.ndarray") -> "np.ndarray":
    """Maximal-vector scan over DISTINCT (price, day) points: sort by
    (price desc, day desc); a point survives iff its day strictly
    exceeds every preceding day.  Returns the surviving points."""
    order = np.lexsort((-pts[:, 1], -pts[:, 0]))
    pts = pts[order]
    best = np.maximum.accumulate(
        np.concatenate(([np.iinfo(np.int64).min], pts[:-1, 1])))
    return pts[pts[:, 1] > best]


def _q_pareto_orders(sf_dir: str):
    """Skyline query: orders not dominated in (totalprice, recency).
    Distributed pareto = per-block local scan (a locally dominated
    point can never be globally maximal, so blocks emit only their own
    frontier), a tiny global scan over the union of frontiers, then a
    broadcast semi-join of the full table against the winning point
    set.  Work is one linear pass per block + O(frontier) driver-side."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    import ray as _ray

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_totalprice",
                                      "o_orderdate"])

    def to_points(t: pa.Table) -> pa.Table:
        price = np.rint(np.asarray(
            t["o_totalprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        day = (pc.cast(t["o_orderdate"], pa.int64()).to_numpy()
               // 86_400_000_000).astype(np.int64)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "price": pa.array(price, pa.int64()),
                         "day": pa.array(day, pa.int64())})

    pts_ds = orders.map_batches(to_points, batch_format="pyarrow")

    def local_frontier(t: pa.Table) -> pa.Table:
        pts = np.unique(np.stack([t["price"].to_numpy(),
                                  t["day"].to_numpy()], axis=1), axis=0)
        keep = _pareto_scan(pts)
        return pa.table({"price": pa.array(keep[:, 0], pa.int64()),
                         "day": pa.array(keep[:, 1], pa.int64())})

    cand = pts_ds.map_batches(local_frontier,
                              batch_format="pyarrow").take_all()
    cand_pts = np.unique(
        np.array([[r["price"], r["day"]] for r in cand], dtype=np.int64),
        axis=0)
    frontier = _pareto_scan(cand_pts)
    keep_set = frozenset((int(p), int(d)) for p, d in frontier)
    ref = _ray.put(keep_set)

    def semi(t: pa.Table) -> pa.Table:
        ks = _ray.get(ref)
        mask = pa.array([(p, d) in ks for p, d in
                         zip(t["price"].to_numpy(), t["day"].to_numpy())])
        return t.filter(mask)

    out = pts_ds.map_batches(semi, batch_format="pyarrow").to_pandas()
    if out.empty:
        out = pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                            "price": pd.Series(dtype="int64"),
                            "day": pd.Series(dtype="int64")})
    return out


def _q_weighted_disc(sf_dir: str):
    """Grouped WEIGHTED ratio: discount weighted by quantity per part
    brand — numerator and denominator accumulated as separate exact
    int64 sums (a distributed ratio must never sum floats), the ratio
    emitted as a floored ppm.  Brand comes from the broadcast part
    dimension."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    import ray as _ray

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_brand"])
    keys = part["p_partkey"].to_numpy(zero_copy_only=False)
    lut = np.full(int(keys.max()) + 1, None, dtype=object)
    lut[keys] = np.asarray(part["p_brand"].to_pylist(), dtype=object)
    ref = _ray.put(lut)

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_partkey", "l_quantity",
                                  "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        m = _ray.get(ref)
        qty = np.rint(np.asarray(
            t["l_quantity"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        disc = np.rint(np.asarray(
            t["l_discount"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        brands = pa.array(m[_i64(t["l_partkey"])], pa.string())
        tt = pa.table({"p_brand": brands,
                       "num": pa.array(disc * qty, pa.int64()),
                       "den": pa.array(qty, pa.int64())})
        g = tt.group_by("p_brand").aggregate([("num", "sum"),
                                              ("den", "sum")])
        return pa.table({"p_brand": g["p_brand"], "num": g["num_sum"],
                         "den": g["den_sum"]})

    rollup = (li.map_batches(partial, batch_format="pyarrow")
              .groupby("p_brand")
              .aggregate(Sum("num", alias_name="num"),
                         Sum("den", alias_name="den")))

    def ratio(t: pa.Table) -> pa.Table:
        num = t["num"].to_numpy()
        den = t["den"].to_numpy()
        return pa.table({"p_brand": t["p_brand"],
                         "num": t["num"], "den": t["den"],
                         "wavg_ppm": pa.array(num * 1_000_000 // den,
                                              pa.int64())})

    return rollup.map_batches(ratio, batch_format="pyarrow")


def _q_bfs_layers(sf_dir: str):
    """Iterative BFS from seed node 0 on the derived doc graph (same
    arithmetic edge rule as ``pagerank``), 3 expansion rounds.  Each
    round is one broadcast-frontier semi-join over the distributed edge
    set (frontier and visited sets are node-space-sized — the small
    side — never corpus-sized); layer = first-visit round, matching the
    recursive-CTE min(layer) semantics."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    import ray as _ray

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id"])

    def to_edges(t: pa.Table) -> pa.Table:
        did = t["doc_id"]
        src = _mod(did, 211)
        dst = _mod(pc.add(pc.multiply(did, 13), 7), 211)
        tt = pa.table({"src": src, "dst": dst})
        tt = tt.filter(pc.not_equal(tt["src"], tt["dst"]))
        return tt.group_by(["src", "dst"]).aggregate([])

    edges = docs.map_batches(to_edges, batch_format="pyarrow")

    visited = {0: 0}
    frontier = frozenset([0])
    for layer in (1, 2, 3):
        if not frontier:
            break
        ref = _ray.put(frontier)

        def expand(t: pa.Table) -> pa.Table:
            f = _ray.get(ref)
            mask = pa.array([s in f for s in t["src"].to_numpy()])
            return t.filter(mask).select(["dst"])

        # reachable node set is graph-node-sized (the small rollup),
        # never corpus-sized — take_all is bounded by |nodes|
        reached = {int(r["dst"]) for r in
                   edges.map_batches(expand,
                                     batch_format="pyarrow").take_all()}
        frontier = frozenset(n for n in reached if n not in visited)
        for nd in frontier:
            visited[nd] = layer

    nodes = sorted(visited)
    return pd.DataFrame({
        "node": pd.Series(nodes, dtype="int64"),
        "layer": pd.Series([visited[n] for n in nodes], dtype="int64")})


def _q_value_gini(sf_dir: str):
    """Exact Gini coefficient of order values — a global
    order-statistic aggregate: range-partition by value into contiguous
    buckets, per-bucket counts → broadcast exclusive rank offsets, then
    each bucket contributes the scalar Σ(rank·x) from a local sort.
    Nothing but per-bucket scalars ever leaves the workers; all
    arithmetic is int64 (gini reported as floored ppm)."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count

    import ray as _ray

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(
            t["o_totalprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "price": pa.array(c, pa.int64())})

    pr = orders.map_batches(cents, batch_format="pyarrow")
    lo = int(pr.min("price"))
    hi = int(pr.max("price"))
    span = max(1, hi - lo + 1)

    def with_part(t: pa.Table) -> pa.Table:
        p = (t["price"].to_numpy() - lo) * 256 // span
        return t.append_column("part", pa.array(p, pa.int64()))

    parted = pr.map_batches(with_part, batch_format="pyarrow")
    totals = (parted.select_columns(["part"])
              .groupby("part").aggregate(Count(alias_name="n")).take_all())
    totals.sort(key=lambda r: r["part"])
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["part"]] = acc
        acc += r["n"]
    off_ref = _ray.put(offsets)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        off = _ray.get(off_ref)[int(g["part"].iloc[0])]
        g = g.sort_values(["price", "o_orderkey"])
        x = g["price"].to_numpy(dtype=np.int64)
        ranks = off + np.arange(1, len(g) + 1, dtype=np.int64)
        return pd.DataFrame({"s1": [int(np.sum(ranks * x))],
                             "sx": [int(np.sum(x))],
                             "n": [len(x)]})

    parts = (parted.groupby("part")
             .map_groups(per_part, batch_format="pandas").to_pandas())
    s1 = int(parts["s1"].sum())
    sx = int(parts["sx"].sum())
    n = int(parts["n"].sum())
    gini_ppm = (2 * s1 - (n + 1) * sx) * 1_000_000 // (n * sx)
    return pd.DataFrame({"n": pd.Series([n], dtype="int64"),
                         "sum_x": pd.Series([sx], dtype="int64"),
                         "s1": pd.Series([s1], dtype="int64"),
                         "gini_ppm": pd.Series([gini_ppm], dtype="int64")})


def _q_repeat_orders_7d(sf_dir: str):
    """Band (range) join, key-scoped: pairs of orders from the SAME
    customer placed ≤ 7 days apart.  The distributed plan for a band
    join whose key bounds the bucket: hash equi-join on the key, then a
    vectorized band filter — the pair blowup is per-customer (~10
    orders), never cross-customer."""
    import pyarrow as pa

    import ray.data as rd

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        day = (pc.cast(t["o_orderdate"], pa.int64()).to_numpy()
               // 86_400_000_000).astype(np.int64)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "day": pa.array(day, pa.int64())})

    base = orders.map_batches(prep, batch_format="pyarrow")
    parts = _pq_parts(sf_dir, "orders", cap=16)
    j = base.join(base, join_type="inner", num_partitions=parts,
                  on=("o_custkey",), right_suffix="_r")

    def band(t: pa.Table) -> pa.Table:
        gap = pc.subtract(t["day_r"], t["day"])
        keep = pc.and_(
            pc.less(t["o_orderkey"], t["o_orderkey_r"]),
            pc.and_(pc.greater_equal(gap, -7), pc.less_equal(gap, 7)))
        t = t.filter(keep)
        return pa.table({"c_custkey": t["o_custkey"],
                         "k1": t["o_orderkey"], "k2": t["o_orderkey_r"],
                         "gap_days": pc.abs(pc.subtract(t["day_r"],
                                                        t["day"]))})

    return j.map_batches(band, batch_format="pyarrow")


_PROFILE_NUMERIC = ("o_orderkey", "o_custkey", "price_cents", "order_day")
_PROFILE_ALL = _PROFILE_NUMERIC + ("o_orderstatus", "o_orderpriority")


def _q_profile_orders(sf_dir: str):
    """Data-profiling operator: per-column null count, exact distinct
    count, and (numeric columns) min/max over orders, emitted long
    (column, metric, value).  Distinct counts use the per-batch
    local-distinct → tiny global groupby shape, one column at a time —
    each shuffle moves unique values only."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice",
                 "o_orderdate", "o_orderstatus", "o_orderpriority"])

    def derive(t: pa.Table) -> pa.Table:
        price = np.rint(np.asarray(
            t["o_totalprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        day = (pc.cast(t["o_orderdate"], pa.int64()).to_numpy()
               // 86_400_000_000).astype(np.int64)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "price_cents": pa.array(price, pa.int64()),
                         "order_day": pa.array(day, pa.int64()),
                         "o_orderstatus": t["o_orderstatus"],
                         "o_orderpriority": t["o_orderpriority"]})

    ds = orders.map_batches(derive, batch_format="pyarrow")

    # one pass for ALL null counters, one aggregate for ALL min/max —
    # only the exact distinct counts need a shuffle per column
    def null_counts(t: pa.Table) -> pa.Table:
        return pa.table({f"null_{c}": pa.array([t[c].null_count],
                                               pa.int64())
                         for c in _PROFILE_ALL})

    nulls_parts = ds.map_batches(null_counts,
                                 batch_format="pyarrow").take_all()
    nulls = {c: sum(r[f"null_{c}"] for r in nulls_parts)
             for c in _PROFILE_ALL}
    from ray.data.aggregate import Max, Min
    mm = ds.aggregate(*[a for c in _PROFILE_NUMERIC
                        for a in (Min(c, alias_name=f"min_{c}"),
                                  Max(c, alias_name=f"max_{c}"))])

    rows = []
    for col in _PROFILE_ALL:
        distinct = (ds.select_columns([col]).map_batches(
            lambda t, c=col: t.filter(pc.is_valid(t[c]))
            .group_by(c).aggregate([]),
            batch_format="pyarrow")
            .groupby(col).aggregate(Count()).count())
        rows.append((col, "n_null", nulls[col]))
        rows.append((col, "n_distinct", int(distinct)))
        if col in _PROFILE_NUMERIC:
            rows.append((col, "min", int(mm[f"min_{col}"])))
            rows.append((col, "max", int(mm[f"max_{col}"])))
    return pd.DataFrame({
        "column": pd.Series([r[0] for r in rows], dtype=object),
        "metric": pd.Series([r[1] for r in rows], dtype=object),
        "value": pd.Series([r[2] for r in rows], dtype="int64")})


def _q_props_value_cov(sf_dir: str):
    """Distributed covariance via SUFFICIENT STATISTICS: per event
    type, the exact integer covariance numerator n·Σxy − Σx·Σy between
    the JSON ``k`` prop and the event value (cents).  Each batch emits
    the four partial sums; only those scalars shuffle — the canonical
    way to compute second moments without float accumulation order
    effects."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "value", "props"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], r'"k":\s*(?P<k>-?\d+)')
        k = pc.fill_null(pc.cast(pc.struct_field(m, "k"), pa.int64()),
                         0).to_numpy()
        v = np.rint(np.asarray(
            t["value"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        tt = pa.table({"event_type": t["event_type"],
                       "sx": pa.array(k, pa.int64()),
                       "sy": pa.array(v, pa.int64()),
                       "sxy": pa.array(k * v, pa.int64()),
                       "n": pa.array(np.ones(len(t), np.int64))})
        g = tt.group_by("event_type").aggregate(
            [("sx", "sum"), ("sy", "sum"), ("sxy", "sum"), ("n", "sum")])
        return pa.table({"event_type": g["event_type"],
                         "sx": g["sx_sum"], "sy": g["sy_sum"],
                         "sxy": g["sxy_sum"], "n": g["n_sum"]})

    rollup = (ev.map_batches(partial, batch_format="pyarrow")
              .groupby("event_type")
              .aggregate(Sum("sx", alias_name="sx"),
                         Sum("sy", alias_name="sy"),
                         Sum("sxy", alias_name="sxy"),
                         Sum("n", alias_name="n")))

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy()
        cov_num = n * t["sxy"].to_numpy() \
            - t["sx"].to_numpy() * t["sy"].to_numpy()
        return pa.table({"event_type": t["event_type"], "n": t["n"],
                         "sx": t["sx"], "sy": t["sy"], "sxy": t["sxy"],
                         "cov_num": pa.array(cov_num, pa.int64())})

    return rollup.map_batches(finish, batch_format="pyarrow")


def _q_nation_matrix(sf_dir: str):
    """Broadcast CROSS JOIN of two small dimensions: every ordered
    nation pair within the same region, with an arithmetic affinity
    key.  The right side rides in the closure (dimension tables never
    shuffle); output is |nation|² bounded."""
    import pyarrow as pa

    import ray.data as rd

    import ray as _ray

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_regionkey"])
    right = list(zip(nation["n_nationkey"].to_pylist(),
                     nation["n_regionkey"].to_pylist()))
    ref = _ray.put(right)

    left = rd.read_parquet(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_regionkey"])

    def cross(t: pa.Table) -> pa.Table:
        rt = _ray.get(ref)
        a_k, a_r = (t["n_nationkey"].to_numpy().astype(np.int64),
                    t["n_regionkey"].to_numpy().astype(np.int64))
        b_k = np.array([x[0] for x in rt], np.int64)
        b_r = np.array([x[1] for x in rt], np.int64)
        # full outer product, then same-region + ordered filter
        aa_k = np.repeat(a_k, len(b_k))
        aa_r = np.repeat(a_r, len(b_k))
        bb_k = np.tile(b_k, len(a_k))
        bb_r = np.tile(b_r, len(a_k))
        keep = (aa_r == bb_r) & (aa_k < bb_k)
        return pa.table({
            "a": pa.array(aa_k[keep], pa.int64()),
            "b": pa.array(bb_k[keep], pa.int64()),
            "region": pa.array(aa_r[keep], pa.int64()),
            "affinity": pa.array((aa_k[keep] * 31 + bb_k[keep]) % 97,
                                 pa.int64())})

    return left.map_batches(cross, batch_format="pyarrow")


def _q_diverse_top_docs(sf_dir: str):
    """Diversified top-k: the 20 longest documents with AT MOST 2 per
    source.  Per-batch local cap (top-2 per source inside the batch is
    a superset of the global per-source top-2 contribution), per-source
    groupby cap, then the tiny candidate set is ranked driver-side with
    explicit rank columns so ordering is hash-checkable."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "source", "n_chars"])

    def local_cap(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True]).head(2)
        return g

    def batch_cap(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["n_chars", "doc_id"],
                           ascending=[False, True])
            .groupby("source", sort=False).head(2),
            preserve_index=False)

    capped = docs.map_batches(batch_cap, batch_format="pyarrow")
    per_source = capped.groupby("source").map_groups(
        local_cap, batch_format="pandas")
    cand = per_source.to_pandas()
    cand = cand.sort_values(["n_chars", "doc_id"],
                            ascending=[False, True])
    cand["rs"] = cand.groupby("source", sort=False).cumcount() + 1
    cand = cand.head(20).reset_index(drop=True)
    cand.insert(0, "rank",
                np.arange(1, len(cand) + 1, dtype=np.int64))
    cand["rs"] = cand["rs"].astype("int64")
    return cand[["rank", "doc_id", "source", "n_chars", "rs"]]


def _q_user_value_norm(sf_dir: str):
    """Per-group normalization via join-back: each event's value as an
    exact ppm ratio of its user's mean — the per-user sufficient stats
    (sum, count) are a tiny rollup hash-joined back onto the event
    stream, then one vectorized integer kernel.  The standard
    'normalize by group statistics' shape without ever broadcasting a
    corpus-sized map."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "user_id", "value"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.rint(np.asarray(
            t["value"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"],
                         "v": pa.array(v, pa.int64())})

    base = ev.map_batches(cents, batch_format="pyarrow")
    stats = (_vgb(base, "user_id", Sum("v", alias_name="s"), Count(alias_name="nu")))
    parts = _pq_parts(sf_dir, "events", cap=16)
    j = base.join(stats, join_type="inner", num_partitions=parts,
                  on=("user_id",))

    def finish(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy()
        s = t["s"].to_numpy()
        nu = t["nu"].to_numpy().astype(np.int64)
        norm = v * 1_000_000 * nu // s
        return pa.table({"event_id": t["event_id"],
                         "user_id": t["user_id"],
                         "norm_ppm": pa.array(norm, pa.int64())})

    return j.map_batches(finish, batch_format="pyarrow")


def _q_join_card_est(sf_dir: str):
    """Join-size estimation from per-key count statistics (the planner
    primitive): |A⋈B| = Σ_k n_A(k)·n_B(k), computed exactly as two
    per-key count rollups (combiner first) joined key-to-key, plus the
    self-join estimate Σ n(k)².  Only per-key counters shuffle."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    def key_counts(path: str, key: str):
        ds = rd.read_parquet(os.path.join(sf_dir, path), columns=[key])

        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by(key).aggregate([([], "count_all")])
            return pa.table({"k": g[key], "n": g["count_all"]})

        return (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("k").aggregate(Sum("n", alias_name="n")))

    li_pk = key_counts("lineitem.parquet", "l_partkey")
    self_est = int(li_pk.map_batches(
        lambda t: pa.table({"sq": pa.array(
            [int(np.sum(t["n"].to_numpy() ** 2))], pa.int64())}),
        batch_format="pyarrow").sum("sq"))

    li_ok = key_counts("lineitem.parquet", "l_orderkey")
    o_ok = key_counts("orders.parquet", "o_orderkey")
    # one partition per ~40k rollup rows (each join partition costs an
    # aggregator actor spin-up; see ops/dedup.py partition-sizing note)
    li_ok, parts = sized_for_join(li_ok, cap=8)
    j = li_ok.join(o_ok, join_type="inner", num_partitions=parts,
                   on=("k",), right_suffix="_r")
    two_est = int(j.map_batches(
        lambda t: pa.table({"p": pa.array(
            [int(np.sum(t["n"].to_numpy() * t["n_r"].to_numpy()))],
            pa.int64())}),
        batch_format="pyarrow").sum("p"))

    return pd.DataFrame({
        "join_name": pd.Series(["lineitem_self_partkey",
                                "lineitem_orders_orderkey"],
                               dtype=object),
        "est_rows": pd.Series([self_est, two_est], dtype="int64")})


def _q_contamination_frac(sf_dir: str):
    """Train/test contamination scoring: per document, the exact
    fraction (ppm) of its word 3-grams that appear in the held-out set
    (docs with doc_id % 31 == 0).  The test-gram set is the SMALL side:
    distinct grams broadcast once via ray.put; the corpus pass is one
    map_batches membership count — the decontamination shape used on
    training corpora, with the overlap reported per doc instead of a
    hard drop."""
    import pyarrow as pa

    import ray.data as rd

    import ray as _ray

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])

    def grams_of(text: str) -> list:
        ws = (text or "").split(" ")
        return [ws[i] + " " + ws[i + 1] + " " + ws[i + 2]
                for i in range(max(0, len(ws) - 2))]

    def test_grams(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(_mod(t["doc_id"], 31), 0))
        out = set()
        for txt in t["text"].to_pylist():
            out.update(grams_of(txt))
        return pa.table({"gram": pa.array(sorted(out), pa.string())})

    # held-out gram set: the small side — distinct grams, broadcast once
    tg = set()
    for r in docs.map_batches(test_grams,
                              batch_format="pyarrow").take_all():
        tg.add(r["gram"])
    ref = _ray.put(frozenset(tg))

    def score(t: pa.Table) -> pa.Table:
        ts = _ray.get(ref)
        ids, ngs, hits = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist()):
            gs = grams_of(txt)
            h = sum(1 for g in gs if g in ts)
            ids.append(did)
            ngs.append(len(gs))
            hits.append(h)
        ngs = np.array(ngs, np.int64)
        hits = np.array(hits, np.int64)
        frac = hits * 1_000_000 // np.maximum(ngs, 1)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_grams": pa.array(ngs, pa.int64()),
                         "n_hit": pa.array(hits, pa.int64()),
                         "frac_ppm": pa.array(frac, pa.int64())})

    return docs.map_batches(score, batch_format="pyarrow")


_CKSUM_P = 1_000_000_007


def _q_table_checksum(sf_dir: str):
    """Order-insensitive content checksums for integrity auditing:
    per table, row count plus Σ(md5_lower64(key||'|'||payload) mod p) —
    a pure combiner (per-batch residue sums, one scalar per batch), so
    two copies of a 100 TB table can be compared without moving either.
    md5 lower-64 matches DuckDB's md5_number_lower (little-endian bytes
    8..16)."""
    import hashlib

    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    def cksum(path: str, fmt) -> tuple:
        ds = rd.read_parquet(os.path.join(sf_dir, path))

        def partial(t: pa.Table) -> pa.Table:
            acc = 0
            n = len(t)
            for row in fmt(t):
                h = hashlib.md5(row.encode("utf-8")).digest()
                acc += int.from_bytes(h[8:], "little") % _CKSUM_P
            return pa.table({"s": pa.array([acc], pa.int64()),
                             "n": pa.array([n], pa.int64())})

        parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
        return (sum(r["n"] for r in parts), sum(r["s"] for r in parts))

    def fmt_docs(t: pa.Table):
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            yield f"{d}|{x}"

    def fmt_nation(t: pa.Table):
        for k, nm in zip(t["n_nationkey"].to_pylist(),
                         t["n_name"].to_pylist()):
            yield f"{k}|{nm}"

    rows = [("documents", *cksum("documents.parquet", fmt_docs)),
            ("nation", *cksum("nation.parquet", fmt_nation))]
    return pd.DataFrame({
        "table_name": pd.Series([r[0] for r in rows], dtype=object),
        "n_rows": pd.Series([r[1] for r in rows], dtype="int64"),
        "checksum": pd.Series([r[2] for r in rows], dtype="int64")})


def _q_cube_rollup(sf_dir: str):
    """CUBE over (lang, source): all four grouping sets.  The finest
    rollup is computed ONCE distributed; the coarser sets re-aggregate
    that tiny table driver-side — the standard way to serve a CUBE
    without shuffling the corpus four times."""
    import pandas as pd

    import ray.data as rd
    from ray.data.aggregate import Count

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["lang", "source"])
    fine = (docs.groupby(["lang", "source"])
            .aggregate(Count(alias_name="n")).to_pandas())
    fine["n"] = fine["n"].astype("int64")
    by_lang = fine.groupby("lang", as_index=False)["n"].sum()
    by_lang["source"] = None
    by_source = fine.groupby("source", as_index=False)["n"].sum()
    by_source["lang"] = None
    total = pd.DataFrame({"lang": [None], "source": [None],
                          "n": [int(fine["n"].sum())]})
    out = pd.concat([fine, by_lang, by_source, total],
                    ignore_index=True)[["lang", "source", "n"]]
    out["n"] = out["n"].astype("int64")
    return out


def _q_orders_above_cust_avg(sf_dir: str):
    """Correlated-subquery shape: per customer, how many of their
    orders cost MORE than their own average — decorrelated into one
    per-customer (sum, count) rollup hash-joined back, with the
    comparison done as exact cross-multiplication price·n > sum."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(
            t["o_totalprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        return pa.table({"o_custkey": t["o_custkey"],
                         "price": pa.array(c, pa.int64())})

    base = orders.map_batches(cents, batch_format="pyarrow")
    stats = (_vgb(base, "o_custkey", Sum("price", alias_name="s"), Count(alias_name="cn")))
    parts = _pq_parts(sf_dir, "orders", cap=8)
    j = base.join(stats, join_type="inner", num_partitions=parts,
                  on=("o_custkey",))

    def above(t: pa.Table) -> pa.Table:
        keep = t["price"].to_numpy() * t["cn"].to_numpy() \
            > t["s"].to_numpy()
        t = t.filter(pa.array(keep))
        return pa.table({"c_custkey": t["o_custkey"],
                         "one": pa.array(np.ones(len(t), np.int64))})

    return (_vgb(j.map_batches(above, batch_format="pyarrow"), "c_custkey", Sum("one", alias_name="n_above")))


def _q_time_multi_rollup(sf_dir: str):
    """Multi-granularity rollup in ONE corpus pass: each event emits a
    tagged (granularity, bucket) row for hour, day and week; a single
    groupby serves all three time scales — three shuffles collapsed
    into one tagged union."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts"])

    def tag(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        parts = []
        for g, div in (("hour", 3_600_000_000),
                       ("day", 86_400_000_000),
                       ("week", 7 * 86_400_000_000)):
            parts.append(pa.table({
                "granularity": pa.array([g] * len(t), pa.string()),
                "bucket": pa.array(us // div, pa.int64()),
                "n": pa.array(np.ones(len(t), np.int64))}))
        tt = pa.concat_tables(parts)
        g2 = tt.group_by(["granularity", "bucket"]).aggregate(
            [("n", "sum")])
        return pa.table({"granularity": g2["granularity"],
                         "bucket": g2["bucket"], "n": g2["n_sum"]})

    return (ev.map_batches(tag, batch_format="pyarrow")
            .groupby(["granularity", "bucket"])
            .aggregate(Sum("n", alias_name="n")))


_TYPE_BITS = {"view": 0, "click": 1, "purchase": 2, "signup": 3,
              "error": 4}


def _q_user_type_mask(sf_dir: str):
    """Feature bitmask: per user, an integer whose bits mark which
    event types the user has ever produced.  Local distinct →
    global distinct pair rollup → sum of per-type bit values (each bit
    contributes once, so SUM == OR)."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_type"])

    def local(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([])
        bits = np.array([1 << _TYPE_BITS[x]
                         for x in g["event_type"].to_pylist()], np.int64)
        return pa.table({"user_id": g["user_id"],
                         "event_type": g["event_type"],
                         "bit": pa.array(bits, pa.int64())})

    pairs = (_vgb(ev.map_batches(local, batch_format="pyarrow"), ["user_id", "event_type"], Sum("bit", alias_name="bit_sum")))

    def debit(t: pa.Table) -> pa.Table:
        # bit_sum is bit × multiplicity (pair seen in k batches); the
        # distinct pair contributes its bit exactly once
        bits = np.array([1 << _TYPE_BITS[x]
                         for x in t["event_type"].to_pylist()], np.int64)
        return pa.table({"user_id": t["user_id"],
                         "bit": pa.array(bits, pa.int64())})

    return (_vgb(pairs.map_batches(debit, batch_format="pyarrow"), "user_id", Sum("bit", alias_name="mask")))


def _q_median_interp(sf_dir: str):
    """Exact interpolated median of order value as an integer: the sum
    of the two middle order-statistics (2×median in cents, no float
    division).  Distributed selection via the value-rollup: per-batch
    (value, count) partials → one groupby on distinct values → a
    cumulative search on the tiny sorted rollup."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(
            t["o_totalprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        tt = pa.table({"price": pa.array(c, pa.int64()),
                       "n": pa.array(np.ones(len(c), np.int64))})
        g = tt.group_by("price").aggregate([("n", "sum")])
        return pa.table({"price": g["price"], "n": g["n_sum"]})

    rollup = (_vgb(orders.map_batches(partial, batch_format="pyarrow"), "price", Sum("n", alias_name="n"))
              .to_pandas().sort_values("price").reset_index(drop=True))
    vals = rollup["price"].to_numpy(dtype=np.int64)
    cum = rollup["n"].to_numpy(dtype=np.int64).cumsum()
    n = int(cum[-1])
    lo_rank = (n + 1) // 2
    hi_rank = n // 2 + 1
    lo_v = int(vals[np.searchsorted(cum, lo_rank)])
    hi_v = int(vals[np.searchsorted(cum, hi_rank)])
    return pd.DataFrame({"n": pd.Series([n], dtype="int64"),
                         "mid2_cents": pd.Series([lo_v + hi_v],
                                                 dtype="int64")})


def _q_region_revenue(sf_dir: str):
    """Snowflake rollup with COMPOSED broadcast dimensions: nation and
    region are joined driver-side into one custkey→region map chain
    (customer is itself treated as the broadcastable mid dimension at
    this scale is NOT assumed — customer joins distributed), revenue
    rolls up per region name."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    import ray as _ray

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"),
                           columns=["r_regionkey", "r_name"])
    r_name = dict(zip(region["r_regionkey"].to_pylist(),
                      region["r_name"].to_pylist()))
    nat_to_region = {k: r_name[r] for k, r in
                     zip(nation["n_nationkey"].to_pylist(),
                         nation["n_regionkey"].to_pylist())}
    ref = _ray.put(nat_to_region)

    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_nationkey"])
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(
            t["o_totalprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        tt = pa.table({"o_custkey": t["o_custkey"],
                       "rev": pa.array(c, pa.int64())})
        g = tt.group_by("o_custkey").aggregate([("rev", "sum")])
        return pa.table({"o_custkey": g["o_custkey"],
                         "rev": g["rev_sum"]})

    per_cust = (_vgb(orders.map_batches(cents, batch_format="pyarrow"), "o_custkey", Sum("rev", alias_name="rev")))
    per_cust, parts = sized_for_join(per_cust, cap=8)
    j = per_cust.join(cust, join_type="inner", num_partitions=parts,
                      on=("o_custkey",), right_on=("c_custkey",))

    def tag_region(t: pa.Table) -> pa.Table:
        m = _ray.get(ref)
        names = pa.array([m[int(k)] for k in
                          t["c_nationkey"].to_pylist()], pa.string())
        return pa.table({"r_name": names, "rev": t["rev"]})

    return (j.map_batches(tag_region, batch_format="pyarrow")
            .groupby("r_name").aggregate(Sum("rev",
                                             alias_name="revenue")))


def _q_trailing_active_users(sf_dir: str):
    """Trailing 3-day active users per day (the DAU/WAU windowed
    distinct): distinct (user, day) pairs, each expanded to the ≤3
    window days it keeps the user active in, one more distinct, then a
    count — two small shuffles over unique pairs, never raw events."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        day = pc.cast(t["ts"], pa.int64()).to_numpy() // 86_400_000_000
        tt = pa.table({"user_id": t["user_id"],
                       "day": pa.array(day, pa.int64())})
        return tt.group_by(["user_id", "day"]).aggregate([])

    distinct = (_vgb(ev.map_batches(pairs, batch_format="pyarrow"), ["user_id", "day"], Count()))
    # the window-day universe: only days that actually occur
    days = frozenset(
        r["day"] for r in
        distinct.groupby("day").aggregate(Count()).take_all())
    import ray as _ray
    dref = _ray.put(days)

    def expand(t: pa.Table) -> pa.Table:
        ds_ = _ray.get(dref)
        u = t["user_id"].to_numpy()
        d = t["day"].to_numpy()
        us, ws = [], []
        for off in (0, 1, 2):
            w = d + off
            keep = np.fromiter((x in ds_ for x in w), bool, len(w))
            us.append(u[keep])
            ws.append(w[keep])
        tt = pa.table({"user_id": pa.array(np.concatenate(us), pa.int64()),
                       "wday": pa.array(np.concatenate(ws), pa.int64())})
        return tt.group_by(["user_id", "wday"]).aggregate([])

    win = (_vgb(distinct.map_batches(expand, batch_format="pyarrow"), ["user_id", "wday"], Count()))
    out = (win.groupby("wday")
           .aggregate(Count(alias_name="active_3d")))
    return out.map_batches(
        lambda t: pa.table({"day": t["wday"], "active_3d":
                            pc.cast(t["active_3d"], pa.int64())}),
        batch_format="pyarrow")


def _q_user_streaks(sf_dir: str):
    """Gaps-and-islands: each user's longest run of consecutive active
    days.  Distinct (user, day) pairs first (the shuffle moves unique
    pairs), then a per-user vectorized streak scan — day − rank is
    constant within an island, exactly the SQL islands trick."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        day = pc.cast(t["ts"], pa.int64()).to_numpy() // 86_400_000_000
        tt = pa.table({"user_id": t["user_id"],
                       "day": pa.array(day, pa.int64())})
        return tt.group_by(["user_id", "day"]).aggregate([])

    distinct = (_vgb(ev.map_batches(pairs, batch_format="pyarrow"), ["user_id", "day"], Count()))

    from pmocr_ray.ops.events import _user_bucketed

    def streak_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # all users of the bucket in one scan: island id = day − rank
        # within user (constant along a consecutive-day run), run
        # lengths via one value_counts, max per user via groupby max
        df = df.sort_values(["user_id", "day"], kind="mergesort")
        rank = df.groupby("user_id", sort=False).cumcount().to_numpy()
        island = df["day"].to_numpy(dtype=np.int64) - rank
        runs = pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                             "i": island})
        lens = (runs.groupby(["user_id", "i"], sort=False)
                .size().reset_index(name="n"))
        out = (lens.groupby("user_id", sort=False)["n"].max()
               .reset_index(name="max_streak"))
        return out

    out = _user_bucketed(distinct, streak_bucket)
    return out.map_batches(
        lambda t: pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                            "max_streak": pc.cast(t["max_streak"],
                                                  pa.int64())}),
        batch_format="pyarrow")


def _q_type_cooccur_lift(sf_dir: str):
    """Co-occurrence lift between event types at the user level, exact
    integer numerators: lift(a,b) = (n_ab·n_users) / (n_a·n_b) emitted
    as the two products (never a float ratio).  Distinct (user, type)
    pairs → per-type counts (tiny, broadcast) → hash self-join on user
    → ordered-pair rollup."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count

    import ray as _ray

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_type"])

    def local(t: pa.Table) -> pa.Table:
        return t.group_by(["user_id", "event_type"]).aggregate([])

    pairs = (_vgb(ev.map_batches(local, batch_format="pyarrow"), ["user_id", "event_type"], Count())
             .select_columns(["user_id", "event_type"]))
    type_counts = {r["event_type"]: r["count()"] for r in
                   pairs.groupby("event_type").aggregate(
                       Count()).take_all()}
    n_users = _vgb(pairs, "user_id", Count()).count()
    tc_ref = _ray.put(type_counts)

    pairs, parts = sized_for_join(pairs, cap=8)
    j = pairs.join(pairs, join_type="inner", num_partitions=parts,
                   on=("user_id",), right_suffix="_r")

    def ordered(t: pa.Table) -> pa.Table:
        keep = pc.less(t["event_type"], t["event_type_r"])
        t = t.filter(keep)
        return pa.table({"a": t["event_type"], "b": t["event_type_r"]})

    co = (_vgb(j.map_batches(ordered, batch_format="pyarrow"), ["a", "b"], Count(alias_name="n_ab")))

    def finish(t: pa.Table) -> pa.Table:
        tc = _ray.get(tc_ref)
        na = np.array([tc[x] for x in t["a"].to_pylist()], np.int64)
        nb = np.array([tc[x] for x in t["b"].to_pylist()], np.int64)
        nab = t["n_ab"].to_numpy().astype(np.int64)
        return pa.table({"a": t["a"], "b": t["b"],
                         "n_a": pa.array(na, pa.int64()),
                         "n_b": pa.array(nb, pa.int64()),
                         "n_ab": pa.array(nab, pa.int64()),
                         "lift_num": pa.array(nab * n_users, pa.int64()),
                         "lift_den": pa.array(na * nb, pa.int64())})

    return co.map_batches(finish, batch_format="pyarrow")


def _q_nation_region_share(sf_dir: str):
    """Hierarchical ratio: each nation's exact ppm share of its
    region's revenue.  One distributed per-customer revenue rollup
    feeds BOTH levels; nation→region is a broadcast dimension chain and
    the two tiny rollups divide integer-exactly driver-side."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    import ray as _ray

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name",
                                    "n_regionkey"])
    nat_region = dict(zip(nation["n_nationkey"].to_pylist(),
                          nation["n_regionkey"].to_pylist()))
    nat_name = dict(zip(nation["n_nationkey"].to_pylist(),
                        nation["n_name"].to_pylist()))
    ref = _ray.put(nat_region)

    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_nationkey"])
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(
            t["o_totalprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        tt = pa.table({"o_custkey": t["o_custkey"],
                       "rev": pa.array(c, pa.int64())})
        g = tt.group_by("o_custkey").aggregate([("rev", "sum")])
        return pa.table({"o_custkey": g["o_custkey"],
                         "rev": g["rev_sum"]})

    per_cust = (_vgb(orders.map_batches(cents, batch_format="pyarrow"), "o_custkey", Sum("rev", alias_name="rev")))
    per_cust, parts = sized_for_join(per_cust, cap=8)
    j = per_cust.join(cust, join_type="inner", num_partitions=parts,
                      on=("o_custkey",), right_on=("c_custkey",))
    per_nation = (j.groupby("c_nationkey")
                  .aggregate(Sum("rev", alias_name="rev"))
                  .to_pandas())
    per_nation["c_nationkey"] = per_nation["c_nationkey"].astype("int64")
    per_nation["region"] = per_nation["c_nationkey"].map(nat_region)
    region_tot = per_nation.groupby("region")["rev"].sum().to_dict()
    out = pd.DataFrame({
        "n_name": per_nation["c_nationkey"].map(nat_name),
        "revenue": per_nation["rev"].astype("int64"),
        "region_revenue": per_nation["region"].map(region_tot)
        .astype("int64")})
    out["share_ppm"] = (out["revenue"] * 1_000_000
                        // out["region_revenue"]).astype("int64")
    return out.reset_index(drop=True)


def _q_doc_len_pct_in_lang(sf_dir: str):
    """Grouped CDF assignment: each document's exact within-language
    length percentile, as (count of strictly shorter docs)·1e6 // n.
    The per-lang value rollup (distinct lengths + counts) is the SMALL
    side, broadcast once; assignment is a vectorized searchsorted per
    batch — no per-row window function over the corpus."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    import ray as _ray

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({"lang": t["lang"], "v": t["n_chars"],
                       "n": pa.array(np.ones(len(t), np.int64))})
        g = tt.group_by(["lang", "v"]).aggregate([("n", "sum")])
        return pa.table({"lang": g["lang"], "v": g["v"],
                         "n": g["n_sum"]})

    rollup = (_vgb(docs.map_batches(partial, batch_format="pyarrow"), ["lang", "v"], Sum("n", alias_name="n"))
              .to_pandas())
    cdf = {}
    for lang, g in rollup.groupby("lang"):
        g = g.sort_values("v")
        vals = g["v"].to_numpy(dtype=np.int64)
        counts = g["n"].to_numpy(dtype=np.int64)
        cum = np.concatenate(([0], counts.cumsum()))
        cdf[lang] = (vals, cum[:-1], int(cum[-1]))
    ref = _ray.put(cdf)

    def assign(t: pa.Table) -> pa.Table:
        m = _ray.get(ref)
        out = np.empty(len(t), np.int64)
        langs = np.asarray(t["lang"].to_pylist())
        v = t["n_chars"].to_numpy()
        for lang in np.unique(langs):
            vals, below, total = m[lang]
            idx = langs == lang
            pos = np.searchsorted(vals, v[idx], side="left")
            out[idx] = below[pos] * 1_000_000 // total
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"],
                         "n_chars": t["n_chars"],
                         "pct_ppm": pa.array(out, pa.int64())})

    return docs.map_batches(assign, batch_format="pyarrow")


# Broadcast gate for _q_nation_pair_flows: an orders side within the
# gate ships as two dense int64 LUTs (≤ ~64 MB) instead of joining.
# Module-level so tests can force the above-gate join plan on small
# fixtures (tests/test_joins.py::test_nation_pair_flows_join_plan_...).
Q7_BROADCAST_GATE = 2_000_000


def _q_nation_pair_flows(sf_dir: str):
    """TPC-H Q7 shape: trade volume between every ordered (supplier
    nation, customer nation) pair per ship year, supp ≠ cust.  Exact
    1e-4-dollar int64 revenue (ref: pmocr.sh has no joins; this is the
    anti-join discipline of pmocr.sh:2126-2144 generalized).

    Two physical plans, gated on the ``orders`` row count (same
    pattern as ``ops/graph.pagerank``'s node-count gate):

    * ``orders`` ≤ 2M rows: JOIN-FREE.  orderkey→custkey and
      custkey→nationkey are dense int64 LUTs broadcast once via
      ``ray.put`` (≤ ~64 MB at the gate) and gathered per batch, so
      the whole query is one lineitem scan + a ≤4200-row rollup —
      zero shuffles.
    * above the gate (orders no longer one-machine-broadcastable):
      partial (orderkey, s_nat, year) pre-agg BEFORE two large-large
      hash joins with data-scaled partition counts — the plan that
      survives 100 TB."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    import ray

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    n_map = dict(zip(nation["n_nationkey"].to_pylist(),
                     nation["n_name"].to_pylist()))
    supplier = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                             columns=["s_suppkey", "s_nationkey"])
    s_map = dict(zip(supplier["s_suppkey"].to_pylist(),
                     supplier["s_nationkey"].to_pylist()))
    s_ref = ray.put(_dense_i64_lut(s_map))

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_suppkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"])

    n_orders = pq.ParquetFile(
        os.path.join(sf_dir, "orders.parquet")).metadata.num_rows
    if n_orders <= Q7_BROADCAST_GATE:  # broadcast gate — see docstring
        ot = pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                           columns=["o_orderkey", "o_custkey"])
        ok = _i64(ot["o_orderkey"])
        o_lut = np.full(int(ok.max()) + 1, -1, np.int64)
        o_lut[ok] = _i64(ot["o_custkey"])
        ct = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_nationkey"])
        ck = _i64(ct["c_custkey"])
        c_lut = np.full(int(ck.max()) + 1, -1, np.int64)
        c_lut[ck] = _i64(ct["c_nationkey"])
        names = np.array([n_map.get(i, "") for i in
                          range(max(n_map) + 1)], dtype=object)
        luts_ref = ray.put((o_lut, c_lut, names))

        def fused(t: pa.Table) -> pa.Table:
            o_lut, c_lut, names = ray.get(luts_ref)
            s_lut = ray.get(s_ref)
            s_nat = _lut_gather(s_lut, _i64(t["l_suppkey"]))
            c_nat = _lut_gather(c_lut,
                                _lut_gather(o_lut, _i64(t["l_orderkey"])))
            keep = (s_nat >= 0) & (c_nat >= 0) & (s_nat != c_nat)
            s_nat, c_nat = s_nat[keep], c_nat[keep]
            kt = t.filter(pa.array(keep))
            year = pc.cast(pc.year(kt["l_shipdate"]), pa.int64())
            ext = np.rint(np.asarray(
                kt["l_extendedprice"].to_numpy(zero_copy_only=False)) * 100
            ).astype(np.int64)
            disc = np.rint(np.asarray(
                kt["l_discount"].to_numpy(zero_copy_only=False)) * 100
            ).astype(np.int64)
            tt = pa.table({
                "supp_nation": pa.array(names[s_nat], pa.string()),
                "cust_nation": pa.array(names[c_nat], pa.string()),
                "l_year": year,
                "rev": pa.array(ext * (100 - disc), pa.int64())})
            g = tt.group_by(["supp_nation", "cust_nation",
                             "l_year"]).aggregate([("rev", "sum")])
            return pa.table({"supp_nation": g["supp_nation"],
                             "cust_nation": g["cust_nation"],
                             "l_year": g["l_year"],
                             "revenue_e4": g["rev_sum"]})

        return (li.map_batches(fused, batch_format="pyarrow")
                .groupby(["supp_nation", "cust_nation", "l_year"])
                .aggregate(Sum("revenue_e4", alias_name="revenue_e4")))

    def partial(t: pa.Table) -> pa.Table:
        lut = ray.get(s_ref)
        nat = pa.array(_lut_gather(lut, _i64(t["l_suppkey"])), pa.int64())
        year = pc.cast(pc.year(t["l_shipdate"]), pa.int64())
        ext = np.rint(np.asarray(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        disc = np.rint(np.asarray(
            t["l_discount"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        tt = pa.table({"l_orderkey": t["l_orderkey"], "s_nat": nat,
                       "l_year": year,
                       "rev": pa.array(ext * (100 - disc), pa.int64())})
        g = tt.group_by(["l_orderkey", "s_nat", "l_year"]).aggregate(
            [("rev", "sum")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "s_nat": g["s_nat"], "l_year": g["l_year"],
                         "rev": g["rev_sum"]})

    from pmocr_ray.ops.vecagg import grouped_aggregate

    # order-scale groups — Arrow-bucketed merge (see ops/vecagg.py)
    per_order = grouped_aggregate(
        li.map_batches(partial, batch_format="pyarrow"),
        ["l_orderkey", "s_nat", "l_year"], [("rev", "sum", "rev")])
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_custkey"])
    per_order, parts = sized_for_join(per_order, cap=8)
    j1 = per_order.join(orders, join_type="inner", num_partitions=parts,
                        on=("l_orderkey",), right_on=("o_orderkey",))
    customer = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey", "c_nationkey"])
    j2 = j1.join(customer, join_type="inner", num_partitions=parts,
                 on=("o_custkey",), right_on=("c_custkey",))
    n_ref = ray.put(n_map)

    def cross_pairs(t: pa.Table) -> pa.Table:
        nmap = ray.get(n_ref)
        names = np.array([nmap.get(i, "") for i in
                          range(max(nmap) + 1)], dtype=object)
        c_nat = pc.cast(t["c_nationkey"], pa.int64())
        keep = pc.invert(pc.equal(c_nat, t["s_nat"]))
        t = t.append_column("c_nat", c_nat).filter(
            pc.fill_null(keep, False))
        supp = pa.array(names[_i64(t["s_nat"])], pa.string())
        cust = pa.array(names[_i64(t["c_nat"])], pa.string())
        tt = pa.table({"supp_nation": supp, "cust_nation": cust,
                       "l_year": t["l_year"], "rev": t["rev"]})
        g = tt.group_by(["supp_nation", "cust_nation", "l_year"]).aggregate(
            [("rev", "sum")])
        return pa.table({"supp_nation": g["supp_nation"],
                         "cust_nation": g["cust_nation"],
                         "l_year": g["l_year"],
                         "revenue_e4": g["rev_sum"]})

    return (j2.map_batches(cross_pairs, batch_format="pyarrow")
            .groupby(["supp_nation", "cust_nation", "l_year"])
            .aggregate(Sum("revenue_e4", alias_name="revenue_e4")))


def _q_sole_returner_suppliers(sf_dir: str):
    """TPC-H Q21 shape (multi-EXISTS self-join on the fact table):
    per finished multi-supplier order, find the *sole* supplier whose
    lines were returned, and tally returned lines per such supplier.
    Two cascaded groupbys replace the EXISTS/NOT-EXISTS pair: the
    per-(order,supplier) rollup makes rows unique, so the per-order
    stage computes n_supp / n_ret_supp / the sole offender with plain
    Sum/Min aggregates — no correlated rescan of lineitem."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    import ray

    SENT = (1 << 62)
    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_suppkey",
                                  "l_returnflag"])

    def per_supp_partial(t: pa.Table) -> pa.Table:
        ret = pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64())
        tt = pa.table({"l_orderkey": t["l_orderkey"],
                       "l_suppkey": t["l_suppkey"], "ret": ret})
        g = tt.group_by(["l_orderkey", "l_suppkey"]).aggregate(
            [("ret", "sum")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "l_suppkey": g["l_suppkey"],
                         "ret_lines": g["ret_sum"]})

    per_supp = (_vgb(li.map_batches(per_supp_partial, batch_format="pyarrow"), ["l_orderkey", "l_suppkey"], Sum("ret_lines", alias_name="ret_lines")))

    def per_order_partial(t: pa.Table) -> pa.Table:
        # rows are unique per (order, supplier) here, so per-batch
        # partials + a global Sum/Min compose exactly
        ret = t["ret_lines"].to_numpy()
        supp = t["l_suppkey"].to_numpy()
        is_ret = (ret > 0).astype(np.int64)
        supp_if = np.where(is_ret == 1, supp, SENT)
        tt = pa.table({
            "l_orderkey": t["l_orderkey"],
            "n_supp": pa.array(np.ones(len(t), np.int64)),
            "n_ret_supp": pa.array(is_ret),
            "ret_total": pa.array(ret.astype(np.int64)),
            "ret_supp": pa.array(supp_if, pa.int64()),
        })
        g = tt.group_by("l_orderkey").aggregate(
            [("n_supp", "sum"), ("n_ret_supp", "sum"),
             ("ret_total", "sum"), ("ret_supp", "min")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "n_supp": g["n_supp_sum"],
                         "n_ret_supp": g["n_ret_supp_sum"],
                         "ret_total": g["ret_total_sum"],
                         "ret_supp": g["ret_supp_min"]})

    per_order = (_vgb(per_supp.map_batches(per_order_partial,
                                      batch_format="pyarrow"), "l_orderkey", Sum("n_supp", alias_name="n_supp"), Sum("n_ret_supp", alias_name="n_ret_supp"), Sum("ret_total", alias_name="ret_total"), Min("ret_supp", alias_name="ret_supp")))

    def sole(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(t["n_supp"], 2),
                       pc.equal(t["n_ret_supp"], 1))
        t = t.filter(pc.fill_null(keep, False))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "ret_supp": t["ret_supp"],
                         "ret_lines": t["ret_total"]})

    cand = per_order.map_batches(sole, batch_format="pyarrow")
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_orderstatus"])

    def f_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["o_orderstatus"], "F")).select(
            ["o_orderkey"])

    f_orders = orders.map_batches(f_only, batch_format="pyarrow")
    cand, parts = sized_for_join(cand, cap=8)
    j = cand.join(f_orders, join_type="inner", num_partitions=parts,
                  on=("l_orderkey",), right_on=("o_orderkey",))
    from ray.data.aggregate import Count

    agg = (j.groupby("ret_supp")
           .aggregate(Count(alias_name="n_orders"),
                      Sum("ret_lines", alias_name="n_ret_lines")))
    supplier = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                             columns=["s_suppkey", "s_name"])
    s_name = dict(zip(supplier["s_suppkey"].to_pylist(),
                      supplier["s_name"].to_pylist()))
    name_ref = ray.put(s_name)

    def named(t: pa.Table) -> pa.Table:
        m = ray.get(name_ref)
        return pa.table({
            "s_name": pa.array([m[k] for k in t["ret_supp"].to_pylist()],
                               pa.string()),
            "n_orders": pc.cast(t["n_orders"], pa.int64()),
            "n_ret_lines": t["n_ret_lines"]})

    return agg.map_batches(named, batch_format="pyarrow")


def _q_ks_lang_len(sf_dir: str):
    """Distributed two-sample Kolmogorov–Smirnov statistic: max CDF
    gap between the length distribution of lang='en' documents and all
    others, exact in cross-multiplied integers (no float CDF).  The
    shuffle moves only (value, n_en, n_other) rollup triples; the
    cumulative scan runs driver-side over the tiny distinct-value
    support."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        e = pc.cast(pc.equal(t["lang"], "en"), pa.int64())
        tt = pa.table({"v": t["n_chars"], "ne": e,
                       "no": pc.subtract(pa.scalar(1, pa.int64()), e)})
        g = tt.group_by("v").aggregate([("ne", "sum"), ("no", "sum")])
        return pa.table({"v": g["v"], "ne": g["ne_sum"],
                         "no": g["no_sum"]})

    rollup = (_vgb(docs.map_batches(partial, batch_format="pyarrow"), "v", Sum("ne", alias_name="ne"), Sum("no", alias_name="no"))
              .to_pandas().sort_values("v"))
    cne = rollup["ne"].to_numpy(dtype=np.int64).cumsum()
    cno = rollup["no"].to_numpy(dtype=np.int64).cumsum()
    n_en, n_other = int(cne[-1]), int(cno[-1])
    d_num = int(np.max(np.abs(cne * n_other - cno * n_en)))
    return pd.DataFrame({
        "n_en": [n_en], "n_other": [n_other], "d_num": [d_num],
        "ks_ppm": [d_num * 1_000_000 // (n_en * n_other)]}).astype("int64")


def _q_order_backlog(sf_dir: str):
    """Interval-overlap sweep: for each day in the delta support, how
    many orders are open (orderdate ≤ day < last ship day of the
    order's lines).  The classic +1/-1 delta decomposition: per-order
    end day from a lineitem partial-max rollup, hash-joined to orders,
    exploded to two delta rows, summed per day — the shuffle carries
    only (day, ±1) pairs and the cumulative scan runs driver-side over
    the ~2.5k-day support (bounded by the calendar, not the data)."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    US_PER_DAY = 86_400_000_000

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_shipdate"])

    def end_partial(t: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(t["l_shipdate"], pa.int64()),
                      US_PER_DAY)
        tt = pa.table({"l_orderkey": t["l_orderkey"], "ed": d})
        g = tt.group_by("l_orderkey").aggregate([("ed", "max")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "ed": g["ed_max"]})

    ends = (_vgb(li.map_batches(end_partial, batch_format="pyarrow"), "l_orderkey", Max("ed", alias_name="ed")))
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_orderdate"])
    ends, parts = sized_for_join(ends, cap=8)
    j = ends.join(orders, join_type="inner", num_partitions=parts,
                  on=("l_orderkey",), right_on=("o_orderkey",))

    def deltas(t: pa.Table) -> pa.Table:
        sd = pc.divide(pc.cast(t["o_orderdate"], pa.int64()), US_PER_DAY)
        day = pa.concat_arrays([sd.combine_chunks(),
                                t["ed"].combine_chunks()])
        one = np.ones(len(t), np.int64)
        delta = pa.array(np.concatenate([one, -one]), pa.int64())
        tt = pa.table({"day": day, "delta": delta})
        g = tt.group_by("day").aggregate([("delta", "sum")])
        return pa.table({"day": g["day"], "delta": g["delta_sum"]})

    rollup = (j.map_batches(deltas, batch_format="pyarrow")
              .groupby("day").aggregate(Sum("delta", alias_name="delta"))
              .to_pandas().sort_values("day"))
    return pd.DataFrame({
        "day": rollup["day"].to_numpy(dtype=np.int64),
        "open_orders": rollup["delta"].to_numpy(dtype=np.int64).cumsum(),
    }).reset_index(drop=True)


def _q_weighted_median_price(sf_dir: str):
    """Grouped *weighted* median: per returnflag, the smallest price
    (cents) whose cumulative quantity weight reaches half the group
    total.  Holistic aggregate made distributive: the all-to-all moves
    only (group, value, weight-sum) triples over the bounded price
    domain; the per-group cumulative scan is driver-side over distinct
    values only."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_returnflag", "l_extendedprice",
                                  "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        v = np.rint(np.asarray(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        w = np.rint(np.asarray(
            t["l_quantity"].to_numpy(zero_copy_only=False))
        ).astype(np.int64)
        tt = pa.table({"grp": t["l_returnflag"],
                       "v": pa.array(v, pa.int64()),
                       "w": pa.array(w, pa.int64())})
        g = tt.group_by(["grp", "v"]).aggregate([("w", "sum")])
        return pa.table({"grp": g["grp"], "v": g["v"], "w": g["w_sum"]})

    rollup = (_vgb(li.map_batches(partial, batch_format="pyarrow"), ["grp", "v"], Sum("w", alias_name="w"))
              .to_pandas())
    out_g, out_v = [], []
    for grp, g in rollup.groupby("grp"):
        g = g.sort_values("v")
        w = g["w"].to_numpy(dtype=np.int64)
        cw = w.cumsum()
        tot = cw[-1]
        idx = int(np.searchsorted(cw * 2, tot, side="left"))
        out_g.append(grp)
        out_v.append(int(g["v"].to_numpy(dtype=np.int64)[idx]))
    return pd.DataFrame({"l_returnflag": out_g,
                         "wmedian_cents": pd.array(out_v,
                                                   dtype="int64")})


def _q_vocab_overlap(sf_dir: str):
    """Exact pairwise vocabulary Jaccard between languages.  The
    corpus-sized explode dedups (lang, term) per batch before any
    shuffle; the two term-keyed shuffles move only vocab-sized pairs
    (never document text), and the pairwise math collapses to a
    ≤2^L-row *lang-bitmask histogram* — no vocab×vocab join anywhere."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["lang", "text"])
    langs = sorted(
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                        columns=["lang"])
        .groupby("lang").count().to_pandas()["lang"])
    bit = {l: 1 << i for i, l in enumerate(langs)}

    def explode(t: pa.Table) -> pa.Table:
        # vectorized: arrow split (\s+ split == \S+ findall minus the
        # empties) + parent-index lang-bit gather + local arrow distinct
        toks = pc.split_pattern_regex(pc.fill_null(t["text"], ""), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        mask = pc.not_equal(flat, "")
        flat, parent = flat.filter(mask), parent.filter(mask)
        lang_bits = np.array([bit[l] for l in t["lang"].to_pylist()],
                             np.int64)
        b = lang_bits[parent.to_numpy(zero_copy_only=False)]
        tab = pa.table({"term": flat, "b": pa.array(b, pa.int64())})
        return tab.group_by(["term", "b"]).aggregate([])

    from pmocr_ray.ops.vecagg import distinct as _vec_distinct
    from pmocr_ray.ops.vecagg import grouped_aggregate

    # distinct (term, lang-bit) globally, then OR bits per term: after
    # the distinct, each (term, bit) is unique, so Sum == bitwise OR;
    # term groups are VOCAB-scale — Arrow-bucketed merge
    distinct = _vec_distinct(
        docs.map_batches(explode, batch_format="pyarrow"), ["term", "b"])
    masks = grouped_aggregate(distinct, ["term"],
                              [("b", "sum", "mask")])

    def hist(t: pa.Table) -> pa.Table:
        tt = pa.table({"mask": t["mask"],
                       "n": pa.array(np.ones(len(t), np.int64))})
        g = tt.group_by("mask").aggregate([("n", "sum")])
        return pa.table({"mask": g["mask"], "n": g["n_sum"]})

    h = (masks.map_batches(hist, batch_format="pyarrow")
         .groupby("mask").aggregate(Sum("n", alias_name="n")).to_pandas())
    mask_n = dict(zip(h["mask"].astype("int64"), h["n"].astype("int64")))
    size = {l: sum(n for m, n in mask_n.items() if m & bit[l])
            for l in langs}
    rows = []
    for i, a in enumerate(langs):
        for bl in langs[i + 1:]:
            common = sum(n for m, n in mask_n.items()
                         if (m & bit[a]) and (m & bit[bl]))
            if common == 0:
                continue
            union = size[a] + size[bl] - common
            rows.append((a, bl, size[a], size[bl], common,
                         common * 1_000_000 // union))
    out = pd.DataFrame(rows, columns=["lang_a", "lang_b", "n_a", "n_b",
                                      "n_common", "jaccard_ppm"])
    for c in ["n_a", "n_b", "n_common", "jaccard_ppm"]:
        out[c] = out[c].astype("int64")
    return out


def _q_rfm_scores(sf_dir: str):
    """RFM customer segmentation with *deterministic* quintiles: each
    dimension's bucket is min(4, strictly-below-count·5 // n) — a pure
    function of the value, so ties never straddle buckets and the
    result is partitioning-independent (NTILE's positional ties are
    not).  One per-customer rollup is materialized once and reused by
    the three dimension-CDF rollups and the final assignment; the CDFs
    travel as one broadcast (bounded value domains: days, order
    counts; monetary support is distinct-cents — at 100 TB swap in
    fixed-width bins)."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    import ray

    US_PER_DAY = 86_400_000_000

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey", "o_orderdate",
                                      "o_totalprice"])

    # global max order day: dedicated column-pruned pass (cheap), so
    # the per-customer rollup below executes exactly once
    dates = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                            columns=["o_orderdate"])

    def day_max(t: pa.Table) -> pa.Table:
        d = pc.max(pc.divide(pc.cast(t["o_orderdate"], pa.int64()),
                             US_PER_DAY))
        return pa.table({"d": pa.array([d.as_py()], pa.int64())})

    max_day = int(dates.map_batches(day_max, batch_format="pyarrow")
                  .max("d"))

    def per_cust_partial(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["o_orderdate"], pa.int64()), US_PER_DAY)
        cents = np.rint(np.asarray(
            t["o_totalprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        tt = pa.table({"ck": t["o_custkey"], "last_day": day,
                       "freq": pa.array(np.ones(len(t), np.int64)),
                       "mon": pa.array(cents, pa.int64())})
        g = tt.group_by("ck").aggregate(
            [("last_day", "max"), ("freq", "sum"), ("mon", "sum")])
        return pa.table({"ck": g["ck"], "last_day": g["last_day_max"],
                         "freq": g["freq_sum"], "mon": g["mon_sum"]})

    def to_rec(t: pa.Table) -> pa.Table:
        rec = pc.subtract(pa.scalar(max_day, pa.int64()), t["last_day"])
        return pa.table({"ck": t["ck"], "rec": rec, "freq": t["freq"],
                         "mon": t["mon"]})

    per_cust = (_vgb(orders.map_batches(per_cust_partial,
                                   batch_format="pyarrow"), "ck", Max("last_day", alias_name="last_day"), Sum("freq", alias_name="freq"), Sum("mon", alias_name="mon"))
                .map_batches(to_rec, batch_format="pyarrow")
                .materialize())
    n_cust = per_cust.count()

    def dim_rollup(dim: str):
        def partial(t: pa.Table) -> pa.Table:
            tt = pa.table({"v": t[dim],
                           "n": pa.array(np.ones(len(t), np.int64))})
            g = tt.group_by("v").aggregate([("n", "sum")])
            return pa.table({"v": g["v"], "n": g["n_sum"]})

        df = (_vgb(per_cust.map_batches(partial, batch_format="pyarrow"), "v", Sum("n", alias_name="n"))
              .to_pandas().sort_values("v"))
        vals = df["v"].to_numpy(dtype=np.int64)
        cum = np.concatenate(([0], df["n"].to_numpy(np.int64).cumsum()))
        return vals, cum[:-1]  # below(v) = customers strictly < v

    cdf_ref = ray.put({d: dim_rollup(d) for d in ("rec", "freq", "mon")})

    def assign(t: pa.Table) -> pa.Table:
        cdfs = ray.get(cdf_ref)
        code = np.zeros(len(t), np.int64)
        for dim, mul in (("rec", 100), ("freq", 10), ("mon", 1)):
            vals, below = cdfs[dim]
            v = t[dim].to_numpy()
            pos = np.searchsorted(vals, v, side="left")
            b = np.minimum(4, below[pos] * 5 // n_cust)
            code += b * mul
        tt = pa.table({"rfm_code": pa.array(code, pa.int64()),
                       "n_customers": pa.array(np.ones(len(t), np.int64)),
                       "sum_monetary": t["mon"]})
        g = tt.group_by("rfm_code").aggregate(
            [("n_customers", "sum"), ("sum_monetary", "sum")])
        return pa.table({"rfm_code": g["rfm_code"],
                         "n_customers": g["n_customers_sum"],
                         "sum_monetary": g["sum_monetary_sum"]})

    return (per_cust.map_batches(assign, batch_format="pyarrow")
            .groupby("rfm_code")
            .aggregate(Sum("n_customers", alias_name="n_customers"),
                       Sum("sum_monetary", alias_name="sum_monetary")))


def _q_emb_norm_outliers(sf_dir: str):
    """Robust outlier flagging on a vector column, bit-exact across
    engines: each embedding is quantized q = floor(x·2²⁰) (scaling by
    a power of two is EXACT in IEEE double, floor has no tie rule —
    no round() half-even/half-away divergence), the squared norm is an
    exact int64 sum, and median/MAD come from the same strict
    2·cum ≥ n walk used by weighted_median.  One materialized
    (vec_id, norm) table feeds both the value-counts rollup and the
    flag pass; the driver walk is over distinct norms (swap in
    fixed-width bins at 10⁹ vectors)."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    import ray

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])

    def norms(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        flat = np.asarray(col.values, dtype=np.float64)
        d = len(flat) // len(t)
        q = np.floor(flat * 1048576.0).astype(np.int64).reshape(len(t), d)
        s = (q * q).sum(axis=1)
        return pa.table({"vec_id": t["vec_id"],
                         "norm_q2": pa.array(s, pa.int64())})

    nt = emb.map_batches(norms, batch_format="pyarrow").materialize()

    def rollup(t: pa.Table) -> pa.Table:
        tt = pa.table({"v": t["norm_q2"],
                       "n": pa.array(np.ones(len(t), np.int64))})
        g = tt.group_by("v").aggregate([("n", "sum")])
        return pa.table({"v": g["v"], "n": g["n_sum"]})

    def strict_median(df) -> int:
        df = df.sort_values("v")
        w = df["n"].to_numpy(dtype=np.int64)
        cw = w.cumsum()
        idx = int(np.searchsorted(cw * 2, cw[-1], side="left"))
        return int(df["v"].to_numpy(dtype=np.int64)[idx])

    vals = (_vgb(nt.map_batches(rollup, batch_format="pyarrow"), "v", Sum("n", alias_name="n")).to_pandas())
    med = strict_median(vals)
    vals["v"] = (vals["v"].astype("int64") - med).abs()
    mad = strict_median(vals.groupby("v", as_index=False)["n"].sum())
    lim_ref = ray.put((med, 3 * mad))

    def flag(t: pa.Table) -> pa.Table:
        med_, lim = ray.get(lim_ref)
        s = t["norm_q2"].to_numpy()
        out = (np.abs(s - med_) > lim).astype(np.int64)
        return pa.table({"vec_id": t["vec_id"], "norm_q2": t["norm_q2"],
                         "is_outlier": pa.array(out, pa.int64())})

    return nt.map_batches(flag, batch_format="pyarrow")


def _q_cohort_retention(sf_dir: str):
    """Quarterly cohort-retention triangle: customers bucketed by
    first-order quarter; for each (cohort, later-quarter) the count of
    cohort customers who ordered again.  The per-customer first
    quarter is a Min rollup hash-joined back to the distinct
    (customer, quarter) activity set — the classic self-referential
    temporal join, with both join inputs already reduced to one row
    per customer(-quarter) before the exchange."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey", "o_orderdate"])

    def cust_q(t: pa.Table) -> pa.Table:
        y = pc.cast(pc.year(t["o_orderdate"]), pa.int64())
        q = pc.cast(pc.quarter(t["o_orderdate"]), pa.int64())
        qi = pc.add(pc.multiply(y, 4), pc.subtract(q, 1))
        tt = pa.table({"ck": t["o_custkey"], "q": qi})
        return tt.group_by(["ck", "q"]).aggregate([])

    activity = (orders.map_batches(cust_q, batch_format="pyarrow")
                .groupby(["ck", "q"]).count()
                .drop_columns(["count()"]))
    first_q = (_vgb(activity, "ck", Min("q", alias_name="cohort")))
    first_q, parts = sized_for_join(first_q, cap=8)
    j = activity.join(first_q, join_type="inner", num_partitions=parts,
                      on=("ck",), right_on=("ck",))

    def pair(t: pa.Table) -> pa.Table:
        tt = pa.table({"cohort_q": t["cohort"], "active_q": t["q"],
                       "n": pa.array(np.ones(len(t), np.int64))})
        g = tt.group_by(["cohort_q", "active_q"]).aggregate([("n", "sum")])
        return pa.table({"cohort_q": g["cohort_q"],
                         "active_q": g["active_q"],
                         "n_customers": g["n_sum"]})

    return (j.map_batches(pair, batch_format="pyarrow")
            .groupby(["cohort_q", "active_q"])
            .aggregate(Sum("n_customers", alias_name="n_customers")))


def _q_rank_fusion(sf_dir: str):
    """Reciprocal-rank fusion of two document rankings (by length and
    by a quality proxy), integer-exact: score = Σ 10⁹//(60+rank).
    Each ranking is assigned distributively via the broadcast-CDF
    trick — rank = strictly-below count on the (value, doc_id) pair,
    no global sort of the corpus — then one map pass fuses and a
    sort().limit(k) returns the top 20."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    import ray

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "n_chars", "text"])

    def with_quality(t: pa.Table) -> pa.Table:
        # quality proxy: words per 100 chars (int), deterministic
        words = pc.list_value_length(
            pc.split_pattern_regex(pc.coalesce(t["text"], ""), r"\s+"))
        n = pc.max_element_wise(t["n_chars"], 1)
        q = pc.divide(pc.multiply(pc.cast(words, pa.int64()), 100),
                      pc.cast(n, pa.int64()))
        return pa.table({"doc_id": t["doc_id"],
                         "len_v": pc.cast(t["n_chars"], pa.int64()),
                         "q_v": q})

    scored = docs.map_batches(with_quality,
                              batch_format="pyarrow").materialize()

    def dim_cdf(dim: str):
        def partial(t: pa.Table) -> pa.Table:
            tt = pa.table({"v": t[dim],
                           "n": pa.array(np.ones(len(t), np.int64))})
            g = tt.group_by("v").aggregate([("n", "sum")])
            return pa.table({"v": g["v"], "n": g["n_sum"]})

        df = (_vgb(scored.map_batches(partial, batch_format="pyarrow"), "v", Sum("n", alias_name="n"))
              .to_pandas().sort_values("v"))
        vals = df["v"].to_numpy(dtype=np.int64)
        cum = np.concatenate(([0], df["n"].to_numpy(np.int64).cumsum()))
        return vals, cum[:-1], int(cum[-1])

    cdf_ref = ray.put({d: dim_cdf(d) for d in ("len_v", "q_v")})

    def fuse(t: pa.Table) -> pa.Table:
        cdfs = ray.get(cdf_ref)
        score = np.zeros(len(t), np.int64)
        for dim in ("len_v", "q_v"):
            vals, below, total = cdfs[dim]
            v = t[dim].to_numpy()
            # rank 1 = best (largest value); ties share the best rank
            # of the tied block: rank = (# strictly greater) + 1
            pos = np.searchsorted(vals, v, side="right")
            count_le = np.concatenate((below, [total]))[pos]
            rank = total - count_le + 1
            score += 1_000_000_000 // (60 + rank)
        return pa.table({"doc_id": t["doc_id"],
                         "rrf_score": pa.array(score, pa.int64())})

    return (scored.map_batches(fuse, batch_format="pyarrow")
            .sort(["rrf_score", "doc_id"], descending=[True, False])
            .limit(20))


def _q_daily_anomalies(sf_dir: str):
    """Trailing-window anomaly detection on daily event volume,
    entirely in integers: day d is anomalous when its count exceeds
    the trailing-28-day mean by 1σ — tested as
    (c·n − S) > 0 ∧ (c·n − S)² > n·Q − S², which clears both
    denominators so no float mean/σ ever exists.  The corpus shuffle
    carries only (day, count) pairs; the trailing scan runs over the
    bounded day support."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    US_PER_DAY = 86_400_000_000

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(t["ts"], pa.int64()), US_PER_DAY)
        tt = pa.table({"day": d,
                       "n": pa.array(np.ones(len(t), np.int64))})
        g = tt.group_by("day").aggregate([("n", "sum")])
        return pa.table({"day": g["day"], "n": g["n_sum"]})

    daily = (ev.map_batches(partial, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("n", alias_name="n"))
             .to_pandas().sort_values("day"))
    days = daily["day"].to_numpy(dtype=np.int64)
    counts = daily["n"].to_numpy(dtype=np.int64)
    rows = []
    for i in range(len(days)):
        lo_day = days[i] - 28
        j0 = int(np.searchsorted(days, lo_day, side="left"))
        w = counts[j0:i][days[j0:i] < days[i]]
        n = len(w)
        if n < 7:  # warm-up: not enough history to judge
            continue
        s, q = int(w.sum()), int((w * w).sum())
        c = int(counts[i])
        lhs = c * n - s
        if lhs > 0 and lhs * lhs > n * q - s * s:
            rows.append((int(days[i]), c, n, s))
    out = pd.DataFrame(rows, columns=["day", "n_events", "win_days",
                                      "win_sum"])
    for col in out.columns:
        out[col] = out[col].astype("int64")
    return out


def _q_small_order_revenue(sf_dir: str):
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20% of their part's average quantity.  The correlated AVG becomes
    a per-part (n, Σqty) rollup hash-joined back to the fact table;
    the 20% test is the integer cross-multiplication
    qty·5·n < Σ — no float average exists, so the filter is exact and
    partitioning-independent.  Output: one row (revenue_e2, n_lines)."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice"])

    def qty_partial(t: pa.Table) -> pa.Table:
        q = np.rint(np.asarray(
            t["l_quantity"].to_numpy(zero_copy_only=False))
        ).astype(np.int64)
        tt = pa.table({"pk": t["l_partkey"],
                       "sq": pa.array(q, pa.int64()),
                       "n": pa.array(np.ones(len(t), np.int64))})
        g = tt.group_by("pk").aggregate([("sq", "sum"), ("n", "sum")])
        return pa.table({"pk": g["pk"], "sq": g["sq_sum"],
                         "n": g["n_sum"]})

    per_part = (_vgb(li.map_batches(qty_partial, batch_format="pyarrow"), "pk", Sum("sq", alias_name="sq"), Sum("n", alias_name="n")))
    per_part, parts = sized_for_join(per_part, cap=8)
    j = li.join(per_part, join_type="inner", num_partitions=parts,
                on=("l_partkey",), right_on=("pk",))

    def below(t: pa.Table) -> pa.Table:
        q = np.rint(np.asarray(
            t["l_quantity"].to_numpy(zero_copy_only=False))
        ).astype(np.int64)
        cents = np.rint(np.asarray(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        keep = q * 5 * t["n"].to_numpy() < t["sq"].to_numpy()
        return pa.table({
            "rev": pa.array([int(cents[keep].sum())], pa.int64()),
            "n": pa.array([int(keep.sum())], pa.int64())})

    agg = (j.map_batches(below, batch_format="pyarrow").to_pandas())
    return pd.DataFrame({"revenue_e2": [int(agg["rev"].sum())],
                         "n_lines": [int(agg["n"].sum())]}).astype("int64")


def _q_large_orders(sf_dir: str):
    """TPC-H Q18 shape: orders whose total quantity exceeds a
    threshold (HAVING over the fact rollup), joined back to orders and
    customer for the report columns.  The rollup-then-filter runs
    BEFORE any join, so only qualifying orderkeys (a tiny set) enter
    the exchanges; customer names attach via hash join sized from the
    survivor count."""
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    THRESH = 250

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        q = np.rint(np.asarray(
            t["l_quantity"].to_numpy(zero_copy_only=False))
        ).astype(np.int64)
        tt = pa.table({"l_orderkey": t["l_orderkey"],
                       "qty": pa.array(q, pa.int64())})
        g = tt.group_by("l_orderkey").aggregate([("qty", "sum")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "qty": g["qty_sum"]})

    per_order = (_vgb(li.map_batches(partial, batch_format="pyarrow"), "l_orderkey", Sum("qty", alias_name="total_qty")))

    def having(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["total_qty"], THRESH))

    big = per_order.map_batches(having, batch_format="pyarrow")
    big, parts = sized_for_join(big, cap=8)
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate", "o_totalprice"])
    j1 = big.join(orders, join_type="inner", num_partitions=parts,
                  on=("l_orderkey",), right_on=("o_orderkey",))
    customer = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey", "c_name"])
    j2 = j1.join(customer, join_type="inner", num_partitions=parts,
                 on=("o_custkey",), right_on=("c_custkey",))

    def report(t: pa.Table) -> pa.Table:
        cents = np.rint(np.asarray(
            t["o_totalprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        day = pc.divide(pc.cast(t["o_orderdate"], pa.int64()),
                        86_400_000_000)
        return pa.table({"c_name": t["c_name"],
                         "o_orderkey": t["l_orderkey"],
                         "order_day": day,
                         "totalprice_e2": pa.array(cents, pa.int64()),
                         "total_qty": t["total_qty"]})

    return j2.map_batches(report, batch_format="pyarrow")


def _q_contingency_chi2(sf_dir: str):
    """Independence audit of the (lang, source) contingency table with
    a floor-exact scaled χ²: per cell the standardized-residual
    numerator (o·N − r·c) and the cell term
    (|resid| // N)² // max(r·c // N, 1) — residual pre-scaled by N so
    the square stays bounded by N² (resid² itself would overflow int64
    past ~10⁹ documents); abs() keeps every division non-negative,
    where DuckDB's truncating // and numpy's flooring // agree, so the
    statistic is integer-reproducible.  One tiny groupby builds the
    table; margins and terms are driver-side arithmetic over the L×S
    cells."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({"lang": t["lang"], "source": t["source"],
                       "n": pa.array(np.ones(len(t), np.int64))})
        g = tt.group_by(["lang", "source"]).aggregate([("n", "sum")])
        return pa.table({"lang": g["lang"], "source": g["source"],
                         "n": g["n_sum"]})

    cells = (docs.map_batches(partial, batch_format="pyarrow")
             .groupby(["lang", "source"])
             .aggregate(Sum("n", alias_name="n")).to_pandas())
    cells["n"] = cells["n"].astype("int64")
    N = int(cells["n"].sum())
    r = cells.groupby("lang")["n"].sum().to_dict()
    c = cells.groupby("source")["n"].sum().to_dict()
    out = cells.copy()
    rc = out["lang"].map(r).astype("int64") * \
        out["source"].map(c).astype("int64")
    resid = out["n"] * N - rc
    out["resid_num"] = resid.astype("int64")
    sr = resid.abs() // N
    denom = np.maximum(rc // N, 1)
    out["chi2_term"] = ((sr * sr) // denom).astype("int64")
    return out[["lang", "source", "n", "resid_num", "chi2_term"]] \
        .reset_index(drop=True)


def _q_cov_matrix(sf_dir: str):
    """Single-pass moment matrix over the four lineitem measures
    (quantity, price in hecto-dollars, discount e2, tax e2): per batch
    the 4+10 sufficient statistics (Σxᵢ, Σxᵢxⱼ) as int64, one global
    reduce, and the pairwise covariance published as the exact integer
    numerator n·Σxy − Σx·Σy (the n² denominator is the consumer's) —
    the shuffle moves 15 numbers per batch regardless of corpus size.
    Price is quantized to 100-dollar units so n·Σxy stays within int64
    (cents² × n × n overflows past ~10⁵ rows)."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    COLS = ["qty", "price_h2", "disc_e2", "tax_e2"]
    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_quantity", "l_extendedprice",
                                  "l_discount", "l_tax"])

    def partial(t: pa.Table) -> pa.Table:
        m = np.empty((len(t), 4), np.int64)
        for i, (src, scale) in enumerate(
                (("l_quantity", 1), ("l_extendedprice", 100),
                 ("l_discount", 100), ("l_tax", 100))):
            m[:, i] = np.rint(np.asarray(
                t[src].to_numpy(zero_copy_only=False)) * scale
            ).astype(np.int64)
        m[:, 1] //= 10000  # cents -> hecto-dollars, exact int floor
        row = {"n": pa.array([len(t)], pa.int64())}
        for i in range(4):
            row[f"s_{i}"] = pa.array([int(m[:, i].sum())], pa.int64())
            for j_ in range(i, 4):
                row[f"s_{i}{j_}"] = pa.array(
                    [int((m[:, i] * m[:, j_]).sum())], pa.int64())
        return pa.table(row)

    stats = (li.map_batches(partial, batch_format="pyarrow")
             .to_pandas().sum())
    n = int(stats["n"])
    rows = []
    for i in range(4):
        for j_ in range(i, 4):
            cov_num = n * int(stats[f"s_{i}{j_}"]) \
                - int(stats[f"s_{i}"]) * int(stats[f"s_{j_}"])
            rows.append((COLS[i], COLS[j_], n, cov_num))
    return pd.DataFrame(rows, columns=["x", "y", "n", "cov_num"]).astype(
        {"n": "int64", "cov_num": "int64"})


def _q_disjunctive_brackets(sf_dir: str):
    """TPC-H Q19 shape: disjunctive multi-column bracket predicates
    across a join.  The part dimension is broadcast once as three
    parallel numpy arrays (sorted keys + brand-code + size) so each
    lineitem batch evaluates all three OR'd brackets with one
    searchsorted gather and pure boolean algebra — no join shuffle, no
    per-row Python.  Revenue exact in 1e-4 dollars (int64)."""
    import pandas as pd
    import pyarrow as pa

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_brand", "p_size"])
    keys = np.asarray(part["p_partkey"].to_numpy(zero_copy_only=False),
                      np.int64)
    order = np.argsort(keys)
    keys = keys[order]
    brand = np.asarray(part["p_brand"].to_pylist(), object)[order]
    bcode = np.zeros(len(keys), np.int8)
    for code, name in ((1, "Brand#12"), (2, "Brand#23"), (3, "Brand#34")):
        bcode[brand == name] = code
    size = np.asarray(part["p_size"].to_numpy(zero_copy_only=False),
                      np.int64)[order]
    dim_ref = ray.put((keys, bcode, size))

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        k, bc, sz = ray.get(dim_ref)
        pk = np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False),
                        np.int64)
        idx = np.searchsorted(k, pk)
        b, s = bc[idx], sz[idx]
        qty = np.rint(np.asarray(
            t["l_quantity"].to_numpy(zero_copy_only=False))).astype(np.int64)
        mask = (((b == 1) & (s >= 1) & (s <= 5) & (qty >= 1) & (qty <= 11))
                | ((b == 2) & (s >= 1) & (s <= 10)
                   & (qty >= 10) & (qty <= 20))
                | ((b == 3) & (s >= 1) & (s <= 15)
                   & (qty >= 20) & (qty <= 30)))
        ext = np.rint(np.asarray(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)[mask]
        disc = np.rint(np.asarray(
            t["l_discount"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)[mask]
        return pa.table({
            "revenue_e4": pa.array([int((ext * (100 - disc)).sum())],
                                   pa.int64()),
            "n_items": pa.array([int(mask.sum())], pa.int64()),
        })

    row = (li.map_batches(partial, batch_format="pyarrow")
           .aggregate(Sum("revenue_e4", alias_name="revenue_e4"),
                      Sum("n_items", alias_name="n_items")))
    return pd.DataFrame([{"revenue_e4": int(row["revenue_e4"]),
                          "n_items": int(row["n_items"])}])


def _q_top_supplier_rev(sf_dir: str):
    """TPC-H Q15 shape: supplier(s) with the maximum revenue over a
    ship-date window, tie-safe.  Per-batch combiner shrinks lineitem to
    (suppkey, rev) partials, one small groupby builds the per-supplier
    rollup, a scalar ``max`` aggregate finds the bar, and only the
    winning row(s) reach the driver — never the rollup, never the
    fact table.  Names resolved from a broadcast supplier dimension."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    LO = np.datetime64("1996-01-01")
    HI = np.datetime64("1996-04-01")
    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_suppkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        ship = np.asarray(t["l_shipdate"].to_numpy(zero_copy_only=False),
                          "datetime64[us]")
        m = (ship >= LO) & (ship < HI)
        ext = np.rint(np.asarray(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)[m]
        disc = np.rint(np.asarray(
            t["l_discount"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)[m]
        supp = np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False),
                          np.int64)[m]
        tt = pa.table({"s_suppkey": pa.array(supp, pa.int64()),
                       "rev": pa.array(ext * (100 - disc), pa.int64())})
        g = tt.group_by("s_suppkey").aggregate([("rev", "sum")])
        return pa.table({"s_suppkey": g["s_suppkey"], "rev": g["rev_sum"]})

    per_supp = (_vgb(li.map_batches(partial, batch_format="pyarrow"), "s_suppkey", Sum("rev", alias_name="total_rev_e4")))
    bar = per_supp.max("total_rev_e4")

    def winners(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["total_rev_e4"],
                                 pa.scalar(int(bar), pa.int64())))

    top = per_supp.map_batches(winners,
                               batch_format="pyarrow").to_pandas()
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_name"])
    names = dict(zip(sup["s_suppkey"].to_pylist(),
                     sup["s_name"].to_pylist()))
    top["s_name"] = top["s_suppkey"].map(names)
    top = top[["s_suppkey", "s_name", "total_rev_e4"]]
    return top.astype({"s_suppkey": "int64", "total_rev_e4": "int64"}) \
        .reset_index(drop=True)


def _q_nation_market_share(sf_dir: str):
    """TPC-H Q8 shape: a target nation's share of ECONOMY-part revenue
    sold into one region, per order year, published as the exact
    integer (numerator, denominator) pair in 1e-4 dollars.  Part
    membership and supplier→nation are broadcast into the lineitem
    scan; the fact side is pre-aggregated to one (orderkey, total,
    target) row BEFORE the two hash joins (orders window-filtered,
    customers region-filtered before joining, so the shuffle moves
    only qualifying keys); final rollup is a handful of year rows."""
    import pandas as pd
    import pyarrow as pa

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    TARGET_NATION = 2
    REGION = 2  # ASIA
    LO = np.datetime64("1996-01-01")
    HI = np.datetime64("1998-01-01")

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_type"])
    eco = np.sort(np.asarray(
        part.filter(pc.equal(part["p_type"], "ECONOMY"))["p_partkey"]
        .to_numpy(zero_copy_only=False), np.int64))
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"])
    skeys = np.asarray(sup["s_suppkey"].to_numpy(zero_copy_only=False),
                       np.int64)
    sorder = np.argsort(skeys)
    skeys = skeys[sorder]
    snat = np.asarray(sup["s_nationkey"].to_numpy(zero_copy_only=False),
                      np.int64)[sorder]
    dim_ref = ray.put((eco, skeys, snat))

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey", "l_partkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        eco_k, sk, sn = ray.get(dim_ref)
        pk = np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False),
                        np.int64)
        pos = np.searchsorted(eco_k, pk)
        pos[pos >= len(eco_k)] = 0
        m = len(eco_k) > 0
        m = (eco_k[pos] == pk) if m else np.zeros(len(pk), bool)
        ext = np.rint(np.asarray(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)[m]
        disc = np.rint(np.asarray(
            t["l_discount"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)[m]
        rev = ext * (100 - disc)
        supp = np.asarray(t["l_suppkey"].to_numpy(zero_copy_only=False),
                          np.int64)[m]
        is_target = sn[np.searchsorted(sk, supp)] == TARGET_NATION
        ok = np.asarray(t["l_orderkey"].to_numpy(zero_copy_only=False),
                        np.int64)[m]
        tt = pa.table({"l_orderkey": pa.array(ok, pa.int64()),
                       "rev": pa.array(rev, pa.int64()),
                       "target": pa.array(
                           np.where(is_target, rev, 0), pa.int64())})
        g = tt.group_by("l_orderkey").aggregate(
            [("rev", "sum"), ("target", "sum")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "rev": g["rev_sum"], "target": g["target_sum"]})

    per_order = (_vgb(li.map_batches(partial, batch_format="pyarrow"), "l_orderkey", Sum("rev", alias_name="rev"), Sum("target", alias_name="target")))

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def order_window(t: pa.Table) -> pa.Table:
        d = np.asarray(t["o_orderdate"].to_numpy(zero_copy_only=False),
                       "datetime64[us]")
        m = (d >= LO) & (d < HI)
        t = t.filter(pa.array(m))
        year = pc.cast(pc.year(t["o_orderdate"]), pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"], "o_year": year})

    orders_w = orders.map_batches(order_window, batch_format="pyarrow")

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_regionkey"])
    region_nations = set(
        nation.filter(pc.equal(nation["n_regionkey"], REGION))
        ["n_nationkey"].to_pylist())
    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_nationkey"])

    def cust_in_region(t: pa.Table) -> pa.Table:
        keep = pc.is_in(pc.cast(t["c_nationkey"], pa.int64()),
                        value_set=pa.array(sorted(region_nations),
                                           pa.int64()))
        return t.filter(keep).select(["c_custkey"])

    cust_r = cust.map_batches(cust_in_region, batch_format="pyarrow")

    per_order, parts = sized_for_join(per_order, cap=8)
    j1 = per_order.join(orders_w, join_type="inner",
                        num_partitions=parts,
                        on=("l_orderkey",), right_on=("o_orderkey",))
    j2 = j1.join(cust_r, join_type="inner", num_partitions=parts,
                 on=("o_custkey",), right_on=("c_custkey",))
    out = (j2.groupby("o_year")
           .aggregate(Sum("target", alias_name="target_rev_e4"),
                      Sum("rev", alias_name="total_rev_e4"))
           .to_pandas())
    return out.astype({"o_year": "int64", "target_rev_e4": "int64",
                       "total_rev_e4": "int64"}) \
        .sort_values("o_year").reset_index(drop=True)


def _q_epoch_price_join(sf_dir: str):
    """Point-in-time (interval) dimension join — the SCD2 lookup shape:
    an effective-dated price dimension (3 validity epochs per part,
    deterministic multiplier) joined to lineitem on key AND
    ``valid_from <= shipdate < valid_to``.  The dimension is built once
    on the driver and broadcast as two parallel arrays (sorted part
    keys + per-part multiplier base); each batch resolves its epoch
    with one ``searchsorted`` against the boundary vector and its part
    row with another — an O(log d) vectorized interval lookup, no
    shuffle, no per-row Python.  Facts fold to 3 epoch rows per batch
    (combiner) before the global rollup.  Exact 1e-4-dollar int64."""
    import pandas as pd
    import pyarrow as pa

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    BOUNDS = np.array(["1997-01-01", "1999-01-01"], "datetime64[us]")
    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey"])
    keys = np.sort(np.asarray(
        part["p_partkey"].to_numpy(zero_copy_only=False), np.int64))
    pct_base = keys % 7
    dim_ref = ray.put((keys, pct_base))

    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_partkey", "l_shipdate",
                                  "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        k, base = ray.get(dim_ref)
        ship = np.asarray(t["l_shipdate"].to_numpy(zero_copy_only=False),
                          "datetime64[us]")
        epoch = np.searchsorted(BOUNDS, ship, side="right").astype(np.int64)
        pk = np.asarray(t["l_partkey"].to_numpy(zero_copy_only=False),
                        np.int64)
        pct = 90 + 5 * epoch + base[np.searchsorted(k, pk)]
        ext = np.rint(np.asarray(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        tt = pa.table({"epoch_idx": pa.array(epoch, pa.int64()),
                       "rep": pa.array(ext * pct, pa.int64()),
                       "one": pa.array(np.ones(len(pk), np.int64))})
        g = tt.group_by("epoch_idx").aggregate(
            [("rep", "sum"), ("one", "sum")])
        return pa.table({"epoch_idx": g["epoch_idx"],
                         "rep": g["rep_sum"], "one": g["one_sum"]})

    out = (li.map_batches(partial, batch_format="pyarrow")
           .groupby("epoch_idx")
           .aggregate(Sum("rep", alias_name="repriced_e4"),
                      Sum("one", alias_name="n_items"))
           .to_pandas())
    return out.astype({"epoch_idx": "int64", "repriced_e4": "int64",
                       "n_items": "int64"}) \
        .sort_values("epoch_idx").reset_index(drop=True)


def _q_outlinks(sf_dir: str):
    """Outlink-graph extraction from raw HTML payloads — the web-native
    companion to the content extractor: every page's anchors are pulled
    with one compiled ``href`` regex over the raw bytes (engine-kernel
    class: per-row parse, columnar everywhere else), counted per batch
    into a tiny (target, n) combiner table, and rolled up to one row
    per link target.  PDF and poison payloads contain no anchors by
    construction, so no routing branch is needed — the kernel is total
    over the page universe."""
    import collections
    import re

    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    pages_dir, _ = _pages(sf_dir)
    ds = rd.read_parquet(pages_dir, columns=["html"])
    href = re.compile(rb'href="([^"]*)"')

    def links(t: pa.Table) -> pa.Table:
        ctr: collections.Counter = collections.Counter()
        for payload in t["html"].to_pylist():
            ctr.update(href.findall(payload or b""))
        return pa.table({
            "target": pa.array([k.decode("utf-8") for k in ctr],
                               pa.string()),
            "n_links": pa.array([int(v) for v in ctr.values()],
                                pa.int64()),
        })

    return (ds.map_batches(links, batch_format="pyarrow")
            .groupby("target")
            .aggregate(Sum("n_links", alias_name="n_links")))


def _q_seq_pattern(sf_dir: str):
    """MATCH_RECOGNIZE-shape sequence pattern matching: each user's
    event history becomes a compact symbol string (type initials in
    (ts, event_id) order — the deterministic tie-break both engines
    share), and a compiled regex counts non-overlapping ``vc*p``
    funnels (view, any clicks, purchase) per user.  Hash-partitioned
    ``groupby(user).map_groups`` — each group is one user's bounded
    history; the regex kernel is O(|seq|) per user."""
    import re

    import pandas as pd
    import ray.data as rd

    pat = re.compile("vc*p")
    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    from pmocr_ray.ops.events import _user_bucketed

    def seq_bucket(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as _pa
        import pyarrow.compute as _pc

        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        usr = df["user_id"].to_numpy()
        sym = df["event_type"].str[0].to_numpy()
        starts = np.flatnonzero(np.concatenate([[True],
                                                usr[1:] != usr[:-1]]))
        offsets = np.concatenate([starts, [len(usr)]]).astype(np.int64)
        la = _pa.LargeListArray.from_arrays(
            _pa.array(offsets, _pa.int64()), _pa.array(sym, _pa.string()))
        seqs = _pc.binary_join(la, "").to_pylist()
        # the regex kernel stays per USER (bounded history), the only
        # inherently scalar step
        return pd.DataFrame({
            "user_id": usr[starts].astype("int64"),
            "seq": seqs,
            "n_hits": [len(pat.findall(q)) for q in seqs],
        })

    out = _user_bucketed(ev, seq_bucket).to_pandas()
    return out.astype({"user_id": "int64", "n_hits": "int64"}) \
        .sort_values("user_id").reset_index(drop=True)


def _q_grouped_regression(sf_dir: str):
    """Per-group OLS via sufficient statistics: for each lang, the
    slope of chars-vs-tokens published as the exact integer pair
    (n·Σxy − Σx·Σy, n·Σx² − (Σx)²) — the consumer divides.  Each batch
    folds to ≤|langs| rows of 5 int64 moments (combiner) before one
    tiny groupby; nothing float crosses the shuffle, so the result is
    bit-reproducible under any partitioning."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["lang", "text"])

    def moments(t: pa.Table) -> pa.Table:
        # null text → 0-moment contribution, identical to SQL's
        # null-skipping sum (adding zero) while count(*) still counts
        txt = pc.fill_null(t["text"], "")
        x = pc.count_substring_regex(txt, r"\S+").cast(pa.int64())
        y = pc.utf8_length(txt).cast(pa.int64())
        xn = np.asarray(x.to_numpy(zero_copy_only=False), np.int64)
        yn = np.asarray(y.to_numpy(zero_copy_only=False), np.int64)
        tt = pa.table({"lang": t["lang"],
                       "n": pa.array(np.ones(len(t), np.int64)),
                       "sx": pa.array(xn), "sy": pa.array(yn),
                       "sxy": pa.array(xn * yn), "sxx": pa.array(xn * xn)})
        g = tt.group_by("lang").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxy", "sum"), ("sxx", "sum")])
        return g.rename_columns(["lang", "n", "sx", "sy", "sxy", "sxx"])

    agg = (docs.map_batches(moments, batch_format="pyarrow")
           .groupby("lang")
           .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                      Sum("sy", alias_name="sy"),
                      Sum("sxy", alias_name="sxy"),
                      Sum("sxx", alias_name="sxx"))
           .to_pandas())
    agg["slope_num"] = agg["n"] * agg["sxy"] - agg["sx"] * agg["sy"]
    agg["slope_den"] = agg["n"] * agg["sxx"] - agg["sx"] * agg["sx"]
    out = agg[["lang", "n", "slope_num", "slope_den"]].astype(
        {"n": "int64", "slope_num": "int64", "slope_den": "int64"})
    return out.sort_values("lang").reset_index(drop=True)


def _q_csv_roundtrip(sf_dir: str):
    """CSV source + sink coverage: the metadata projection of the
    corpus is written as sharded CSV (one file per block — the same
    resumable-partition discipline as the parquet sinks), read back
    with the CSV source, and rolled up per lang.  Quoting-safe by
    construction (int/short-string columns only); the oracle aggregates
    the same projection straight from parquet, so a roundtrip fault
    (type coercion, header loss, row drop) breaks the hash."""
    import shutil

    import ray.data as rd
    from ray.data.aggregate import Sum

    out = os.path.join("/tmp/pmocr_ray_csv",
                       os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "lang", "n_chars"])
    docs.write_csv(out)
    back = rd.read_csv(out)

    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({"lang": t["lang"],
                       "n_docs": pa.array(np.ones(len(t), np.int64)),
                       "sum_chars": pc.cast(t["n_chars"], pa.int64())})
        g = tt.group_by("lang").aggregate(
            [("n_docs", "sum"), ("sum_chars", "sum")])
        return g.rename_columns(["lang", "n_docs", "sum_chars"])

    return (back.map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("sum_chars", alias_name="sum_chars")))


def _q_lang_profiles(sf_dir: str):
    """Distributed n-gram model training: per-lang char-bigram count
    profiles (top 10, deterministic (-count, bigram) tie-break, rank
    emitted as a value column).  The counting kernel is fully
    vectorized — each batch concatenates one lang's texts with a NUL
    separator, views the bytes as uint8, forms bigram codes with one
    multiply-add, and ``bincount``s them; only (lang, code, n) partials
    cross the shuffle (≤65k rows per lang per batch, typically ~10³).
    Corpus texts are ASCII so byte bigrams equal the oracle's char
    bigrams."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["lang", "text"])

    def count_bigrams(t: pa.Table) -> pa.Table:
        langs_out, codes_out, ns_out = [], [], []
        langs = t["lang"].to_pylist()
        texts = t["text"].to_pylist()
        by_lang: dict[str, list[str]] = {}
        for lg, tx in zip(langs, texts):
            by_lang.setdefault(lg, []).append(tx or "")
        for lg, txts in by_lang.items():
            blob = np.frombuffer("\x00".join(txts).encode("utf-8"),
                                 np.uint8)
            if len(blob) < 2:
                continue
            a, b = blob[:-1].astype(np.int32), blob[1:].astype(np.int32)
            codes = a * 256 + b
            codes = codes[(a != 0) & (b != 0)]
            cnt = np.bincount(codes, minlength=65536)
            nz = np.nonzero(cnt)[0]
            langs_out.extend([lg] * len(nz))
            codes_out.extend(nz.tolist())
            ns_out.extend(cnt[nz].tolist())
        return pa.table({"lang": pa.array(langs_out, pa.string()),
                         "code": pa.array(codes_out, pa.int64()),
                         "n": pa.array(ns_out, pa.int64())})

    # lang × 65536 possible groups — Arrow-bucketed merge
    per_code = _vgb(docs.map_batches(count_bigrams,
                                     batch_format="pyarrow"),
                    ["lang", "code"], Sum("n", alias_name="n"))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["bigram"] = [chr(c >> 8) + chr(c & 255) for c in g["code"]]
        g = g.sort_values(["n", "bigram"],
                          ascending=[False, True]).head(10)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["lang", "bigram", "n", "rank"]]

    out = (per_code.groupby("lang")
           .map_groups(topk, batch_format="pandas").to_pandas())
    return out.astype({"n": "int64", "rank": "int64"}) \
        .sort_values(["lang", "rank"]).reset_index(drop=True)


def _q_fk_audit(sf_dir: str):
    """Referential-integrity audit across the star schema: for each FK
    edge, the count of DISTINCT fact keys with no dimension match.
    Fact keys are uniqued per batch (combiner) then globally, and the
    membership test is the Bloom-prefiltered exact anti-join
    (ops/joins.bloom_anti_join) — the fixed-size-bitmap shape that
    scales to dimensions too large to broadcast.  The events edge is
    deliberately included as a *broken* FK so the audit demonstrably
    detects orphans, not just confirms zeros."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import Count

    from pmocr_ray.ops.joins import bloom_anti_join

    def n_orphans(fact_file: str, fact_col: str,
                  dim_file: str, dim_col: str) -> int:
        fact = rd.read_parquet(os.path.join(sf_dir, fact_file),
                               columns=[fact_col])

        def uniq(t: pa.Table) -> pa.Table:
            vals = np.unique(np.asarray(
                t[fact_col].to_numpy(zero_copy_only=False), np.int64))
            return pa.table({fact_col: pa.array(vals, pa.int64())})

        # anti-join FIRST (map-only for definite non-members), distinct
        # AFTER — the global groupby then runs over the orphan set only,
        # not the full fact key domain
        keys = fact.map_batches(uniq, batch_format="pyarrow")
        dim = rd.read_parquet(os.path.join(sf_dir, dim_file),
                              columns=[dim_col])
        orphans = bloom_anti_join(keys, dim, on=fact_col,
                                  right_on=dim_col)
        from pmocr_ray.ops.vecagg import distinct as _vec_distinct

        return _vec_distinct(orphans, [fact_col]).count()

    EDGES = [
        ("lineitem.l_orderkey->orders", "lineitem.parquet", "l_orderkey",
         "orders.parquet", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem.parquet", "l_partkey",
         "part.parquet", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem.parquet", "l_suppkey",
         "supplier.parquet", "s_suppkey"),
        ("orders.o_custkey->customer", "orders.parquet", "o_custkey",
         "customer.parquet", "c_custkey"),
        ("events.user_id->customer", "events.parquet", "user_id",
         "customer.parquet", "c_custkey"),
    ]
    # serial on purpose: overlapping these pipelines from driver
    # threads races Ray Data's lazy fsspec imports (observed
    # ImportError under a ThreadPoolExecutor); each edge is seconds
    rows = [(name, n_orphans(ff, fc, df, dc))
            for name, ff, fc, df, dc in EDGES]
    return pd.DataFrame(rows, columns=["fk", "n_orphans"]).astype(
        {"n_orphans": "int64"})


def _q_stream_windows(sf_dir: str):
    """Streaming tumbling windows with watermark-gated emission
    (ops/streaming.streaming_windows): arrival-ordered chunks feed
    window-hashed stateful actors; complete windows emit as the
    watermark passes them.  Final rows equal the batch
    ``late_data_window`` — same SQL oracle."""
    import ray.data as rd

    from pmocr_ray.ops.streaming import streaming_windows

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "ts"])
    out = os.path.join("/tmp/pmocr_ray_stream_wspool",
                       os.path.basename(os.path.normpath(sf_dir)))
    return streaming_windows(ev, n_chunks=5, n_buckets=4, spool_dir=out)


def _q_stream_new_users(sf_dir: str):
    """Streaming first-seen index (ops/streaming.streaming_first_seen):
    per-bucket membership actors absorb time-ordered chunks and emit
    only never-seen keys — the shared-mutable-index pattern.  Output
    equals the batch min-day rollup; same oracle as new_users_curve."""
    import ray.data as rd

    from pmocr_ray.ops.streaming import streaming_first_seen

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts"])
    out = os.path.join("/tmp/pmocr_ray_stream_fspool",
                       os.path.basename(os.path.normpath(sf_dir)))
    return streaming_first_seen(ev, n_chunks=5, n_buckets=4,
                                spool_dir=out)


def _q_stream_sessions(sf_dir: str):
    """Stateful-streaming sessionization: the events log is spooled as
    a hive-partitioned (chunk=time-range, bucket=user-hash) log and
    consumed chunk-by-chunk by a pool of stateful actors carrying open
    sessions between chunks (ops/streaming.py).  Equals the batch
    ``sessionize`` for any chunking — checked against the identical
    SQL oracle."""
    import ray.data as rd

    from pmocr_ray.ops.streaming import streaming_sessionize

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts", "event_id"])
    out = os.path.join("/tmp/pmocr_ray_stream_spool",
                       os.path.basename(os.path.normpath(sf_dir)))
    return streaming_sessionize(ev, n_chunks=5, n_buckets=4,
                                spool_dir=out)


def _q_top_parts_per_brand(sf_dir: str):
    """Per-group top-k as a CUSTOM DISTRIBUTIVE AGGREGATE: a bounded
    k-candidate state per (group, block) accumulated vectorized, merged
    associatively across blocks — per-group top-3 without ``map_groups``
    and without ever co-locating a group's full row set.  The k-bounded
    state is what makes the shuffle O(groups·k) regardless of group
    size (contrast: ``map_groups`` moves every row of a hot group to
    one worker).  Deterministic (-price, partkey) order; exploded to
    (brand, rank, part, price) rows after the aggregate."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import AggregateFn

    K = 3

    def acc_block(state, block):
        price = np.rint(np.asarray(
            block["p_retailprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        ids = np.asarray(block["p_partkey"].to_numpy(zero_copy_only=False),
                         np.int64)
        cand = state + list(zip(price.tolist(), ids.tolist()))
        cand.sort(key=lambda t: (-t[0], t[1]))
        return cand[:K]

    def merge(a, b):
        m = a + b
        m.sort(key=lambda t: (-t[0], t[1]))
        return m[:K]

    top3 = AggregateFn(
        init=lambda k: [],
        accumulate_block=acc_block,
        merge=merge,
        name="top3",
    )
    part = rd.read_parquet(os.path.join(sf_dir, "part.parquet"),
                           columns=["p_brand", "p_partkey",
                                    "p_retailprice"])
    rows = part.groupby("p_brand").aggregate(top3).take_all()
    out = [(r["p_brand"], rank + 1, int(pid), int(price))
           for r in rows
           for rank, (price, pid) in enumerate(r["top3"])]
    return pd.DataFrame(out, columns=["p_brand", "rank", "p_partkey",
                                      "price_cents"]).astype(
        {"rank": "int64", "p_partkey": "int64", "price_cents": "int64"}) \
        .sort_values(["p_brand", "rank"]).reset_index(drop=True)


def _q_page_meta(sf_dir: str):
    """Structured-metadata extraction from raw HTML: <title> text and
    the html lang attribute pulled with vectorized binary-regex kernels
    (``pc.extract_regex`` straight over the payload bytes — no decode
    pass, no per-row Python).  Non-HTML payloads (PDF, poison) match
    nothing and yield nulls, so the kernel is total over the page
    universe — the metadata companion to the main-content extractor."""
    import pyarrow as pa

    import ray.data as rd

    pages_dir, _ = _pages(sf_dir)
    ds = rd.read_parquet(pages_dir, columns=["url", "html"])

    def meta(t: pa.Table) -> pa.Table:
        title = pc.cast(pc.struct_field(
            pc.extract_regex(t["html"],
                             r"<title>(?P<t>[^<]*)</title>"), "t"),
            pa.string())
        lang = pc.cast(pc.struct_field(
            pc.extract_regex(t["html"],
                             r'<html lang="(?P<l>[a-z]+)">'), "l"),
            pa.string())
        return pa.table({"url": t["url"], "title": title,
                         "html_lang": lang})

    return ds.map_batches(meta, batch_format="pyarrow")


def _q_user_type_mask_agg(sf_dir: str):
    """Second physical plan for the feature bitmask: a custom
    bitwise-OR ``AggregateFn`` (OR is idempotent + associative, so a
    one-int64 state per group is exact under any partitioning — no
    distinct pass needed at all, unlike the sum-over-distinct-bits
    plan).  Same oracle as user_type_mask: the gate proves both plans
    agree."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from ray.data.aggregate import AggregateFn

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_type"])

    def with_bits(t: pa.Table) -> pa.Table:
        bits = np.array([1 << _TYPE_BITS[x]
                         for x in t["event_type"].to_pylist()], np.int64)
        return pa.table({"user_id": t["user_id"],
                         "bit": pa.array(bits, pa.int64())})

    bit_or = AggregateFn(
        init=lambda k: 0,
        accumulate_block=lambda s, blk: s | int(
            np.bitwise_or.reduce(np.asarray(
                blk["bit"].to_numpy(zero_copy_only=False), np.int64))),
        merge=lambda a, b: a | b,
        name="mask",
    )
    rows = (ev.map_batches(with_bits, batch_format="pyarrow")
            .groupby("user_id").aggregate(bit_or).take_all())
    return pd.DataFrame(rows)[["user_id", "mask"]].astype(
        {"user_id": "int64", "mask": "int64"}) \
        .sort_values("user_id").reset_index(drop=True)


def _q_federated_union(sf_dir: str):
    """Heterogeneous-source federation: even-id rows stay in Parquet,
    odd-id rows round-trip through a sharded CSV sink+source, and
    ``Dataset.union`` of the two feeds one rollup — proving the union
    operator and the CSV codec reproduce the single-source result
    bit-for-bit (same oracle as the all-parquet rollup)."""
    import shutil

    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "lang", "n_chars"])

    def half(t: pa.Table, even: bool) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False),
                         np.int64)
        return t.filter(pa.array((ids % 2 == 0) == even))

    out = os.path.join("/tmp/pmocr_ray_fed_csv",
                       os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    docs.map_batches(half, fn_kwargs={"even": False},
                     batch_format="pyarrow").write_csv(out)
    odd_back = rd.read_csv(out)
    even = docs.map_batches(half, fn_kwargs={"even": True},
                            batch_format="pyarrow")
    both = even.union(odd_back)

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({"lang": t["lang"],
                       "n_docs": pa.array(np.ones(len(t), np.int64)),
                       "sum_chars": pc.cast(t["n_chars"], pa.int64())})
        g = tt.group_by("lang").aggregate(
            [("n_docs", "sum"), ("sum_chars", "sum")])
        return g.rename_columns(["lang", "n_docs", "sum_chars"])

    return (both.map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("sum_chars", alias_name="sum_chars")))


def _q_pdf_target_roundtrip(sf_dir: str):
    """The reference's PRIMARY output format closed under this engine:
    extracted text → searchable-PDF target (targets.pdf_transform) →
    PDF parser → byte-compare.  Writer and parser are exact inverses;
    every extracted document roundtrips.  The oracle asserts ok=1 for
    exactly the rows whose extraction produced text — the Ray side
    EARNS each 1 by building and re-parsing a real PDF payload."""
    import pyarrow as pa

    import ray.data as rd

    ds = rd.read_parquet(_extraction_output_dir(sf_dir),
                         columns=["url", "extracted_text"])

    def roundtrip(t: pa.Table) -> pa.Table:
        from pmocr_ray.extract.pdf_extractor import extract_pdf
        from pmocr_ray.targets import pdf_transform

        t2 = pdf_transform(t)
        urls, oks = [], []
        for url, txt, pdf in zip(t2["url"].to_pylist(),
                                 t2["extracted_text"].to_pylist(),
                                 t2["pdf"].to_pylist()):
            if txt is None:
                continue
            urls.append(url)
            oks.append(int(extract_pdf(pdf) == txt))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "roundtrip_ok": pa.array(oks, pa.int64())})

    return ds.map_batches(roundtrip, batch_format="pyarrow")


def _q_docx_target_roundtrip(sf_dir: str):
    """The reference's WORD output target closed under this engine:
    extracted text → minimal real docx (targets.docx_transform, a ZIP
    of WordprocessingML built from the stdlib) → docx parser →
    byte-compare.  Writer and parser are exact inverses; every
    extracted document roundtrips.  Same gate shape as
    ``pdf_target_roundtrip`` — the Ray side EARNS each ok=1 by
    building and re-parsing a real docx payload."""
    import pyarrow as pa

    import ray.data as rd

    ds = rd.read_parquet(_extraction_output_dir(sf_dir),
                         columns=["url", "extracted_text"])

    def roundtrip(t: pa.Table) -> pa.Table:
        from pmocr_ray.extract.docx_extractor import extract_docx
        from pmocr_ray.targets import docx_transform

        t2 = docx_transform(t)
        urls, oks = [], []
        for url, txt, doc in zip(t2["url"].to_pylist(),
                                 t2["extracted_text"].to_pylist(),
                                 t2["docx"].to_pylist()):
            if txt is None:
                continue
            urls.append(url)
            oks.append(int(extract_docx(doc) == txt))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "roundtrip_ok": pa.array(oks, pa.int64())})

    return ds.map_batches(roundtrip, batch_format="pyarrow")


def _q_xlsx_target_roundtrip(sf_dir: str):
    """The reference's EXCEL output target closed under this engine:
    extracted text → minimal real xlsx (targets.xlsx_transform, a ZIP
    of SpreadsheetML with one inline-string cell per ;-field — the
    CSV-hack delimiter, pmocr.sh:2013-2043) → xlsx parser →
    byte-compare.  Writer and parser are exact inverses; every
    extracted document roundtrips.  Same gate shape as
    ``docx_target_roundtrip``."""
    import pyarrow as pa

    import ray.data as rd

    ds = rd.read_parquet(_extraction_output_dir(sf_dir),
                         columns=["url", "extracted_text"])

    def roundtrip(t: pa.Table) -> pa.Table:
        from pmocr_ray.extract.xlsx_extractor import extract_xlsx
        from pmocr_ray.targets import xlsx_transform

        t2 = xlsx_transform(t)
        urls, oks = [], []
        for url, txt, doc in zip(t2["url"].to_pylist(),
                                 t2["extracted_text"].to_pylist(),
                                 t2["xlsx"].to_pylist()):
            if txt is None:
                continue
            urls.append(url)
            oks.append(int(extract_xlsx(doc) == txt))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "roundtrip_ok": pa.array(oks, pa.int64())})

    return ds.map_batches(roundtrip, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # extraction pipeline family (pages fixture derived from documents)
        "pages_gen": _q_pages_gen,
        "pages_lang_en": _q_pages_lang_en,
        "distinct_langs": _q_distinct_langs,
        "sniff_route": _q_sniff_route,
        "extract_flagship": _q_flagship,
        "extract_html": _q_extract_html,
        "extract_pdf": _q_extract_pdf,
        "skip_existing": _q_skip_existing,
        "quarantine": _q_quarantine,
        "done_skip": _q_done_skip,
        "status_counts": _q_status_counts,
        "csv_hack": _q_csv_hack,
        "jsonl_format": _q_jsonl_format,
        "retry_redrive": _q_retry_redrive,
        # text analysis
        "text_stats": _q_text_stats,
        "len_histogram": _q_len_histogram,
        "doc_fingerprint": _q_fingerprint,
        "lang_id": _q_lang_id,
        "quality_score": _q_quality,
        # dedup
        "dedup_exact": _q_dedup_exact,
        "dedup_pairs_exact": _q_dedup_pairs_exact,
        "dedup_minhash": _q_dedup_minhash,
        "dedup_ngram": _q_dedup_ngram,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_embedding": _q_dedup_embedding,
        "semdedup": _q_semdedup,
        "dedup_embedding_lsh": _q_dedup_embedding_lsh,
        # similarity search
        "knn_cosine": _q_knn,
        "knn_multi": _q_knn_multi,
        "knn_ivf": _q_knn_ivf,
        "knn_ivf_indexed": _q_knn_ivf_indexed,
        # driver-sample window: the flagship compositions + one
        # representative of every remaining family, placed here so the
        # driver's 50-query CORRECTNESS sample (first 50 dict entries)
        # spans the whole engine, not just the front families
        "curate": _q_curate,
        "corpus_build": _q_corpus_build,
        "pagerank": _q_pagerank,
        "pack_sequences": _q_pack_sequences,
        "bucketed_join": _q_bucketed_join,
        "line_dedup": _q_line_dedup,
        "decontaminate": _q_decontaminate,
        "stream_sessions": _q_stream_sessions,
        "media_resize_real": _q_media_resize_real,
        "media_jpeg_real": _q_media_jpeg_real,
        "media_gif_real": _q_media_gif_real,
        "audio_resample_real": _q_audio_resample_real,
        "frame_sample_real": _q_frame_sample_real,
        "url_canon_dedup": _q_url_canon_dedup,
        "rare_term_pairs": _q_rare_term_pairs,
        "token_budget": _q_token_budget,
        # events / aggregates
        "events_window": _q_events_window,
        "top_users": _q_top_users,
        "sessionize": _q_sessionize,
        "lineitem_agg": _q_lineitem_agg,
        "top_docs_by_len": _q_top_docs_by_len,
        "orders_by_segment": _q_orders_by_segment,
        "revenue_by_nation": _q_revenue_by_nation,
        "top_terms": _q_top_terms,
        "host_stats": _q_host_stats,
        "mirror_hosts": _q_mirror_hosts,
        "hash_sample": _q_hash_sample,
        "doc_freq": _q_doc_freq,
        "host_cap": _q_host_cap,
        "asof_click_view": _q_asof_click_view,
        "props_agg": _q_props_agg,
        "top_events_per_user": _q_top_events_per_user,
        "window_distinct_users": _q_window_distinct_users,
        "event_pivot": _q_event_pivot,
        "hopping_window": _q_hopping_window,
        "customers_no_f_orders": _q_customers_no_f_orders,
        "customers_no_f_orders_bloom": _q_customers_no_f_orders_bloom,
        "customers_no_f_orders_native": _q_customers_no_f_orders_native,
        "lang_len_quantiles": _q_lang_len_quantiles,
        "label_centroids": _q_label_centroids,
        "orders_running_total": _q_orders_running_total,
        "shuffle_rank": _q_shuffle_rank,
        "events_value_stats": _q_events_value_stats,
        "tfidf": _q_tfidf,
        "kmv_sketch": _q_kmv_sketch,
        "clean_text": _q_clean_text,
        "dedup_incremental": _q_dedup_incremental,
        "lang_label_mix": _q_lang_label_mix,
        "cc_chain": _q_cc_chain,
        "latest_order": _q_latest_order,
        "trending_terms": _q_trending_terms,
        "len_percentile": _q_len_percentile,
        "kmeans_cells": _q_kmeans_cells,
        "kmeans_assign1": _q_kmeans_assign1,
        "lm_score": _q_lm_score,
        "lm_bigram_counts": _q_lm_bigram_counts,
        "quantize_embeddings": _q_quantize_embeddings,
        "span_extract": _q_span_extract,
        "events_with_session": _q_events_with_session,
        "len_bucket": _q_len_bucket,
        "funnel_stages": _q_funnel_stages,
        "hourly_retention": _q_hourly_retention,
        "webdataset_audit": _q_webdataset_audit,
        # curation / export ops
        "redact_pii": _q_redact_pii,
        "repetition_stats": _q_repetition_stats,
        "stratified_sample": _q_stratified_sample,
        "len_quantiles": _q_len_quantiles,
        "shard_counts": _q_shard_counts,
        "chunk_tokens": _q_chunk_tokens,
        "line_self_dedup": _q_line_self_dedup,
        "split_assign": _q_split_assign,
        "dup_spans": _q_dup_spans,
        "remove_dup_spans": _q_remove_dup_spans,
        "event_transitions": _q_event_transitions,
        "inter_arrival": _q_inter_arrival,
        "incremental_near_dedup": _q_incremental_near_dedup,
        "clip_outliers": _q_clip_outliers,
        "bpe_pairs": _q_bpe_pairs,
        "shipping_priority": _q_shipping_priority,
        "zorder": _q_zorder,
        "keyword_search": _q_keyword_search,
        "heavy_hitters": _q_heavy_hitters,
        "zorder_scan": _q_zorder_scan,
        "pps_sample": _q_pps_sample,
        "distinct_by_type": _q_distinct_by_type,
        "domain_reweight": _q_domain_reweight,
        "dsir_weights": _q_dsir_weights,
        "posting_lists": _q_posting_lists,
        "gopher_quality": _q_gopher_quality,
        "c4_filter": _q_c4_filter,
        "ntile_buckets": _q_ntile_buckets,
        "rollup_orders": _q_rollup_orders,
        "collocations": _q_collocations,
        "snapshot_diff": _q_snapshot_diff,
        "dup_cluster_hist": _q_dup_cluster_hist,
        "attribution": _q_attribution,
        "host_blocklist": _q_host_blocklist,
        "host_mirror": _q_host_mirror,
        "cheapest_supplier": _q_cheapest_supplier,
        "local_supplier_revenue": _q_local_supplier_revenue,
        "late_data_window": _q_late_data_window,
        "typo_pairs": _q_typo_pairs,
        "host_lang": _q_host_lang,
        "incremental_stats": _q_incremental_stats,
        "event_debounce": _q_event_debounce,
        "promo_revenue": _q_promo_revenue,
        "embedding_dim_stats": _q_embedding_dim_stats,
        "triangle_count": _q_triangle_count,
        "moving_window": _q_moving_window,
        "range_scan": _q_range_scan,
        "skew_join": _q_skew_join,
        "value_trend": _q_value_trend,
        "value_mad": _q_value_mad,
        "host_churn": _q_host_churn,
        "table_extract": _q_table_extract,
        "session_sets": _q_session_sets,
        "byte_blocks": _q_byte_blocks,
        "schema_evolve": _q_schema_evolve,
        "priority_semi": _q_priority_semi,
        "priority_semi_native": _q_priority_semi_native,
        "user_type_mask_agg": _q_user_type_mask_agg,
        "federated_union": _q_federated_union,
        "pdf_target_roundtrip": _q_pdf_target_roundtrip,
        "docx_target_roundtrip": _q_docx_target_roundtrip,
        "xlsx_target_roundtrip": _q_xlsx_target_roundtrip,
        "cust_order_dist": _q_cust_order_dist,
        "sentence_stats": _q_sentence_stats,
        "basket_pairs": _q_basket_pairs,
        "scd2_dim": _q_scd2_dim,
        "returned_top_customers": _q_returned_top_customers,
        "big_spender_filter": _q_big_spender_filter,
        "lineitem_unpivot": _q_lineitem_unpivot,
        "keep_best_dedup": _q_keep_best_dedup,
        "wow_change": _q_wow_change,
        "supplier_variety": _q_supplier_variety,
        "new_users_curve": _q_new_users_curve,
        "revenue_concentration": _q_revenue_concentration,
        "users_all_types": _q_users_all_types,
        "user_top_type": _q_user_top_type,
        "daily_fill_gaps": _q_daily_fill_gaps,
        "pareto_orders": _q_pareto_orders,
        "weighted_disc": _q_weighted_disc,
        "bfs_layers": _q_bfs_layers,
        "value_gini": _q_value_gini,
        "repeat_orders_7d": _q_repeat_orders_7d,
        "profile_orders": _q_profile_orders,
        "props_value_cov": _q_props_value_cov,
        "nation_matrix": _q_nation_matrix,
        "diverse_top_docs": _q_diverse_top_docs,
        "user_value_norm": _q_user_value_norm,
        "join_card_est": _q_join_card_est,
        "contamination_frac": _q_contamination_frac,
        "table_checksum": _q_table_checksum,
        "cube_rollup": _q_cube_rollup,
        "orders_above_cust_avg": _q_orders_above_cust_avg,
        "time_multi_rollup": _q_time_multi_rollup,
        "user_type_mask": _q_user_type_mask,
        "median_interp": _q_median_interp,
        "region_revenue": _q_region_revenue,
        "trailing_active_users": _q_trailing_active_users,
        "user_streaks": _q_user_streaks,
        "type_cooccur_lift": _q_type_cooccur_lift,
        "nation_region_share": _q_nation_region_share,
        "doc_len_pct_in_lang": _q_doc_len_pct_in_lang,
        "nation_pair_flows": _q_nation_pair_flows,
        "sole_returner_suppliers": _q_sole_returner_suppliers,
        "ks_lang_len": _q_ks_lang_len,
        "order_backlog": _q_order_backlog,
        "weighted_median_price": _q_weighted_median_price,
        "vocab_overlap": _q_vocab_overlap,
        "rfm_scores": _q_rfm_scores,
        "emb_norm_outliers": _q_emb_norm_outliers,
        "cohort_retention": _q_cohort_retention,
        "rank_fusion": _q_rank_fusion,
        "daily_anomalies": _q_daily_anomalies,
        "small_order_revenue": _q_small_order_revenue,
        "large_orders": _q_large_orders,
        "contingency_chi2": _q_contingency_chi2,
        "cov_matrix": _q_cov_matrix,
        "disjunctive_brackets": _q_disjunctive_brackets,
        "top_supplier_rev": _q_top_supplier_rev,
        "nation_market_share": _q_nation_market_share,
        "epoch_price_join": _q_epoch_price_join,
        "outlinks": _q_outlinks,
        "page_meta": _q_page_meta,
        "seq_pattern": _q_seq_pattern,
        "grouped_regression": _q_grouped_regression,
        "csv_roundtrip": _q_csv_roundtrip,
        "lang_profiles": _q_lang_profiles,
        "fk_audit": _q_fk_audit,
        "stream_windows": _q_stream_windows,
        "stream_new_users": _q_stream_new_users,
        "top_parts_per_brand": _q_top_parts_per_brand,
        # composed curation
        # multimodal
        "media_meta": _q_media_meta,
        "media_png_real": _q_media_png_real,
        "media_tiff_real": _q_media_tiff_real,
        "gif_frames_real": _q_gif_frames_real,
        "media_resize": _q_media_resize,
        "audio_meta": _q_audio_meta,
        "audio_g711_real": _q_audio_g711_real,
        "frame_sample": _q_frame_sample,
    }


# ------------------------------------------------------------- oracle SQL

# Shared fragment: the page universe — documents × rep, with class and url
# derived exactly as in pmocr_ray/schema.py.
_PAGE_CTE = f"""
WITH p AS (
  SELECT d.doc_id, d.text, d.lang,
         (d.doc_id * {REPS} + r.range) AS seq, r.range AS rep
  FROM documents d CROSS JOIN range({REPS}) r
), c AS (
  SELECT doc_id, text, lang, seq, rep, seq % 20 AS cls,
         'https://site' || (seq % 997) || '.example/page/' || doc_id || '-' || rep AS url
  FROM p
)
"""

_CT_EXPR = """
  CASE WHEN cls BETWEEN 11 AND 15 THEN 'pdf'
       WHEN cls = 18 THEN (CASE WHEN (doc_id + rep) % 2 = 0 THEN 'pdf' ELSE 'html' END)
       ELSE 'html' END
"""

_STATUS_EXPR = """
  CASE WHEN cls BETWEEN 14 AND 15 THEN 'skipped_existing_text'
       WHEN cls BETWEEN 16 AND 17 THEN 'skipped_suffix'
       WHEN cls = 18 THEN 'failed'
       ELSE 'done' END
"""

_ATTEMPTS_EXPR = """
  CASE WHEN cls <= 13 OR cls = 19 THEN 1 WHEN cls = 18 THEN 2 ELSE 0 END
"""

_EXTRACTED_EXPR = """
  CASE WHEN cls <= 15 THEN text
       WHEN cls = 19 THEN rtrim(repeat(text || ' ', 200))
       ELSE NULL END
"""


# Word-3-gram / char-5-gram shingle CTEs: the exact shingle sets the
# Jaccard verify kernel builds (pmocr_ray/ops/dedup.py jaccard()), so
# DuckDB recomputes the SAME verified pair set + jaccard values.
_WORD_SHINGLES_CTE = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_distinct(list_transform(range(1, len(w) - 1),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
              ELSE list_value(array_to_string(w, ' ')) END AS s
  FROM toks WHERE len(w) > 0
)
"""

_CHAR_SHINGLES_CTE = r"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(length(text) - 4, 1) + 1),
           i -> substring(text, i, 5))) AS s
  FROM documents WHERE text IS NOT NULL AND text <> ''
)
"""

# Inverted-index form of the all-pairs Jaccard: identical result set
# to the naive n^2 list_intersect self-join (jaccard > 0 requires at
# least one shared shingle, and |A∪B| = |A|+|B|-|A∩B|), but candidate
# generation is a hash join on the shingle postings instead of 12.5M
# pairwise list intersections — the n^2 form wedged the sf0.1
# heavy-tail selfcheck for 25+ minutes on char-5-gram lists (~290
# shingles/doc); this form runs in ~70 s there and is term-for-term
# equal at sf0.01 (verified before the swap).
_PAIR_JACCARD_SQL = """
, sizes AS (
  SELECT doc_id, len(s) AS n FROM sh
), post AS (
  SELECT doc_id, unnest(s) AS g FROM sh
), inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM post x JOIN post y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT a, b, jaccard FROM (
  SELECT a, b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
  FROM inter JOIN sizes sa ON sa.doc_id = a
             JOIN sizes sb ON sb.doc_id = b
) WHERE jaccard >= 0.8
"""

# (a, b)-only variant for composite oracles (curate / corpus_build)
# whose pair CTE only feeds component labeling — same inverted-index
# candidate generation, no jaccard column
_PAIR_AB_INVERTED = """
, sizes AS (SELECT doc_id, len(s) AS n FROM sh),
post AS (SELECT doc_id, unnest(s) AS g FROM sh),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM post x JOIN post y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2)
SELECT a, b FROM inter
JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
"""

# quality_score arithmetic, reproduced term-for-term (same IEEE ops in
# the same order as pmocr_ray/ops/text.py quality_score)
_QUALITY_CTE = r"""
WITH q AS (
  SELECT doc_id, text,
         regexp_extract_all(text, '\S+') AS toks,
         len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
         length(text) AS n_chars
  FROM documents
), m AS (
  SELECT doc_id,
    CASE WHEN len(toks) = 0 THEN 0.0
         ELSE CAST(n_punct AS DOUBLE) / n_chars END AS punct_ratio,
    CASE WHEN len(toks) = 0 THEN 0.0
         ELSE CAST(len(list_filter(toks,
                t -> list_contains({stopwords}, lower(t)))) AS DOUBLE)
              / len(toks) END AS stopword_ratio,
    CASE WHEN len(toks) = 0 THEN 0.0
         ELSE CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
              / len(toks) END AS mean_token_len,
    len(toks) AS n_toks
  FROM q
), quality_m AS (
  SELECT doc_id, punct_ratio, stopword_ratio, mean_token_len,
    CASE WHEN n_toks = 0 THEN 0.0 ELSE
      least(1.0, CAST(n_toks AS DOUBLE) / 50.0)
      * (1.0 - least(1.0, 4.0 * punct_ratio))
      * (0.5 + least(0.5, 2.0 * stopword_ratio))
      * (CASE WHEN mean_token_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END)
    END AS quality
  FROM m
)
"""


def _quality_cte() -> str:
    from pmocr_ray.ops.text import _STOPWORDS

    stop = "[" + ", ".join(f"'{w}'" for w in sorted(_STOPWORDS)) + "]"
    return _QUALITY_CTE.replace("{stopwords}", stop)


def _lang_id_sql() -> str:
    """Generated from LangIdStage.PROFILES — the prediction is a pure
    bigram-overlap argmax, so the SQL recomputes it exactly (ties keep
    the first language in sorted order, matching the strict-> update)."""
    from pmocr_ray.ops.text import LangIdStage

    profs = {lang: sorted(frozenset(p.split()))
             for lang, p in LangIdStage.PROFILES.items()}
    langs = sorted(profs)
    score = {
        lang: (f"(CAST(len(list_intersect(bg, ["
               + ", ".join(f"'{t}'" for t in profs[lang])
               + f"])) AS DOUBLE) / {len(profs[lang])})")
        for lang in langs
    }
    cases = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"{score[lang]} >= {score[o]}"
                             for o in langs[i + 1:])
        cases.append(f"WHEN {conds} THEN '{lang}'")
    case_sql = "\n      ".join(cases)
    return f"""
WITH s0 AS (
  SELECT doc_id, text, lower(substring(text, 1, 1000)) AS s FROM documents
), b AS (
  SELECT doc_id, text,
         CASE WHEN length(s) >= 2
              THEN list_distinct(list_transform(range(1, length(s)),
                     i -> substring(s, i, 2)))
              ELSE CAST([] AS VARCHAR[]) END AS bg
  FROM s0
)
SELECT doc_id,
  CASE WHEN text IS NULL OR text = '' THEN 'und'
      {case_sql}
      ELSE '{langs[-1]}' END AS lang_pred
FROM b"""


def oracle_sql() -> dict[str, str]:
    return {
        "fk_audit": """
            SELECT 'lineitem.l_orderkey->orders' AS fk,
                   CAST(count(*) AS BIGINT) AS n_orphans
            FROM (SELECT DISTINCT l_orderkey FROM lineitem) f
            LEFT JOIN orders ON f.l_orderkey = o_orderkey
            WHERE o_orderkey IS NULL
            UNION ALL
            SELECT 'lineitem.l_partkey->part',
                   CAST(count(*) AS BIGINT)
            FROM (SELECT DISTINCT l_partkey FROM lineitem) f
            LEFT JOIN part ON f.l_partkey = p_partkey
            WHERE p_partkey IS NULL
            UNION ALL
            SELECT 'lineitem.l_suppkey->supplier',
                   CAST(count(*) AS BIGINT)
            FROM (SELECT DISTINCT l_suppkey FROM lineitem) f
            LEFT JOIN supplier ON f.l_suppkey = s_suppkey
            WHERE s_suppkey IS NULL
            UNION ALL
            SELECT 'orders.o_custkey->customer',
                   CAST(count(*) AS BIGINT)
            FROM (SELECT DISTINCT o_custkey FROM orders) f
            LEFT JOIN customer ON f.o_custkey = c_custkey
            WHERE c_custkey IS NULL
            UNION ALL
            SELECT 'events.user_id->customer',
                   CAST(count(*) AS BIGINT)
            FROM (SELECT DISTINCT user_id FROM events) f
            LEFT JOIN customer ON f.user_id = c_custkey
            WHERE c_custkey IS NULL""",
        "lang_profiles": """
            WITH bg AS (
              -- all overlapping bigrams = the two interleaved
              -- non-overlapping extractions (even + odd offsets)
              SELECT lang, unnest(regexp_extract_all(text, '..'))
                         AS bigram
              FROM documents
              UNION ALL
              SELECT lang,
                     unnest(regexp_extract_all(substr(text, 2), '..'))
                         AS bigram
              FROM documents
            ), cnt AS (
              SELECT lang, bigram, CAST(count(*) AS BIGINT) AS n
              FROM bg GROUP BY lang, bigram
            ), rk AS (
              SELECT lang, bigram, n,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n DESC, bigram) AS rank
              FROM cnt
            )
            SELECT lang, bigram, n, CAST(rank AS BIGINT) AS rank
            FROM rk WHERE rank <= 10""",
        "csv_roundtrip": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang""",
        "federated_union": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang""",
        "grouped_regression": r"""
            WITH m AS (
              SELECT lang,
                     CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                         AS x,
                     CAST(length(text) AS BIGINT) AS y
              FROM documents
            )
            SELECT lang, CAST(count(*) AS BIGINT) AS n,
                   CAST(count(*) * sum(x * y) - sum(x) * sum(y)
                        AS BIGINT) AS slope_num,
                   CAST(count(*) * sum(x * x) - sum(x) * sum(x)
                        AS BIGINT) AS slope_den
            FROM m GROUP BY lang""",
        "seq_pattern": """
            WITH s AS (
              SELECT user_id,
                     string_agg(substr(event_type, 1, 1), ''
                                ORDER BY ts, event_id) AS seq
              FROM events GROUP BY user_id
            )
            SELECT user_id, seq,
                   CAST(len(regexp_extract_all(seq, 'vc*p')) AS BIGINT)
                       AS n_hits
            FROM s""",
        "pdf_target_roundtrip": _PAGE_CTE + """
            SELECT url, CAST(1 AS BIGINT) AS roundtrip_ok
            FROM c WHERE cls <= 15 OR cls = 19""",
        "docx_target_roundtrip": _PAGE_CTE + """
            SELECT url, CAST(1 AS BIGINT) AS roundtrip_ok
            FROM c WHERE cls <= 15 OR cls = 19""",
        "xlsx_target_roundtrip": _PAGE_CTE + """
            SELECT url, CAST(1 AS BIGINT) AS roundtrip_ok
            FROM c WHERE cls <= 15 OR cls = 19""",
        "page_meta": _PAGE_CTE + """
            SELECT url,
                   CASE WHEN cls <= 10 OR cls IN (16, 17, 19)
                        THEN 'site ' || (seq % 997) END AS title,
                   CASE WHEN cls <= 10 OR cls IN (16, 17, 19)
                        THEN lang END AS html_lang
            FROM c""",
        "outlinks": _PAGE_CTE + """
            , h AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN doc_id % 3 = 2
                              THEN 1 ELSE 0 END) AS BIGINT) AS n2
              FROM c WHERE cls <= 10 OR cls IN (16, 17, 19)
            )
            SELECT t.target,
                   CAST(CASE WHEN t.promo = 1 THEN h.n2 ELSE h.n END
                        AS BIGINT) AS n_links
            FROM h, (VALUES
              ('/', 0), ('/home', 0), ('/world', 0), ('/politics', 0),
              ('/business', 0), ('/tech', 0), ('/sport', 0),
              ('/culture', 0), ('/weather', 0), ('/trending', 0),
              ('/newsletter', 0), ('/podcast', 0), ('/archive', 0),
              ('/jobs', 0), ('/deals', 0), ('/about', 0),
              ('/contact', 0), ('/terms', 0), ('/privacy', 0),
              ('/cookies', 0), ('/offers', 1), ('/app', 1))
              AS t(target, promo)""",
        "pages_gen": _PAGE_CTE + """
            SELECT url,
                   TIMESTAMP '2024-01-01 00:00:00' + seq * INTERVAL 1 SECOND AS warc_ts,
                   lang
            FROM c""",
        "pages_lang_en": _PAGE_CTE + """
            SELECT url, lang FROM c WHERE lang = 'en'""",
        "distinct_langs": "SELECT DISTINCT lang FROM documents",
        "sniff_route": _PAGE_CTE + f"""
            SELECT url, {_CT_EXPR} AS content_type FROM c""",
        "extract_flagship": _PAGE_CTE + f"""
            SELECT url, lang,
                   {_CT_EXPR} AS content_type,
                   {_STATUS_EXPR} AS status,
                   CAST({_ATTEMPTS_EXPR} AS INTEGER) AS attempts,
                   {_EXTRACTED_EXPR} AS extracted_text
            FROM c""",
        "extract_html": _PAGE_CTE + f"""
            SELECT url,
                   CASE WHEN cls = 19 THEN rtrim(repeat(text || ' ', 200))
                        ELSE text END AS extracted_text
            FROM c
            WHERE ({_CT_EXPR}) = 'html' AND ({_STATUS_EXPR}) = 'done'""",
        "extract_pdf": _PAGE_CTE + f"""
            SELECT url, text AS extracted_text
            FROM c
            WHERE ({_CT_EXPR}) = 'pdf' AND ({_STATUS_EXPR}) = 'done'""",
        "skip_existing": _PAGE_CTE + """
            SELECT url, 'skipped_existing_text' AS status, text AS extracted_text
            FROM c WHERE cls BETWEEN 14 AND 15""",
        "quarantine": _PAGE_CTE + f"""
            SELECT url, {_CT_EXPR} AS content_type,
                   'failed' AS status, CAST(2 AS INTEGER) AS attempts
            FROM c WHERE cls = 18""",
        "done_skip": _PAGE_CTE + """
            SELECT url, 'skipped_suffix' AS status
            FROM c WHERE cls BETWEEN 16 AND 17""",
        "status_counts": _PAGE_CTE + f"""
            SELECT ({_STATUS_EXPR}) AS status, count(*) AS n
            FROM c GROUP BY 1""",
        "csv_hack": """
            SELECT doc_id,
                   regexp_replace(text || '   ' || lang || '   ' || source,
                                  '   +', ';', 'g') AS csv_text
            FROM documents""",
        "jsonl_format": _PAGE_CTE + f"""
            SELECT url,
                   to_json(struct_pack(
                     url := url,
                     status := ({_STATUS_EXPR}),
                     extracted_text := ({_EXTRACTED_EXPR}))) AS json_row
            FROM c""",
        "retry_redrive": _PAGE_CTE + """
            SELECT url,
                   CASE WHEN cls = 18 THEN 'failed'
                        ELSE 'skipped_suffix' END AS status,
                   CAST(CASE WHEN cls = 18 THEN 3 ELSE 0 END AS INTEGER)
                     AS attempts
            FROM c""",
        "text_stats": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars_total,
                   CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT) AS n_chars_nospace
            FROM documents""",
        "doc_fingerprint": "SELECT doc_id, md5(text) AS fp FROM documents",
        "dedup_exact": """
            SELECT md5(text) AS fp, min(doc_id) AS keep_id,
                   count(*) AS n_dups
            FROM documents GROUP BY md5(text)""",
        "dedup_pairs_exact": """
            SELECT d1.doc_id AS a, d2.doc_id AS b
            FROM documents d1 JOIN documents d2
              ON d1.text = d2.text AND d1.doc_id < d2.doc_id""",
        "knn_cosine": """
            SELECT vec_id, CAST(rank AS INTEGER) AS rank FROM (
              SELECT vec_id,
                     row_number() OVER (
                       ORDER BY list_cosine_similarity(
                         embedding,
                         (SELECT embedding FROM embeddings WHERE vec_id = 0)
                       ) DESC, vec_id ASC) AS rank
              FROM embeddings)
            WHERE rank <= 10""",
        "events_window": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n_events,
                   min(value) AS min_value, max(value) AS max_value
            FROM events GROUP BY 1, 2""",
        "top_users": """
            SELECT user_id,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
            FROM events GROUP BY user_id
            ORDER BY total_cents DESC, user_id ASC LIMIT 10""",
        "top_parts_per_brand": """
            WITH r AS (
              SELECT p_brand, p_partkey,
                     CAST(round(p_retailprice * 100) AS BIGINT)
                         AS price_cents,
                     row_number() OVER (
                       PARTITION BY p_brand
                       ORDER BY round(p_retailprice * 100) DESC,
                                p_partkey) AS rank
              FROM part)
            SELECT p_brand, CAST(rank AS BIGINT) AS rank, p_partkey,
                   price_cents
            FROM r WHERE rank <= 3""",
        "stream_new_users": """
            WITH f AS (
              SELECT user_id,
                     min(CAST(epoch_us(ts) // 86400000000 AS BIGINT))
                       AS day
              FROM events GROUP BY user_id
            ), d AS (
              SELECT day, CAST(count(*) AS BIGINT) AS n_new
              FROM f GROUP BY day
            )
            SELECT day, n_new,
                   CAST(sum(n_new) OVER (
                     ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS cum_users
            FROM d""",
        "stream_windows": """
            WITH e AS (
              SELECT epoch_us(ts) AS ts_us,
                     epoch_us(ts) + (event_id % 7) * 60000000 AS arrival_us
              FROM events
            ), w AS (
              SELECT max(arrival_us) - 30 * 60000000 AS wm FROM e
            ), g AS (
              SELECT (ts_us // 3600000000) * 3600000000 AS ws,
                     CAST(count(*) AS BIGINT) AS n_events,
                     CAST(sum(CASE WHEN arrival_us >
                         (ts_us // 3600000000) * 3600000000 + 3600000000
                         + 3 * 60000000 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_late
              FROM e GROUP BY 1
            )
            SELECT make_timestamp(ws) AS window_start, n_events, n_late,
                   CASE WHEN ws + 3600000000 <= (SELECT wm FROM w)
                        THEN 'closed' ELSE 'open' END AS status
            FROM g""",
        "stream_sessions": """
            WITH o AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                               > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
              FROM events),
            s AS (
              SELECT user_id, ts, event_id,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sess
              FROM o)
            SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM s GROUP BY user_id, sess""",
        "sessionize": """
            WITH o AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                               > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
              FROM events),
            s AS (
              SELECT user_id, ts, event_id,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sess
              FROM o)
            SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events
            FROM s GROUP BY user_id, sess""",
        "lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "top_docs_by_len": """
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id ASC LIMIT 20""",
        "top_terms": r"""
            SELECT term, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS term
                  FROM documents)
            GROUP BY term ORDER BY n DESC, term ASC LIMIT 20""",
        "host_stats": _PAGE_CTE + """
            SELECT regexp_extract(url, '^[a-z+]+://([^/]+)', 1) AS host,
                   CAST(count(*) AS BIGINT) AS n_pages
            FROM c GROUP BY host""",
        "mirror_hosts": _PAGE_CTE + """
            , h AS (SELECT DISTINCT
                      regexp_extract(url, '^[a-z+]+://([^/]+)', 1) AS host
                    FROM c)
            SELECT x.host AS a, y.host AS b
            FROM h x JOIN h y
              ON x.host < y.host AND levenshtein(x.host, y.host) = 1
            ORDER BY a, b""",
        "hash_sample": """
            SELECT doc_id FROM documents
            WHERE substr(md5(text), 1, 2) < '1a'""",
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE CASE lang
                    WHEN 'en' THEN substr(md5(text), 1, 1) < '4'
                    WHEN 'de' THEN substr(md5(text), 1, 1) < 'c'
                    ELSE TRUE END""",
        "redact_pii": r"""
            SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
                text || ' contact user' || doc_id
                     || '@mail.example or 10.0.' || (doc_id % 200) || '.7 now',
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                '\+\d[\d\-\. ]{7,}\d', '<PHONE>', 'g') AS text_redacted
            FROM documents""",
        "repetition_stats": r"""
            WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w
                       FROM documents),
            bg AS (SELECT doc_id,
                          unnest(list_transform(range(1, len(w)),
                                 i -> w[i] || ' ' || w[i+1])) AS g
                   FROM t WHERE len(w) >= 2),
            mx AS (SELECT doc_id, max(c) AS mc FROM
                     (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2)
                   GROUP BY 1)
            SELECT t.doc_id,
                   CASE WHEN len(w) > 0
                        THEN CAST(len(list_distinct(w)) AS DOUBLE) / len(w)
                        ELSE 0.0 END AS distinct_ratio,
                   coalesce(CAST(mx.mc AS DOUBLE) / nullif(len(w) - 1, 0),
                            0.0) AS top_bigram_frac
            FROM t LEFT JOIN mx USING (doc_id)""",
        "len_quantiles": """
            SELECT unnest([0.5, 0.9, 0.99]) AS q,
                   unnest(qv) AS value FROM
              (SELECT quantile_disc(n_chars, [0.5, 0.9, 0.99]) AS qv
               FROM documents)""",
        "line_dedup": r"""
            WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
                       FROM documents),
            ln AS (SELECT doc_id,
                          unnest(list_transform(
                            range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT)),
                            i -> struct_pack(
                              line_no := i,
                              line := array_to_string(
                                toks[(i*10+1):(i*10+10)], ' ')))) AS s
                   FROM w WHERE len(toks) > 0),
            k AS (SELECT doc_id, s.line_no AS line_no, s.line AS line,
                         row_number() OVER (PARTITION BY s.line
                                            ORDER BY doc_id, s.line_no) AS rn
                  FROM ln)
            SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no)
                     AS text_dedup
            FROM k WHERE rn = 1 GROUP BY doc_id""",
        "decontaminate": r"""
            WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                       FROM documents),
            sh AS (SELECT doc_id,
                          unnest(list_transform(range(1, len(t) - 11),
                                 i -> array_to_string(t[i:i+12], ' '))) AS g
                   FROM w WHERE len(t) >= 13),
            bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0),
            hit AS (SELECT DISTINCT sh.doc_id FROM sh JOIN bench USING (g))
            SELECT d.doc_id, d.doc_id IN (SELECT doc_id FROM hit)
                     AS contaminated
            FROM documents d""",
        "shard_counts": _PAGE_CTE + """
            SELECT CAST(CAST(('0x' || substr(md5(url), 1, 8)) AS UBIGINT)
                        % 16 AS BIGINT) AS shard,
                   count(*) AS n
            FROM c GROUP BY 1""",
        "len_histogram": """
            SELECT n_chars // 100 AS bucket,
                   CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY bucket""",
        "chunk_tokens": r"""
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(text, '\S+') AS ts
              FROM documents),
            ch AS (
              SELECT doc_id, ts,
                unnest(range(CASE WHEN len(ts) = 0 THEN 0
                                  WHEN len(ts) <= 64 THEN 1
                                  ELSE (len(ts) - 64 + 47) // 48 + 1 END))
                  AS k
              FROM tok)
            SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
                   CAST(least(k * 48 + 64, len(ts)) - k * 48 AS BIGINT)
                     AS n_tokens,
                   array_to_string(ts[k * 48 + 1 : least(k * 48 + 64,
                                                         len(ts))], ' ')
                     AS chunk_text
            FROM ch""",
        "line_self_dedup": r"""
            WITH d AS (
              SELECT doc_id, regexp_replace(text, '((?:\S+ ){7}\S+) ',
                                            '\1' || chr(10), 'g') AS t2
              FROM documents),
            l AS (
              SELECT doc_id,
                     unnest(split(t2, chr(10))) AS line,
                     unnest(range(len(split(t2, chr(10))))) AS pos
              FROM d),
            f AS (
              SELECT doc_id, line, min(pos) AS p
              FROM l GROUP BY doc_id, line)
            SELECT f.doc_id,
                   CAST(any_value(nl.n) AS BIGINT) AS n_lines,
                   CAST(count(*) AS BIGINT) AS n_unique_lines,
                   string_agg(f.line, chr(10) ORDER BY f.p) AS dedup_text
            FROM f JOIN (SELECT doc_id,
                                len(split(t2, chr(10))) AS n FROM d) nl
                   ON f.doc_id = nl.doc_id
            GROUP BY f.doc_id""",
        "split_assign": """
            SELECT doc_id, lang,
                   CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS
                          VARCHAR)), 1, 8)) AS UBIGINT) % 100 < 80
                          THEN 'train'
                        WHEN CAST(('0x' || substr(md5(CAST(doc_id AS
                          VARCHAR)), 1, 8)) AS UBIGINT) % 100 < 90
                          THEN 'val'
                        ELSE 'test' END AS split
            FROM documents""",
        "pps_sample": """
            WITH c AS (
              SELECT doc_id, n_chars,
                     sum(n_chars) OVER (ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum
              FROM documents),
            t AS (SELECT greatest(sum(n_chars) // 50, 1) AS s
                  FROM documents)
            SELECT doc_id, CAST(n_chars AS BIGINT) AS weight
            FROM c, t
            WHERE (cum // s) > ((cum - n_chars) // s)""",
        "distinct_by_type": """
            SELECT event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
            FROM events GROUP BY event_type""",
        "keyword_search": r"""
            WITH tok AS (
              SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
              FROM documents),
            h AS (SELECT doc_id, w FROM tok
                  WHERE w IN ('hash', 'merge', 'sort', 'window', 'spark')),
            s AS (SELECT doc_id,
                         CAST(count(DISTINCT w) AS BIGINT) AS n_match,
                         CAST(count(*) AS BIGINT) AS sum_tf
                  FROM h GROUP BY doc_id)
            SELECT doc_id, n_match, sum_tf
            FROM s ORDER BY n_match DESC, sum_tf DESC, doc_id
            LIMIT 20""",
        "heavy_hitters": r"""
            SELECT w AS term, CAST(count(*) AS BIGINT) AS approx_n
            FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS w
                  FROM documents)
            GROUP BY w""",
        "zorder_scan": """
            SELECT doc_id, n_chars, lang
            FROM documents
            WHERE n_chars BETWEEN 100 AND 300 AND lang = 'en'""",
        "shipping_priority": """
            WITH rev AS (
              SELECT l_orderkey,
                     CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                              * (100 - CAST(round(l_discount * 100)
                                            AS BIGINT))) AS BIGINT)
                       AS revenue_e4
              FROM lineitem
              WHERE l_shipdate > TIMESTAMP '1998-01-01'
              GROUP BY l_orderkey)
            SELECT r.l_orderkey, r.revenue_e4, o.o_orderdate,
                   o.o_orderpriority
            FROM rev r
            JOIN orders o ON r.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE o.o_orderdate < TIMESTAMP '1998-01-01'
              AND c.c_mktsegment = 'BUILDING'
            ORDER BY r.revenue_e4 DESC, r.l_orderkey
            LIMIT 10""",
        "zorder": """
            WITH lc AS (
              SELECT lang,
                     CAST(row_number() OVER (ORDER BY lang) - 1
                          AS BIGINT) AS code
              FROM (SELECT DISTINCT lang FROM documents)),
            b AS (
              SELECT d.doc_id, d.n_chars % 65536 AS x, lc.code AS y
              FROM documents d JOIN lc USING (lang)),
            z AS (
              SELECT doc_id,
                     CAST(sum((((x >> i) & 1) << (2 * i))
                              + (((y >> i) & 1) << (2 * i + 1)))
                          AS BIGINT) AS zvalue
              FROM b, unnest(range(16)) AS t(i)
              GROUP BY doc_id)
            SELECT doc_id, zvalue,
                   CAST(zvalue >> 20 AS BIGINT) AS file_bucket
            FROM z""",
        "clip_outliers": """
            WITH b AS (SELECT quantile_disc(n_chars, 0.05) AS lo,
                              quantile_disc(n_chars, 0.95) AS hi
                       FROM documents)
            SELECT doc_id, n_chars,
                   CAST(least(greatest(n_chars, b.lo), b.hi) AS BIGINT)
                     AS clipped
            FROM documents, b""",
        "bpe_pairs": r"""
            WITH w AS (
              SELECT unnest(regexp_extract_all(text, '\S+')) AS word
              FROM documents),
            wc AS (SELECT word, count(*) AS c FROM w GROUP BY word),
            p AS (
              SELECT substring(word, i, 2) AS pair,
                     CAST(sum(c) AS BIGINT) AS n
              FROM wc, unnest(range(1, length(word))) AS t(i)
              GROUP BY pair)
            SELECT pair, n FROM p ORDER BY n DESC, pair LIMIT 50""",
        "incremental_near_dedup": _WORD_SHINGLES_CTE + """
            , newd AS (SELECT * FROM sh WHERE doc_id % 5 <> 0),
            hist AS (SELECT * FROM sh WHERE doc_id % 5 = 0),
            dup AS (
              SELECT DISTINCT n.doc_id
              FROM newd n JOIN hist h
                ON CAST(len(list_intersect(n.s, h.s)) AS DOUBLE)
                   / len(list_distinct(list_concat(n.s, h.s))) >= 0.8)
            SELECT d.doc_id, d.lang
            FROM documents d
            WHERE d.doc_id % 5 <> 0
              AND d.doc_id NOT IN (SELECT doc_id FROM dup)""",
        "dup_spans": r"""
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(text, '\S+') AS ts
              FROM documents),
            g AS (
              SELECT DISTINCT doc_id,
                     array_to_string(ts[k + 1 : k + 8], ' ') AS gram
              FROM tok, unnest(range(greatest(len(ts) - 7, 0))) AS t(k)),
            c AS (SELECT gram, count(*) AS nd FROM g GROUP BY gram),
            per AS (
              SELECT g.doc_id, count(*) AS n_grams,
                     sum(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END) AS n_dup
              FROM g JOIN c USING (gram) GROUP BY g.doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
                   CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup_grams
            FROM documents d LEFT JOIN per p USING (doc_id)""",
        "remove_dup_spans": r"""
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(text, '\S+') AS ts
              FROM documents),
            w AS (
              SELECT doc_id, k AS pos, ts[k + 1] AS word
              FROM tok, unnest(range(len(ts))) AS t(k)),
            occ AS (
              SELECT doc_id, k AS pos,
                     array_to_string(ts[k + 1 : k + 8], ' ') AS gram
              FROM tok, unnest(range(greatest(len(ts) - 7, 0))) AS t(k)),
            c AS (
              SELECT gram, count(*) AS nd,
                     min(doc_id * 1048576 + pos) AS first_packed
              FROM occ GROUP BY gram),
            rem AS (
              SELECT o.doc_id, o.pos
              FROM occ o JOIN c USING (gram)
              WHERE c.nd > 1
                AND o.doc_id * 1048576 + o.pos <> c.first_packed),
            cov AS (
              SELECT DISTINCT r.doc_id, r.pos + j AS pos
              FROM rem r, unnest(range(8)) AS t(j)),
            kept AS (
              SELECT w.doc_id, w.pos, w.word
              FROM w LEFT JOIN cov
                ON w.doc_id = cov.doc_id AND w.pos = cov.pos
              WHERE cov.doc_id IS NULL),
            per AS (
              SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS text_clean
              FROM kept GROUP BY doc_id)
            SELECT d.doc_id, coalesce(p.text_clean, '') AS text_clean
            FROM documents d LEFT JOIN per p USING (doc_id)""",
        "event_transitions": """
            WITH s AS (
              SELECT event_type AS from_type,
                     lead(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS to_type
              FROM events)
            SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
            FROM s WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type""",
        "inter_arrival": """
            WITH s AS (
              SELECT user_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
              FROM events)
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(pts) AS BIGINT) AS n_gaps,
                   CAST(coalesce(sum(date_diff('microsecond', pts, ts)), 0)
                        AS BIGINT) AS sum_gap_us,
                   CAST(coalesce(max(date_diff('microsecond', pts, ts)), 0)
                        AS BIGINT) AS max_gap_us
            FROM s GROUP BY user_id""",
        "dsir_weights": """
            WITH tok AS (
              SELECT doc_id, lang,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
              FROM documents),
            g AS (
              SELECT doc_id, lang,
                     CAST(CAST(('0x' || substr(md5(ts[k + 1] || ' ' ||
                          ts[k + 2]), 1, 8)) AS UBIGINT) % 4096
                          AS BIGINT) AS bkt
              FROM tok, unnest(range(greatest(len(ts) - 1, 0))) AS t(k)),
            tots AS (
              SELECT count(*) AS r_tot,
                     count(*) FILTER (lang = 'en') AS t_tot
              FROM g),
            lr AS (
              SELECT bkt,
                     ln((count(*) FILTER (lang = 'en') + 1.0)
                        / (tots.t_tot + 4096))
                   - ln((count(*) + 1.0) / (tots.r_tot + 4096)) AS logratio
              FROM g, tots GROUP BY bkt, tots.t_tot, tots.r_tot),
            per AS (
              SELECT g.doc_id,
                     count(*) AS n_feats,
                     sum(lr.logratio) AS dsir_logw
              FROM g JOIN lr USING (bkt) GROUP BY g.doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(p.n_feats, 0) AS BIGINT) AS n_feats,
                   coalesce(p.dsir_logw, 0.0) AS dsir_logw
            FROM documents d LEFT JOIN per p USING (doc_id)""",
        "domain_reweight": """
            WITH n AS (SELECT lang, count(*) AS n_g
                       FROM documents GROUP BY lang),
                 t AS (SELECT min(n_g) AS target_n FROM n)
            SELECT d.doc_id, d.lang
            FROM documents d JOIN n USING (lang) CROSS JOIN t
            WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                       AS UBIGINT) % 1048576
                  < (t.target_n * 1048576) // n.n_g""",
        "posting_lists": r"""
            WITH pairs AS (
              SELECT DISTINCT term, doc_id FROM (
                SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
                FROM documents))
            SELECT term, CAST(count(*) AS BIGINT) AS df,
                   array_to_string(
                     list_slice(list(doc_id ORDER BY doc_id), 1, 20), ',')
                     AS postings
            FROM pairs GROUP BY term""",
        "gopher_quality": r"""
            WITH g AS (
              SELECT doc_id,
                len(regexp_extract_all(text, '\S+')) AS n_words,
                CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT)
                  AS n_word_chars,
                len(regexp_extract_all(text, '\S*[A-Za-z]\S*'))
                  AS n_alpha_words,
                CAST(1 + length(text) - length(replace(text, chr(10), ''))
                     AS BIGINT) AS n_lines,
                len(regexp_extract_all(text, '(?m)^[ \t]*[-*•]'))
                  AS n_bullet_lines,
                len(regexp_extract_all(text, '(?m)(\.\.\.|…)[ \t]*$'))
                  AS n_ellipsis_lines
              FROM documents)
            SELECT doc_id, n_words, n_word_chars, n_alpha_words, n_lines,
                   n_bullet_lines, n_ellipsis_lines,
                   (n_words BETWEEN 50 AND 100000
                    AND n_word_chars BETWEEN 3 * n_words AND 10 * n_words
                    AND 100 * n_bullet_lines <= 90 * n_lines
                    AND 100 * n_ellipsis_lines <= 30 * n_lines
                    AND 100 * n_alpha_words >= 80 * n_words) AS keep
            FROM g""",
        "c4_filter": r"""
            WITH d AS (
              SELECT doc_id,
                     regexp_replace(text, '((?:\S+ ){7}\S+) ',
                                    '\1' || chr(10), 'g') AS t2
              FROM documents
            ), f AS (
              SELECT doc_id, t2,
                CAST(len(split(t2, chr(10))) AS BIGINT) AS n_lines,
                list_filter(split(t2, chr(10)),
                    l -> regexp_matches(l, '(?:^|[ \t])table(?:[ \t]|$)')
                         AND len(regexp_extract_all(l, '\S+')) >= 8) AS kept
              FROM d)
            SELECT doc_id, n_lines,
                   CAST(len(kept) AS BIGINT) AS n_kept_lines,
                   COALESCE(array_to_string(kept, chr(10)), '') AS kept_text,
                   (len(kept) >= 2
                    AND NOT contains(lower(t2), 'lorem ipsum')
                    AND NOT contains(t2, '{')) AS keep
            FROM f""",
        "ntile_buckets": """
            SELECT doc_id, n_chars,
                   CAST(row_number() OVER (ORDER BY n_chars, doc_id)
                        AS BIGINT) AS rnk,
                   CAST(ntile(8) OVER (ORDER BY n_chars, doc_id)
                        AS BIGINT) AS bucket
            FROM documents""",
        "rollup_orders": """
            SELECT COALESCE(c_mktsegment, 'ALL') AS seg,
                   CAST(COALESCE(c_nationkey, -1) AS BIGINT) AS nationkey,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS total_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY ROLLUP(c_mktsegment, c_nationkey)""",
        "collocations": r"""
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(text, '\S+') AS w
              FROM documents
            ), uni AS (
              SELECT term, CAST(count(*) AS BIGINT) AS n
              FROM (SELECT unnest(w) AS term FROM toks) GROUP BY term
            ), vocab AS (
              SELECT term, n FROM uni ORDER BY n DESC, term LIMIT 200
            ), pairs AS (
              SELECT p.w1 AS w1, p.w2 AS w2 FROM (
                SELECT unnest(list_transform(range(1, len(w)),
                         i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS p
                FROM toks WHERE len(w) >= 2)
            )
            SELECT pr.w1, pr.w2, CAST(count(*) AS BIGINT) AS pair_n,
                   v1.n AS w1_n, v2.n AS w2_n
            FROM pairs pr
            JOIN vocab v1 ON pr.w1 = v1.term
            JOIN vocab v2 ON pr.w2 = v2.term
            GROUP BY pr.w1, pr.w2, v1.n, v2.n
            HAVING count(*) >= 2""",
        "snapshot_diff": """
            WITH b AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]'
                          ELSE text END AS text
              FROM documents WHERE doc_id % 7 <> 0
              UNION ALL
              SELECT doc_id + 1000000000 AS doc_id,
                     'new page ' || doc_id AS text
              FROM documents WHERE doc_id % 11 = 0
            )
            SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
                   CASE WHEN a.doc_id IS NULL THEN 'added'
                        WHEN b.doc_id IS NULL THEN 'removed'
                        ELSE 'changed' END AS change
            FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id
            WHERE a.doc_id IS NULL OR b.doc_id IS NULL
               OR a.text IS DISTINCT FROM b.text""",
        "pagerank": """
            WITH e AS (
              SELECT DISTINCT doc_id % 211 AS src,
                              (doc_id * 13 + 7) % 211 AS dst
              FROM documents
              WHERE (doc_id % 211) <> ((doc_id * 13 + 7) % 211)
            ), outd AS (
              SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
            ), n AS (
              SELECT DISTINCT node FROM (
                SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
            ), r0 AS (
              SELECT node, CAST(1000000 AS BIGINT) AS r FROM n
            ), c1 AS (
              SELECT e.dst AS node, sum(r0.r // outd.deg) AS s
              FROM e JOIN r0 ON e.src = r0.node
                     JOIN outd ON e.src = outd.src
              GROUP BY e.dst
            ), r1 AS (
              SELECT n.node, 150000 + (85 * COALESCE(c1.s, 0)) // 100 AS r
              FROM n LEFT JOIN c1 ON n.node = c1.node
            ), c2 AS (
              SELECT e.dst AS node, sum(r1.r // outd.deg) AS s
              FROM e JOIN r1 ON e.src = r1.node
                     JOIN outd ON e.src = outd.src
              GROUP BY e.dst
            ), r2 AS (
              SELECT n.node, 150000 + (85 * COALESCE(c2.s, 0)) // 100 AS r
              FROM n LEFT JOIN c2 ON n.node = c2.node
            ), c3 AS (
              SELECT e.dst AS node, sum(r2.r // outd.deg) AS s
              FROM e JOIN r2 ON e.src = r2.node
                     JOIN outd ON e.src = outd.src
              GROUP BY e.dst
            ), r3 AS (
              SELECT n.node, 150000 + (85 * COALESCE(c3.s, 0)) // 100 AS r
              FROM n LEFT JOIN c3 ON n.node = c3.node
            )
            SELECT node, CAST(r AS BIGINT) AS "rank" FROM r3""",
        "attribution": """
            SELECT p.event_id, p.user_id, p.ts,
                   CAST(count(c.event_id) AS BIGINT) AS n_touches
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON c.user_id = p.user_id
             AND c.ts >= p.ts - INTERVAL 60 MINUTE
             AND c.ts < p.ts
            GROUP BY p.event_id, p.user_id, p.ts""",
        "host_blocklist": _PAGE_CTE + """
            SELECT url, lang FROM (
              SELECT url, lang,
                     regexp_extract(url, '^[a-z+]+://([^/]+)', 1) AS host
              FROM c)
            WHERE host NOT IN ('site7.example', 'site13.example')
              AND host NOT LIKE '%3.example'""",
        "host_mirror": _PAGE_CTE + f"""
            , x AS (
              SELECT DISTINCT
                     regexp_extract(url, '^[a-z+]+://([^/]+)', 1) AS host,
                     md5(extr) AS fp
              FROM (SELECT url, {_EXTRACTED_EXPR} AS extr,
                           {_STATUS_EXPR} AS status FROM c)
              WHERE status = 'done' AND extr IS NOT NULL
            )
            SELECT a.host AS host_a, b.host AS host_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM x a JOIN x b ON a.fp = b.fp AND a.host < b.host
            GROUP BY a.host, b.host""",
        "cheapest_supplier": """
            SELECT p_partkey, s_suppkey, total_cents FROM (
              SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
                     CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                          AS BIGINT) AS total_cents,
                     row_number() OVER (
                       PARTITION BY l_partkey
                       ORDER BY sum(CAST(round(l_extendedprice * 100)
                                         AS BIGINT)) ASC, l_suppkey ASC
                     ) AS rn
              FROM lineitem GROUP BY l_partkey, l_suppkey)
            WHERE rn = 1""",
        "local_supplier_revenue": """
            SELECT n_name,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                        AS BIGINT) AS revenue_e4
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
            GROUP BY n_name""",
        "late_data_window": """
            WITH e AS (
              SELECT epoch_us(ts) AS ts_us,
                     epoch_us(ts) + (event_id % 7) * 60000000 AS arrival_us
              FROM events
            ), w AS (
              SELECT max(arrival_us) - 30 * 60000000 AS wm FROM e
            ), g AS (
              SELECT (ts_us // 3600000000) * 3600000000 AS ws,
                     CAST(count(*) AS BIGINT) AS n_events,
                     CAST(sum(CASE WHEN arrival_us >
                         (ts_us // 3600000000) * 3600000000 + 3600000000
                         + 3 * 60000000 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_late
              FROM e GROUP BY 1
            )
            SELECT make_timestamp(ws) AS window_start, n_events, n_late,
                   CASE WHEN ws + 3600000000 <= (SELECT wm FROM w)
                        THEN 'closed' ELSE 'open' END AS status
            FROM g""",
        "host_lang": _PAGE_CTE + """
            SELECT host, lang, n_pages FROM (
              SELECT regexp_extract(url, '^[a-z+]+://([^/]+)', 1) AS host,
                     lang, CAST(count(*) AS BIGINT) AS n_pages,
                     row_number() OVER (
                       PARTITION BY regexp_extract(url,
                                      '^[a-z+]+://([^/]+)', 1)
                       ORDER BY count(*) DESC, lang ASC) AS rn
              FROM c GROUP BY 1, 2)
            WHERE rn = 1""",
        "url_canon_dedup": _PAGE_CTE + """
            SELECT url, CAST(3 AS BIGINT) AS n_variants FROM c""",
        "incremental_stats": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY lang""",
        "cust_order_dist": """
            SELECT n_orders, CAST(count(*) AS BIGINT) AS n_custs FROM (
              SELECT c_custkey,
                     CAST(count(o_custkey) AS BIGINT) AS n_orders
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey)
            GROUP BY n_orders""",
        "sentence_stats": """
            SELECT doc_id,
                   COALESCE(CAST(len(list_filter(list_transform(
                     string_split_regex(replace(text, ' batch ', '. '),
                                        '[.!?]+'),
                     s -> trim(s)), s -> s <> '')) AS BIGINT), 0)
                     AS n_sentences
            FROM documents""",
        "basket_pairs": """
            WITH items AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            )
            SELECT a.l_partkey AS p1, b.l_partkey AS p2,
                   CAST(count(*) AS BIGINT) AS support
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY a.l_partkey, b.l_partkey
            HAVING count(*) >= 3""",
        "scd2_dim": """
            WITH b AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]'
                          ELSE text END AS text
              FROM documents WHERE doc_id % 7 <> 0
              UNION ALL
              SELECT doc_id + 1000000000 AS doc_id,
                     'new page ' || doc_id AS text
              FROM documents WHERE doc_id % 11 = 0
            ), diff AS (
              SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
                     CASE WHEN a.doc_id IS NULL THEN 'added'
                          WHEN b.doc_id IS NULL THEN 'removed'
                          ELSE 'changed' END AS change
              FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id
              WHERE a.doc_id IS NULL OR b.doc_id IS NULL
                 OR a.text IS DISTINCT FROM b.text
            )
            SELECT doc_id, 'v2' AS valid_from,
                   CAST(NULL AS VARCHAR) AS valid_to
            FROM diff WHERE change = 'added'
            UNION ALL
            SELECT doc_id, 'v1', 'v2'
            FROM diff WHERE change IN ('removed', 'changed')
            UNION ALL
            SELECT doc_id, 'v2', NULL FROM diff WHERE change = 'changed'
            UNION ALL
            SELECT d.doc_id, 'v1', NULL
            FROM documents d
            WHERE d.doc_id NOT IN (SELECT doc_id FROM diff)""",
        "returned_top_customers": """
            WITH po AS (
              SELECT l_orderkey,
                     sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                       AS rev
              FROM lineitem WHERE l_returnflag = 'R'
              GROUP BY l_orderkey
            ), cr AS (
              SELECT o.o_custkey AS c_custkey,
                     CAST(count(*) AS BIGINT) AS n_orders,
                     CAST(sum(po.rev) AS BIGINT) AS revenue
              FROM po JOIN orders o ON po.l_orderkey = o.o_orderkey
              GROUP BY o.o_custkey
            )
            SELECT CAST(row_number() OVER (
                     ORDER BY revenue DESC, c_custkey) AS BIGINT) AS rank,
                   c_custkey, n_orders, revenue
            FROM cr ORDER BY revenue DESC, c_custkey LIMIT 20""",
        "big_spender_filter": """
            WITH base AS (
              SELECT c_custkey, c_mktsegment,
                     CAST(round(c_acctbal * 100) AS BIGINT) AS cents
              FROM customer
            ), stat AS (
              SELECT CAST(sum(cents) AS BIGINT) AS s,
                     CAST(count(*) AS BIGINT) AS n
              FROM base WHERE cents > 0
            )
            SELECT c_mktsegment,
                   CAST(count(*) AS BIGINT) AS n_customers,
                   CAST(sum(cents) AS BIGINT) AS total_bal_cents
            FROM base, stat
            WHERE cents * stat.n > stat.s
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderstatus = 'F')
            GROUP BY c_mktsegment""",
        "lineitem_unpivot": """
            SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                   m.measure,
                   CAST(round(CASE m.measure
                     WHEN 'quantity' THEN l_quantity
                     WHEN 'extendedprice' THEN l_extendedprice
                     WHEN 'discount' THEN l_discount
                     ELSE l_tax END * 100) AS BIGINT) AS cents
            FROM lineitem
            CROSS JOIN (SELECT unnest(['quantity', 'extendedprice',
                                       'discount', 'tax']) AS measure) m""",
        "keep_best_dedup": """
            WITH g AS (
              SELECT lang, source, max(n_chars) AS best_len,
                     CAST(count(*) AS BIGINT) AS n_docs
              FROM documents GROUP BY lang, source
            )
            SELECT g.lang, g.source,
                   CAST(min(d.doc_id) AS BIGINT) AS keep_id,
                   g.best_len, g.n_docs
            FROM documents d
            JOIN g ON d.lang = g.lang AND d.source = g.source
                  AND d.n_chars = g.best_len
            GROUP BY g.lang, g.source, g.best_len, g.n_docs""",
        "wow_change": """
            WITH d AS (
              SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1
            )
            SELECT day, n,
                   CAST(n - COALESCE(lag(n) OVER (ORDER BY day), 0)
                        AS BIGINT) AS delta
            FROM d""",
        "supplier_variety": """
            SELECT p.p_type,
                   CAST(count(DISTINCT l.l_suppkey) AS BIGINT)
                     AS n_suppliers
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_type""",
        "new_users_curve": """
            WITH f AS (
              SELECT user_id,
                     min(CAST(epoch_us(ts) // 86400000000 AS BIGINT))
                       AS day
              FROM events GROUP BY user_id
            ), d AS (
              SELECT day, CAST(count(*) AS BIGINT) AS n_new
              FROM f GROUP BY day
            )
            SELECT day, n_new,
                   CAST(sum(n_new) OVER (
                     ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS cum_users
            FROM d""",
        "revenue_concentration": """
            WITH po AS (
              SELECT l_orderkey,
                     sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                       AS rev
              FROM lineitem GROUP BY l_orderkey
            ), r AS (
              SELECT rev, row_number() OVER (
                       ORDER BY rev DESC, l_orderkey) AS rn
              FROM po
            ), kk AS (
              SELECT greatest(1, count(*) // 100) AS k FROM po
            )
            SELECT CAST(kk.k AS BIGINT) AS k,
                   CAST(sum(r.rev) FILTER (WHERE r.rn <= kk.k) AS BIGINT)
                     AS top_rev,
                   CAST(sum(r.rev) AS BIGINT) AS total_rev,
                   CAST(sum(r.rev) FILTER (WHERE r.rn <= kk.k)
                        * 1000000 // sum(r.rev) AS BIGINT) AS share_ppm
            FROM r, kk GROUP BY kk.k""",
        "users_all_types": """
            SELECT user_id FROM (
              SELECT user_id, count(DISTINCT event_type) AS c
              FROM events
              WHERE event_type IN ('view', 'click', 'purchase')
              GROUP BY user_id)
            WHERE c = 3""",
        "user_top_type": """
            WITH c AS (
              SELECT user_id, event_type,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY user_id, event_type
            ), m AS (
              SELECT user_id, max(n) AS best FROM c GROUP BY user_id
            )
            SELECT c.user_id, min(c.event_type) AS top_type,
                   CAST(m.best AS BIGINT) AS n
            FROM c JOIN m ON c.user_id = m.user_id AND c.n = m.best
            GROUP BY c.user_id, m.best""",
        "daily_fill_gaps": """
            WITH d AS (
              SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1
            ), s AS (
              SELECT unnest(generate_series(
                (SELECT min(day) FROM d), (SELECT max(day) FROM d)))
                AS day
            )
            SELECT s.day, CAST(COALESCE(d.n, 0) AS BIGINT) AS n
            FROM s LEFT JOIN d USING (day)""",
        "pareto_orders": """
            WITH o AS (
              SELECT o_orderkey,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS price,
                     CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                       AS day
              FROM orders
            ), p AS (
              SELECT DISTINCT price, day FROM o
            ), s AS (
              SELECT price, day,
                     max(day) OVER (
                       ORDER BY price DESC, day DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS best_prev
              FROM p
            ), keep AS (
              SELECT price, day FROM s
              WHERE best_prev IS NULL OR day > best_prev
            )
            SELECT o.o_orderkey, o.price, o.day
            FROM o JOIN keep USING (price, day)""",
        "weighted_disc": """
            SELECT p.p_brand,
                   CAST(sum(CAST(round(l.l_discount * 100) AS BIGINT)
                            * CAST(round(l.l_quantity * 100) AS BIGINT))
                        AS BIGINT) AS num,
                   CAST(sum(CAST(round(l.l_quantity * 100) AS BIGINT))
                        AS BIGINT) AS den,
                   CAST(sum(CAST(round(l.l_discount * 100) AS BIGINT)
                            * CAST(round(l.l_quantity * 100) AS BIGINT))
                        * 1000000
                        // sum(CAST(round(l.l_quantity * 100) AS BIGINT))
                        AS BIGINT) AS wavg_ppm
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_brand""",
        "bfs_layers": """
            WITH RECURSIVE e AS (
              SELECT DISTINCT doc_id % 211 AS src,
                              (doc_id * 13 + 7) % 211 AS dst
              FROM documents
              WHERE (doc_id % 211) <> ((doc_id * 13 + 7) % 211)
            ), b AS (
              SELECT CAST(0 AS BIGINT) AS node, 0 AS layer
              UNION
              SELECT e.dst AS node, b.layer + 1
              FROM b JOIN e ON e.src = b.node
              WHERE b.layer < 3
            )
            SELECT node, CAST(min(layer) AS BIGINT) AS layer
            FROM b GROUP BY node""",
        "value_gini": """
            WITH o AS (
              SELECT o_orderkey,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS price
              FROM orders
            ), r AS (
              SELECT price, row_number() OVER (
                       ORDER BY price, o_orderkey) AS rn
              FROM o
            )
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(price) AS BIGINT) AS sum_x,
                   CAST(sum(rn * price) AS BIGINT) AS s1,
                   CAST((2 * sum(rn * price)
                         - (count(*) + 1) * sum(price)) * 1000000
                        // (count(*) * sum(price)) AS BIGINT)
                     AS gini_ppm
            FROM r""",
        "repeat_orders_7d": """
            WITH o AS (
              SELECT o_orderkey, o_custkey,
                     CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                       AS day
              FROM orders
            )
            SELECT a.o_custkey AS c_custkey,
                   a.o_orderkey AS k1, b.o_orderkey AS k2,
                   CAST(abs(b.day - a.day) AS BIGINT) AS gap_days
            FROM o a JOIN o b
              ON a.o_custkey = b.o_custkey
             AND a.o_orderkey < b.o_orderkey
             AND abs(b.day - a.day) <= 7""",
        "profile_orders": """
            WITH o AS (
              SELECT o_orderkey, o_custkey,
                     CAST(round(o_totalprice * 100) AS BIGINT)
                       AS price_cents,
                     CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                       AS order_day,
                     o_orderstatus, o_orderpriority
              FROM orders
            )
            SELECT 'o_orderkey' AS "column", m.metric, m.value FROM (
              SELECT 'n_null' AS metric,
                     CAST(count(*) FILTER (o_orderkey IS NULL) AS BIGINT)
                       AS value FROM o
              UNION ALL SELECT 'n_distinct',
                CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM o
              UNION ALL SELECT 'min', CAST(min(o_orderkey) AS BIGINT) FROM o
              UNION ALL SELECT 'max', CAST(max(o_orderkey) AS BIGINT) FROM o
            ) m
            UNION ALL
            SELECT 'o_custkey', m.metric, m.value FROM (
              SELECT 'n_null' AS metric,
                     CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT)
                       AS value FROM o
              UNION ALL SELECT 'n_distinct',
                CAST(count(DISTINCT o_custkey) AS BIGINT) FROM o
              UNION ALL SELECT 'min', CAST(min(o_custkey) AS BIGINT) FROM o
              UNION ALL SELECT 'max', CAST(max(o_custkey) AS BIGINT) FROM o
            ) m
            UNION ALL
            SELECT 'price_cents', m.metric, m.value FROM (
              SELECT 'n_null' AS metric,
                     CAST(count(*) FILTER (price_cents IS NULL) AS BIGINT)
                       AS value FROM o
              UNION ALL SELECT 'n_distinct',
                CAST(count(DISTINCT price_cents) AS BIGINT) FROM o
              UNION ALL SELECT 'min', CAST(min(price_cents) AS BIGINT) FROM o
              UNION ALL SELECT 'max', CAST(max(price_cents) AS BIGINT) FROM o
            ) m
            UNION ALL
            SELECT 'order_day', m.metric, m.value FROM (
              SELECT 'n_null' AS metric,
                     CAST(count(*) FILTER (order_day IS NULL) AS BIGINT)
                       AS value FROM o
              UNION ALL SELECT 'n_distinct',
                CAST(count(DISTINCT order_day) AS BIGINT) FROM o
              UNION ALL SELECT 'min', CAST(min(order_day) AS BIGINT) FROM o
              UNION ALL SELECT 'max', CAST(max(order_day) AS BIGINT) FROM o
            ) m
            UNION ALL
            SELECT 'o_orderstatus', m.metric, m.value FROM (
              SELECT 'n_null' AS metric,
                     CAST(count(*) FILTER (o_orderstatus IS NULL) AS BIGINT)
                       AS value FROM o
              UNION ALL SELECT 'n_distinct',
                CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM o
            ) m
            UNION ALL
            SELECT 'o_orderpriority', m.metric, m.value FROM (
              SELECT 'n_null' AS metric,
                     CAST(count(*) FILTER (o_orderpriority IS NULL)
                          AS BIGINT) AS value FROM o
              UNION ALL SELECT 'n_distinct',
                CAST(count(DISTINCT o_orderpriority) AS BIGINT) FROM o
            ) m""",
        "props_value_cov": """
            WITH e AS (
              SELECT event_type,
                     COALESCE(CAST(regexp_extract(props, '"k":\\s*(-?\\d+)',
                                                  1) AS BIGINT), 0) AS k,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
            )
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(k) AS BIGINT) AS sx,
                   CAST(sum(v) AS BIGINT) AS sy,
                   CAST(sum(k * v) AS BIGINT) AS sxy,
                   CAST(count(*) * sum(k * v) - sum(k) * sum(v)
                        AS BIGINT) AS cov_num
            FROM e GROUP BY event_type""",
        "nation_matrix": """
            SELECT a.n_nationkey AS a, b.n_nationkey AS b,
                   CAST(a.n_regionkey AS BIGINT) AS region,
                   CAST((a.n_nationkey * 31 + b.n_nationkey) % 97
                        AS BIGINT) AS affinity
            FROM nation a CROSS JOIN nation b
            WHERE a.n_regionkey = b.n_regionkey
              AND a.n_nationkey < b.n_nationkey""",
        "diverse_top_docs": """
            WITH r AS (
              SELECT doc_id, source, n_chars,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC, doc_id) AS rs
              FROM documents
            ), t AS (
              SELECT * FROM r WHERE rs <= 2
            )
            SELECT CAST(row_number() OVER (
                     ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank,
                   doc_id, source, n_chars, CAST(rs AS BIGINT) AS rs
            FROM t ORDER BY n_chars DESC, doc_id LIMIT 20""",
        "user_value_norm": """
            SELECT event_id, user_id,
                   CAST(CAST(round(value * 100) AS BIGINT) * 1000000
                        * count(*) OVER (PARTITION BY user_id)
                        // sum(CAST(round(value * 100) AS BIGINT))
                          OVER (PARTITION BY user_id)
                        AS BIGINT) AS norm_ppm
            FROM events""",
        "join_card_est": """
            WITH a AS (
              SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
              FROM lineitem GROUP BY l_partkey
            ), b AS (
              SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n
              FROM lineitem GROUP BY l_orderkey
            ), c AS (
              SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n
              FROM orders GROUP BY o_orderkey
            )
            SELECT 'lineitem_self_partkey' AS join_name,
                   CAST(sum(n * n) AS BIGINT) AS est_rows FROM a
            UNION ALL
            SELECT 'lineitem_orders_orderkey',
                   CAST(sum(b.n * c.n) AS BIGINT)
            FROM b JOIN c ON b.l_orderkey = c.o_orderkey""",
        "contamination_frac": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws
              FROM documents
            ), g AS (
              SELECT doc_id,
                     unnest(list_transform(
                       generate_series(1, greatest(len(ws) - 2, 0)),
                       i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                       AS gram
              FROM w
            ), t AS (
              SELECT DISTINCT gram FROM g WHERE doc_id % 31 = 0
            ), pd AS (
              SELECT g.doc_id,
                     CAST(count(*) AS BIGINT) AS n_grams,
                     CAST(count(*) FILTER (
                       gram IN (SELECT gram FROM t)) AS BIGINT) AS n_hit
              FROM g GROUP BY g.doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(pd.n_grams, 0) AS BIGINT) AS n_grams,
                   CAST(COALESCE(pd.n_hit, 0) AS BIGINT) AS n_hit,
                   CAST(COALESCE(pd.n_hit, 0) * 1000000
                        // greatest(COALESCE(pd.n_grams, 0), 1)
                        AS BIGINT) AS frac_ppm
            FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id""",
        "table_checksum": """
            SELECT 'documents' AS table_name,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CAST(md5_number_lower(
                     CAST(doc_id AS VARCHAR) || '|' || text)
                     % 1000000007 AS BIGINT)) AS BIGINT) AS checksum
            FROM documents
            UNION ALL
            SELECT 'nation',
                   CAST(count(*) AS BIGINT),
                   CAST(sum(CAST(md5_number_lower(
                     CAST(n_nationkey AS VARCHAR) || '|' || n_name)
                     % 1000000007 AS BIGINT)) AS BIGINT)
            FROM nation""",
        "cube_rollup": """
            SELECT lang, source, CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY CUBE (lang, source)""",
        "orders_above_cust_avg": """
            WITH o AS (
              SELECT o_custkey,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS price
              FROM orders
            ), s AS (
              SELECT o_custkey, CAST(sum(price) AS BIGINT) AS s,
                     CAST(count(*) AS BIGINT) AS cn
              FROM o GROUP BY o_custkey
            )
            SELECT o.o_custkey AS c_custkey,
                   CAST(count(*) AS BIGINT) AS n_above
            FROM o JOIN s ON o.o_custkey = s.o_custkey
            WHERE o.price * s.cn > s.s
            GROUP BY o.o_custkey""",
        "time_multi_rollup": """
            SELECT g.granularity,
                   CAST(epoch_us(ts) // g.div AS BIGINT) AS bucket,
                   CAST(count(*) AS BIGINT) AS n
            FROM events
            CROSS JOIN (
              SELECT unnest(['hour', 'day', 'week']) AS granularity,
                     unnest([3600000000, 86400000000,
                             604800000000]) AS div) g
            GROUP BY g.granularity, bucket""",
        "user_type_mask_agg": """
            SELECT user_id,
                   CAST(sum(DISTINCT CASE event_type
                     WHEN 'view' THEN 1 WHEN 'click' THEN 2
                     WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                     ELSE 16 END) AS BIGINT) AS mask
            FROM events GROUP BY user_id""",
        "user_type_mask": """
            SELECT user_id,
                   CAST(sum(DISTINCT CASE event_type
                     WHEN 'view' THEN 1 WHEN 'click' THEN 2
                     WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                     ELSE 16 END) AS BIGINT) AS mask
            FROM events GROUP BY user_id""",
        "median_interp": """
            WITH o AS (
              SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS price
              FROM orders
            ), r AS (
              SELECT price, row_number() OVER (ORDER BY price) AS rn
              FROM o
            ), nn AS (
              SELECT count(*) AS n FROM o
            )
            SELECT CAST(nn.n AS BIGINT) AS n,
                   CAST((SELECT price FROM r WHERE rn = (nn.n + 1) // 2)
                        + (SELECT price FROM r WHERE rn = nn.n // 2 + 1)
                        AS BIGINT) AS mid2_cents
            FROM nn""",
        "region_revenue": """
            SELECT r.r_name,
                   CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS revenue
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name""",
        "trailing_active_users": """
            WITH p AS (
              SELECT DISTINCT user_id,
                     CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
              FROM events
            ), days AS (
              SELECT DISTINCT day FROM p
            )
            SELECT d.day,
                   CAST(count(DISTINCT p.user_id) AS BIGINT)
                     AS active_3d
            FROM days d JOIN p ON p.day BETWEEN d.day - 2 AND d.day
            GROUP BY d.day""",
        "user_streaks": """
            WITH p AS (
              SELECT DISTINCT user_id,
                     CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
              FROM events
            ), g AS (
              SELECT user_id, day,
                     day - row_number() OVER (
                       PARTITION BY user_id ORDER BY day) AS grp
              FROM p
            ), s AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS len
              FROM g GROUP BY user_id, grp
            )
            SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak
            FROM s GROUP BY user_id""",
        "type_cooccur_lift": """
            WITH p AS (
              SELECT DISTINCT user_id, event_type FROM events
            ), tc AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n
              FROM p GROUP BY event_type
            ), nu AS (
              SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM p
            ), co AS (
              SELECT x.event_type AS a, y.event_type AS b,
                     CAST(count(*) AS BIGINT) AS n_ab
              FROM p x JOIN p y
                ON x.user_id = y.user_id
               AND x.event_type < y.event_type
              GROUP BY x.event_type, y.event_type
            )
            SELECT co.a, co.b, ta.n AS n_a, tb.n AS n_b, co.n_ab,
                   CAST(co.n_ab * nu.n AS BIGINT) AS lift_num,
                   CAST(ta.n * tb.n AS BIGINT) AS lift_den
            FROM co JOIN tc ta ON co.a = ta.event_type
                    JOIN tc tb ON co.b = tb.event_type
                    CROSS JOIN nu""",
        "nation_region_share": """
            WITH nr AS (
              SELECT n.n_name, n.n_nationkey, n.n_regionkey,
                     CAST(sum(CAST(round(o.o_totalprice * 100)
                                   AS BIGINT)) AS BIGINT) AS revenue
              FROM orders o
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
              GROUP BY n.n_name, n.n_nationkey, n.n_regionkey
            ), rr AS (
              SELECT n_regionkey,
                     CAST(sum(revenue) AS BIGINT) AS region_revenue
              FROM nr GROUP BY n_regionkey
            )
            SELECT nr.n_name, nr.revenue, rr.region_revenue,
                   CAST(nr.revenue * 1000000 // rr.region_revenue
                        AS BIGINT) AS share_ppm
            FROM nr JOIN rr ON nr.n_regionkey = rr.n_regionkey""",
        "doc_len_pct_in_lang": """
            SELECT doc_id, lang, n_chars,
                   CAST((rank() OVER (
                          PARTITION BY lang ORDER BY n_chars) - 1)
                        * 1000000
                        // count(*) OVER (PARTITION BY lang)
                        AS BIGINT) AS pct_ppm
            FROM documents""",
        "nation_pair_flows": """
            SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                   CAST(extract(year FROM l.l_shipdate) AS BIGINT)
                       AS l_year,
                   CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l.l_discount * 100)
                                          AS BIGINT)))
                        AS BIGINT) AS revenue_e4
            FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
            JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
            WHERE s.s_nationkey <> c.c_nationkey
            GROUP BY ns.n_name, nc.n_name, l_year""",
        "sole_returner_suppliers": """
            WITH ls AS (
              SELECT l_orderkey, l_suppkey,
                     CAST(sum(CASE WHEN l_returnflag = 'R'
                              THEN 1 ELSE 0 END) AS BIGINT) AS ret_lines
              FROM lineitem GROUP BY l_orderkey, l_suppkey
            ), po AS (
              SELECT l_orderkey,
                     count(*) AS n_supp,
                     sum(CASE WHEN ret_lines > 0 THEN 1 ELSE 0 END)
                         AS n_ret_supp,
                     CAST(sum(ret_lines) AS BIGINT) AS ret_total,
                     min(CASE WHEN ret_lines > 0 THEN l_suppkey END)
                         AS ret_supp
              FROM ls GROUP BY l_orderkey
            )
            SELECT s.s_name,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(po.ret_total) AS BIGINT) AS n_ret_lines
            FROM po
            JOIN orders o ON po.l_orderkey = o.o_orderkey
            JOIN supplier s ON po.ret_supp = s.s_suppkey
            WHERE po.n_supp >= 2 AND po.n_ret_supp = 1
              AND o.o_orderstatus = 'F'
            GROUP BY s.s_name""",
        "ks_lang_len": """
            WITH g AS (
              SELECT n_chars AS v,
                     CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                          AS BIGINT) AS ne,
                     CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
                          AS BIGINT) AS no
              FROM documents GROUP BY n_chars
            ), c AS (
              SELECT CAST(sum(ne) OVER (ORDER BY v) AS BIGINT) AS cne,
                     CAST(sum(no) OVER (ORDER BY v) AS BIGINT) AS cno
              FROM g
            ), t AS (
              SELECT CAST(sum(ne) AS BIGINT) AS n_en,
                     CAST(sum(no) AS BIGINT) AS n_other
              FROM g
            )
            SELECT t.n_en, t.n_other,
                   CAST(max(abs(c.cne * t.n_other - c.cno * t.n_en))
                        AS BIGINT) AS d_num,
                   CAST(max(abs(c.cne * t.n_other - c.cno * t.n_en))
                        * 1000000 // (t.n_en * t.n_other)
                        AS BIGINT) AS ks_ppm
            FROM c, t GROUP BY t.n_en, t.n_other""",
        "order_backlog": """
            WITH le AS (
              SELECT l_orderkey,
                     CAST(epoch_us(max(l_shipdate)) // 86400000000
                          AS BIGINT) AS ed
              FROM lineitem GROUP BY l_orderkey
            ), o AS (
              SELECT CAST(epoch_us(o_orderdate) // 86400000000
                          AS BIGINT) AS sd, le.ed
              FROM orders JOIN le ON o_orderkey = l_orderkey
            ), d AS (
              SELECT sd AS day, CAST(1 AS BIGINT) AS delta FROM o
              UNION ALL
              SELECT ed, CAST(-1 AS BIGINT) FROM o
            ), g AS (
              SELECT day, CAST(sum(delta) AS BIGINT) AS delta
              FROM d GROUP BY day
            )
            SELECT day,
                   CAST(sum(delta) OVER (ORDER BY day) AS BIGINT)
                       AS open_orders
            FROM g""",
        "weighted_median_price": """
            WITH d AS (
              SELECT l_returnflag AS grp,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
                     CAST(round(l_quantity) AS BIGINT) AS w
              FROM lineitem
            ), g AS (
              SELECT grp, v, CAST(sum(w) AS BIGINT) AS w
              FROM d GROUP BY grp, v
            ), c AS (
              SELECT grp, v,
                     CAST(sum(w) OVER (PARTITION BY grp ORDER BY v)
                          AS BIGINT) AS cw,
                     CAST(sum(w) OVER (PARTITION BY grp) AS BIGINT) AS tw
              FROM g
            )
            SELECT grp AS l_returnflag,
                   CAST(min(v) AS BIGINT) AS wmedian_cents
            FROM c WHERE cw * 2 >= tw GROUP BY grp""",
        "vocab_overlap": r"""
            WITH lt AS (
              SELECT DISTINCT lang, term FROM (
                SELECT lang,
                       unnest(regexp_extract_all(text, '\S+')) AS term
                FROM documents)
            ), p AS (
              SELECT a.lang AS lang_a, b.lang AS lang_b,
                     CAST(count(*) AS BIGINT) AS n_common
              FROM lt a JOIN lt b
                   ON a.term = b.term AND a.lang < b.lang
              GROUP BY a.lang, b.lang
            ), s AS (
              SELECT lang, CAST(count(*) AS BIGINT) AS n
              FROM lt GROUP BY lang
            )
            SELECT p.lang_a, p.lang_b, sa.n AS n_a, sb.n AS n_b,
                   p.n_common,
                   CAST(p.n_common * 1000000
                        // (sa.n + sb.n - p.n_common) AS BIGINT)
                       AS jaccard_ppm
            FROM p JOIN s sa ON p.lang_a = sa.lang
                   JOIN s sb ON p.lang_b = sb.lang""",
        "rfm_scores": """
            WITH pc AS (
              SELECT o_custkey AS ck,
                     CAST(max(epoch_us(o_orderdate)) // 86400000000
                          AS BIGINT) AS last_day,
                     CAST(count(*) AS BIGINT) AS freq,
                     CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS mon
              FROM orders GROUP BY o_custkey
            ), d AS (
              SELECT ck,
                     (SELECT max(last_day) FROM pc) - last_day AS rec,
                     freq, mon
              FROM pc
            ), b AS (
              SELECT mon,
                     least(4, (rank() OVER (ORDER BY rec) - 1) * 5
                              // count(*) OVER ()) AS rb,
                     least(4, (rank() OVER (ORDER BY freq) - 1) * 5
                              // count(*) OVER ()) AS fb,
                     least(4, (rank() OVER (ORDER BY mon) - 1) * 5
                              // count(*) OVER ()) AS mb
              FROM d
            )
            SELECT CAST(rb * 100 + fb * 10 + mb AS BIGINT) AS rfm_code,
                   CAST(count(*) AS BIGINT) AS n_customers,
                   CAST(sum(mon) AS BIGINT) AS sum_monetary
            FROM b GROUP BY rfm_code""",
        "emb_norm_outliers": """
            WITH nq AS (
              SELECT vec_id,
                     CAST(list_sum(list_transform(
                          CAST(embedding AS DOUBLE[]),
                          x -> CAST(floor(x * 1048576) AS BIGINT)
                               * CAST(floor(x * 1048576) AS BIGINT)))
                          AS BIGINT) AS s
              FROM embeddings
            ), m AS (
              SELECT min(v) AS med FROM (
                SELECT s AS v,
                       count(*) OVER (ORDER BY s) * 2
                         >= count(*) OVER () AS ok
                FROM nq) WHERE ok
            ), a AS (
              SELECT vec_id, s,
                     abs(s - (SELECT med FROM m)) AS ad
              FROM nq
            ), mm AS (
              SELECT min(v) AS mad FROM (
                SELECT ad AS v,
                       count(*) OVER (ORDER BY ad) * 2
                         >= count(*) OVER () AS ok
                FROM a) WHERE ok
            )
            SELECT vec_id, CAST(s AS BIGINT) AS norm_q2,
                   CAST(CASE WHEN ad > 3 * (SELECT mad FROM mm)
                        THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
            FROM a""",
        "cohort_retention": """
            WITH a AS (
              SELECT DISTINCT o_custkey AS ck,
                     CAST(extract(year FROM o_orderdate) * 4
                          + extract(quarter FROM o_orderdate) - 1
                          AS BIGINT) AS q
              FROM orders
            ), f AS (
              SELECT ck, min(q) AS cohort_q FROM a GROUP BY ck
            )
            SELECT f.cohort_q, a.q AS active_q,
                   CAST(count(*) AS BIGINT) AS n_customers
            FROM a JOIN f ON a.ck = f.ck
            GROUP BY f.cohort_q, a.q""",
        "rank_fusion": r"""
            WITH d AS (
              SELECT doc_id, CAST(n_chars AS BIGINT) AS len_v,
                     CAST(len(string_split_regex(coalesce(text, ''),
                                                 '\s+')) AS BIGINT)
                       * 100
                       // CAST(greatest(n_chars, 1) AS BIGINT) AS q_v
              FROM documents
            ), r AS (
              SELECT doc_id,
                     rank() OVER (ORDER BY len_v DESC) AS rl,
                     rank() OVER (ORDER BY q_v DESC) AS rq
              FROM d
            )
            SELECT doc_id,
                   CAST(1000000000 // (60 + rl)
                        + 1000000000 // (60 + rq) AS BIGINT)
                       AS rrf_score
            FROM r ORDER BY rrf_score DESC, doc_id LIMIT 20""",
        "daily_anomalies": """
            WITH g AS (
              SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY day
            ), w AS (
              SELECT day, n,
                     CAST(count(n) OVER win AS BIGINT) AS wn,
                     CAST(coalesce(sum(n) OVER win, 0) AS BIGINT) AS ws,
                     CAST(coalesce(sum(n * n) OVER win, 0) AS BIGINT)
                         AS wq
              FROM g
              WINDOW win AS (ORDER BY day
                             RANGE BETWEEN 28 PRECEDING
                                       AND 1 PRECEDING)
            )
            SELECT day, n AS n_events, wn AS win_days, ws AS win_sum
            FROM w
            WHERE wn >= 7 AND (n * wn - ws) > 0
              AND (n * wn - ws) * (n * wn - ws)
                  > wn * wq - ws * ws""",
        "small_order_revenue": """
            WITH pq AS (
              SELECT l_partkey AS pk,
                     CAST(sum(CAST(round(l_quantity) AS BIGINT))
                          AS BIGINT) AS sq,
                     CAST(count(*) AS BIGINT) AS n
              FROM lineitem GROUP BY l_partkey
            )
            SELECT CAST(sum(CAST(round(l.l_extendedprice * 100)
                                 AS BIGINT)) AS BIGINT) AS revenue_e2,
                   CAST(count(*) AS BIGINT) AS n_lines
            FROM lineitem l JOIN pq ON l.l_partkey = pq.pk
            WHERE CAST(round(l.l_quantity) AS BIGINT) * 5 * pq.n
                  < pq.sq""",
        "large_orders": """
            WITH po AS (
              SELECT l_orderkey,
                     CAST(sum(CAST(round(l_quantity) AS BIGINT))
                          AS BIGINT) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING total_qty > 250
            )
            SELECT c.c_name, po.l_orderkey AS o_orderkey,
                   CAST(epoch_us(o.o_orderdate) // 86400000000
                        AS BIGINT) AS order_day,
                   CAST(round(o.o_totalprice * 100) AS BIGINT)
                       AS totalprice_e2,
                   po.total_qty
            FROM po
            JOIN orders o ON po.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey""",
        "contingency_chi2": """
            WITH cells AS (
              SELECT lang, source, CAST(count(*) AS BIGINT) AS n
              FROM documents GROUP BY lang, source
            ), tot AS (
              SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells
            ), rm AS (
              SELECT lang, CAST(sum(n) AS BIGINT) AS rn
              FROM cells GROUP BY lang
            ), cm AS (
              SELECT source, CAST(sum(n) AS BIGINT) AS cn
              FROM cells GROUP BY source
            )
            SELECT cells.lang, cells.source, cells.n,
                   CAST(cells.n * tot.nn - rm.rn * cm.cn AS BIGINT)
                       AS resid_num,
                   CAST((abs(cells.n * tot.nn - rm.rn * cm.cn)
                         // tot.nn)
                        * (abs(cells.n * tot.nn - rm.rn * cm.cn)
                           // tot.nn)
                        // greatest((rm.rn * cm.cn) // tot.nn, 1)
                        AS BIGINT) AS chi2_term
            FROM cells, tot
            JOIN rm ON cells.lang = rm.lang
            JOIN cm ON cells.source = cm.source""",
        "cov_matrix": """
            WITH m AS (
              SELECT CAST(round(l_quantity) AS BIGINT) AS x0,
                     CAST(round(l_extendedprice * 100) AS BIGINT)
                         // 10000 AS x1,
                     CAST(round(l_discount * 100) AS BIGINT) AS x2,
                     CAST(round(l_tax * 100) AS BIGINT) AS x3
              FROM lineitem
            ), s AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     sum(x0) AS s0, sum(x1) AS s1,
                     sum(x2) AS s2, sum(x3) AS s3,
                     sum(x0*x0) AS s00, sum(x0*x1) AS s01,
                     sum(x0*x2) AS s02, sum(x0*x3) AS s03,
                     sum(x1*x1) AS s11, sum(x1*x2) AS s12,
                     sum(x1*x3) AS s13, sum(x2*x2) AS s22,
                     sum(x2*x3) AS s23, sum(x3*x3) AS s33
              FROM m
            )
            SELECT p.x, p.y, s.n,
              CAST(CASE p.x || '/' || p.y
                WHEN 'qty/qty' THEN s.n*s.s00 - s.s0*s.s0
                WHEN 'qty/price_h2' THEN s.n*s.s01 - s.s0*s.s1
                WHEN 'qty/disc_e2' THEN s.n*s.s02 - s.s0*s.s2
                WHEN 'qty/tax_e2' THEN s.n*s.s03 - s.s0*s.s3
                WHEN 'price_h2/price_h2' THEN s.n*s.s11 - s.s1*s.s1
                WHEN 'price_h2/disc_e2' THEN s.n*s.s12 - s.s1*s.s2
                WHEN 'price_h2/tax_e2' THEN s.n*s.s13 - s.s1*s.s3
                WHEN 'disc_e2/disc_e2' THEN s.n*s.s22 - s.s2*s.s2
                WHEN 'disc_e2/tax_e2' THEN s.n*s.s23 - s.s2*s.s3
                WHEN 'tax_e2/tax_e2' THEN s.n*s.s33 - s.s3*s.s3
              END AS BIGINT) AS cov_num
            FROM s, (VALUES
              ('qty','qty'), ('qty','price_h2'), ('qty','disc_e2'),
              ('qty','tax_e2'), ('price_h2','price_h2'),
              ('price_h2','disc_e2'), ('price_h2','tax_e2'),
              ('disc_e2','disc_e2'), ('disc_e2','tax_e2'),
              ('tax_e2','tax_e2')) AS p(x, y)""",
        "disjunctive_brackets": """
            SELECT CAST(coalesce(sum(
                     CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))),
                   0) AS BIGINT) AS revenue_e4,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)""",
        "top_supplier_rev": """
            WITH rev AS (
              SELECT l_suppkey AS s_suppkey,
                     CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l_discount * 100)
                                        AS BIGINT))) AS BIGINT)
                         AS total_rev_e4
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1996-04-01'
              GROUP BY l_suppkey
            )
            SELECT rev.s_suppkey, s.s_name, rev.total_rev_e4
            FROM rev JOIN supplier s ON rev.s_suppkey = s.s_suppkey
            WHERE rev.total_rev_e4 = (SELECT max(total_rev_e4) FROM rev)""",
        "epoch_price_join": """
            WITH dim AS (
              SELECT p_partkey, e.idx AS epoch_idx,
                     CASE e.idx
                       WHEN 0 THEN TIMESTAMP '1995-01-01'
                       WHEN 1 THEN TIMESTAMP '1997-01-01'
                       ELSE TIMESTAMP '1999-01-01' END AS valid_from,
                     CASE e.idx
                       WHEN 0 THEN TIMESTAMP '1997-01-01'
                       WHEN 1 THEN TIMESTAMP '1999-01-01'
                       ELSE TIMESTAMP '2999-01-01' END AS valid_to,
                     90 + 5 * e.idx + p_partkey % 7 AS pct
              FROM part, (VALUES (0), (1), (2)) AS e(idx)
            )
            SELECT d.epoch_idx,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * d.pct) AS BIGINT) AS repriced_e4,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem l
            JOIN dim d ON l.l_partkey = d.p_partkey
                      AND l.l_shipdate >= d.valid_from
                      AND l.l_shipdate < d.valid_to
            GROUP BY 1""",
        "nation_market_share": """
            WITH l AS (
              SELECT l_orderkey,
                     CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))
                         AS rev,
                     s_nationkey
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              JOIN supplier ON l_suppkey = s_suppkey
              WHERE p_type = 'ECONOMY'
            )
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST(sum(CASE WHEN l.s_nationkey = 2
                            THEN l.rev ELSE 0 END) AS BIGINT)
                       AS target_rev_e4,
                   CAST(sum(l.rev) AS BIGINT) AS total_rev_e4
            FROM l
            JOIN orders ON l.l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE n_regionkey = 2
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY 1""",
        "rare_term_pairs": r"""
            WITH d AS (
              SELECT doc_id,
                     text || ' mk' || CAST(doc_id % (SELECT greatest(149, CAST(ceil(count(*) / 3.0) AS BIGINT)) FROM documents) AS VARCHAR)
                       AS text
              FROM documents
            ), inc AS (
              SELECT DISTINCT doc_id, term FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(text, '\S+')) AS term
                FROM d)
            ), rare AS (
              SELECT term FROM inc GROUP BY term HAVING count(*) <= 3
            ), ri AS (
              SELECT i.term, i.doc_id FROM inc i
              JOIN rare ON i.term = rare.term
            )
            SELECT x.doc_id AS a, y.doc_id AS b,
                   CAST(count(*) AS BIGINT) AS n_shared_terms
            FROM ri x JOIN ri y
              ON x.term = y.term AND x.doc_id < y.doc_id
            GROUP BY x.doc_id, y.doc_id""",
        "priority_semi": """
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
            FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_quantity > 45)
            GROUP BY o_orderpriority""",
        "priority_semi_native": """
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
            FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_quantity > 45)
            GROUP BY o_orderpriority""",
        "byte_blocks": """
            SELECT doc_id, CAST(n_chars AS BIGINT) AS row_bytes,
                   CAST((sum(n_chars) OVER (
                     ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                     - n_chars) // 4096 AS BIGINT) AS block_id
            FROM documents""",
        "schema_evolve": """
            WITH u AS (
              SELECT doc_id, text, NULL AS lang, NULL AS crawl_tag
              FROM documents WHERE doc_id % 2 = 0
              UNION ALL
              SELECT doc_id, text, lang, 'c2' AS crawl_tag
              FROM documents WHERE doc_id % 2 = 1
            )
            SELECT COALESCE(lang, '<missing>') AS lang,
                   COALESCE(crawl_tag, '<none>') AS crawl_tag,
                   CAST(count(*) AS BIGINT) AS n
            FROM u GROUP BY 1, 2""",
        "table_extract": """
            SELECT doc_id, CAST(0 AS BIGINT) AS table_idx,
                   r.range AS row_idx, c.range AS col_idx,
                   doc_id || '-' || r.range || '-' || c.range AS cell
            FROM documents CROSS JOIN range(2) r CROSS JOIN range(2) c""",
        "session_sets": """
            WITH s AS (
              SELECT user_id, event_id, event_type, ts,
                     CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), g AS (
              SELECT *, sum(brk) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS sess
              FROM s
            )
            SELECT user_id, min(ts) AS session_start,
                   array_to_string(list_sort(list_distinct(
                     list(event_type))), ',') AS type_set,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM g GROUP BY user_id, sess""",
        "value_trend": """
            WITH c AS (
              SELECT event_type,
                     (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01'))
                       // 3600000000 AS x,
                     CAST(round(value * 100) AS BIGINT) AS y
              FROM events
            )
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sum_x,
                   CAST(sum(y) AS BIGINT) AS sum_y,
                   CAST(sum(x * y) AS BIGINT) AS sum_xy,
                   CAST(sum(x * x) AS BIGINT) AS sum_x2
            FROM c GROUP BY event_type""",
        "value_mad": """
            WITH c AS (
              SELECT event_type,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events
            ), m AS (
              SELECT event_type, quantile_disc(v, 0.5) AS med
              FROM c GROUP BY event_type
            )
            SELECT c.event_type,
                   CAST(m.med AS BIGINT) AS median_cents,
                   CAST(quantile_disc(abs(c.v - m.med), 0.5) AS BIGINT)
                     AS mad_cents
            FROM c JOIN m ON c.event_type = m.event_type
            GROUP BY c.event_type, m.med""",
        "host_churn": """
            WITH b AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]'
                          ELSE text END AS text
              FROM documents WHERE doc_id % 7 <> 0
              UNION ALL
              SELECT doc_id + 1000000000 AS doc_id,
                     'new page ' || doc_id AS text
              FROM documents WHERE doc_id % 11 = 0
            ), diff AS (
              SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
                     CASE WHEN a.doc_id IS NULL THEN 'added'
                          WHEN b.doc_id IS NULL THEN 'removed'
                          ELSE 'changed' END AS change
              FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id
              WHERE a.doc_id IS NULL OR b.doc_id IS NULL
                 OR a.text IS DISTINCT FROM b.text
            )
            SELECT d.source, diff.change, CAST(count(*) AS BIGINT) AS n
            FROM diff JOIN documents d ON
              (CASE WHEN diff.doc_id >= 1000000000
                    THEN diff.doc_id - 1000000000
                    ELSE diff.doc_id END) = d.doc_id
            GROUP BY d.source, diff.change""",
        "token_budget": """
            SELECT doc_id, source, n_chars FROM (
              SELECT doc_id, source, n_chars,
                     sum(n_chars) OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC, doc_id ASC
                       ROWS UNBOUNDED PRECEDING) AS c
              FROM documents)
            WHERE c <= 50000""",
        "range_scan": """
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS total_cents
            FROM orders
            WHERE o_orderkey >= 1000 AND o_orderkey < 3000""",
        "skew_join": """
            WITH p AS (
              SELECT user_id AS p_user,
                     CAST(sum(CAST(round(value * 100) AS BIGINT))
                          AS BIGINT) AS user_cents
              FROM events GROUP BY user_id
            )
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(user_cents) AS BIGINT) AS total_user_cents
            FROM events JOIN p ON user_id = p_user
            GROUP BY event_type""",
        "triangle_count": """
            WITH e AS (
              SELECT DISTINCT doc_id % 211 AS src,
                              (doc_id * 13 + 7) % 211 AS dst
              FROM documents
              WHERE (doc_id % 211) <> ((doc_id * 13 + 7) % 211)
            ), u AS (
              SELECT DISTINCT least(src, dst) AS a,
                              greatest(src, dst) AS b FROM e
            )
            SELECT CAST(count(*) AS BIGINT) AS n_triangles
            FROM u x JOIN u y ON x.b = y.a
                     JOIN u z ON z.a = x.a AND z.b = y.b""",
        "bucketed_join": """
            SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment""",
        "moving_window": """
            WITH r AS (
              SELECT event_type,
                     (epoch_us(ts) // 3600000000) * 3600000000 AS h,
                     CAST(sum(CAST(round(value * 100) AS BIGINT))
                          AS BIGINT) AS cents
              FROM events GROUP BY 1, 2
            )
            SELECT event_type, make_timestamp(h) AS hour,
                   CAST(sum(cents) OVER (
                     PARTITION BY event_type ORDER BY h
                     RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS trailing_cents
            FROM r""",
        "event_debounce": """
            SELECT event_id, user_id, event_type, ts FROM (
              SELECT event_id, user_id, event_type, ts,
                     lag(ts) OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS pts
              FROM events)
            WHERE pts IS NULL OR ts - pts > INTERVAL 3600 SECOND""",
        "promo_revenue": """
            SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev
                                 ELSE 0 END) AS BIGINT) AS promo_e4,
                   CAST(sum(rev) AS BIGINT) AS total_e4
            FROM (SELECT l_partkey,
                         CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                           AS rev
                  FROM lineitem) l
            JOIN part ON l_partkey = p_partkey""",
        "embedding_dim_stats": """
            SELECT dim, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(v) AS BIGINT) AS sum_e6,
                   CAST(min(v) AS BIGINT) AS min_e6,
                   CAST(max(v) AS BIGINT) AS max_e6
            FROM (
              SELECT r.range AS dim,
                     CAST(floor(CAST(embedding[r.range + 1] AS DOUBLE)
                                * 1000000) AS BIGINT) AS v
              FROM embeddings CROSS JOIN range(64) r)
            GROUP BY dim""",
        "typo_pairs": r"""
            WITH t AS (
              SELECT DISTINCT unnest(regexp_extract_all(p_name, '\S+')) AS w
              FROM part
            )
            SELECT a.w AS w1, b.w AS w2,
                   CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
            FROM t a JOIN t b
              ON a.w < b.w AND levenshtein(a.w, b.w) <= 1""",
        "dup_cluster_hist": """
            WITH d AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 10 < 3
                          THEN 'dup bucket ' || CAST(doc_id % 50 AS VARCHAR)
                          ELSE text END AS text
              FROM documents
            ), s AS (
              SELECT CAST(count(*) AS BIGINT) AS cluster_size
              FROM d GROUP BY md5(text)
            )
            SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
            FROM s GROUP BY cluster_size""",
        "knn_multi": """
            SELECT CAST(qid AS INTEGER) AS query_idx, vec_id,
                   CAST(rank AS INTEGER) AS rank FROM (
              SELECT q.vec_id AS qid, e.vec_id AS vec_id,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(e.embedding, q.embedding)
                                  DESC, e.vec_id ASC) AS rank
              FROM embeddings e
              CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                          WHERE vec_id < 5) q)
            WHERE rank <= 10""",
        "doc_freq": r"""
            SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
                  FROM documents)
            GROUP BY term ORDER BY df DESC, term ASC LIMIT 50""",
        "kmeans_assign1": """
            WITH cent AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx,
                     embedding AS c,
                     CASE WHEN list_dot_product(embedding, embedding) = 0
                          THEN 1.0
                          ELSE sqrt(list_dot_product(embedding, embedding))
                     END AS nrm
              FROM (SELECT vec_id, embedding FROM embeddings
                    ORDER BY vec_id LIMIT 8)
            ),
            sims AS (
              SELECT e.vec_id, c.idx,
                     list_dot_product(e.embedding, c.c) / c.nrm AS s
              FROM embeddings e CROSS JOIN cent c
            )
            SELECT vec_id, CAST(idx AS BIGINT) AS cell FROM (
              SELECT vec_id, idx,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY s DESC, idx ASC) AS rn
              FROM sims)
            WHERE rn = 1""",
        "lm_bigram_counts": """
            WITH chars AS (
              SELECT substring(text, u.i, 1) AS ch
              FROM documents,
                   unnest(range(1, length(text)::BIGINT + 1)) AS u(i)
              WHERE text IS NOT NULL
            ),
            top AS (
              SELECT ch FROM (
                SELECT ch, count(*) AS n FROM chars GROUP BY ch
                ORDER BY n DESC, ch ASC LIMIT 64)
            ),
            big AS (
              SELECT CASE WHEN substring(text, u.i, 1) IN
                            (SELECT ch FROM top)
                          THEN substring(text, u.i, 1)
                          ELSE '<oov>' END AS prev_ch,
                     CASE WHEN substring(text, u.i + 1, 1) IN
                            (SELECT ch FROM top)
                          THEN substring(text, u.i + 1, 1)
                          ELSE '<oov>' END AS next_ch
              FROM documents,
                   unnest(range(1, length(text)::BIGINT)) AS u(i)
              WHERE text IS NOT NULL AND length(text) >= 2
            )
            SELECT prev_ch, next_ch, CAST(count(*) AS BIGINT) AS n
            FROM big GROUP BY prev_ch, next_ch""",
        "host_cap": _PAGE_CTE + """
            SELECT host, url FROM (
              SELECT host, url,
                     row_number() OVER (PARTITION BY host ORDER BY url) AS rn
              FROM (SELECT regexp_extract(url, '^[a-z+]+://([^/]+)', 1) AS host,
                           url
                    FROM c))
            WHERE rn <= 3""",
        "asof_click_view": """
            SELECT event_id, user_id, ts, prev_ts FROM (
              SELECT event_id, user_id, ts, event_type,
                     max(CASE WHEN event_type = 'view' THEN ts END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS prev_ts
              FROM events)
            WHERE event_type = 'click'""",
        "props_agg": """
            SELECT event_type,
                   CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
                     AS sum_k,
                   count(*) AS n
            FROM events GROUP BY event_type""",
        "top_events_per_user": """
            SELECT user_id, event_id, value, rank FROM (
              SELECT user_id, event_id, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY value DESC, event_id ASC)
                       AS rank
              FROM events)
            WHERE rank <= 3""",
        "window_distinct_users": """
            SELECT date_trunc('hour', ts) AS hour,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1""",
        "event_pivot": """
            SELECT date_trunc('day', ts) AS day,
                   CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                   CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                   CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                   CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
            FROM events GROUP BY 1""",
        "hopping_window": """
            WITH e AS (
              SELECT date_trunc('hour', ts) AS h,
                     CAST(round(value * 100) AS BIGINT) AS c
              FROM events),
            w AS (
              SELECT h AS window_start, c FROM e
              UNION ALL
              SELECT h - INTERVAL 1 HOUR, c FROM e)
            SELECT window_start,
                   CAST(sum(c) AS BIGINT) AS total_cents,
                   count(*) AS n_events
            FROM w GROUP BY window_start""",
        "customers_no_f_orders": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""",
        "customers_no_f_orders_bloom": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""",
        "customers_no_f_orders_native": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""",
        "lang_len_quantiles": """
            SELECT lang, 0.5::DOUBLE AS q,
                   CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS value
            FROM documents GROUP BY lang
            UNION ALL
            SELECT lang, 0.9::DOUBLE,
                   CAST(quantile_disc(n_chars, 0.9) AS BIGINT)
            FROM documents GROUP BY lang
            UNION ALL
            SELECT lang, 0.99::DOUBLE,
                   CAST(quantile_disc(n_chars, 0.99) AS BIGINT)
            FROM documents GROUP BY lang""",
        "span_extract": r"""
            SELECT doc_id, unnest(regexp_extract_all(text, 'scan \w+'))
                     AS match
            FROM documents""",
        "quantize_embeddings": """
            WITH u AS (
              SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
                     CAST(unnest(embedding) AS DOUBLE) AS v
              FROM embeddings),
            b AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM u GROUP BY dim)
            SELECT u.vec_id, u.dim,
                   CAST(CASE WHEN b.mx > b.mn
                             THEN floor((u.v - b.mn) / (b.mx - b.mn) * 255)
                             ELSE 0 END AS BIGINT) AS q
            FROM u JOIN b USING (dim)""",
        "label_centroids": """
            SELECT label, dim,
                   CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT))
                          AS BIGINT) AS sum_fp,
                   count(*) AS n
            FROM (SELECT label,
                         generate_subscripts(embedding, 1) AS dim,
                         unnest(embedding) AS v
                  FROM embeddings)
            GROUP BY label, dim""",
        "orders_running_total": """
            SELECT o_orderkey, o_custkey, o_orderdate,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                          OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS cum_cents
            FROM orders""",
        "pack_sequences": r"""
            WITH c AS (
              SELECT doc_id,
                     CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT)
                       AS n_tokens
              FROM documents),
            s AS (
              SELECT doc_id, n_tokens,
                     CAST(coalesce(sum(n_tokens) OVER (
                            ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS BIGINT)
                       AS tok_start
              FROM c)
            SELECT doc_id, n_tokens, tok_start,
                   tok_start // 512 AS block_start,
                   CASE WHEN n_tokens > 0
                        THEN (tok_start + n_tokens - 1) // 512
                        ELSE tok_start // 512 END AS block_end
            FROM s""",
        "shuffle_rank": """
            SELECT doc_id, md5(text) AS h,
                   row_number() OVER (ORDER BY md5(text), doc_id) AS rank
            FROM documents""",
        "events_value_stats": """
            WITH c AS (
              SELECT event_type,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events)
            SELECT event_type,
                   CAST(sum(cents) AS BIGINT) AS sum_cents,
                   CAST(sum(cents * cents) AS BIGINT) AS sum_sq_cents,
                   count(*) AS n
            FROM c GROUP BY event_type""",
        "tfidf": r"""
            WITH terms AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '\S+')) AS term
              FROM documents),
            df AS (
              SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              FROM terms GROUP BY term),
            vocab AS (
              SELECT term, df FROM df
              ORDER BY df DESC, term ASC LIMIT 50),
            tf AS (
              SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
              FROM terms GROUP BY doc_id, term)
            SELECT t.doc_id, t.term, t.tf, v.df
            FROM tf t JOIN vocab v USING (term)""",
        "kmv_sketch": """
            SELECT h FROM (
              SELECT DISTINCT md5(text) AS h FROM documents
              WHERE text IS NOT NULL)
            ORDER BY h LIMIT 64""",
        "clean_text": r"""
            SELECT doc_id,
                   trim(regexp_replace(
                        regexp_replace(lower(text), '[\x00-\x1f\x7f]', ' ', 'g'),
                        '\s+', ' ', 'g')) AS text_clean
            FROM documents""",
        "dedup_incremental": """
            SELECT doc_id, text, lang, source, n_chars
            FROM documents n
            WHERE doc_id % 2 = 1 AND NOT EXISTS (
              SELECT 1 FROM documents h
              WHERE h.doc_id % 2 = 0 AND md5(h.text) = md5(n.text))""",
        "webdataset_audit": """
            SELECT CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                             AS UBIGINT) % 8 AS BIGINT) AS shard,
                   count(*) AS n_members
            FROM documents GROUP BY shard""",
        "funnel_stages": """
            WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
                       WHERE event_type = 'view' GROUP BY user_id),
            c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                  JOIN v ON e.user_id = v.user_id
                  WHERE e.event_type = 'click' AND e.ts > v.t1
                  GROUP BY e.user_id),
            p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
                  JOIN c ON e.user_id = c.user_id
                  WHERE e.event_type = 'purchase' AND e.ts > c.t2
                  GROUP BY e.user_id),
            u AS (SELECT DISTINCT user_id FROM events)
            SELECT u.user_id,
                   CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                             WHEN c.user_id IS NOT NULL THEN 2
                             WHEN v.user_id IS NOT NULL THEN 1
                             ELSE 0 END AS BIGINT) AS stage
            FROM u LEFT JOIN v USING (user_id)
                   LEFT JOIN c USING (user_id)
                   LEFT JOIN p USING (user_id)""",
        "hourly_retention": """
            WITH p AS (SELECT DISTINCT user_id,
                              date_trunc('hour', ts) AS hour
                       FROM events)
            SELECT a.hour, count(*) AS retained_users
            FROM p a JOIN p b ON a.user_id = b.user_id
                             AND b.hour = a.hour + INTERVAL 1 HOUR
            GROUP BY a.hour""",
        "events_with_session": """
            WITH o AS (
              SELECT event_id, user_id, ts,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id)
                               > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
              FROM events),
            s AS (
              SELECT event_id, user_id, ts,
                     sum(new_s) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sess
              FROM o)
            SELECT event_id, user_id, ts,
                   min(ts) OVER (PARTITION BY user_id, sess) AS session_start
            FROM s""",
        "len_bucket": """
            WITH b AS (
              SELECT quantile_disc(n_chars, 0.25) AS q1,
                     quantile_disc(n_chars, 0.5)  AS q2,
                     quantile_disc(n_chars, 0.75) AS q3
              FROM documents)
            SELECT doc_id,
                   CAST(CASE WHEN n_chars <= q1 THEN 0
                             WHEN n_chars <= q2 THEN 1
                             WHEN n_chars <= q3 THEN 2
                             ELSE 3 END AS BIGINT) AS bucket
            FROM documents, b""",
        "trending_terms": r"""
            SELECT lang, term, n, rank FROM (
              SELECT lang, term, n,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n DESC, term ASC) AS rank
              FROM (SELECT lang, term, CAST(count(*) AS BIGINT) AS n
                    FROM (SELECT lang,
                                 unnest(regexp_extract_all(text, '\S+'))
                                   AS term
                          FROM documents)
                    GROUP BY lang, term))
            WHERE rank <= 5""",
        "len_percentile": """
            SELECT doc_id,
                   cume_dist() OVER (ORDER BY n_chars) AS pct
            FROM documents""",
        "latest_order": """
            SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
              SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate DESC,
                                                 o_orderkey DESC) AS rn
              FROM orders)
            WHERE rn = 1""",
        "cc_chain": """
            SELECT doc_id AS node,
                   CAST(doc_id - doc_id % 10 AS BIGINT) AS label
            FROM documents""",
        "lang_label_mix": """
            SELECT d.lang, CAST(e.label AS BIGINT) AS label,
                   CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
                   count(*) AS n_docs
            FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
            GROUP BY d.lang, e.label""",
        "orders_by_segment": """
            SELECT c.c_mktsegment,
                   count(*) AS n_orders,
                   CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                     AS total_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment""",
        "revenue_by_nation": """
            WITH po AS (
              SELECT l_orderkey,
                     sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                       AS rev
              FROM lineitem GROUP BY l_orderkey
            )
            SELECT n.n_name,
                   count(*) AS n_orders,
                   CAST(sum(po.rev) AS BIGINT) AS revenue
            FROM po
            JOIN orders o ON po.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name""",
        "media_meta": """
            SELECT doc_id,
                   CAST(doc_id % 640 + 16 AS INTEGER) AS width,
                   CAST(doc_id % 480 + 16 AS INTEGER) AS height,
                   CAST(doc_id % 3 + 1 AS INTEGER) AS channels,
                   CAST(18 + least((doc_id % 640 + 16) * (doc_id % 480 + 16)
                                   * (doc_id % 3 + 1), 4096) AS BIGINT) AS media_bytes
            FROM documents""",
        "media_resize": """
            SELECT doc_id,
                   CAST(64 AS INTEGER) AS out_width,
                   CAST(48 AS INTEGER) AS out_height,
                   CAST(18 + least(64 * 48 * (doc_id % 3 + 1), 4096)
                        AS BIGINT) AS out_bytes
            FROM documents""",
        "media_resize_real": """
            -- recompute the REAL codec's resized pixel sum from the
            -- same (doc_id, y, x, c) arithmetic and the same
            -- nearest-index formula src = (dst * in) // out
            SELECT d.doc_id,
                   CAST(4 AS INTEGER) AS out_width,
                   CAST(3 AS INTEGER) AS out_height,
                   CAST(sum((d.doc_id
                             + ((y2.range * (6 + d.doc_id % 4)) // 3) * 31
                             + ((x2.range * (8 + d.doc_id % 5)) // 4) * 7
                             + ch.range * 3) % 256) AS BIGINT) AS pixel_sum
            FROM documents d
            CROSS JOIN range(3) y2 CROSS JOIN range(4) x2
            CROSS JOIN range(3) ch
            GROUP BY d.doc_id""",
        "media_tiff_real": """
            -- lossless TIFF (PackBits / LZW containers) resized to
            -- 4x3: same arithmetic + nearest-index formula as
            -- media_resize_real (container-independent)
            SELECT d.doc_id,
                   CAST(4 AS INTEGER) AS out_width,
                   CAST(3 AS INTEGER) AS out_height,
                   CAST(sum((d.doc_id
                             + ((y2.range * (6 + d.doc_id % 4)) // 3) * 31
                             + ((x2.range * (8 + d.doc_id % 5)) // 4) * 7
                             + ch.range * 3) % 256) AS BIGINT) AS pixel_sum
            FROM documents d
            CROSS JOIN range(3) y2 CROSS JOIN range(4) x2
            CROSS JOIN range(3) ch
            GROUP BY d.doc_id""",
        "media_gif_real": """
            -- lossless LZW GIF resized to 4x3: palette channel c of
            -- index i is an arithmetic function of (doc_id, i, c);
            -- index at (y,x) = (d + y*5 + x*3) % 24; nearest-index
            -- src = (dst * in) // out
            WITH px AS (
              SELECT d.doc_id AS doc_id,
                     (d.doc_id
                      + ((y2.range * (6 + d.doc_id % 4)) // 3) * 5
                      + ((x2.range * (8 + d.doc_id % 5)) // 4) * 3
                     ) % 24 AS i
              FROM documents d
              CROSS JOIN range(3) y2 CROSS JOIN range(4) x2
            )
            SELECT doc_id,
                   CAST(4 AS INTEGER) AS out_width,
                   CAST(3 AS INTEGER) AS out_height,
                   CAST(sum((doc_id + i * 7) % 256
                            + (doc_id * 3 + i * 11) % 256
                            + (doc_id * 5 + i * 13) % 256) AS BIGINT)
                     AS pixel_sum
            FROM px GROUP BY doc_id""",
        "gif_frames_real": """
            -- animated GIF, step-2 frame sampling: frame f's composed
            -- RGB byte sum over the 8x8 canvas, all arithmetic
            WITH fr AS (
              SELECT d.doc_id AS doc_id, f.range AS frame_idx
              FROM documents d CROSS JOIN range(4) f
              WHERE f.range < 2 + d.doc_id % 3 AND f.range % 2 = 0
            ), px AS (
              SELECT doc_id, frame_idx,
                     (doc_id + frame_idx * 9 + y.range * 3 + x.range)
                       % 16 AS i
              FROM fr CROSS JOIN range(8) y CROSS JOIN range(8) x
            )
            SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
                   CAST(sum((doc_id + i * 7) % 256
                            + (doc_id * 3 + i * 11) % 256
                            + (doc_id * 5 + i * 13) % 256) AS BIGINT)
                     AS byte_sum
            FROM px GROUP BY doc_id, frame_idx""",
        "media_jpeg_real": """
            -- grayscale uniform-tile JPEG (all-ones quant: DC-only
            -- blocks, bit-exact through Huffman+IDCT) resized to 5x4:
            -- pixel (y,x) of the source = tile value at (y//8, x//8),
            -- nearest-index src = (dst * in) // out
            SELECT d.doc_id,
                   CAST(5 AS INTEGER) AS out_width,
                   CAST(4 AS INTEGER) AS out_height,
                   CAST(sum((d.doc_id
                     + (((y2.range * (8 * (3 + d.doc_id % 3))) // 4) // 8) * 31
                     + (((x2.range * (8 * (4 + d.doc_id % 2))) // 5) // 8) * 7
                     ) % 256) AS BIGINT) AS pixel_sum
            FROM documents d
            CROSS JOIN range(4) y2 CROSS JOIN range(5) x2
            GROUP BY d.doc_id""",
        "media_png_real": """
            -- 2-channel (gray+alpha) PNG resized to 5x4 through the
            -- real zlib codec: same pixel arithmetic + nearest-index
            -- formula, summed over 2 channels
            SELECT d.doc_id,
                   CAST(5 AS INTEGER) AS out_width,
                   CAST(4 AS INTEGER) AS out_height,
                   CAST(sum((d.doc_id
                             + ((y2.range * (6 + d.doc_id % 4)) // 4) * 31
                             + ((x2.range * (8 + d.doc_id % 5)) // 5) * 7
                             + ch.range * 3) % 256) AS BIGINT) AS pixel_sum
            FROM documents d
            CROSS JOIN range(4) y2 CROSS JOIN range(5) x2
            CROSS JOIN range(2) ch
            GROUP BY d.doc_id""",
        "audio_g711_real": """
            -- G.711 expansion recomputed in SQL: payload byte
            -- b = (d*13 + i*7) % 256; mu-law (even d): u = 255 - b,
            -- mag = ((u%16)*8 + 132) * 2^((u//16)%8) - 132, sign from
            -- u >= 128; A-law (odd d): a = xor(b, 85), exp=(a//16)%8,
            -- mag = exp=0 ? (a%16)*16+8 : ((a%16)*16+264)*2^(exp-1),
            -- POSITIVE when a >= 128
            WITH s AS (
              SELECT d.doc_id AS doc_id, i.range AS i,
                     (d.doc_id * 13 + i.range * 7) % 256 AS b,
                     48 + d.doc_id % 17 AS n
              FROM documents d CROSS JOIN range(65) i
              WHERE i.range < 48 + d.doc_id % 17
            ), e AS (
              SELECT doc_id, i, n,
                CASE WHEN doc_id % 2 = 0 THEN
                  CASE WHEN (255 - b) >= 128 THEN
                    -((((255 - b) % 16) * 8 + 132)
                      * (1 << (((255 - b) // 16) % 8)) - 132)
                  ELSE
                    ((((255 - b) % 16) * 8 + 132)
                     * (1 << (((255 - b) // 16) % 8)) - 132)
                  END
                ELSE
                  CASE WHEN xor(b, 85) >= 128 THEN
                    CASE WHEN ((xor(b, 85) // 16) % 8) = 0
                         THEN (xor(b, 85) % 16) * 16 + 8
                         ELSE ((xor(b, 85) % 16) * 16 + 264)
                              * (1 << (((xor(b, 85) // 16) % 8) - 1))
                    END
                  ELSE
                    -(CASE WHEN ((xor(b, 85) // 16) % 8) = 0
                           THEN (xor(b, 85) % 16) * 16 + 8
                           ELSE ((xor(b, 85) % 16) * 16 + 264)
                                * (1 << (((xor(b, 85) // 16) % 8) - 1))
                      END)
                  END
                END AS x
              FROM s
            ), z AS (
              SELECT doc_id, n, x,
                     lag(x) OVER (PARTITION BY doc_id ORDER BY i) AS px
              FROM e
            )
            SELECT doc_id,
                   CAST(8000 AS INTEGER) AS sample_rate,
                   CAST(max(n) AS BIGINT) AS n_samples,
                   CAST(1 AS INTEGER) AS n_channels,
                   CAST(sum(abs(x)) AS BIGINT) AS sum_abs,
                   CAST(sum(x * x) AS BIGINT) AS sum_sq,
                   CAST(sum(CASE WHEN px IS NOT NULL
                                  AND ((x >= 0) <> (px >= 0))
                            THEN 1 ELSE 0 END) AS BIGINT)
                     AS zero_crossings,
                   CAST(NULL AS VARCHAR) AS media_error
            FROM z GROUP BY doc_id""",
        "audio_meta": """
            WITH s AS (
              SELECT d.doc_id, i.range AS i,
                     ((d.doc_id * 7 + i.range * 13) % 4001) - 2000 AS x,
                     64 + d.doc_id % 37 AS n
              FROM documents d CROSS JOIN range(100) i
              WHERE i.range < 64 + d.doc_id % 37
            ), z AS (
              SELECT doc_id, n, x,
                     lag(x) OVER (PARTITION BY doc_id ORDER BY i) AS px
              FROM s
            )
            SELECT doc_id,
                   CAST(8000 + (doc_id % 3) * 4000 AS INTEGER)
                     AS sample_rate,
                   CAST(max(n) AS BIGINT) AS n_samples,
                   CAST(1 AS INTEGER) AS n_channels,
                   CAST(sum(abs(x)) AS BIGINT) AS sum_abs,
                   CAST(sum(x * x) AS BIGINT) AS sum_sq,
                   CAST(sum(CASE WHEN px IS NOT NULL
                                  AND ((x >= 0) <> (px >= 0))
                            THEN 1 ELSE 0 END) AS BIGINT)
                     AS zero_crossings,
                   CAST(NULL AS VARCHAR) AS media_error
            FROM z GROUP BY doc_id""",
        "audio_resample_real": """
            WITH p AS (
              SELECT doc_id, 64 + doc_id % 37 AS n,
                     8000 + (doc_id % 3) * 4000 AS rate
              FROM documents
            ), q AS (
              SELECT doc_id, n, (n * 4000) // rate AS n_out FROM p
            ), j AS (
              SELECT q.doc_id, q.n_out,
                     ((q.doc_id * 7
                       + ((jj.range * q.n) // q.n_out) * 13) % 4001)
                       - 2000 AS x
              FROM q CROSS JOIN range(51) jj
              WHERE jj.range < q.n_out
            )
            SELECT doc_id,
                   CAST(4000 AS INTEGER) AS out_rate,
                   CAST(max(n_out) AS BIGINT) AS out_samples,
                   CAST(sum(x) AS BIGINT) AS sample_sum
            FROM j GROUP BY doc_id""",
        "frame_sample_real": """
            -- pixel(f,y,x) = (doc_id + f*7 + y*5 + x) % 256 over a
            -- 4x5 luma frame; frames sampled every 3rd
            SELECT d.doc_id, CAST(f.range AS INTEGER) AS frame_idx,
                   CAST(sum((d.doc_id + f.range * 7
                             + y.range * 5 + x.range) % 256)
                        AS BIGINT) AS frame_sum
            FROM documents d
            CROSS JOIN range(0, 10, 3) f
            CROSS JOIN range(4) y CROSS JOIN range(5) x
            WHERE f.range < d.doc_id % 10 + 1
            GROUP BY d.doc_id, f.range""",
        "frame_sample": """
            SELECT doc_id, CAST(f.range AS INTEGER) AS frame_idx
            FROM documents CROSS JOIN range(0, 10, 3) f
            WHERE f.range < doc_id % 10 + 1""",
        # Near-dup pairs: LSH-found candidates verified with EXACT
        # jaccard, and the testdata's pair margins are wide (nothing in
        # [0.7, 0.8); found pairs all >= 0.89 — measured), so DuckDB can
        # recompute the identical verified pair set + values.
        "dedup_minhash": _WORD_SHINGLES_CTE + _PAIR_JACCARD_SQL,
        "dedup_ngram": _CHAR_SHINGLES_CTE + _PAIR_JACCARD_SQL,
        # Exact brute-force cosine pairs (ids only: the float cosine
        # itself differs in low bits between numpy and DuckDB, but the
        # min margin to the 0.45 threshold is 5.5e-4 — measured)
        "dedup_embedding": """
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45""",
        # SemDeDup pinned regime: first-8 centroid init + one assignment
        # pass (the kmeans_assign1 argmax twin), then the keep-first
        # pairwise prune within each cell at cosine >= 0.45 (margins
        # measured: assignment ~1e-4, threshold 5.5e-4)
        "semdedup": """
            WITH cent AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx,
                     embedding AS c,
                     CASE WHEN list_dot_product(embedding, embedding) = 0
                          THEN 1.0
                          ELSE sqrt(list_dot_product(embedding, embedding))
                     END AS nrm
              FROM (SELECT vec_id, embedding FROM embeddings
                    ORDER BY vec_id LIMIT 8)
            ),
            asg AS (
              SELECT vec_id, CAST(idx AS BIGINT) AS cell FROM (
                SELECT e.vec_id, c.idx,
                       row_number() OVER (
                         PARTITION BY e.vec_id
                         ORDER BY list_dot_product(e.embedding, c.c) / c.nrm
                                    DESC,
                                  c.idx ASC) AS rn
                FROM embeddings e CROSS JOIN cent c)
              WHERE rn = 1
            )
            SELECT a.vec_id, a.cell,
                   EXISTS (
                     SELECT 1 FROM asg b
                     JOIN embeddings x ON x.vec_id = a.vec_id
                     JOIN embeddings y ON y.vec_id = b.vec_id
                     WHERE b.cell = a.cell AND b.vec_id < a.vec_id
                       AND list_cosine_similarity(x.embedding, y.embedding)
                             >= 0.45
                   ) AS dropped
            FROM asg a""",
        "lang_id": _lang_id_sql(),
        "quality_score": _quality_cte() + """
            SELECT doc_id, punct_ratio, stopword_ratio, mean_token_len,
                   quality
            FROM quality_m""",
        # curate = lang-ID + quality + near-dup keep decision; all three
        # are exactly recomputable (components via min-label propagation
        # over the verified pair set)
        "curate": f"""
            WITH RECURSIVE
            lang AS ({_lang_id_sql()}),
            qual AS ({_quality_cte()}
                     SELECT doc_id, quality FROM quality_m),
            pairs AS ({_WORD_SHINGLES_CTE}{_PAIR_AB_INVERTED}),
            edges(x, y) AS (SELECT a, b FROM pairs
                            UNION ALL SELECT b, a FROM pairs),
            cc(n, m) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT e.y, cc.m FROM edges e JOIN cc ON cc.n = e.x
            ),
            roots AS (SELECT n AS doc_id, min(m) AS root FROM cc GROUP BY n)
            SELECT d.doc_id, lang.lang_pred, qual.quality, TRUE AS keep
            FROM documents d
            JOIN lang USING (doc_id)
            JOIN qual USING (doc_id)
            JOIN roots USING (doc_id)
            WHERE roots.root = d.doc_id AND qual.quality >= 0.0""",
        # corpus_build = the whole downstream story chained: page
        # universe → done-row extraction reconstruction → exact dedup
        # (min-seq winner per distinct text) → lang/quality/near-dup
        # curation over the SURVIVORS (the three curate fragments,
        # re-pointed from `documents` to the survivor CTE) → 512-token
        # concat-then-chunk packing in ascending key order
        "corpus_build": f"""
            WITH RECURSIVE
            pg AS (
              {_PAGE_CTE}
              SELECT seq AS pkey, {_EXTRACTED_EXPR} AS text
              FROM c WHERE {_STATUS_EXPR} = 'done'
            ),
            corpus AS (
              SELECT pkey AS doc_id, text FROM (
                SELECT pkey, text,
                       row_number() OVER (PARTITION BY text
                                          ORDER BY pkey) AS rn
                FROM pg) WHERE rn = 1
            ),
            lang AS ({_lang_id_sql().replace("FROM documents",
                                             "FROM corpus")}),
            qual AS ({_quality_cte().replace("FROM documents",
                                             "FROM corpus")}
                     SELECT doc_id, quality FROM quality_m),
            pairs AS ({_WORD_SHINGLES_CTE.replace("FROM documents",
                                                  "FROM corpus")}
                      {_PAIR_AB_INVERTED}),
            edges(x, y) AS (SELECT a, b FROM pairs
                            UNION ALL SELECT b, a FROM pairs),
            cc(n, m) AS (
              SELECT doc_id, doc_id FROM corpus
              UNION
              SELECT e.y, cc.m FROM edges e JOIN cc ON cc.n = e.x
            ),
            roots AS (SELECT n AS doc_id, min(m) AS root FROM cc GROUP BY n),
            kept AS (
              SELECT c2.doc_id, c2.text, lang.lang_pred, qual.quality
              FROM corpus c2
              JOIN lang USING (doc_id)
              JOIN qual USING (doc_id)
              JOIN roots USING (doc_id)
              WHERE roots.root = c2.doc_id AND qual.quality >= 0.1
            ),
            cnt AS (
              SELECT doc_id, lang_pred, quality,
                     CAST(length(regexp_extract_all(text, '\\S+'))
                          AS BIGINT) AS n_tokens
              FROM kept),
            sq AS (
              SELECT doc_id, lang_pred, quality, n_tokens,
                     CAST(coalesce(sum(n_tokens) OVER (
                            ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS BIGINT)
                       AS tok_start
              FROM cnt)
            SELECT doc_id, lang_pred, quality, n_tokens, tok_start,
                   tok_start // 512 AS block_start,
                   CASE WHEN n_tokens > 0
                        THEN (tok_start + n_tokens - 1) // 512
                        ELSE tok_start // 512 END AS block_end
            FROM sq""",
        # SimHash pinned to its exact regime: md5 word hashes
        # (md5_number_upper = little-endian first 8 digest bytes,
        # matching the engine's word_hash="md5") reconstruct the
        # 64-bit signatures in SQL; pigeonhole banding is complete for
        # Hamming <= 3, so the engine's banded pair set equals this
        # brute-force signature self-join
        "dedup_simhash": r"""
            WITH words AS (
              SELECT doc_id, w FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(text, '\s+')) AS w
                FROM documents
              ) WHERE w <> ''
            ), wh AS (
              SELECT doc_id, md5_number_upper(w) AS h FROM words
            ), bits AS (
              SELECT doc_id, r.range AS bit,
                     SUM(CASE WHEN (h >> CAST(r.range AS INTEGER)) & 1 = 1
                              THEN 1 ELSE -1 END) AS acc
              FROM wh, range(64) r GROUP BY doc_id, r.range
            ), sigs AS (
              SELECT doc_id,
                     bit_or(CASE WHEN acc > 0
                                 THEN CAST((CAST(1 AS HUGEINT)
                                            << CAST(bit AS INTEGER))
                                           AS UBIGINT)
                                 ELSE CAST(0 AS UBIGINT) END) AS sig
              FROM bits GROUP BY doc_id
            )
            SELECT x.doc_id AS a, y.doc_id AS b,
                   CAST(bit_count(xor(x.sig, y.sig)) AS BIGINT) AS distance
            FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
            WHERE bit_count(xor(x.sig, y.sig)) <= 3""",
        # IVF knn pinned to its exact regime (n_probe = n_cells →
        # candidate set = whole corpus): the brute-force twin applies
        "knn_ivf": """
            SELECT vec_id, CAST(rank AS INTEGER) AS rank FROM (
              SELECT vec_id,
                     row_number() OVER (
                       ORDER BY list_cosine_similarity(
                         embedding,
                         (SELECT embedding FROM embeddings WHERE vec_id = 0)
                       ) DESC, vec_id ASC) AS rank
              FROM embeddings)
            WHERE rank <= 10""",
        "knn_ivf_indexed": """
            SELECT vec_id, CAST(rank AS INTEGER) AS rank FROM (
              SELECT vec_id,
                     row_number() OVER (
                       ORDER BY list_cosine_similarity(
                         embedding,
                         (SELECT embedding FROM embeddings WHERE vec_id = 0)
                       ) DESC, vec_id ASC) AS rank
              FROM embeddings)
            WHERE rank <= 10""",
        # SRP-LSH pinned to a candidate-complete dense regime (see the
        # query docstring): verified pairs = exact threshold pairs
        "dedup_embedding_lsh": """
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45""",
    }
