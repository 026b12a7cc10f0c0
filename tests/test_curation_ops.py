"""Tests for the curation/export operators: PII redaction, repetition
stats, stratified sampling, exact quantiles, line dedup,
decontamination, hash-shard export."""

import hashlib
import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from pmocr_ray.ops.dedup import (
    benchmark_shingles,
    decontaminate,
    explode_lines,
    line_dedup,
)
from pmocr_ray.ops.export import assign_shard, shard_counts, shard_export
from pmocr_ray.ops.text import (
    length_quantiles,
    redact_pii,
    repetition_stats,
    stratified_sample,
)


# ---------------------------------------------------------------- redact


def test_redact_pii_patterns():
    t = pa.table({"text": [
        "mail me at jane.doe+x@sub.example.org today",
        "server at 192.168.001.7 and +1 415-555-0199 thanks",
        "no pii here",
    ]})
    out = redact_pii(t)["text_redacted"].to_pylist()
    assert out[0] == "mail me at <EMAIL> today"
    assert out[1] == "server at <IP> and <PHONE> thanks"
    assert out[2] == "no pii here"


def test_redact_pii_is_vectorized_no_partial_leak():
    # an email inside a longer token is still caught (no \b on email)
    t = pa.table({"text": ["x a@b.co y", "ip 1.2.3.4."]})
    out = redact_pii(t)["text_redacted"].to_pylist()
    assert out == ["x <EMAIL> y", "ip <IP>."]


# ------------------------------------------------------------ repetition


def test_repetition_stats_values():
    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            "a b a b a b",        # 6 toks, 2 distinct, "a b" x3 of 5 slots
            "w x y z",            # all distinct, every bigram once
            "",                   # empty
        ],
    })
    out = repetition_stats(t)
    dr = out["distinct_ratio"].to_pylist()
    tb = out["top_bigram_frac"].to_pylist()
    assert dr[0] == pytest.approx(2 / 6)
    assert tb[0] == pytest.approx(3 / 5)
    assert dr[1] == 1.0 and tb[1] == pytest.approx(1 / 3)
    assert dr[2] == 0.0 and tb[2] == 0.0


def test_repetition_stats_single_token_doc():
    out = repetition_stats(pa.table({"doc_id": [1], "text": ["solo"]}))
    assert out["distinct_ratio"].to_pylist() == [1.0]
    assert out["top_bigram_frac"].to_pylist() == [0.0]


# -------------------------------------------------------------- sampling


def test_stratified_sample_thresholds_and_determinism(ray_session):
    rows = [{"k": f"url{i}", "g": "en" if i % 2 else "de"} for i in range(400)]
    ds = rd.from_items(rows)
    thresholds = {"en": "4"}  # ~25% of en, all de
    got1 = sorted(r["k"] for r in
                  stratified_sample(ds, "g", thresholds, key_column="k")
                  .take_all())
    got2 = sorted(r["k"] for r in
                  stratified_sample(rd.from_items(rows), "g", thresholds,
                                    key_column="k").take_all())
    assert got1 == got2  # deterministic
    exp = sorted(
        r["k"] for r in rows
        if r["g"] == "de" or hashlib.md5(r["k"].encode()).hexdigest()[:1] < "4"
    )
    assert got1 == exp
    n_de = sum(1 for k in got1 if int(k[3:]) % 2 == 0)
    assert n_de == 200  # group without threshold kept wholesale


# -------------------------------------------------------------- quantiles


def test_length_quantiles_exact(ray_session):
    vals = [1, 1, 2, 9]
    ds = rd.from_items([{"n_chars": v} for v in vals])
    out = length_quantiles(ds, qs=(0.5, 0.75, 0.9))
    # DuckDB quantile_disc rule: value at 1-based rank ceil(q*n)
    assert out["value"].to_pylist() == [1, 2, 9]
    assert out["q"].to_pylist() == [0.5, 0.75, 0.9]


def test_length_quantiles_partition_invariant(ray_session):
    vals = list(range(100, 0, -1)) * 3
    a = length_quantiles(rd.from_items([{"n_chars": v} for v in vals]))
    b = length_quantiles(
        rd.from_items([{"n_chars": v} for v in vals]).repartition(7))
    assert a.to_pylist() == b.to_pylist()


# ------------------------------------------------------------- line dedup


def test_explode_lines_chunking(ray_session):
    ds = rd.from_items([{"doc_id": 5, "text": " ".join(str(i) for i in range(23))}])
    rows = sorted(explode_lines(ds, width=10).take_all(),
                  key=lambda r: r["line_no"])
    assert [r["line_no"] for r in rows] == [0, 1, 2]
    assert rows[0]["line"] == " ".join(str(i) for i in range(10))
    assert rows[2]["line"] == "20 21 22"


def test_line_dedup_keeps_global_first_occurrence(ray_session):
    shared = " ".join(f"w{i}" for i in range(10))
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(10))
    ds = rd.from_items([
        {"doc_id": 1, "text": shared + " " + uniq_a},
        {"doc_id": 2, "text": shared + " " + uniq_b},  # loses the shared line
        {"doc_id": 3, "text": shared},                 # loses everything
    ])
    out = {r["doc_id"]: r["text_dedup"] for r in line_dedup(ds).take_all()}
    assert out == {1: shared + "\n" + uniq_a, 2: uniq_b}


def test_line_dedup_within_doc_repeat(ray_session):
    line = " ".join(f"t{i}" for i in range(10))
    ds = rd.from_items([{"doc_id": 9, "text": line + " " + line}])
    out = line_dedup(ds).take_all()
    assert out == [{"doc_id": 9, "text_dedup": line}]


def test_line_dedup_partition_invariant(ray_session, sf_small):
    docs = rd.read_parquet(os.path.join(sf_small, "documents.parquet"),
                           columns=["doc_id", "text"])
    a = sorted((r["doc_id"], r["text_dedup"])
               for r in line_dedup(docs).take_all())
    b = sorted((r["doc_id"], r["text_dedup"])
               for r in line_dedup(docs.repartition(11)).take_all())
    assert a == b


# --------------------------------------------------------- decontaminate


def test_decontaminate_flags_13gram_overlap(ray_session):
    bench_text = " ".join(f"q{i}" for i in range(20))
    clean_text = " ".join(f"c{i}" for i in range(20))
    # doc 2 embeds 13 consecutive benchmark tokens mid-document
    leak = "x0 " + " ".join(f"q{i}" for i in range(3, 16)) + " x1"
    bench = rd.from_items([{"doc_id": 0, "text": bench_text}])
    corpus = rd.from_items([
        {"doc_id": 1, "text": clean_text},
        {"doc_id": 2, "text": leak},
        {"doc_id": 3, "text": "short doc"},
    ])
    shingles = benchmark_shingles(bench, n=13)
    assert len(shingles) == 8  # 20 - 13 + 1
    out = {r["doc_id"]: r["contaminated"]
           for r in decontaminate(corpus, shingles, n=13).take_all()}
    assert out == {1: False, 2: True, 3: False}


# ------------------------------------------------------------- sharding


def test_assign_shard_matches_md5():
    t = pa.table({"url": ["u1", "u2", "u3"]})
    got = assign_shard(t, n_shards=7)["shard"].to_pylist()
    exp = [int(hashlib.md5(u.encode()).hexdigest()[:8], 16) % 7
           for u in ["u1", "u2", "u3"]]
    assert got == exp


def test_shard_export_membership_deterministic(ray_session, tmp_path):
    rows = [{"url": f"https://h/{i}", "v": i} for i in range(200)]
    out1 = str(tmp_path / "e1")
    out2 = str(tmp_path / "e2")
    shard_export(rd.from_items(rows), out1, n_shards=4)
    shard_export(rd.from_items(rows).repartition(9), out2, n_shards=4)

    def membership(path):
        import pyarrow.dataset as pads

        t = pads.dataset(path, partitioning="hive").to_table()
        return sorted(zip(t["url"].to_pylist(),
                          [int(s) for s in t["shard"].to_pylist()]))

    m1, m2 = membership(out1), membership(out2)
    assert m1 == m2  # identical membership on a different partitioning
    assert len(m1) == 200
    assert {s for _, s in m1} == {0, 1, 2, 3}


def test_shard_counts_total(ray_session):
    ds = rd.from_items([{"url": f"u{i}"} for i in range(100)])
    out = shard_counts(ds, n_shards=5).take_all()
    assert sum(r["n"] for r in out) == 100
    assert all(0 <= r["shard"] < 5 for r in out)


def test_clean_text_normalizes(ray_session):
    import pandas as pd
    import ray.data as rd

    from pmocr_ray.ops.text import clean_text

    df = pd.DataFrame({"text": ["  Hello\t WORLD\n\nx ", "a\x01b"]})
    out = (rd.from_pandas(df).map_batches(clean_text, batch_format="pyarrow")
           .to_pandas())
    assert list(out["text_clean"]) == ["hello world x", "a b"]


def test_incremental_exact_dedup_drops_seen_content(ray_session):
    import pandas as pd
    import ray.data as rd

    from pmocr_ray.ops.dedup import incremental_exact_dedup

    history = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2], "text": ["seen before", "also seen"]}))
    new = rd.from_pandas(pd.DataFrame(
        {"doc_id": [10, 11, 12],
         "text": ["seen before", "brand new", "also seen"]}))
    out = incremental_exact_dedup(new, history, n_bits=1 << 10).to_pandas()
    assert list(out["doc_id"]) == [11]
    assert "fp" not in out.columns


def test_webdataset_export_deterministic_tars(ray_session, tmp_path):
    import hashlib
    import tarfile

    import pandas as pd
    import ray.data as rd

    from pmocr_ray.ops.export import webdataset_export

    df = pd.DataFrame({"doc_id": range(20),
                       "text": [f"doc body {i}" for i in range(20)]})
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    audit = webdataset_export(rd.from_pandas(df), out1,
                              n_shards=4).to_pandas()
    assert audit["n_members"].sum() == 20
    # re-export under a different partitioning: identical shard bytes
    webdataset_export(rd.from_pandas(df).repartition(7), out2,
                      n_shards=4).to_pandas()
    for s in audit["shard"]:
        h1 = hashlib.md5(open(f"{out1}/shard-{s}.tar", "rb").read()).hexdigest()
        h2 = hashlib.md5(open(f"{out2}/shard-{s}.tar", "rb").read()).hexdigest()
        assert h1 == h2
    # members are readable and named by key
    with tarfile.open(f"{out1}/shard-{audit['shard'].iloc[0]}.tar") as tar:
        names = tar.getnames()
        assert all(n.endswith(".txt") for n in names)
        m = tar.extractfile(names[0]).read().decode()
        assert m.startswith("doc body ")


def test_jsonl_source_roundtrip_extraction(ray_session, tmp_path):
    """JSONL ingest path produces byte-identical extraction output to
    the Parquet path over the same pages."""
    import collections

    from pmocr_ray.fixtures import ensure_pages_fixture
    from pmocr_ray.pipeline import run_extraction
    from pmocr_ray.sources import pages_to_jsonl, read_pages_jsonl

    pages, manifest = ensure_pages_fixture("/root/testdata/sf0.001")
    jdir = str(tmp_path / "pages_jsonl")
    pages_to_jsonl(pages, jdir)

    via_jsonl = run_extraction(read_pages_jsonl(jdir), manifest,
                               run_id="jsonl")
    via_parquet = run_extraction(pages, manifest, run_id="parquet")
    a = {r["url"]: (r["status"], r["extracted_text"])
         for r in via_jsonl.select_columns(
             ["url", "status", "extracted_text"]).take_all()}
    b = {r["url"]: (r["status"], r["extracted_text"])
         for r in via_parquet.select_columns(
             ["url", "status", "extracted_text"]).take_all()}
    assert a == b
    assert collections.Counter(s for s, _ in a.values())["done"] == 3000


def test_collocation_pairs_counts(ray_session):
    """Known corpus: exact pair and unigram counts, vocab restriction,
    min_count filter."""
    import pandas as pd

    import ray.data as rd
    from pmocr_ray.ops.text import collocation_pairs

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["big data big data big",
                 "data big data",
                 "rare word big data"],
    })
    out = collocation_pairs(rd.from_pandas(df).repartition(3),
                            vocab_k=2, min_count=2).to_pandas()
    got = {(r.w1, r.w2): (r.pair_n, r.w1_n, r.w2_n)
           for r in out.itertuples()}
    # vocab_k=2 keeps {big:5, data:5}; 'rare'/'word' excluded
    assert got == {("big", "data"): (4, 5, 5),
                   ("data", "big"): (3, 5, 5)}


def test_collocation_pairs_adjacency_not_cross_doc(ray_session):
    """The last token of one doc never pairs with the first of the next."""
    import pandas as pd

    import ray.data as rd
    from pmocr_ray.ops.text import collocation_pairs

    df = pd.DataFrame({"doc_id": [0, 1, 2, 3],
                       "text": ["alpha beta"] * 2 + ["beta alpha"] * 2})
    out = collocation_pairs(rd.from_pandas(df).repartition(1),
                            vocab_k=5, min_count=1).to_pandas()
    got = {(r.w1, r.w2): r.pair_n for r in out.itertuples()}
    assert got == {("alpha", "beta"): 2, ("beta", "alpha"): 2}


def test_snapshot_diff_classification(ray_session):
    import pandas as pd

    import ray.data as rd
    from pmocr_ray.ops.compact import snapshot_diff

    a = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                      "text": ["one", "two", "three", "four"]})
    b = pd.DataFrame({"doc_id": [2, 3, 4, 5],
                      "text": ["two", "THREE", "four", "five"]})
    out = snapshot_diff(rd.from_pandas(a).repartition(2),
                        rd.from_pandas(b).repartition(3)).to_pandas()
    got = dict(zip(out["doc_id"], out["change"]))
    assert got == {1: "removed", 3: "changed", 5: "added"}


def test_snapshot_diff_identical_is_empty(ray_session):
    import pandas as pd

    import ray.data as rd
    from pmocr_ray.ops.compact import snapshot_diff

    a = pd.DataFrame({"doc_id": [1, 2], "text": ["x", "y"]})
    out = snapshot_diff(rd.from_pandas(a), rd.from_pandas(a)).to_pandas()
    assert len(out) == 0


def test_dup_cluster_histogram(ray_session):
    import pandas as pd

    import ray.data as rd
    from pmocr_ray.ops.dedup import dup_cluster_histogram

    texts = (["same"] * 4) + (["also same"] * 2) + ["solo1", "solo2",
                                                    "solo3"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = dup_cluster_histogram(rd.from_pandas(df).repartition(4)).to_pandas()
    got = dict(zip(out["cluster_size"], out["n_clusters"]))
    assert got == {4: 1, 2: 1, 1: 3}


def test_host_mirror_pairs_counts_and_cap(ray_session):
    import pandas as pd

    import ray.data as rd
    from pmocr_ray.ops.dedup import host_mirror_pairs

    rows = [
        ("https://a.x/1", "mirrored"), ("https://b.x/1", "mirrored"),
        ("https://c.x/1", "mirrored"),
        ("https://a.x/2", "shared-ab"), ("https://b.x/2", "shared-ab"),
        ("https://a.x/3", "solo"), ("https://d.x/9", None),
    ]
    df = pd.DataFrame(rows, columns=["url", "extracted_text"])
    out = host_mirror_pairs(rd.from_pandas(df).repartition(3)).to_pandas()
    got = {(r.host_a, r.host_b): r.n_shared for r in out.itertuples()}
    assert got == {("a.x", "b.x"): 2, ("a.x", "c.x"): 1,
                   ("b.x", "c.x"): 1}
    # cap: with max_hosts_per_content=2 only the lexicographic prefix
    # {a.x, b.x} of the 3-host cluster emits
    capped = host_mirror_pairs(rd.from_pandas(df).repartition(3),
                               max_hosts_per_content=2).to_pandas()
    gotc = {(r.host_a, r.host_b): r.n_shared for r in capped.itertuples()}
    assert gotc == {("a.x", "b.x"): 2}


def test_plan_compaction_ffd():
    from pmocr_ray.ops.compact import plan_compaction

    sizes = {"a": 60, "b": 50, "c": 40, "d": 30, "e": 200}
    groups = plan_compaction(sizes, target_bytes=100)
    # e oversized → singleton; FFD: 60+40, 50+30
    assert sorted(map(sorted, groups)) == [["a", "c"], ["b", "d"], ["e"]]


def test_compact_small_files_preserves_rows(ray_session, tmp_path):
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pmocr_ray.ops.compact import compact_small_files

    in_dir = str(tmp_path / "small"); os.makedirs(in_dir)
    out_dir = str(tmp_path / "compacted")
    for i in range(12):
        pq.write_table(
            pa.table({"k": pa.array(range(i * 10, i * 10 + 10), pa.int64()),
                      "v": pa.array([f"r{j}" for j in range(10)])}),
            f"{in_dir}/part-{i:03d}.parquet")
    some = os.path.getsize(f"{in_dir}/part-000.parquet")
    outs = compact_small_files(in_dir, out_dir, target_bytes=some * 4)
    assert 3 <= len(outs) < 12
    got = pd.concat([pq.read_table(f).to_pandas() for f in outs])
    assert sorted(got["k"]) == list(range(120))
    # deterministic rerun overwrites, not duplicates
    outs2 = compact_small_files(in_dir, out_dir, target_bytes=some * 4)
    assert outs2 == outs
    assert len(os.listdir(out_dir)) == len(outs)


def test_cheapest_supplier_tie_breaks_min_suppkey(ray_session):
    """Driver query helper: argmin ties resolve to the smaller suppkey
    under any partitioning."""
    import importlib.util

    import pandas as pd

    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({
            "l_partkey": pa.array([1, 1, 1, 2], pa.int64()),
            "l_suppkey": pa.array([9, 3, 3, 5], pa.int64()),
            "l_extendedprice": pa.array([10.0, 5.0, 5.0, 7.0]),
        }), os.path.join(d, "lineitem.parquet"))
        out = m._q_cheapest_supplier(d).to_pandas()
    got = {r.p_partkey: (r.s_suppkey, r.total_cents)
           for r in out.itertuples()}
    assert got == {1: (3, 1000), 2: (5, 700)}  # tie 1000 vs 1000 → supp 3


def test_strip_tracking_params_cases():
    from pmocr_ray.ops.text import strip_tracking_params as s

    assert s("https://a.x/p?utm_source=f&q=1&utm_medium=m") == \
        "https://a.x/p?q=1"
    assert s("HTTPS://A.X/p?gclid=z#frag") == "https://a.x/p"
    assert s("https://a.x/p?ref=tw&fbclid=1") == "https://a.x/p"
    assert s("https://a.x/p") == "https://a.x/p"
    # non-tracking params keep order and blank values
    assert s("https://a.x/p?b=&a=2") == "https://a.x/p?b=&a=2"


def test_canonicalize_urls_differential_vs_scalar():
    """The vectorized canonicalizer must be byte-identical to the
    scalar strip_tracking_params on every input — common shapes
    (Arrow fast path) AND anomalous rows (Python fallback): percent
    escapes, bare keys, semicolons, '=' in values, non-ASCII,
    schemeless, junk."""
    from pmocr_ray.ops.text import canonicalize_urls, strip_tracking_params

    urls = [
        # fast-path shapes
        "https://a.x/p",
        "HTTPS://A.X/Path/Keep#frag",
        "https://a.x/p?utm_source=f&q=1&utm_medium=m",
        "https://a.x/p?gclid=z",
        "https://a.x/p?ref=tw&fbclid=1",
        "https://a.x/p?b=&a=2",
        "https://a.x/p?a=1&a=2&refx=keepme",
        # keys that merely CONTAIN a tracking name must be kept intact
        # (suffix/infix forms — a substring-matching strip corrupts
        # these; the per-param anchored filter must not)
        "https://a.x/p?pref=1",
        "https://a.x/p?xref=abc",
        "https://a.x/p?agclid=5",
        "https://a.x/p?foutm_a=1&b=2",
        "https://a.x/p?utm_a=1&utm_b=2&utm_c=3&utm_d=4",  # adjacent strips
        "https://a.x/p?a=b+c",          # '+' round-trips as '+'
        "https://User@Host:8080/x?k=v",
        "https://a.x/p?utm_=1&utm_campaign=x%20y",  # tracking any value
        "https://a.x/p?",
        "https://a.x/p?#f",
        "http://h/a:b,c(d)!$",          # odd path chars preserved
        "https://a.x/p?a=1&ref",        # bare tracking key removed
        # fallback shapes
        "https://a.x/p?a=%20b",         # escape re-encoded by parse_qsl
        "https://a.x/p?bare",           # bare key -> 'bare='
        "https://a.x/p?a=b=c",          # '=' in value gets quoted
        "https://a.x/p?a=b;c",          # ';' gets quoted
        "https://a.x/p?a=é",       # non-ASCII
        "//schemeless.example/x?utm_source=1",
        "mailto:someone@example.com",
        "not a url at all",
        "",
    ]
    got = canonicalize_urls(pa.array(urls, pa.string())).to_pylist()
    exp = [strip_tracking_params(u) for u in urls]
    assert got == exp
    # all-eligible batch exercises the pure-Arrow early return
    fast_only = [u for u in urls[:19]]  # everything before the fallback shapes
    got2 = canonicalize_urls(pa.array(fast_only, pa.string())).to_pylist()
    assert got2 == [strip_tracking_params(u) for u in fast_only]


def test_canonical_url_counts(ray_session):
    import pandas as pd

    import ray.data as rd
    from pmocr_ray.ops.text import canonical_url_counts

    df = pd.DataFrame({"url": [
        "https://a.x/p", "https://a.x/p?utm_source=f", "HTTPS://A.X/p#z",
        "https://b.x/q?id=7", "https://b.x/q?id=7&gclid=g",
    ]})
    out = canonical_url_counts(rd.from_pandas(df).repartition(3)).to_pandas()
    got = dict(zip(out["url"], out["n_variants"]))
    assert got == {"https://a.x/p": 3, "https://b.x/q?id=7": 2}


def test_incremental_rollup_matches_batch_and_idempotent(ray_session,
                                                         tmp_path):
    import pandas as pd

    import ray.data as rd
    from pmocr_ray.ops.compact import fold_rollup_shard, read_rollup

    df = pd.DataFrame({"g": ["a", "b", "a", "b", "a"],
                       "v": [1, 2, 3, 4, 5]})
    state = str(tmp_path / "state")
    fold_rollup_shard(rd.from_pandas(df.iloc[:3]), state, "r1",
                      group_col="g", sum_cols={"sv": "v"})
    fold_rollup_shard(rd.from_pandas(df.iloc[3:]), state, "r2",
                      group_col="g", sum_cols={"sv": "v"})
    # idempotent re-fold of r2 (crash/retry) must not double-count
    fold_rollup_shard(rd.from_pandas(df.iloc[3:]), state, "r2",
                      group_col="g", sum_cols={"sv": "v"})
    out = read_rollup(state, group_col="g").to_pandas()
    got = {r.g: (r.n_rows, r.sv) for r in out.itertuples()}
    assert got == {"a": (3, 9), "b": (2, 6)}


def test_align_schemas_union(ray_session):
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from pmocr_ray.sources import align_schemas

    a = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()),
                                "x": ["p", "q"]}))
    b = rd.from_arrow(pa.table({"k": pa.array([3], pa.int64()),
                                "y": pa.array([9.5], pa.float64())}))
    out = align_schemas([a, b], fill={"x": "<d>"}).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert list(out.columns) == ["k", "x", "y"]
    assert out["x"].tolist() == ["p", "q", "<d>"]
    assert pd.isna(out["y"].iloc[0]) and out["y"].iloc[2] == 9.5


def test_rare_term_pairs_blocking(ray_session):
    import pandas as pd

    import ray.data as rd
    from pmocr_ray.ops.text import rare_term_pairs

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "common zebra common",      # zebra: docs 1,2 (df 2)
            "common zebra quark",       # quark: docs 2,3 (df 2)
            "common quark",
            "common words only",        # 'common' df 4 > max_df: no link
        ],
    })
    out = rare_term_pairs(rd.from_pandas(df).repartition(2),
                          max_df=3).to_pandas()
    got = {(r.a, r.b): r.n_shared_terms for r in out.itertuples()}
    # 'words'/'only' are df-1 singletons: no pairs from them
    assert got == {(1, 2): 1, (2, 3): 1}
    # repeated rare term inside one doc counts once
    df2 = pd.DataFrame({"doc_id": [7, 8],
                        "text": ["rare rare rare", "rare x"]})
    out2 = rare_term_pairs(rd.from_pandas(df2), max_df=3).to_pandas()
    assert {(r.a, r.b): r.n_shared_terms
            for r in out2.itertuples()} == {(7, 8): 1}


def test_rare_term_pairs_gated_plans_equivalent(ray_session, monkeypatch):
    """Force the scale plan (bloom prefilter + exact left_semi verify)
    by zeroing the broadcast gate: both plans must emit byte-identical
    pair sets on a fixture with rare AND common vocabulary."""
    import pandas as pd

    import ray.data as rd
    from pmocr_ray.ops import text as text_mod

    rng = np.random.default_rng(3)
    rows = []
    for i in range(120):
        words = ["common", "filler", "words"]
        # each doc carries 2 rare tokens drawn from a pool sized so
        # most have df 2-3 (pairs) and some are singletons
        for r in rng.integers(0, 90, 2):
            words.append(f"rare{r}")
        rng.shuffle(words)
        rows.append((i, " ".join(words)))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])

    def run() -> pd.DataFrame:
        return (text_mod.rare_term_pairs(
            rd.from_pandas(df).repartition(4), max_df=3)
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))

    broadcast_plan = run()
    assert len(broadcast_plan) > 0  # fixture really produces pairs
    monkeypatch.setattr(text_mod, "RARE_TERM_BROADCAST_GATE", 0)
    join_plan = run()
    pd.testing.assert_frame_equal(broadcast_plan, join_plan)
