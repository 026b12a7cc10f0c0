"""Sequence packing / distributed prefix-sum tests."""
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from pmocr_ray.ops.pack import hash_shuffle_rank, pack_sequences


def test_pack_sequences_concat_then_chunk(ray_session):
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b c", "", "d e f g h", "i j"],  # tokens: 3,0,5,2
    })
    out = (pack_sequences(rd.from_pandas(df), block_tokens=4, part_size=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["n_tokens"]) == [3, 0, 5, 2]
    assert list(out["tok_start"]) == [0, 3, 3, 8]
    assert list(out["block_start"]) == [0, 0, 0, 2]
    # doc2 spans tokens [3, 8) -> blocks 0..1; doc3 tokens [8, 10) -> block 2
    assert list(out["block_end"]) == [0, 0, 1, 2]


def test_pack_sequences_partition_invariant(ray_session):
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "doc_id": np.arange(200),
        "text": [" ".join(["w"] * int(n)) for n in rng.integers(0, 30, 200)],
    })
    a = (pack_sequences(rd.from_pandas(df), block_tokens=64, part_size=10)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (pack_sequences(rd.from_pandas(df).repartition(13), block_tokens=64,
                        part_size=37)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # global invariant: consecutive tok_starts differ by n_tokens
    assert (a["tok_start"].diff().dropna().to_numpy()
            == a["n_tokens"].to_numpy()[:-1]).all()


def test_hash_shuffle_rank_is_total_order(ray_session):
    df = pd.DataFrame({"doc_id": np.arange(50),
                       "text": [f"doc number {i}" for i in range(50)]})
    out = hash_shuffle_rank(rd.from_pandas(df).repartition(7)).to_pandas()
    assert sorted(out["rank"]) == list(range(1, 51))  # dense global rank
    ordered = out.sort_values("rank")
    hs = list(ordered["h"])
    assert hs == sorted(hs)  # rank order IS hash order


def test_zorder_values_interleave(ray_session):
    from pmocr_ray.ops.pack import zorder_values

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "n_chars": pa.array([0b101, 0b11, 0], pa.int64()),
                  "lang": ["b", "a", "b"]})    # codes: a=0, b=1
    out = zorder_values(rd.from_arrow(t).repartition(2)) \
        .to_pandas().set_index("doc_id")
    # doc 1: x=101, y=1 -> bits x0..: z = x interleaved even, y odd
    #   x=5 (101): bits at 0,4 -> 1+16=17 ; y=1: bit at 1 -> 2 ; z=19
    assert out.loc[1, "zvalue"] == 19
    # doc 2: x=3 (11): bits 0,2 -> 5 ; y=0 -> z=5
    assert out.loc[2, "zvalue"] == 5
    # doc 3: x=0, y=1 -> z=2
    assert out.loc[3, "zvalue"] == 2
    assert (out["file_bucket"] == out["zvalue"] // (1 << 20)).all()


def test_zorder_locality_property(ray_session):
    from pmocr_ray.ops.pack import zorder_values

    # same category + close numeric -> close zvalues; different
    # category flips a low odd bit
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "n_chars": pa.array([100, 101, 100], pa.int64()),
                  "lang": ["a", "a", "b"]})
    out = zorder_values(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    near_same_cat = abs(out.loc[1, "zvalue"] - out.loc[2, "zvalue"])
    assert near_same_cat <= 4          # adjacent x in same cat stays close


def test_zorder_write_read_prunes_and_matches_full_scan(ray_session, tmp_path):
    from pmocr_ray.ops.pack import (zorder_pruned_buckets, zorder_read,
                                    zorder_write)

    rng = np.random.default_rng(7)
    n = 400
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "n_chars": pa.array(rng.integers(0, 4096, n), pa.int64()),
        "lang": pa.array([["en", "fr", "de"][i % 3] for i in range(n)]),
    })
    out = str(tmp_path / "zo")
    zorder_write(rd.from_arrow(t).repartition(4), out, bucket_shift=6)

    pruned = zorder_pruned_buckets(out, x_range=(0, 100))
    all_b = zorder_pruned_buckets(out)
    assert len(pruned) < len(all_b)        # zone map actually prunes

    got = zorder_read(out, x_range=(0, 100), cat="en").to_pandas()
    df = t.to_pandas()
    want = df[(df.n_chars <= 100) & (df.lang == "en")]
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])


def test_pps_systematic_sample_deterministic_and_weighted(ray_session):
    from pmocr_ray.ops.pack import pps_systematic_sample

    # one huge-weight row must always be selected; zero-weight never
    t = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                  "n_chars": pa.array([10000 if i == 7 else
                                       (0 if i == 8 else 10)
                                       for i in range(100)], pa.int64())})
    a = pps_systematic_sample(rd.from_arrow(t), n_samples=10) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert 7 in set(a["doc_id"])         # certainty unit (w > stride)
    assert 8 not in set(a["doc_id"])     # zero weight never drawn
    b = pps_systematic_sample(rd.from_arrow(t).repartition(7),
                              n_samples=10) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    # uniform weights -> exactly n_samples selected
    u = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                  "n_chars": pa.array([10] * 100, pa.int64())})
    c = pps_systematic_sample(rd.from_arrow(u), n_samples=10).to_pandas()
    assert len(c) == 10


def test_bucketed_join_matches_plain_join(ray_session, tmp_path):
    import pandas as pd

    from pmocr_ray.ops.pack import bucketed_join, bucketed_write

    left = pd.DataFrame({"k": [1, 2, 3, 4, 5, 7], "lv": list("abcdef")})
    right = pd.DataFrame({"rk": [2, 3, 3, 5, 9], "rv": list("vwxyz")})
    da = bucketed_write(rd.from_pandas(left).repartition(3),
                        str(tmp_path / "l"), key="k", n_buckets=4)
    db = bucketed_write(rd.from_pandas(right).repartition(2),
                        str(tmp_path / "r"), key="rk", n_buckets=4)
    out = bucketed_join(da, db, key_a="k", key_b="rk",
                        n_buckets=4).to_pandas()
    got = sorted(zip(out["k"], out["lv"], out["rv"]))
    exp = sorted((r.k, r.lv, rr.rv)
                 for r in left.itertuples() for rr in right.itertuples()
                 if r.k == rr.rk)
    assert got == exp


def test_bucketed_join_hot_bucket_split(ray_session, tmp_path):
    """One key = 50% of rows (all landing in one bucket): a tiny
    hot_bucket_bytes must star-split that bucket across multiple
    tasks (row-group slices of the larger side x full smaller side)
    and still produce the exact inner join."""
    from pmocr_ray.ops.pack import bucketed_join, bucketed_write

    n = 20_000
    rng = np.random.default_rng(0)
    lk = np.concatenate([np.full(n // 2, 42, dtype=np.int64),
                         rng.integers(0, 10_000, n // 2)])
    left = pd.DataFrame({"k": lk, "lv": np.arange(n)})
    right = pd.DataFrame({"rk": np.arange(10_050, dtype=np.int64),
                          "rv": np.arange(10_050) * 2})
    da = bucketed_write(rd.from_pandas(left).repartition(8),
                        str(tmp_path / "l"), key="k", n_buckets=4)
    db = bucketed_write(rd.from_pandas(right).repartition(4),
                        str(tmp_path / "r"), key="rk", n_buckets=4)
    joined = bucketed_join(da, db, key_a="k", key_b="rk", n_buckets=4,
                           hot_bucket_bytes=20_000)
    mat = joined.materialize()
    # the split planner must have emitted more tasks than buckets
    assert mat.num_blocks() > 4
    out = mat.to_pandas().sort_values("lv").reset_index(drop=True)
    exp = (left.merge(right, left_on="k", right_on="rk")
           .sort_values("lv").reset_index(drop=True))
    assert len(out) == len(exp)
    assert (out["lv"].values == exp["lv"].values).all()
    assert (out["rv"].values == exp["rv"].values).all()


def test_bucketed_join_shared_nonkey_column_suffixed(ray_session, tmp_path):
    """Both sides carry a non-key column named `v`: pa.Table.join
    would emit the field twice and the output select would raise
    KeyError; the join must disambiguate with _x/_y suffixes (the
    pandas-merge convention the previous implementation had)."""
    import pandas as pd

    from pmocr_ray.ops.pack import bucketed_join, bucketed_write

    left = pd.DataFrame({"k": [1, 2, 3, 5], "v": list("abcd")})
    right = pd.DataFrame({"rk": [2, 3, 3, 9], "v": list("wxyz")})
    da = bucketed_write(rd.from_pandas(left).repartition(2),
                        str(tmp_path / "l"), key="k", n_buckets=4)
    db = bucketed_write(rd.from_pandas(right).repartition(2),
                        str(tmp_path / "r"), key="rk", n_buckets=4)
    out = bucketed_join(da, db, key_a="k", key_b="rk",
                        n_buckets=4).to_pandas()
    assert {"v_x", "v_y"} <= set(out.columns) and "v" not in out.columns
    got = sorted(zip(out["k"], out["v_x"], out["v_y"]))
    exp = sorted((r.k, r.v, rr.v)
                 for r in left.itertuples() for rr in right.itertuples()
                 if r.k == rr.rk)
    assert got == exp


def test_token_budget_trim_rule(ray_session):
    import pandas as pd

    from pmocr_ray.ops.pack import token_budget_trim

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "source": ["a", "a", "a", "b", "b"],
        "n_chars": [60, 50, 40, 200, 30],
    })
    out = token_budget_trim(rd.from_pandas(df).repartition(3),
                            budget=100).to_pandas()
    # PREFIX rule (SQL-exact), not greedy knapsack: source a keeps 60
    # (cumsum 60), then 50 -> 110 and 40 -> 150 exceed; source b's 200
    # exceeds alone AND blocks the 30 behind it (cumsum 230).
    assert sorted(out["doc_id"]) == [1]
    # raising the budget past the blocker admits the prefix again
    out2 = token_budget_trim(rd.from_pandas(df).repartition(3),
                             budget=230).to_pandas()
    assert sorted(out2["doc_id"]) == [1, 2, 3, 4, 5]


def test_range_partition_write_prunes_and_matches(ray_session, tmp_path):
    import glob
    import json

    import pandas as pd

    from pmocr_ray.ops.pack import range_lookup, range_partition_write

    df = pd.DataFrame({"k": list(range(100)), "v": list(range(100))})
    d = str(tmp_path / "ranges")
    range_partition_write(rd.from_pandas(df).repartition(4), d,
                          key="k", n_parts=5)
    man = json.load(open(f"{d}/_range_manifest.json"))
    assert len(man["parts"]) == 5
    out = range_lookup(d, lo=37, hi=61).to_pandas()
    assert sorted(out["k"]) == list(range(37, 61))
    # pruning actually happened: the overlapped partitions hold fewer
    # rows than the table
    touched = [p for p in man["parts"] if p["lo"] < 61 and p["hi"] > 37]
    assert len(touched) < 5


def test_skew_join_hot_and_cold_paths_match_plain(ray_session):
    import pandas as pd

    from pmocr_ray.ops.joins import skew_hash_join

    left = pd.DataFrame({
        "k": [1] * 50 + [2, 2, 3, 4],   # key 1 is hot
        "x": list(range(54)),
    })
    right = pd.DataFrame({"rk": [1, 2, 3, 9], "y": ["a", "b", "c", "z"]})
    exp = left.merge(right, left_on="k", right_on="rk").drop(columns=["rk"])
    for thr in (5, 1000, 0):
        out = skew_hash_join(rd.from_pandas(left).repartition(3),
                             rd.from_pandas(right), on="k", right_on="rk",
                             hot_threshold=thr).to_pandas()
        assert (sorted(zip(out["k"], out["x"], out["y"]))
                == sorted(zip(exp["k"], exp["x"], exp["y"]))), thr


def test_byte_balanced_blocks_giant_row_isolated(ray_session):
    import pandas as pd

    from pmocr_ray.ops.pack import byte_balanced_blocks

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "n_chars": [100, 100, 5000, 100, 100],  # doc 2 is giant
    })
    for parts in (1, 3):
        out = (byte_balanced_blocks(
                   rd.from_pandas(df).repartition(parts),
                   target_bytes=1000)
               .to_pandas().set_index("doc_id")["block_id"])
        # cum-before: 0,100,200,5200,5300 → blocks 0,0,0,5,5
        assert out.to_dict() == {0: 0, 1: 0, 2: 0, 3: 5, 4: 5}


def test_skew_hash_join_all_hot_no_right_match_keeps_joined_schema(ray_session):
    """Every key hot, none present on the right: the empty result must
    still carry the JOINED schema so downstream selects of right-side
    columns see the column, matching the cold-path branch."""
    import pandas as pd
    import ray.data as rd

    from pmocr_ray.ops.joins import skew_hash_join

    left = rd.from_pandas(pd.DataFrame(
        {"user_id": [7] * 50, "v": range(50)}))
    right = rd.from_pandas(pd.DataFrame(
        {"uid": [1, 2, 3], "name": ["a", "b", "c"]}))
    out = skew_hash_join(left, right, on="user_id", right_on="uid",
                         hot_threshold=10)
    assert out.count() == 0
    assert "name" in out.schema().names and "v" in out.schema().names


def test_chunk_tokens_stride_regimes(ray_session):
    """stride > window (gap sampling) must not crash or emit empty
    chunks; stride <= window keeps the cover-minimal chunking."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from pmocr_ray.ops.pack import chunk_tokens

    def chunks(text, window, stride):
        ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": [text]}))
        out = chunk_tokens(ds, window, stride).to_pandas()
        return list(zip(out["chunk_idx"], out["n_tokens"],
                        out["chunk_text"]))

    toks12 = " ".join(f"t{i}" for i in range(12))
    # gap sampling: starts 0 and 10 only, tail chunk short
    assert chunks(" ".join(f"t{i}" for i in range(4)), 3, 10) == [
        (0, 3, "t0 t1 t2")]
    assert chunks(toks12, 3, 10) == [(0, 3, "t0 t1 t2"), (1, 2, "t10 t11")]
    # start==t_cnt would be an empty chunk: must not be emitted
    assert chunks(" ".join(f"t{i}" for i in range(10)), 3, 10) == [
        (0, 3, "t0 t1 t2")]
    # overlap regime unchanged: cover-minimal starts 0,3,6
    assert [c[0] for c in chunks(" ".join(f"t{i}" for i in range(10)),
                                 4, 3)] == [0, 1, 2]
    with pytest.raises(ValueError, match="window >= 1"):
        chunk_tokens(rd.from_pandas(
            pd.DataFrame({"doc_id": [1], "text": ["a"]})), 0, 1)
