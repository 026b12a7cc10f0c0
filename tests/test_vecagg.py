"""vecagg.grouped_aggregate must be bit-for-bit equivalent to Ray's
groupby().aggregate() for the decomposable aggregates — on int keys,
string keys, nullable values, multi-key tuples, and the empty input."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from pmocr_ray.ops.vecagg import distinct, grouped_aggregate


def _sorted_df(ds, keys):
    df = ds.to_pandas()
    return df.sort_values(keys).reset_index(drop=True)[sorted(df.columns)]


@pytest.fixture(scope="module")
def pair_ds(ray_session):
    rng = np.random.RandomState(7)
    n = 20_000
    a = rng.randint(0, 300, n).astype(np.int64)
    b = rng.randint(0, 40, n).astype(np.int64)
    v = rng.randint(-50, 50, n).astype(np.int64)
    vals = pd.array(v, dtype="Int64")
    vals[rng.rand(n) < 0.05] = pd.NA  # null values must be skipped
    t = pa.table({"a": pa.array(a), "b": pa.array(b),
                  "v": pa.array(vals, pa.int64())})
    return rd.from_arrow(t).repartition(8).materialize()


def test_distinct_matches_groupby(ray_session, pair_ds):
    got = _sorted_df(distinct(pair_ds, ["a", "b"]), ["a", "b"])
    exp = _sorted_df(
        pair_ds.groupby(["a", "b"]).aggregate(Count(alias_name="_n"))
        .select_columns(["a", "b"]), ["a", "b"])
    pd.testing.assert_frame_equal(got, exp)


def test_all_aggs_match_ray(ray_session, pair_ds):
    got = _sorted_df(grouped_aggregate(
        pair_ds, ["a", "b"],
        [(None, "count", "n"), ("v", "sum", "s"), ("v", "min", "mn"),
         ("v", "max", "mx"), ("v", "mean", "avg")]), ["a", "b"])
    exp = _sorted_df(
        pair_ds.groupby(["a", "b"]).aggregate(
            Count(alias_name="n"), Sum("v", alias_name="s"),
            Min("v", alias_name="mn"), Max("v", alias_name="mx"),
            Mean("v", alias_name="avg")), ["a", "b"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_string_keys_and_single_key(ray_session):
    t = pa.table({
        "k": pa.array(["x", "y", None, "x", "y", "x", None]),
        "v": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(3)
    got = grouped_aggregate(
        ds, "k", [("v", "sum", "s"), (None, "count", "n")]).to_pandas()
    got = {(None if pd.isna(r.k) else r.k): (r.s, r.n)
           for r in got.itertuples()}
    # pandas oracle (Ray's sort-based groupby cannot even sort null
    # string keys; arrow hash aggregation groups them fine)
    assert got == {"x": (11, 3), "y": (7, 2), None: (10, 2)}


def test_empty_input_keeps_schema(ray_session):
    t = pa.table({"a": pa.array([], pa.int64()),
                  "b": pa.array([], pa.int64())})
    seed = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    out = distinct(rd.from_arrow(t), ["a", "b"], seed_schema=seed)
    assert out.count() == 0
    assert [f.name for f in out.schema().base_schema] == ["a", "b"]


def test_bucketing_is_partition_invariant(ray_session):
    # same rows, different block layout → identical result
    rng = np.random.RandomState(3)
    a = rng.randint(0, 500, 5000).astype(np.int64)
    t = pa.table({"a": pa.array(a),
                  "v": pa.array(rng.randint(0, 9, 5000), pa.int64())})
    one = rd.from_arrow(t)
    many = rd.from_arrow(t).repartition(11)
    g1 = _sorted_df(grouped_aggregate(one, ["a"], [("v", "sum", "s")]), ["a"])
    g2 = _sorted_df(grouped_aggregate(many, ["a"], [("v", "sum", "s")]), ["a"])
    pd.testing.assert_frame_equal(g1, g2)


def test_rejects_unknown_fn(ray_session):
    with pytest.raises(ValueError, match="unsupported agg fn"):
        grouped_aggregate(rd.range(3), ["id"], [("id", "median", "m")])


def test_property_matches_pandas_reference(ray_session):
    """Randomized: grouped_aggregate == a pandas reference on arbitrary
    int key/value tables with nulls, any block layout."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=400),
        n_keys=st.integers(min_value=1, max_value=30),
        parts=st.integers(min_value=1, max_value=7),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(n, n_keys, parts, seed):
        rng = np.random.RandomState(seed)
        k = rng.randint(-n_keys, n_keys, n).astype(np.int64)
        v = pd.array(rng.randint(-100, 100, n), dtype="Int64")
        v[rng.rand(n) < 0.1] = pd.NA
        t = pa.table({"k": pa.array(k), "v": pa.array(v, pa.int64())})
        ds = rd.from_arrow(t).repartition(parts)
        got = grouped_aggregate(
            ds, ["k"],
            [(None, "count", "n"), ("v", "sum", "s"),
             ("v", "min", "mn"), ("v", "max", "mx")],
        ).to_pandas().sort_values("k").reset_index(drop=True)
        ref = (t.to_pandas().groupby("k", dropna=False)
               .agg(n=("v", "size"), s=("v", "sum"),
                    mn=("v", "min"), mx=("v", "max"))
               .reset_index().sort_values("k").reset_index(drop=True))
        assert got["k"].tolist() == ref["k"].tolist()
        assert got["n"].tolist() == ref["n"].tolist()
        # all-null groups: pandas sum() gives 0, SQL/vecagg give null —
        # compare only where a non-null value exists
        has = ~ref["mn"].isna()
        assert got.loc[has, "s"].tolist() == ref.loc[has, "s"].tolist()
        assert got.loc[has, "mn"].tolist() == ref.loc[has, "mn"].tolist()
        assert got.loc[has, "mx"].tolist() == ref.loc[has, "mx"].tolist()
        assert got.loc[~has, "s"].isna().all()

    check()


def test_ray_aggregate_shim_matches_and_rejects(ray_session, pair_ds):
    """ray_aggregate introspects Ray aggregate objects correctly and
    refuses anything it cannot reproduce exactly."""
    from ray.data.aggregate import AbsMax

    from pmocr_ray.ops.vecagg import ray_aggregate

    got = _sorted_df(ray_aggregate(
        pair_ds, ["a"], Count(alias_name="n"), Sum("v", alias_name="s"),
        Min("v", alias_name="mn"), Mean("v", alias_name="avg")), ["a"])
    exp = _sorted_df(
        pair_ds.groupby("a").aggregate(
            Count(alias_name="n"), Sum("v", alias_name="s"),
            Min("v", alias_name="mn"), Mean("v", alias_name="avg")), ["a"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    with pytest.raises(ValueError, match="not decomposable"):
        ray_aggregate(pair_ds, ["a"], AbsMax("v"))
    with pytest.raises(ValueError, match="row-count"):
        ray_aggregate(pair_ds, ["a"], Count("v", ignore_nulls=True))
