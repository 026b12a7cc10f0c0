"""In-suite DuckDB oracle conformance for key driver-contract queries.

The driver compares every ``queries()[k]`` against ``oracle_sql()[k]``
at sf=0.01; this test runs the same comparison for a representative
subset at sf=0.001 so `python -m pytest -x -q` itself proves the
contract (row count + column names + order-insensitive value hash).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = [
    "extract_flagship",
    "status_counts",
    "sniff_route",
    "csv_hack",
    "text_stats",
    "dedup_exact",
    "top_users",
    "lineitem_agg",
    "media_meta",
    # round-2 relational/curation shapes
    "basket_pairs",
    "keep_best_dedup",
    "users_all_types",
    "pareto_orders",
    "value_gini",
    "scd2_dim",
    # late round-2 relational/analytic shapes
    "nation_pair_flows",
    "sole_returner_suppliers",
    "ks_lang_len",
    "weighted_median_price",
    "vocab_overlap",
    "rfm_scores",
    # session-3 shapes
    "disjunctive_brackets",
    "top_supplier_rev",
    "nation_market_share",
    "epoch_price_join",
    "outlinks",
    "seq_pattern",
    "grouped_regression",
    "csv_roundtrip",
    "lang_profiles",
    "contingency_chi2",
    "stream_sessions",
    "stream_windows",
    "fk_audit",
    "top_parts_per_brand",
    "stream_new_users",
    "page_meta",
    "customers_no_f_orders_native",
    "priority_semi_native",
    "user_type_mask_agg",
    "federated_union",
    "pdf_target_roundtrip",
    # round-3 additions
    "xlsx_target_roundtrip",
    "lm_bigram_counts",
    "kmeans_assign1",
]


@pytest.fixture(scope="module")
def duck(sf_small):
    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(sf_small, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("key", KEYS)
def test_query_matches_oracle(key, duck, sf_small, ray_session):
    import __ray_entry__ as E
    from scripts.selfcheck import to_pandas, value_hash

    got = to_pandas(E.queries()[key](sf_small))
    exp = duck.sql(E.oracle_sql()[key]).df()
    assert len(got) == len(exp)
    assert sorted(got.columns) == sorted(exp.columns)
    assert value_hash(got) == value_hash(exp)
