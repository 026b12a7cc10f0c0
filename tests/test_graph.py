"""Distributed connected-components tests."""
import pandas as pd

import ray.data as rd

from pmocr_ray.ops.graph import connected_components_distributed


def test_cc_chains_and_isolated_pair(ray_session):
    edges = pd.DataFrame({"a": [0, 1, 2, 3, 10, 11, 20],
                          "b": [1, 2, 3, 4, 11, 12, 21]})
    out = (connected_components_distributed(rd.from_pandas(edges))
           .to_pandas().sort_values("node"))
    got = dict(zip(out["node"], out["label"]))
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_cc_matches_driver_union_find(ray_session):
    import numpy as np

    from pmocr_ray.ops.dedup import connected_components

    rng = np.random.default_rng(3)
    a = rng.integers(0, 60, 80)
    b = rng.integers(0, 60, 80)
    mask = a != b
    pairs = list({(int(min(x, y)), int(max(x, y)))
                  for x, y in zip(a[mask], b[mask])})
    edges = pd.DataFrame({"a": [p[0] for p in pairs],
                          "b": [p[1] for p in pairs]})
    dist = (connected_components_distributed(
                rd.from_pandas(edges).repartition(5))
            .to_pandas())
    got = dict(zip(dist["node"], dist["label"]))
    want = connected_components(pairs)
    # driver union-find returns root per node; normalize both to min-id
    assert got == {n: r for n, r in want.items()}
