"""Broadcast join helper tests (SURVEY §2.5)."""

import pyarrow as pa

import ray.data as rd

from pmocr_ray.ops.joins import (
    broadcast_anti_join,
    broadcast_lookup,
    broadcast_semi_join,
)


def _ds(ray_session):
    return rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "v": ["a", "b", "c", "d", "e"],
    }))


def test_semi_join(ray_session):
    out = broadcast_semi_join(_ds(ray_session), "k", [2, 4, 9]).take_all()
    assert sorted(r["k"] for r in out) == [2, 4]


def test_anti_join(ray_session):
    out = broadcast_anti_join(_ds(ray_session), "k", [2, 4, 9]).take_all()
    assert sorted(r["k"] for r in out) == [1, 3, 5]


def test_anti_join_empty_keyset_keeps_all(ray_session):
    out = broadcast_anti_join(_ds(ray_session), "k", []).take_all()
    assert len(out) == 5


def test_lookup(ray_session):
    out = broadcast_lookup(_ds(ray_session), "k", {1: "x", 3: "y"},
                           "looked", default="-").take_all()
    got = {r["k"]: r["looked"] for r in out}
    assert got == {1: "x", 2: "-", 3: "y", 4: "-", 5: "-"}
