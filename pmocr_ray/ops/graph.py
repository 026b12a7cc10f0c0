"""Distributed connected components over a duplicate-pair edge set.

The keep/drop step of every dedup family needs the component id of each
doc.  The driver-side union-find (``ops/dedup.connected_components``)
is right when verified pairs fit one process; this is the scale path:
iterative MIN-LABEL PROPAGATION where labels, edges and every
intermediate live in the cluster.

Per iteration (one hash join + one groupby, both on int64 keys only):

    label'(u) = min( label(u),  min_{(u,v) ∈ E} label(v) )

run over the symmetrized edge list until the global label sum stops
falling (the sum is strictly decreasing while any label changes —
an O(1)-size convergence check, no driver-side diff of label tables).
Converges in graph-diameter iterations; the LSH/exact-dup pair
generators STAR-EMIT hot clusters (every member paired with the
cluster minimum), so their components have diameter ≤ 2 by
construction and the loop ends in ~3 iterations.  Adversarial chain
graphs converge in diameter steps — acceptable for dedup workloads,
where a long chain means a long run of pairwise-similar docs.

Reference parity: pmOCR has no graph ops; this serves the
beyond-the-reference dedup keep/drop decision at corpus scale.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Min, Sum


def _sym_edges(edges: rd.Dataset) -> rd.Dataset:
    """(a,b) → both directions (u,v), u≠v assumed."""
    def both(t: pa.Table) -> pa.Table:
        u = pa.concat_arrays([t["a"].combine_chunks().cast(pa.int64()),
                              t["b"].combine_chunks().cast(pa.int64())])
        v = pa.concat_arrays([t["b"].combine_chunks().cast(pa.int64()),
                              t["a"].combine_chunks().cast(pa.int64())])
        return pa.table({"u": u, "v": v})

    return edges.map_batches(both, batch_format="pyarrow")


def connected_components_distributed(edges: rd.Dataset,
                                     max_iters: int = 50,
                                     num_partitions: int = 8) -> rd.Dataset:
    """Component label (= min node id in the component) per node.

    ``edges`` has int64 columns (a, b).  Returns (node, label).
    """
    sym = _sym_edges(edges).materialize()
    n_edges = sym.count()
    parts = max(1, min(num_partitions, n_edges // 2048 + 1))

    # initial labels: every distinct endpoint labels itself
    def self_label(t: pa.Table) -> pa.Table:
        g = t.select(["u"]).group_by("u").aggregate([])
        return pa.table({"node": g["u"], "label": g["u"]})

    labels = (sym.map_batches(self_label, batch_format="pyarrow")
              .groupby("node").aggregate(Min("label", alias_name="label"))
              ).materialize()

    prev_sum = None
    for _ in range(max_iters):
        # neighbor labels: edges ⋈ labels on the *source* side, so each
        # edge (u,v) proposes label(u) to v
        j = sym.join(labels, join_type="inner", num_partitions=parts,
                     on=("u",), right_on=("node",))
        proposals = j.map_batches(
            lambda t: pa.table({"node": t["v"], "label": t["label"]}),
            batch_format="pyarrow")
        own = labels
        labels = (proposals.union(own)
                  .groupby("node").aggregate(Min("label", alias_name="label"))
                  ).materialize()
        # pointer jumping: label'(u) = label(label(u)) — one extra join
        # halves the remaining chain length each round, so convergence
        # is O(log diameter) joins instead of O(diameter)
        j2 = labels.join(
            labels.map_batches(
                lambda t: pa.table({"lnode": t["node"], "llabel": t["label"]}),
                batch_format="pyarrow"),
            join_type="left_outer", num_partitions=parts,
            on=("label",), right_on=("lnode",))
        labels = j2.map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "label": pc.coalesce(t["llabel"], t["label"])}),
            batch_format="pyarrow").materialize()
        s = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if s == prev_sum:
            break
        prev_sum = s
    return labels
