"""Composed curation pipeline + dedup-keep tests."""

import ray.data as rd

from pmocr_ray.ops.dedup import minhash_dedup_keep
from pmocr_ray.pipelines import curate

GOOD = ("the quick brown fox jumps over the lazy dog while the cat watches "
        "from the windowsill and the birds are singing in the garden and it "
        "is a long enough document to score well on the quality heuristics")
JUNK = "!!! ??? *** $$$"


def _corpus(ray_session):
    return rd.from_items([
        {"doc_id": 0, "text": GOOD},
        {"doc_id": 1, "text": GOOD},              # exact dup of 0
        {"doc_id": 2, "text": GOOD + " extra"},   # near dup of 0
        {"doc_id": 3, "text": JUNK},              # low quality
        {"doc_id": 4, "text": "another perfectly fine and rather long "
                              "document about data engines processing web "
                              "pages with the arrow format and it keeps "
                              "going for a while to be long enough"},
    ])


def test_minhash_dedup_keep(ray_session):
    rows = {r["doc_id"]: r for r in
            minhash_dedup_keep(_corpus(ray_session), threshold=0.5).take_all()}
    assert len(rows) == 5                       # every row annotated
    assert rows[0]["keep"] and rows[0]["dup_of"] == 0
    assert not rows[1]["keep"] and rows[1]["dup_of"] == 0
    assert not rows[2]["keep"] and rows[2]["dup_of"] == 0
    assert rows[3]["keep"] and rows[4]["keep"]  # singletons kept


def test_curate_pipeline(ray_session):
    out = {r["doc_id"]: r for r in
           curate(_corpus(ray_session), min_quality=0.1,
                  dedup_threshold=0.5).take_all()}
    assert set(out) == {0, 4}                   # dups and junk removed
    for r in out.values():
        assert {"lang_pred", "quality", "dup_of", "keep"} <= set(r)
        assert r["keep"] and r["quality"] >= 0.1


def test_minhash_dedup_keep_distributed_cc_matches(ray_session):
    """Forcing the distributed connected-components route (pair limit 0)
    must produce byte-identical (dup_of, keep) decisions to the default
    driver-side union-find route."""
    driver = {r["doc_id"]: (r["dup_of"], r["keep"]) for r in
              minhash_dedup_keep(_corpus(ray_session),
                                 threshold=0.5).take_all()}
    dist = {r["doc_id"]: (r["dup_of"], r["keep"]) for r in
            minhash_dedup_keep(_corpus(ray_session), threshold=0.5,
                               distributed_cc_pair_limit=0).take_all()}
    assert driver == dist
    assert dist[0] == (0, True) and dist[1] == (0, False)


def test_minhash_dedup_keep_annotate_ds(ray_session):
    """annotate_ds decouples decision input from annotation target:
    decisions computed from the pruned corpus, annotation applied to a
    dataset carrying extra columns — which must survive, with the same
    (dup_of, keep) decisions on both CC routes."""
    import pyarrow.compute as pc

    def score(t):
        return t.append_column("score", pc.multiply(
            pc.cast(t["doc_id"], "int64"), 10))

    for limit in (2_000_000, 0):  # union-find route, distributed route
        scored = _corpus(ray_session).map_batches(
            score, batch_format="pyarrow")
        out = {r["doc_id"]: r for r in minhash_dedup_keep(
            _corpus(ray_session), annotate_ds=scored, threshold=0.5,
            distributed_cc_pair_limit=limit).take_all()}
        assert len(out) == 5
        assert all(r["score"] == i * 10 for i, r in out.items())
        assert out[0]["keep"] and not out[1]["keep"]
        assert out[1]["dup_of"] == 0 and out[2]["dup_of"] == 0


def test_corpus_build(ray_session):
    """End-to-end corpus build: exact dedup -> curate -> packing.

    doc 1 (exact dup of 0) must fall at the EXACT stage, doc 2 (near
    dup) at the curate stage, doc 3 (junk) at the quality gate; the
    survivors' pack spans must be the contiguous concat-then-chunk
    assignment in ascending key order."""
    from pmocr_ray.pipelines import corpus_build

    rows = {r["doc_id"]: r for r in
            corpus_build(_corpus(ray_session), block_tokens=16,
                         min_quality=0.1,
                         dedup_threshold=0.5).take_all()}
    assert set(rows) == {0, 4}
    n0 = len(GOOD.split())
    assert rows[0]["n_tokens"] == n0 and rows[0]["tok_start"] == 0
    assert rows[0]["block_start"] == 0
    assert rows[0]["block_end"] == (n0 - 1) // 16
    assert rows[4]["tok_start"] == n0          # exclusive prefix sum
    assert rows[4]["block_start"] == n0 // 16
    for r in rows.values():
        assert {"lang_pred", "quality"} <= set(r)
        assert r["quality"] >= 0.1


def test_corpus_build_partition_invariance(ray_session):
    """The composed result is identical at any input partitioning."""
    from pmocr_ray.pipelines import corpus_build

    def run(ds):
        return sorted(
            (r["doc_id"], r["n_tokens"], r["tok_start"], r["block_start"],
             r["block_end"], r["lang_pred"], r["quality"])
            for r in corpus_build(ds, block_tokens=16, min_quality=0.1,
                                  dedup_threshold=0.5).take_all())

    one = run(_corpus(ray_session).repartition(1))
    many = run(_corpus(ray_session).repartition(5))
    assert one == many and len(one) == 2


def test_curate_distributed_cc(ray_session):
    """curate survives (and matches) with the distributed CC route."""
    base = {r["doc_id"] for r in
            curate(_corpus(ray_session), min_quality=0.1,
                   dedup_threshold=0.5).take_all()}
    dist = {r["doc_id"] for r in
            curate(_corpus(ray_session), min_quality=0.1,
                   dedup_threshold=0.5,
                   distributed_cc_pair_limit=0).take_all()}
    assert base == dist == {0, 4}
