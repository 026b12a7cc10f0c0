"""Composed training-data curation pipeline.

The "what the engine is for at 100 TB" composition: extracted pages →
language ID → quality scoring → near-dup dedup → filtered corpus.
Every stage is one of the engine's existing operators; this module
only wires them (the reference's per-target dispatch loop shape,
/root/reference/pmocr.sh:2546-2593 — one pipeline per output, stages
shared).

Shuffle budget: lang-ID and quality are map-only; dedup contributes
the MinHash band exchange + candidate join; the final filter is
map-only against a broadcast decision map.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from pmocr_ray.ops.dedup import exact_dedup, minhash_dedup_keep
from pmocr_ray.ops.text import LangIdStage, quality_score


class _LangQualityStage(LangIdStage):
    """Lang-ID + quality scoring in ONE actor-pool operator: the task
    map would not fuse into the actor pool, so scoring separately costs
    the corpus an extra object-store hop between operators."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return quality_score(super().__call__(batch))


def curate(
    docs: rd.Dataset,
    *,
    key: str = "doc_id",
    column: str = "text",
    min_quality: float = 0.1,
    keep_langs: tuple[str, ...] | None = None,
    dedup_threshold: float = 0.8,
    concurrency: int = 2,
    distributed_cc_pair_limit: int = 2_000_000,
) -> rd.Dataset:
    """Curated corpus: quality-scored, language-tagged, near-dup-free.

    Returns the surviving rows with added columns ``lang_pred``,
    ``quality``, ``dup_of``, ``keep``.
    """
    ds = docs.map_batches(_LangQualityStage, batch_format="pyarrow",
                          concurrency=(1, concurrency))
    # Decision input = the PRUNED raw corpus; annotation target = the
    # scored rows.  The dedup decision reads only (key, column), and the
    # decision side is consumed twice (sketch + verify corpus side) —
    # feeding it the scored dataset would re-run lang-ID and quality
    # scoring once per consumer (3× the scoring compute at corpus scale,
    # plus two extra LangId actor-pool spin-ups at bench scale).
    ds = minhash_dedup_keep(
        docs.select_columns([key, column]), annotate_ds=ds,
        column=column, key=key, threshold=dedup_threshold,
        concurrency=concurrency,
        distributed_cc_pair_limit=distributed_cc_pair_limit)

    lang_set = pa.array(list(keep_langs)) if keep_langs else None

    def keep_filter(t: pa.Table) -> pa.Table:
        mask = pc.and_(t["keep"], pc.greater_equal(t["quality"], min_quality))
        if lang_set is not None:
            mask = pc.and_(mask, pc.is_in(t["lang_pred"], value_set=lang_set))
        return t.filter(mask)

    return ds.map_batches(keep_filter, batch_format="pyarrow")


def corpus_build(
    corpus: rd.Dataset,
    *,
    key: str = "doc_id",
    column: str = "text",
    block_tokens: int = 512,
    min_quality: float = 0.1,
    dedup_threshold: float = 0.8,
    concurrency: int = 2,
) -> rd.Dataset:
    """The complete training-corpus build over an extracted corpus —
    the engine's flagship composition (extraction's downstream half of
    the 100 TB story, every stage an existing operator):

    exact dedup (min-``key`` winner per distinct ``column``) →
    :func:`curate` (lang-ID + quality + MinHash-LSH near-dup keep) →
    :func:`pmocr_ray.ops.pack.pack_sequences` (concat-then-chunk token
    packing in ascending ``key`` order).

    Returns one row per surviving document: (key, lang_pred, quality,
    n_tokens, tok_start, block_start, block_end).

    Shuffle budget on top of curate's: the exact-dedup decision
    exchange moves (fp, keep_id, n) triples only; the survivor
    semi-join and the final pack⋈meta join are both survivor-scale
    with data-sized partitions (:func:`pmocr_ray.ops.joins
    .parts_for_rows`); pack's exchange is per-part token totals.  The
    corpus text itself crosses the wires exactly as in curate — never
    the driver.
    """
    from pmocr_ray.ops.joins import parts_for_rows
    from pmocr_ray.ops.pack import pack_sequences

    # exact-dedup survivors: keep_id values are unique by construction
    # (one fp per distinct content, one winner per fp), so the decision
    # table is itself the semi-join probe side
    dec = exact_dedup(corpus, column=column, key=key)
    keep = dec.map_batches(
        lambda t: pa.table({key: t["keep_id"]}),
        batch_format="pyarrow").materialize()
    survivors = corpus.join(
        keep, join_type="left_semi", on=(key,),
        num_partitions=parts_for_rows(keep.count())).materialize()

    curated = curate(
        survivors, key=key, column=column, min_quality=min_quality,
        dedup_threshold=dedup_threshold, concurrency=concurrency,
    ).materialize()  # consumed twice: pack + meta join-back

    packed = pack_sequences(curated, block_tokens, key=key, column=column)
    meta = curated.select_columns([key, "lang_pred", "quality"])
    out = packed.join(
        meta, join_type="inner", on=(key,),
        num_partitions=parts_for_rows(curated.count()))
    return out.select_columns(
        [key, "lang_pred", "quality", "n_tokens", "tok_start",
         "block_start", "block_end"])
