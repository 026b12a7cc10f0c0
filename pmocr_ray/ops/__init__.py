"""Training-data-pipeline operators beyond the reference's own surface.

The reference converts documents; a 100 TB training-data pipeline also
needs dedup (exact / MinHash-LSH / SimHash / embedding / line-level /
incremental), similarity search (brute, IVF, full-corpus k-means),
graph ops (distributed connected components), sequence packing and
deterministic shuffling (`pack`), compaction (`compact`), joins
(broadcast / hash / Bloom anti), sketches (KMV), windowed analytics
(`events`), curation and text analysis (`text`), multimodal
plumbing (`media`), and stateful streaming over a partitioned log —
session windows, watermark windows, first-seen index (`streaming`).
Each op here follows the same architecture rules as the extraction
engine: Arrow batches, vectorized kernels, actor pools for stateful
stages, partial aggregation before any shuffle, broadcast small sides.
"""
