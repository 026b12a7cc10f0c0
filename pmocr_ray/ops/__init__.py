"""Training-data-pipeline operators beyond the reference's own surface.

The reference converts documents; a 100 TB training-data pipeline also
needs dedup, similarity search, text analysis and multimodal plumbing.
Each op here follows the same architecture rules as the extraction
engine: Arrow batches, vectorized kernels, actor pools for stateful
stages, partial aggregation before any shuffle, broadcast small sides.
"""
