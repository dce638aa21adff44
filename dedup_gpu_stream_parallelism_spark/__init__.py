"""PySpark-native near-duplicate detection + clustering engine.

From-scratch re-expression of the capabilities of
larcc-group/dedup-gpu-stream-parallelism (PARSEC dedup + GPU LZSS stream
parallelism) as an idiomatic Spark pipeline:

    chunk/shingle -> fingerprint (sha256 / MinHash / SimHash)
                  -> LSH candidate pairs (groupBy band keys)
                  -> suffix-array exact-substring confirm
                  -> connected components -> cluster ids

See SURVEY.md for the capability mapping and file:line citations into the
reference.
"""

from dedup_gpu_stream_parallelism_spark.config import DEFAULT_CONFIG, DedupConfig

__all__ = ["DEFAULT_CONFIG", "DedupConfig"]
__version__ = "0.1.0"
