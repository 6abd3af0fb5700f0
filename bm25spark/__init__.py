"""bm25spark — a PySpark-native BM25 full-text index engine.

A from-scratch distributed rebuild of the capabilities of
tensorchord/VectorChord-bm25 (a PostgreSQL index access method):
batch inverted-index construction over document tables, block-max
posting lists with WAND top-k retrieval, and an exact DataFrame
scorer that serves as the differential oracle.
"""

from .config import BLOCK_SIZE, DEFAULT_LIMIT, KEY_WIDTH, Bm25Config, derive_seed

__all__ = [
    "Bm25Config",
    "derive_seed",
    "BLOCK_SIZE",
    "KEY_WIDTH",
    "DEFAULT_LIMIT",
]
__version__ = "0.1.0"
