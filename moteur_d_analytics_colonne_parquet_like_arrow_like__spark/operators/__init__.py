"""Extension operators beyond the reference's 9-operator surface.

The reference is single-table only (``cae/README.md:137``); everything in
this package is the north-star extension surface from SURVEY.md §2.4-2.11,
expressed Spark-first: built-in DataFrame ops wherever semantics allow,
Arrow-batched pandas UDFs only where they genuinely don't (minhash band
hashing, embedding kernels, multimodal decode).
"""

from . import (
    aggregates,
    dedup,
    joins,
    multimodal,
    setops,
    similarity,
    sorts,
    text,
    windows,
)

__all__ = [
    "aggregates",
    "dedup",
    "joins",
    "multimodal",
    "setops",
    "similarity",
    "sorts",
    "text",
    "windows",
]
