"""Cross-engine deterministic hash helpers.

All hash-dependent operators (minhash, simhash, LSH, fingerprints)
use **md5** because Spark and DuckDB produce identical lowercase hex
for identical input strings — unlike engine-native hashes
(xxhash64 vs DuckDB ``hash()``), which would break differential
testing. The helpers derive integers from md5 hex prefixes:
15 hex chars = 60 bits, always inside a signed int64.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column, nhex: int = 15) -> Column:
    """First ``nhex`` hex chars of md5 as a non-negative bigint.
    DuckDB equivalent: ``('0x' || substr(md5(x), 1, nhex))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, nhex), 16, 10).cast("bigint")


def py_md5_long(s: str, nhex: int = 15) -> int:
    """Driver-side counterpart (for deriving deterministic constants
    like LSH hyperplane signs)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:nhex], 16)


def lsh_plane_signs(n_planes: int, dims: int) -> list[list[int]]:
    """±1 hyperplane sign matrix derived from md5 — deterministic,
    seed-free, identical for any engine that replays the derivation."""
    return [
        [1 if py_md5_long(f"plane{p}_dim{d}", 8) % 2 == 0 else -1 for d in range(dims)]
        for p in range(n_planes)
    ]
