"""Shared streaming-source helpers."""

from __future__ import annotations

import os
import tempfile


def as_stream_dir(path: str, prefix: str = "stream_src_") -> str:
    """Spark's file stream source requires a DIRECTORY. The test data
    ships single parquet files — expose one through a temp dir holding
    an absolute symlink (the one definition of the shim that was
    previously copy-pasted per module). Directories pass through."""
    if not os.path.isfile(path):
        return path
    d = tempfile.mkdtemp(prefix=prefix)
    os.symlink(os.path.abspath(path), os.path.join(d, os.path.basename(path)))
    return d
