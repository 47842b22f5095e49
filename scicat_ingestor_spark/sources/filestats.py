"""File-stat + checksum scans (SURVEY §2.1 S8-S9, S18).

Reference: per-file os.stat -> size/ctime/uid/gid/perm
(/root/reference/src/scicat_dataset.py:554-589) and streaming blake2b
over a 128 KiB buffer (:532-551; only blake2b is accepted, else raise).

Spark-first: both run inside one mapInPandas stage over the file-path
DataFrame — stat and hash happen next to the data, one pass per file,
no driver I/O. Missing files produce a row with nulls + now-timestamp
only, mirroring the reference's fallback (:584-589).
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd

from pyspark.sql import DataFrame

STATS_SCHEMA = (
    "path string, size long, ctime string, uid long, gid long, perm string, "
    "checksum string, exists boolean"
)

_BUF = 128 * 1024  # reference buffer size (/root/reference/src/scicat_dataset.py:546)


def compute_checksum(path: str, algorithm: str = "blake2b") -> str:
    """Streaming checksum; only blake2b is allowed, matching the
    reference's guard (/root/reference/src/scicat_dataset.py:532-543)."""
    if algorithm != "blake2b":
        raise ValueError(f"Unsupported checksum algorithm: {algorithm}")
    h = hashlib.blake2b()
    with open(path, "rb") as f:
        while chunk := f.read(_BUF):
            h.update(chunk)
    return h.hexdigest()


def _iso_z(ts: float) -> str:
    # reference emits ISO with trailing .000Z (/root/reference/src/scicat_dataset.py:566-571)
    return (
        datetime.fromtimestamp(ts, tz=timezone.utc)
        .isoformat(timespec="milliseconds")
        .replace("+00:00", "Z")
    )


def stat_files(files_df: DataFrame, path_col: str = "path", with_checksum: bool = True) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path in pdf[path_col]:
                try:
                    st = os.stat(path)
                except OSError:
                    rows.append(
                        {
                            "path": path,
                            "size": None,
                            "ctime": _iso_z(datetime.now(tz=timezone.utc).timestamp()),
                            "uid": None,
                            "gid": None,
                            "perm": None,
                            "checksum": None,
                            "exists": False,
                        }
                    )
                    continue
                rows.append(
                    {
                        "path": path,
                        "size": st.st_size,
                        "ctime": _iso_z(st.st_ctime),
                        "uid": st.st_uid,
                        "gid": st.st_gid,
                        "perm": oct(st.st_mode)[-3:],
                        "checksum": compute_checksum(path) if with_checksum else None,
                        "exists": True,
                    }
                )
            yield pd.DataFrame(rows)

    return files_df.mapInPandas(run, schema=STATS_SCHEMA)
