"""Datafile-list assembly (SURVEY §2.1 S17-S18, §3.2 step 7).

The reference builds one ``DataFileListItem`` per ingested file, appends
a ``<stem>.b2b`` hash-file sibling for every hashed file (the sibling
itself carries no hash), and rewrites paths relative to the source
folder (/root/reference/src/scicat_dataset.py:615-692, item shape
:509-519).

Spark-first: the datafile list is an ARRAY<STRUCT> column per dataset
row; sibling injection and path rewrite are array expressions — no
shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ITEM_SCHEMA = (
    "path string, size long, time string, chk string, uid string, gid string, perm string"
)

# blake2b hex digest length: the hash FILE's content (and thus its size)
# is the 128-char hex string (/root/reference/src/scicat_dataset.py:592-612)
HASH_FILE_SIZE = 128


def item(
    path: Column,
    size: Column,
    time: Column,
    chk: Column | None = None,
    uid: Column | None = None,
    gid: Column | None = None,
    perm: Column | None = None,
) -> Column:
    null = F.lit(None).cast("string")
    return F.struct(
        path.cast("string").alias("path"),
        size.cast("long").alias("size"),
        time.cast("string").alias("time"),
        (chk if chk is not None else null).cast("string").alias("chk"),
        (uid if uid is not None else null).cast("string").alias("uid"),
        (gid if gid is not None else null).cast("string").alias("gid"),
        (perm if perm is not None else null).cast("string").alias("perm"),
    )


def _hash_sibling(it: Column, ingestor_dir: str, ext: str) -> Column:
    basename = F.substring_index(it.getField("path"), "/", -1)
    return F.struct(
        F.concat(F.lit(ingestor_dir.rstrip("/") + "/"), basename, F.lit(ext)).alias(
            "path"
        ),
        F.lit(HASH_FILE_SIZE).cast("long").alias("size"),
        it.getField("time").alias("time"),
        F.lit(None).cast("string").alias("chk"),  # hash file carries no hash
        F.lit(None).cast("string").alias("uid"),
        F.lit(None).cast("string").alias("gid"),
        F.lit(None).cast("string").alias("perm"),
    )


def with_hash_files(items: Column, ingestor_dir: str, ext: str = ".b2b") -> Column:
    """S18: after each item that has a checksum, insert its hash-file
    sibling (which has no checksum of its own)."""
    return F.flatten(
        F.transform(
            items,
            lambda it: F.when(
                it.getField("chk").isNotNull(),
                F.array(it, _hash_sibling(it, ingestor_dir, ext)),
            ).otherwise(F.array(it)),
        )
    )


def relativize(items: Column, source_folder: Column) -> Column:
    """file_path_type=relative: strip `source_folder`/ from every path
    (reference uses Path.relative_to, :684-691). Paths outside the
    folder are left absolute (the reference would raise; we tolerate)."""
    prefix = F.concat(source_folder, F.lit("/"))
    return F.transform(
        items,
        lambda it: it.withField(
            "path",
            F.when(
                it.getField("path").startswith(prefix),
                it.getField("path").substr(F.length(prefix) + 1, F.lit(1 << 30)),
            ).otherwise(it.getField("path")),
        ),
    )
