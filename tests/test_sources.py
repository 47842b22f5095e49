"""Sources: HDF5 Python Data Source, extractor plugins, wildcard compile,
file stats."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from scicat_ingestor_spark.functions.extractors import (
    apply_extractor,
    register,
)
from scicat_ingestor_spark.sources import filestats, hdf5
from scicat_ingestor_spark.sources.hdf5_datasource import register_hdf5_source


def test_hdf5_datasource_matches_mapinpandas_scan(spark):
    register_hdf5_source(spark)
    paths = ["/a.nxs", "/b/c.nxs", "/b/d.nxs"]
    via_source = (
        spark.read.format("hdf5").option("paths", ",".join(paths)).load()
    )
    files_df = spark.createDataFrame([(p,) for p in paths], "file string")
    via_scan = hdf5.scan_files(files_df)
    assert via_source.schema == via_scan.schema
    a = sorted(tuple(r) for r in via_source.collect())
    b = sorted(tuple(r) for r in via_scan.collect())
    assert a == b and len(a) == 30


def test_hdf5_datasource_parallelism(spark):
    register_hdf5_source(spark)
    paths = ",".join(f"/f{i}.nxs" for i in range(8))
    df = spark.read.format("hdf5").option("paths", paths).load()
    assert df.rdd.getNumPartitions() == 8  # one per file


def test_wildcard_compile_semantics():
    pat = hdf5.compile_wildcard("/entry/user_*/name")
    assert re.match(pat, "/entry/user_alice/name")
    assert not re.match(pat, "/entry/user_alice/other")
    assert not re.match(pat, "/entry/user_alice/deeper/name")
    star = hdf5.compile_wildcard("/entry/*/counts")
    assert re.match(star, "/entry/anything/counts")
    assert not re.match(star, "/entry/a/b/counts")


def test_extractors_builtin(spark):
    df = spark.createDataFrame([([1.0, 2.0, 6.0],)], "vals array<double>")
    row = df.select(
        apply_extractor("max", F.col("vals")).alias("mx"),
        apply_extractor("min", F.col("vals")).alias("mn"),
        apply_extractor("mean", F.col("vals")).alias("avg"),
    ).first()
    assert (row["mx"], row["mn"], row["avg"]) == (6.0, 1.0, 3.0)


def test_extractors_plugin_hook(spark):
    register("span", lambda c: F.array_max(c) - F.array_min(c))
    df = spark.createDataFrame([([1.0, 9.0],)], "vals array<double>")
    assert df.select(apply_extractor("span", F.col("vals"))).first()[0] == 8.0


def test_file_stats_and_checksum(spark, sf_dir, tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"hello" * 1000)
    files = spark.createDataFrame([(str(p),), (str(tmp_path / "nope"),)], "path string")
    rows = {r["path"]: r for r in filestats.stat_files(files).collect()}
    ok = rows[str(p)]
    assert ok["exists"] and ok["size"] == 5000
    assert ok["checksum"] == hashlib.blake2b(b"hello" * 1000).hexdigest()
    missing = rows[str(tmp_path / "nope")]
    assert not missing["exists"] and missing["size"] is None
