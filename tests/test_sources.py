"""Sources: HDF5 Python Data Source, extractor plugins, wildcard compile,
file stats."""

from __future__ import annotations

import hashlib
import types
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


def test_file_open_retry_clamp_and_backoff(monkeypatch):
    """T6: open retried with clamped delay, succeeds within budget, and
    raises the last error after exhaustion
    (/root/reference/src/scicat_nexus_helper.py:62-95 — 3 tries, delay
    clamped to [1, 120] s)."""
    assert hdf5._clamp_delay(0.01) == 1.0
    assert hdf5._clamp_delay(3.0) == 3.0
    assert hdf5._clamp_delay(999) == 120.0

    attempts = {"n": 0}
    sleeps: list[float] = []

    class FakeFile:
        def __init__(self, path, mode):
            attempts["n"] += 1
            if attempts["n"] < 3:
                raise OSError("file locked by writer")

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def visititems(self, fn):
            pass

    class FakeH5py:
        File = FakeFile
        Dataset = type("Dataset", (), {})

    monkeypatch.setattr(hdf5, "try_import_h5py", lambda: FakeH5py)
    monkeypatch.setattr(hdf5.time, "sleep", sleeps.append)
    rows = hdf5._walk_h5("/being/written.nxs", max_tries=3, retry_delay=0.1)
    assert rows == [] and attempts["n"] == 3
    assert sleeps == [1.0, 1.0]  # clamped up from 0.1

    attempts["n"] = -10  # never succeeds within 3 tries
    try:
        hdf5._walk_h5("/never/ready.nxs", max_tries=3, retry_delay=5)
        raise AssertionError("expected OSError")
    except OSError:
        pass


def test_retry_delay_list_fill_truncate(monkeypatch):
    """T6 list form: per-attempt delays with the reference's
    fill/truncate semantics
    (/root/reference/src/scicat_configuration.py:296-309,
    scicat_nexus_helper.py:63-87 and tests/test_file_io_delay.py)."""
    r = hdf5.resolve_retry_delays

    assert r(None, 3) == [3.0, 3.0, 3.0]  # empty -> default everywhere
    assert r([], 3) == [3.0, 3.0, 3.0]
    assert r([5], 3) == [5.0, 5.0, 5.0]  # shorter -> extend with last
    assert r([1, 2], 4) == [1.0, 2.0, 2.0, 2.0]
    assert r([1, 2, 3, 4, 5], 3) == [1.0, 2.0, 3.0]  # longer -> truncate
    assert r([0.01, 999], 2) == [1.0, 120.0]  # clamp [1, 120]
    assert r(7.0, 3) == [7.0, 7.0, 7.0]  # scalar back-compat

    # the walker consumes the schedule in order
    attempts = {"n": 0}
    sleeps: list[float] = []

    class FakeFile:
        def __init__(self, path, mode):
            attempts["n"] += 1
            if attempts["n"] < 4:
                raise OSError("file locked by writer")

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def visititems(self, fn):
            pass

    class FakeH5py:
        File = FakeFile
        Dataset = type("Dataset", (), {})

    monkeypatch.setattr(hdf5, "try_import_h5py", lambda: FakeH5py)
    monkeypatch.setattr(hdf5.time, "sleep", sleeps.append)
    rows = hdf5._walk_h5("/being/written.nxs", max_tries=3, retry_delay=[2, 4])
    assert rows == [] and attempts["n"] == 4  # first open + 3 retries
    assert sleeps == [2.0, 4.0, 4.0]


def test_config_retry_schedule():
    """FileHandlingConfig.retry_schedule: the list wins over the scalar
    when non-empty; empty list falls back to the scalar."""
    from scicat_ingestor_spark.config import FileHandlingConfig

    c = FileHandlingConfig(open_max_tries=3, open_retry_delay_s=5.0)
    assert c.retry_schedule() == [5.0, 5.0, 5.0]
    c = FileHandlingConfig(
        open_max_tries=3, open_retry_delay_s=5.0, open_retry_delays=[1, 2]
    )
    assert c.retry_schedule() == [1.0, 2.0, 2.0]


def test_walk_h5_normalizes_like_hdf5lite(monkeypatch):
    """ADVICE r4: both walkers must emit IDENTICAL rows for the same
    tree. h5py yields numpy scalars/arrays and bytes; a stub h5py module
    serves a tree of exactly those types and the rows must come out in
    the plain-python rendering the hdf5lite walker produces (decoded
    strings, comma-separated list reprs) — with the same max_elements
    bulk-data skip."""
    import numpy as np

    class _DS:
        def __init__(self, value, unit=b"", size=1):
            self._value = value
            self.size = size
            self.attrs = {"units": unit} if unit else {}

        def __getitem__(self, _):
            return self._value

    class _File:
        tree = {
            "entry/title": _DS(b"run 7"),
            "entry/temp": _DS(np.float64(291.5), unit=b"K"),
            "entry/counts": _DS(np.array([1, 2, 3]), unit=b"counts", size=3),
            "entry/team": _DS(np.array([b"ada", b"grace"]), size=2),
            # GB-scale event array stand-in: must be skipped, not read
            "entry/events": _DS(None, size=10_000_000),
        }

        def __init__(self, path, mode):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def visititems(self, fn):
            for name, obj in self.tree.items():
                fn(name, obj)

    stub = types.SimpleNamespace(File=_File, Dataset=_DS)
    monkeypatch.setattr(hdf5, "try_import_h5py", lambda: stub)

    rows = dict(
        (path, (value, unit))
        for path, value, unit in hdf5._walk_h5("/fake.nxs")
    )
    # plain-python renderings — exactly what _walk_hdf5lite emits
    assert rows["/entry/title"] == ("run 7", "")
    assert rows["/entry/temp"] == ("291.5", "K")
    assert rows["/entry/counts"] == ("[1, 2, 3]", "counts")  # commas, not numpy repr
    assert rows["/entry/team"] == ("['ada', 'grace']", "")  # decoded bytes
    assert "/entry/events" not in rows  # max_elements dataspace skip
