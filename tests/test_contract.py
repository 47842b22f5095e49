"""Driver-contract hygiene: queries() and oracle_sql() stay in lockstep."""

import __spark_entry__ as entrymod

# Queries whose results are not expressible as SQL over the tables —
# the driver records the weaker rows-only check for these, deliberately.
# r6: EMPTY. The trained-ANN family graduated to real SQL oracles
# (training is reproducible — quantized means — so oracles.py replays
# the Lloyd iterations as unrolled CTEs), and multimodal_features to a
# constants oracle over its fixed fixture.
ROWS_ONLY: set[str] = set()


def test_every_query_has_oracle_or_explicit_waiver():
    missing = set(entrymod.queries()) - set(entrymod.oracle_sql())
    assert missing == ROWS_ONLY, (
        f"queries without oracle twins must be explicitly waived here: "
        f"{sorted(missing ^ ROWS_ONLY)}"
    )


def test_no_orphan_oracles():
    orphans = set(entrymod.oracle_sql()) - set(entrymod.queries())
    assert not orphans, f"oracles without queries: {sorted(orphans)}"


def test_contract_callables():
    qs = entrymod.queries()
    assert len(qs) >= 55
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in entrymod.oracle_sql().values())


def test_register_tables_sql_surface(spark, sf_dir):
    """Raw spark.sql over the registered views agrees with the
    DataFrame query for the same aggregation (q1 shape)."""
    from pyspark.sql import functions as F

    from scicat_ingestor_spark.queries import register_tables

    tables = register_tables(spark, sf_dir)
    assert "lineitem" in tables and "events" in tables
    via_sql = spark.sql(
        "SELECT l_returnflag, l_linestatus, count(*) AS n, "
        "sum(l_quantity) AS qty FROM lineitem "
        "WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus"
    ).collect()
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    via_df = (
        df.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"))
        .collect()
    )
    key = lambda r: (r.l_returnflag, r.l_linestatus)  # noqa: E731
    assert {key(r): (r.n, r.qty) for r in via_sql} == {
        key(r): (r.n, r.qty) for r in via_df
    }
    # the normalized events view exposes a TIMESTAMP ts for SQL users
    ts_type = dict(spark.sql("SELECT ts FROM events").dtypes)["ts"]
    assert ts_type == "timestamp"
