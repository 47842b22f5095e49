"""Driver-contract hygiene: queries() and oracle_sql() stay in lockstep."""

import __spark_entry__ as entrymod

# Queries whose results depend on data-trained plan constants or
# hash-based fake extractors — not expressible as static SQL; the driver
# records the weaker rows-only check for these, deliberately.
ROWS_ONLY = {"ann_ivf_trained_topk", "multimodal_features"}


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
