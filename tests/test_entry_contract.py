"""Driver-contract smoke: entry() runs, every queries() entry returns a
DataFrame at sf0.001, and every oracle key has a matching query."""

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"host", "url", "rn"}


def test_oracle_keys_subset_of_queries():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # the vast majority must be oracle-checked
    assert len(oracles) >= 20


def test_all_queries_run_smoke(spark, sf_dir):
    qs = entry_mod.queries()
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()
