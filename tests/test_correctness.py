"""The operator-library correctness gate: every registered query vs its
DuckDB oracle at sf0.001 (the driver runs the same contract at sf0.01)."""

from __future__ import annotations

import pytest

from rdkafka_streams_spark.queries import REGISTRY
from rdkafka_streams_spark.testing import diff_frames


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    spdf = q.fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        assert len(spdf) >= 0  # rows-only contract: runs and yields a frame
        return
    dpdf = duck.execute(q.oracle).fetchdf()
    problems = diff_frames(spdf, dpdf)
    assert not problems, f"{name}: " + "; ".join(problems)
    assert len(spdf) > 0, f"{name}: empty result weakens the check"


def test_registry_complete():
    # every query has a distinct, stable name and a docstring
    assert len(REGISTRY) >= 50
    for name, q in REGISTRY.items():
        assert q.doc, f"{name} has no docstring"


def test_entry_contract(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())
