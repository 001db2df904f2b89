"""Format IO roundtrips (SURVEY.md §2.1 S7): parquet/csv/json."""

from __future__ import annotations

import pytest

from rdkafka_streams_spark.core.io import load_table, read_any, write_any


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json"])
def test_roundtrip(spark, sf_dir, tmp_path, fmt):
    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / f"nation_{fmt}")
    write_any(src, path, fmt)
    back = read_any(spark, path, fmt, schema=src.schema)
    assert back.count() == src.count()
    assert {r["n_name"] for r in back.collect()} == {r["n_name"] for r in src.collect()}


def test_load_table_rejects_unknown(spark, sf_dir):
    with pytest.raises(KeyError):
        load_table(spark, sf_dir, "nope")
