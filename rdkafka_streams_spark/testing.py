"""Shared test/verification helpers: DuckDB oracle wiring and the
order-insensitive DataFrame comparison the driver's correctness gate models.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from rdkafka_streams_spark.core.io import TABLES


def duck_con(sf_dir: str, tables: tuple[str, ...] = TABLES) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by value; stringify timestamps/objects —
    the canonical form under which Spark and oracle results must be equal."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def diff_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Empty list = match (bitwise for floats). Mirrors the driver's
    row-count + schema + order-insensitive value comparison."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return [
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        ]
    if len(spark_pdf) != len(duck_pdf):
        return [f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}"]
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sc, dc = s[c], d[c]
        if pd.api.types.is_float_dtype(sc) and pd.api.types.is_float_dtype(dc):
            mask = ~(sc.isna() & dc.isna())
            eq = np.isclose(
                sc[mask].astype(float), dc[mask].astype(float), rtol=0, atol=0, equal_nan=True
            )
            if not eq.all():
                diffs = (sc[mask][~eq].astype(float) - dc[mask][~eq].astype(float)).abs()
                problems.append(
                    f"col {c!r}: {(~eq).sum()} mismatches, max |diff|={diffs.max():.3e}, "
                    f"e.g. spark={sc[mask][~eq].iloc[0]!r} duck={dc[mask][~eq].iloc[0]!r}"
                )
        else:
            eq = sc.astype(str).fillna("<null>") == dc.astype(str).fillna("<null>")
            if not eq.all():
                i = int((~eq).idxmax())
                problems.append(
                    f"col {c!r}: {(~eq).sum()} mismatches, e.g. row {i}: "
                    f"spark={sc.iloc[i]!r} duck={dc.iloc[i]!r} (dtypes {sc.dtype}/{dc.dtype})"
                )
    return problems
