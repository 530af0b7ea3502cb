"""DuckDB oracle harness: canonical serialization + comparison.

Implements the oracle determinism protocol of SURVEY.md §2.4: the Spark
result and the DuckDB result of the *same declared query* are canonically
serialized (columns sorted by name, rows sorted by all columns, floats
rendered at fixed precision, ``\\N`` for null, ISO timestamps) and compared
cell-by-cell / via sha256.

This mirrors what the driver's correctness gate does (row-count + schema +
order-insensitive value-hash), so any query that passes here should pass
there.  Used only by tests — never in the hot path.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
from decimal import Decimal

import duckdb

from .catalog import ALL_TABLES

NULL = "\\N"


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh DuckDB connection with the engine tables registered as views,
    matching the driver's pre-registered-views setup."""
    con = duckdb.connect()
    for name in ALL_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir.rstrip('/')}/{name}.parquet')"
        )
    return con


def canon_cell(v) -> str:
    """Canonical string for one value.

    DRIVER-FAITHFUL rendering (round-1 finding): the external correctness
    gate pulls both results through pandas and stringifies cells, so the
    type *class* matters — Decimal vs float, int64 vs float64, ndarray
    cells — not just the numeric value.  Floats therefore render via
    ``str`` (shortest repr; a last-ulp engine divergence IS a failure
    there, so it must be one here), and Decimal renders distinctly from
    float so a decimal-typed output can never silently pass.
    """
    # numpy scalars -> python scalars first (np.float64 is a float
    # subclass, np.int64 is not an int subclass)
    if type(v).__module__ == "numpy" and hasattr(v, "item") and not hasattr(v, "__len__"):
        v = v.item()
    if v is None:
        return NULL
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return str(v)
    if isinstance(v, Decimal):
        return f"Decimal({v})"
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, _dt.datetime):
        if v != v:  # pandas NaT
            return NULL
        # millisecond precision, naive (both engines run tz-naive/UTC)
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="milliseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if hasattr(v, "tolist"):  # numpy array cell
        return "[" + ",".join(canon_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, dict):
        items = sorted((str(k), canon_cell(val)) for k, val in v.items())
        return "{" + ",".join(f"{k}:{val}" for k, val in items) + "}"
    if v != v:  # remaining NaN-like (pandas NA)
        return NULL
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    """Sort columns by name, canonicalize cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def canon_pdf(pdf) -> list[tuple[str, ...]]:
    """Canonicalize a pandas DataFrame the way the driver does: columns
    sorted by name, datetime64 columns rendered via pandas' own column
    formatter (which drops the time part when every value in the column is
    midnight — this is exactly how a Spark DATE column, arriving as
    datetime.date objects, hashes equal to DuckDB's DATE, which .df()
    widens to datetime64), everything else through canon_cell."""
    import numpy as np

    cols = sorted(pdf.columns)
    rendered = []
    for c in cols:
        ser = pdf[c]
        if np.issubdtype(ser.dtype, np.datetime64):
            rendered.append(
                [NULL if s == "NaT" else s for s in ser.astype(str)]
            )
        else:
            rendered.append([canon_cell(v) for v in ser])
    out = list(zip(*rendered)) if cols else []
    out.sort()
    return out


def sha(rows: list[tuple[str, ...]]) -> str:
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode("utf-8"))
        h.update(b"\x1e")
    return h.hexdigest()


def spark_result(df):
    """Spark result via toPandas — the driver's path.  Nullable int
    columns become float64 with NaN exactly as the external gate sees
    them (DuckDB's .df() does the same on its side)."""
    return df.toPandas()


def duck_result(con, sql: str):
    """DuckDB result via .df() — the driver's path.  This is what exposes
    HUGEINT (sum of ints) as float64: fetchall() would hand back exact
    ints and silently mask a driver-side hash mismatch."""
    return con.execute(sql).df()


class OracleMismatch(AssertionError):
    pass


def compare(spark_df, con, sql: str, name: str = "query") -> int:
    """Compare a Spark DataFrame against a DuckDB SQL result.

    Raises OracleMismatch with a focused diff on failure; returns row count
    on success.
    """
    s_pdf = spark_result(spark_df)
    d_pdf = duck_result(con, sql)
    s_cols, d_cols = list(s_pdf.columns), list(d_pdf.columns)
    if sorted(s_cols) != sorted(d_cols):
        raise OracleMismatch(
            f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
        )
    if len(s_pdf) != len(d_pdf):
        raise OracleMismatch(
            f"{name}: row count mismatch spark={len(s_pdf)} duckdb={len(d_pdf)}"
        )
    cs, cd = canon_pdf(s_pdf), canon_pdf(d_pdf)
    if cs != cd:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(cs, cd)) if a != b
        ][:5]
        raise OracleMismatch(
            f"{name}: value mismatch ({len(diffs)}+ rows differ); "
            f"cols={sorted(s_cols)} first diffs (spark vs duckdb): {diffs}"
        )
    return len(cs)
