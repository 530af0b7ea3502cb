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
    """Canonical string for one value (engine-agnostic)."""
    if v is None:
        return NULL
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return f"{v:.4f}"
    if isinstance(v, Decimal):
        return f"{v:.4f}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, _dt.datetime):
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
    if isinstance(v, dict):
        items = sorted((str(k), canon_cell(val)) for k, val in v.items())
        return "{" + ",".join(f"{k}:{val}" for k, val in items) + "}"
    # numpy scalars and anything else with .item()
    item = getattr(v, "item", None)
    if item is not None:
        try:
            return canon_cell(item())
        except Exception:
            pass
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    """Sort columns by name, canonicalize cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def sha(rows: list[tuple[str, ...]]) -> str:
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode("utf-8"))
        h.update(b"\x1e")
    return h.hexdigest()


def spark_result(df) -> tuple[list[str], list[tuple]]:
    return df.columns, [tuple(r) for r in df.collect()]


def duck_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


class OracleMismatch(AssertionError):
    pass


def compare(spark_df, con, sql: str, name: str = "query") -> int:
    """Compare a Spark DataFrame against a DuckDB SQL result.

    Raises OracleMismatch with a focused diff on failure; returns row count
    on success.
    """
    s_cols, s_rows = spark_result(spark_df)
    d_cols, d_rows = duck_result(con, sql)
    if sorted(s_cols) != sorted(d_cols):
        raise OracleMismatch(
            f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
        )
    if len(s_rows) != len(d_rows):
        raise OracleMismatch(
            f"{name}: row count mismatch spark={len(s_rows)} duckdb={len(d_rows)}"
        )
    cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
    if cs != cd:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(cs, cd)) if a != b
        ][:5]
        raise OracleMismatch(
            f"{name}: value mismatch ({len(diffs)}+ rows differ); "
            f"cols={sorted(s_cols)} first diffs (spark vs duckdb): {diffs}"
        )
    return len(cs)
