"""Differential-testing harness: Spark result vs DuckDB oracle.

Mirrors the driver's t2 gate (row-count + column set + order-insensitive
value comparison) but STRICTER locally: values must match exactly after
normalization (doubles to 9 significant digits, timestamps to microseconds),
so any engine-semantics drift surfaces here first.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from decimal import Decimal

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, Decimal):
        # TYPE-STRICT (round-2): do NOT coerce Decimal -> float. The driver's
        # value-hash distinguishes Spark DECIMAL from DuckDB DOUBLE (round-1
        # failed elt_sales_clean / elt_region_rollup_sql / elt_grouping_sets_sql
        # on exactly this drift while this harness passed them). A Decimal on
        # one side only matches a Decimal with the identical string form on
        # the other side.
        return ("decimal", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        # 9 significant digits: tolerates accumulation-order ULP drift only
        return float(f"{v:.9g}")
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_value(r[i]) for i in idx) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in idx], out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Run both sides, return a diff report dict; report['ok'] is the gate."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    d = con.execute(sql)
    d_cols = [c[0] for c in d.description]
    d_rows = d.fetchall()

    report = {"ok": True, "mismatches": []}
    if sorted(s_cols) != sorted(d_cols):
        report["ok"] = False
        report["mismatches"].append(f"columns: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return report
    if len(s_rows) != len(d_rows):
        report["ok"] = False
        report["mismatches"].append(f"rowcount: spark={len(s_rows)} duck={len(d_rows)}")
    _, sn = _norm_rows(s_cols, s_rows)
    _, dn = _norm_rows(d_cols, d_rows)
    if sn != dn:
        report["ok"] = False
        diffs = [i for i, (a, b) in enumerate(zip(sn, dn)) if a != b][:5]
        for i in diffs:
            report["mismatches"].append(f"row {i}: spark={sn[i]} duck={dn[i]}")
        if len(sn) != len(dn):
            report["mismatches"].append("row sets differ in length")
    return report
