"""Differential test: every registered query with an oracle must match
DuckDB exactly at sf0.01 — the local mirror of the driver's t2 gate."""

from __future__ import annotations

import pytest

from bigdata_etl_elt_dashboard_spark.plans import REGISTRY

from .oracle_harness import compare, duck_connection

_WITH_ORACLE = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)
_ROWS_ONLY = sorted(name for name, q in REGISTRY.items() if q.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_oracle):
    con = duck_connection(sf_oracle)
    yield con
    con.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_match(spark, sf_oracle, duck, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_oracle)
    report = compare(df, duck, q.oracle)
    assert report["ok"], f"{name}: {report['mismatches']}"


def test_driver_gate_window_order_is_pinned():
    """The driver verifies the FIRST 50 registry entries per round; the
    round's rotation plan lives in plans.__init__._GATE_WINDOW. Guard
    against registration-order drift silently pushing a planned query out
    of the gated window."""
    from bigdata_etl_elt_dashboard_spark import plans

    names = list(REGISTRY)
    assert names[: len(plans._GATE_WINDOW)] == plans._GATE_WINDOW
    assert len(plans._GATE_WINDOW) == 50
    # everything in the window except the documented rows-only entry is
    # value-hash gated (has an oracle)
    rows_only = [n for n in plans._GATE_WINDOW if REGISTRY[n].oracle is None]
    assert rows_only == ["agg_approx_sketches"]


def test_queries_md_index_is_fresh():
    """QUERIES.md is generated from the registry; regenerate via
    ``python tools/gen_query_index.py`` whenever queries change."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "QUERIES.md")) as f:
        before = f.read()
    subprocess.run(
        [sys.executable, os.path.join(root, "tools", "gen_query_index.py")],
        check=True,
        cwd=root,
        capture_output=True,
    )
    with open(os.path.join(root, "QUERIES.md")) as f:
        after = f.read()
    assert before == after, "QUERIES.md is stale — run tools/gen_query_index.py"


def test_harness_is_type_strict():
    """Round-1 regression: the driver's value-hash distinguishes DECIMAL from
    DOUBLE; the local harness must too (it used to coerce Decimal->float and
    passed three queries the driver failed)."""
    from decimal import Decimal

    from .oracle_harness import _norm_value

    assert _norm_value(Decimal("1.50")) != _norm_value(1.5)
    assert _norm_value(Decimal("1.50")) == _norm_value(Decimal("1.50"))
    # differing textual scale is also a mismatch (hash is over string forms)
    assert _norm_value(Decimal("1.50")) != _norm_value(Decimal("1.5"))


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, sf_oracle, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_oracle)
    n = df.count()
    assert n >= 0
    assert df.columns  # stable schema exists
