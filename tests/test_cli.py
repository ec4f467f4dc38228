"""CLI surface (__main__.py): list, query, and the CSV→warehouse pipeline
run — the reference's `python etl_pipeline/load.py` UX."""

from __future__ import annotations

import contextlib
import io

from bigdata_etl_elt_dashboard_spark.__main__ import main
from bigdata_etl_elt_dashboard_spark.schemas import SALES_RAW

from .fixtures import sales_sources


def _capture(argv) -> tuple[int, str]:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(argv)
    return rc, buf.getvalue()


def test_cli_list():
    rc, out = _capture(["list"])
    assert rc == 0
    assert "q1_total_revenue" in out and "docs_training_corpus" in out


def test_cli_query(spark):
    rc, out = _capture(
        ["query", "q5_avg_margin_per_status", "--sf-dir", "/root/testdata/sf0.001", "--limit", "5"]
    )
    assert rc == 0
    assert "q5_avg_margin_per_status" in out and "avg" in out.lower()
    rc, _ = _capture(["query", "no_such_query"])
    assert rc == 2


def test_cli_pipeline(spark, tmp_path):
    local, api = sales_sources(spark)
    lp, ap = str(tmp_path / "local_csv"), str(tmp_path / "api_csv")
    local.coalesce(1).write.option("header", True).csv(lp)
    api.coalesce(1).write.option("header", True).csv(ap)
    out = str(tmp_path / "wh")
    rc, text = _capture(["pipeline", "--local-csv", lp, "--api-csv", ap, "--out", out])
    assert rc == 0
    assert "warehouse written" in text and "stage=transform" in text
    fact = spark.read.parquet(f"{out}/fact_sales")
    assert fact.count() == 11  # same invariant as test_pipeline_end_to_end


def test_gate_rotation_plan_emitter():
    """tools/gate_rotation.py --plan (r12 verdict task 8): the emitted
    next-round window must be paste-ready and honor the standing
    freshness policy — 50 oracle-backed names, never-gated first, then
    strictly non-decreasing last-gated rounds, no rows-only queries."""
    import re
    import subprocess
    import sys as _sys

    from bigdata_etl_elt_dashboard_spark.plans import REGISTRY

    p = subprocess.run(
        [_sys.executable, "tools/gate_rotation.py", "--plan"],
        capture_output=True, text=True,
        cwd=__file__.rsplit("/tests/", 1)[0],
    )
    assert p.returncode == 0, p.stderr[-500:]
    names = re.findall(r'^    "([a-z0-9_]+)",', p.stdout, re.M)
    rounds = re.findall(r'#\s+(never gated|r(\d+)-last)$', p.stdout, re.M)
    assert len(names) == 50 and len(rounds) == 50
    assert all(REGISTRY[n].oracle is not None for n in names)
    order = [-1 if tag.startswith("never") else int(num) for tag, num in rounds]
    assert order == sorted(order)  # freshness order, never-gated first
    assert "_GATE_WINDOW = [" in p.stdout  # paste-ready literal
