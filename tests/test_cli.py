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
