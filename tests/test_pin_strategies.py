"""The pin() materialization helper is deployment policy, not semantics:
every strategy (local checkpoint / reliable checkpoint / persist+count)
must yield bit-identical results for the queries whose correctness LEANS
on pinning — the iterative plans (per-round frames) and global_rank
(frozen partition ids feeding two branches).

This is the cluster-grading proof for the round-4 advisory: on a
preemptible cluster, ``spark.graft.pin.strategy=reliable`` swaps every
executor-local checkpoint for a fault-tolerant one WITHOUT touching any
query code, and these tests pin (sic) the equivalence.
"""

from __future__ import annotations

import pytest

from bigdata_etl_elt_dashboard_spark.operators.scale import (
    PIN_DIR_CONF,
    PIN_STRATEGY_CONF,
    pin,
)
from bigdata_etl_elt_dashboard_spark.plans import REGISTRY

# queries whose plans route through pin(): one iterative (per-round
# pinning), one multi-branch (frozen partition ids), one corpus DAG
_PINNED_QUERIES = [
    "graph_pagerank_3iter",
    "scale_global_rank_orders",
    "docs_span_contamination",
]


def _rows(spark, name: str, sf_dir: str):
    df = REGISTRY[name].fn(spark, sf_dir)
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def _strategy(spark, tmp_path):
    """Restore the default strategy (and checkpoint dir conf) after each
    test — the session is shared across the whole suite."""
    yield
    spark.conf.set(PIN_STRATEGY_CONF, "local")
    spark.conf.unset(PIN_DIR_CONF)


@pytest.mark.parametrize("strategy", ["reliable", "persist"])
@pytest.mark.parametrize("name", _PINNED_QUERIES)
def test_strategy_equivalence(spark, sf_smoke, tmp_path, _strategy, strategy, name):
    spark.conf.set(PIN_STRATEGY_CONF, "local")
    baseline = _rows(spark, name, sf_smoke)
    spark.conf.set(PIN_STRATEGY_CONF, strategy)
    spark.conf.set(PIN_DIR_CONF, str(tmp_path / "pin"))
    assert _rows(spark, name, sf_smoke) == baseline


def test_reliable_checkpoints_to_configured_dir(spark, sf_smoke, tmp_path, _strategy):
    """The reliable strategy must actually write fault-tolerant checkpoint
    files under spark.graft.pin.dir (not executor-local block storage)."""
    import os

    target = tmp_path / "pin-dir"
    spark.conf.set(PIN_STRATEGY_CONF, "reliable")
    spark.conf.set(PIN_DIR_CONF, str(target))
    df = spark.range(100).transform(pin)
    assert df.count() == 100
    # setCheckpointDir only applies on first use; if an earlier test in the
    # session already registered one, the context dir wins — accept either,
    # but SOME reliable checkpoint dir must exist and be non-empty.
    ckpt_dir = spark.sparkContext.getCheckpointDir()
    assert ckpt_dir is not None
    local = ckpt_dir.removeprefix("file:")
    assert os.path.isdir(local) and any(os.scandir(local))


def test_reliable_pin_runs_iterative_query_off_checkpoint_files(
    spark, sf_smoke, tmp_path, _strategy
):
    """The deployment mode SCALING.md recommends for preemptible 100 TB
    clusters must EXECUTE in CI, not just parse: run PageRank under
    spark.graft.pin.strategy=reliable and assert (a) its two pinned
    frames (edge list + degree table — every iteration joins both) wrote
    real fault-tolerant checkpoint rdd-* directories with part files, and
    (b) the result is bit-equal to the local-strategy baseline — reliable
    checkpointing TRUNCATES lineage, so a correct result can only have
    been computed by reading those files back (written AND reused)."""
    import os

    spark.conf.set(PIN_STRATEGY_CONF, "local")
    baseline = _rows(spark, "graph_pagerank_3iter", sf_smoke)

    spark.conf.set(PIN_STRATEGY_CONF, "reliable")
    spark.conf.set(PIN_DIR_CONF, str(tmp_path / "pin"))

    def rdd_dirs() -> set[str]:
        # the context checkpoint dir is sticky from its first use in the
        # shared session, so count NEW rdd-* dirs rather than assuming ours
        d = spark.sparkContext.getCheckpointDir()
        if d is None:
            return set()
        local = d.removeprefix("file:")
        if not os.path.isdir(local):
            return set()
        return {e.name for e in os.scandir(local) if e.name.startswith("rdd-")}

    before = rdd_dirs()
    got = _rows(spark, "graph_pagerank_3iter", sf_smoke)
    assert got == baseline
    new = rdd_dirs() - before
    assert len(new) >= 2, f"expected one reliable checkpoint per pin (edges, deg), got {new}"
    base = spark.sparkContext.getCheckpointDir().removeprefix("file:")
    part_files = [
        f
        for n in new
        for f in os.listdir(os.path.join(base, n))
        if f.startswith("part-")
    ]
    assert part_files, "reliable checkpoints wrote no part files"


def test_unknown_strategy_raises(spark, _strategy):
    spark.conf.set(PIN_STRATEGY_CONF, "no-such-strategy")
    with pytest.raises(ValueError, match="no-such-strategy"):
        spark.range(1).transform(pin)


def test_fan_out_widens_single_split_scans(spark, sf_oracle, tmp_path):
    """fan_out must repartition a single-file scan up to the context's
    default parallelism, be an identity on scans that already have enough
    splits, and never change row contents."""
    from bigdata_etl_elt_dashboard_spark.operators.scale import fan_out

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    assert len(docs.inputFiles()) == 1
    wide = fan_out(docs)
    target = spark.sparkContext.defaultParallelism
    assert wide.rdd.getNumPartitions() == target
    assert wide.count() == docs.count()

    # many-file input: identity (no repartition node, same object)
    many = tmp_path / "many"
    spark.range(1000).repartition(target).write.parquet(str(many))
    df = spark.read.parquet(str(many))
    assert len(df.inputFiles()) >= target
    assert fan_out(df) is df


class TestZeroRowQueriesAreNotVacuous:
    """Queries whose selecting condition CAN be empty need their positive
    path pinned on an engineered slice of the real tables — a hash match
    on an empty result is weak evidence. Since r10, the non-vacuity lint
    (test_oracle_parity.py::test_no_vacuous_oracle_gates) forces every
    oracle-gated query to be rows-bearing at the gate SF except the
    whitelisted li_value_share_parts (Q11-faithful threshold, empty at
    every local SF by design) — exactly the query whose positive path
    these slices pin. customers_without_orders is rows-bearing since its
    r10 redesign (no-1995-orders), but its engineered slice stays: it
    asserts the anti-join reports EXACTLY an injected victim delta, not
    just any rows."""

    @staticmethod
    def _slice(spark, sf, tmp_path, tables, filters):
        out = tmp_path / "sliced"
        out.mkdir(exist_ok=True)
        for name in tables:
            df = spark.read.parquet(f"{sf}/{name}.parquet")
            if name in filters:
                df = df.filter(filters[name])
            df.write.mode("overwrite").parquet(str(out / f"{name}.parquet"))
        return str(out)

    def test_customers_without_orders_positive(self, spark, sf_smoke, tmp_path):
        from pyspark.sql import functions as F

        from bigdata_etl_elt_dashboard_spark.plans import REGISTRY

        # victims: 3 customers who DO have 1995 orders in the pristine data
        baseline = {
            r["c_custkey"]
            for r in REGISTRY["customers_without_orders"].fn(spark, sf_smoke).collect()
        }
        victims = [
            r["c_custkey"]
            for r in spark.read.parquet(f"{sf_smoke}/customer.parquet")
            .filter(~F.col("c_custkey").isin(list(baseline)))
            .select("c_custkey").orderBy("c_custkey").limit(3).collect()
        ]
        d = self._slice(
            spark, sf_smoke, tmp_path,
            ["customer", "orders"],
            {"orders": ~F.col("o_custkey").isin(victims)},
        )
        got = {
            r["c_custkey"]
            for r in REGISTRY["customers_without_orders"].fn(spark, d).collect()
        }
        # the anti-join reports exactly baseline plus the injected victims
        assert got == baseline | set(victims)

    def test_set_ops_customer_years_exact_semantics(self, spark, sf_smoke):
        """Plain-Python replicate of the INTERSECT/EXCEPT semantics on the
        pristine smoke tables (audit-invariant pattern): the distinct
        customer sets are computed independently with Python set algebra
        and must equal the engine's answer exactly."""
        import duckdb

        from bigdata_etl_elt_dashboard_spark.plans import REGISTRY

        con = duckdb.connect()
        rows = con.execute(
            "SELECT o_custkey, year(CAST(o_orderdate AS DATE)) AS y, o_orderstatus"
            f" FROM read_parquet('{sf_smoke}/orders.parquet')"
        ).fetchall()
        con.close()
        c95 = {k for k, y, s in rows if y == 1995}
        c96 = {k for k, y, s in rows if y == 1996}
        cp = {k for k, y, s in rows if s == "P"}
        want = sorted((c95 & c96) - cp)
        got = [
            r["o_custkey"]
            for r in REGISTRY["set_ops_customer_years"].fn(spark, sf_smoke).collect()
        ]
        assert got == want
        assert len(got) > 0  # rows-bearing at the smoke SF

    def test_li_value_share_parts_positive(self, spark, sf_smoke, tmp_path):
        from pyspark.sql import functions as F

        from bigdata_etl_elt_dashboard_spark.plans import REGISTRY

        # keep only ~20 parts' lineitems: each survivor's share is ~5%,
        # far over the 0.1% threshold — expect every kept part reported
        keep = [
            r["l_partkey"]
            for r in spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
            .select("l_partkey").distinct().orderBy("l_partkey").limit(20)
            .collect()
        ]
        d = self._slice(
            spark, sf_smoke, tmp_path,
            ["lineitem"],
            {"lineitem": F.col("l_partkey").isin(keep)},
        )
        rows = REGISTRY["li_value_share_parts"].fn(spark, d).collect()
        assert sorted(r["l_partkey"] for r in rows) == sorted(keep)
        assert abs(sum(r["value_share"] for r in rows) - 1.0) < 1e-9

def test_release_pins_reclaims_all_pinned_blocks(spark):
    """r12 verdict task 3: pinned localCheckpoint blocks are freed only by
    the ASYNC ContextCleaner, which lags a long single-process sweep and
    OOM'd the r12 monolithic run at the tail. release_pins makes
    reclamation synchronous: after the pin-heaviest registry queries are
    fully consumed, one call must leave ZERO persistent RDDs behind
    (tools/run_count_sweep.py calls it after every query)."""
    from bigdata_etl_elt_dashboard_spark.operators.scale import release_pins
    from bigdata_etl_elt_dashboard_spark.plans import REGISTRY

    release_pins(spark)  # clean slate (session is shared across tests)
    for name in (
        "graph_label_propagation",  # the r12 monolithic-sweep casualty
        "graph_kcore_peel",         # per-round pins
        "graph_pagerank_3iter",     # per-round pins
    ):
        REGISTRY[name].fn(spark, "/root/testdata/sf0.001").count()
    jsc = spark.sparkContext._jsc.sc()
    assert jsc.getPersistentRDDs().size() > 0  # the leak class is real
    released = release_pins(spark)
    assert released > 0
    assert jsc.getPersistentRDDs().size() == 0  # and fully reclaimed
