"""Multi-executor (local-cluster) regression: the engine's results do
not depend on single-process execution.

``local[N]`` short-circuits everything distribution-shaped: broadcasts
are never serialized, shuffle blocks never cross a process, and
executor-side Python workers share the driver's ``sys.path``. A bug in
any of those (an unpicklable closure, a missing executor-side import —
e.g. the vendored protobuf shim — a broadcast that only works by
same-JVM reference) survives the whole local suite and dies on the
first real cluster. This test spins Spark's ``local-cluster[2,2,1536]``
master — two REAL executor JVMs under an in-process standalone Worker —
in a hermetic subprocess (a second master cannot coexist with the
session-scoped ``spark`` fixture's JVM) and asserts bit-identical row
sets against the shared local-mode session for two representative
paths:

- a multi-join broadcast analytic (``q3_top5_nations_by_revenue``):
  TorrentBroadcast pieces actually serialize to the executors;
- an Arrow-batched ``mapInPandas`` decoder (``mm_image_contrast_stats``):
  executor-spawned Python workers must IMPORT the package
  (``session.local_cluster_conf`` exports the repo root + vendored
  protobuf onto ``spark.executorEnv.PYTHONPATH``) and move Arrow
  batches over real sockets.

The full-registry version of this check (393/393 parity under
``local-cluster[2,8,4096]``) and the executor-loss scenarios live in
``tools/run_parity_subset.py --master`` / ``tools/executor_loss_probe.py``
(SCALING.md round-14 addendum); this test pins the machinery in the
suite at smoke scale.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_QUERIES = ["q3_top5_nations_by_revenue", "mm_image_contrast_stats"]

_CHILD = r"""
import json, sys
from bigdata_etl_elt_dashboard_spark.session import get_spark, local_cluster_conf

master = "local-cluster[2,2,1536]"
spark = get_spark(
    app_name="lc-smoke-child",
    master=master,
    shuffle_partitions=4,
    extra_conf={
        **local_cluster_conf(master),
        "spark.driver.memory": "2g",
        "spark.ui.enabled": "false",
    },
)
import __spark_entry__ as e

qs = e.queries()
sf = sys.argv[1]
out = {}
for name in sys.argv[2:]:
    rows = qs[name](spark, sf).collect()
    out[name] = sorted([str(v) for v in r] for r in rows)
# prove the rows were computed by REAL separate executor JVMs
n_members = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
out["_cluster_members"] = n_members  # 2 executors + driver
print("LC_RESULT " + json.dumps(out))
spark.stop()
"""


def test_local_cluster_matches_local_mode(spark, sf_smoke):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, sf_smoke, *_QUERIES],
        capture_output=True,
        text=True,
        cwd=root,
        timeout=600,
    )
    payload = None
    for line in p.stdout.splitlines():
        if line.startswith("LC_RESULT "):
            payload = json.loads(line[len("LC_RESULT "):])
    assert payload is not None, (
        f"child rc={p.returncode}\nstdout tail: {p.stdout[-500:]}\n"
        f"stderr tail: {p.stderr[-1500:]}"
    )
    assert payload.pop("_cluster_members") >= 3  # driver + 2 executor JVMs

    import __spark_entry__ as e

    qs = e.queries()
    for name in _QUERIES:
        local_rows = sorted(
            [str(v) for v in r] for r in qs[name](spark, sf_smoke).collect()
        )
        assert payload[name] == local_rows, f"{name} diverged under local-cluster"
