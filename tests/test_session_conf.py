"""Session-factory gates: confs that must hold on every session the
package creates, driver-local AND cluster posture.

The JDK-17 GCLocker mitigation (session.py) was diagnosed in r14 —
spurious "Retried waiting for GCLocker too often" OOMs under
JNI-critical (parquet/zstd) + array churn, not real heap exhaustion.
In local mode the driver JVM is the executor, so only the driver conf
is load-bearing here; on a real cluster the executor conf is the one
that matters.  This gate pins BOTH so the factory is cluster-correct
as its docstring promises, not just locally lucky.
"""

from __future__ import annotations

GCLOCKER_FLAGS = "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=100"


def test_gclocker_mitigation_on_driver_and_executor(spark):
    for side in ("driver", "executor"):
        opts = spark.conf.get(f"spark.{side}.extraJavaOptions")
        assert "-XX:GCLockerRetryAllocationCount=100" in opts, side
        assert "-XX:+UnlockDiagnosticVMOptions" in opts, side


def test_session_core_confs(spark):
    # UTC pin: the DuckDB oracle hashes naive-UTC timestamps; a drifted
    # session timezone silently flips every timestamp-valued hash.
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    # AQE posture adopted in r13/r14 (SCALE.md "partition knee").
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    cpus = spark.sparkContext.defaultParallelism
    init = int(spark.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum"))
    assert init == 8 * cpus
