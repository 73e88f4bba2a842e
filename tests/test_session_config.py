"""Session-factory regression pins.

The r5→r6 bench drift investigation traced late-session inflation on
unchanged queries to JVM listener state: even with the UI disabled,
Spark's AppStatus/SQLAppStatus listeners retain full plan graphs for the
last 1000 SQL executions, which accretes hundreds of MB across a
110-query timing session (VERDICT r5 "What's wrong" #1; fixed in r6 with
retention caps).  Pin the caps so a future get_spark edit can't silently
reintroduce the drift.
"""

from __future__ import annotations


def test_listener_retention_caps_pinned(spark):
    conf = spark.sparkContext.getConf()
    assert int(conf.get("spark.sql.ui.retainedExecutions")) <= 50
    assert int(conf.get("spark.ui.retainedJobs")) <= 200
    assert int(conf.get("spark.ui.retainedStages")) <= 500
    assert conf.get("spark.ui.enabled") == "false"


def test_engine_posture_pinned(spark):
    # the configs every SCALING.md argument assumes
    conf = spark.sparkContext.getConf()
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    assert conf.get("spark.sql.session.timeZone") == "UTC"
