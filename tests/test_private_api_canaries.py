"""Canaries for the three private-API touchpoints (VERDICT r04 #4).

The engine leans on Spark-internal APIs in exactly three places; a Spark
minor upgrade that changes any of them would otherwise surface as an opaque
mid-query Py4J stack (or, worse for the strip, as a silent perf pathology).
Each canary exercises ONE touchpoint end-to-end and names the API in its
failure message, so a version bump fails loudly here first.

Touchpoints under guard:
  1. `SparkSession.internalCreateDataFrame`  — graph._strip_plan_origin
     (severs checkpoint origin metadata; without it iterative self-join
     loops compound per-round driver cost exponentially).
  2. `JavaSparkContext.getPersistentRDDs`    — graph._ckpt_tracked /
     _free_ckpt (tracking + freeing the blocks a localCheckpoint pins).
  3. `org.apache.spark.util.sketch.CountMinSketch.readFrom` — the JVM
     sketch round-trip behind cms_heavy_hitters_events
     (plans/queries.py, point-estimates from the aggregated sketch bytes).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_canary_internal_create_dataframe(spark):
    """graph._strip_plan_origin depends on
    SparkSession.internalCreateDataFrame(JavaRDD[InternalRow], StructType,
    Boolean). If this canary fails, the strip is silently falling back and
    iterative checkpoint loops lose their flat-round guarantee."""
    from pyspark.sql import DataFrame

    df = spark.range(5).selectExpr("id", "CAST(id AS STRING) AS s")
    jdf = df._jdf
    rdd = jdf.queryExecution().toRdd()
    schema = spark._jvm.org.apache.spark.sql.types.DataType.fromJson(
        df.schema.json()
    )
    fn = getattr(spark._jsparkSession, "internalCreateDataFrame", None)
    assert fn is not None, (
        "private API gone: SparkSession.internalCreateDataFrame — "
        "graph._strip_plan_origin will silently fall back (see its warning); "
        "find the replacement internal constructor for this Spark version"
    )
    rebuilt = DataFrame(fn(rdd, schema, False), spark)
    assert rebuilt.count() == 5 and rebuilt.schema == df.schema
    # the whole point: the rebuilt plan is a bare leaf
    assert "LogicalRDD" in rebuilt._jdf.queryExecution().optimizedPlan().toString()


def test_canary_get_persistent_rdds(spark):
    """graph._ckpt_tracked/_free_ckpt depend on
    JavaSparkContext.getPersistentRDDs returning a java.util.Map[int, RDD]
    whose values support unpersist(Boolean)."""
    sc = spark.sparkContext
    fn = getattr(sc._jsc, "getPersistentRDDs", None)
    assert fn is not None, (
        "private API gone: JavaSparkContext.getPersistentRDDs — "
        "checkpoint tracking/freeing (graph._ckpt_tracked/_free_ckpt) broken"
    )
    before = set(fn().keySet().toArray())
    df = spark.range(7).localCheckpoint(eager=True)
    new = [i for i in fn().keySet().toArray() if i not in before]
    assert new, (
        "localCheckpoint no longer registers in getPersistentRDDs — "
        "_ckpt_tracked would return empty id lists and leak blocks"
    )
    assert df.count() == 7  # consume BEFORE freeing: lineage is truncated
    jmap = fn()
    for i in new:
        rdd = jmap.get(i)
        assert rdd is not None
        rdd.unpersist(False)


def test_canary_count_min_sketch_jvm_roundtrip(spark):
    """cms_heavy_hitters_events deserializes the bytes produced by the
    count_min_sketch SQL aggregate through the JVM-side
    org.apache.spark.util.sketch.CountMinSketch.readFrom and calls
    estimateCount on it — both halves are exercised here."""
    df = spark.createDataFrame([(1,)] * 10 + [(2,)] * 3, "k long")
    sk = df.agg(
        F.count_min_sketch("k", F.lit(0.001), F.lit(0.99), F.lit(7)).alias("s")
    ).first()["s"]
    jvm = spark._jvm
    cls = getattr(
        getattr(getattr(getattr(jvm, "org"), "apache"), "spark"), "util", None
    )
    assert cls is not None and hasattr(cls.sketch, "CountMinSketch"), (
        "private API gone: org.apache.spark.util.sketch.CountMinSketch — "
        "cms_heavy_hitters_events' JVM round-trip broken"
    )
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(sk))
    )
    est1 = int(sketch.estimateCount(1))
    est2 = int(sketch.estimateCount(2))
    # CMS never under-counts
    assert est1 >= 10 and est2 >= 3, (
        "CountMinSketch.estimateCount under-counted — serialization format "
        "of the count_min_sketch aggregate changed"
    )


def test_canary_checkpoint_id_from_analyzed_plan(spark):
    """graph._ckpt_tracked (r8) reads the pinned RDD id DIRECTLY off the
    checkpointed Dataset — `queryExecution().analyzed()` must be the
    LogicalRDD wrapping exactly the RDD localCheckpoint persisted. (The old
    getPersistentRDDs diff raced under concurrent registry queries: two
    simultaneous checkpoints could each sweep the other thread's id into
    their diff and later free a live checkpoint.) If this canary fails,
    _ckpt_tracked falls back to LEAKING blocks for the session (empty id
    list + RuntimeWarning) — safe but unbounded for BSP loops; find the new
    way to identify the persisted RDD."""
    sc = spark.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    df = spark.range(9).selectExpr("id", "id * 3 AS y").localCheckpoint(
        eager=True
    )
    diff = [
        i for i in sc._jsc.getPersistentRDDs().keySet().toArray()
        if i not in before
    ]
    plan = df._jdf.queryExecution().analyzed()
    assert "LogicalRDD" in plan.getClass().getName(), (
        "private API drift: a localCheckpointed Dataset's analyzed plan is "
        f"no longer LogicalRDD (got {plan.getClass().getName()}) — "
        "graph._ckpt_tracked is leaking checkpoint blocks"
    )
    direct = plan.rdd().id()
    assert [direct] == diff, (
        f"LogicalRDD.rdd().id() = {direct} no longer matches the persisted "
        f"id(s) {diff} — graph._ckpt_tracked would free the wrong RDD"
    )
    assert df.count() == 9
    jmap = sc._jsc.getPersistentRDDs()
    rdd = jmap.get(direct)
    if rdd is not None:
        rdd.unpersist(False)
