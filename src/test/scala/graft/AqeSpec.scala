package graft

import org.apache.spark.sql.functions._

import graft.model.Tables

/** Adaptive Query Execution evidence: the engine leans on AQE for the
  * runtime re-plans that matter at 100 TB — demote-to-broadcast when a
  * shuffle side turns out small, and shuffle-partition coalescing when
  * the static partition count overshoots the data. These tests pin
  * that the session actually gets both behaviors (a config regression
  * would silently cost a full shuffle at scale).
  */
class AqeSpec extends SparkSpec {

  test("AQE re-plans a sort-merge join to broadcast at runtime") {
    val conf = spark.conf
    val oldStatic = conf.get("spark.sql.autoBroadcastJoinThreshold")
    // Static broadcast off (so the initial plan is SMJ), runtime
    // broadcast on — exactly the regime of a 100 TB join whose build
    // side only reveals itself as small after filtering.
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "8388608")
    try {
      val li = Tables.lineitem(spark, Sf0001)
        .select(col("l_orderkey"), col("l_quantity"))
      val ord = Tables.orders(spark, Sf0001)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      val initial = j.queryExecution.executedPlan.toString
      assert(initial.contains("SortMergeJoin"),
        "initial plan should sort-merge: " + initial.take(600))
      j.collect()
      val fin = j.queryExecution.executedPlan.toString
      assert(fin.contains("isFinalPlan=true"), fin.take(300))
      assert(fin.contains("BroadcastHashJoin"),
        "AQE should demote to broadcast at runtime: " + fin.take(1200))
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldStatic)
      conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    val conf = spark.conf
    val oldStatic = conf.get("spark.sql.autoBroadcastJoinThreshold")
    // The 100 TB regime: fact-fact shuffle join where the build side is
    // selectively filtered. Spark injects a bloom_filter_agg subquery
    // on the build side and a might_contain guard on the probe scan, so
    // probe rows that cannot match die before the shuffle. The scan
    // threshold defaults to 10 GB — zero it so sf0.001 triggers the
    // same rewrite the full-scale join would get.
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, Sf0001)
        .select(col("l_orderkey"), col("l_quantity"))
      val ord = Tables.orders(spark, Sf0001)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
        "probe side should carry a runtime bloom filter: " + opt.take(1200))
      // and the filtered result still matches the unfiltered join count
      val n = j.collect().head.getLong(0)
      val expected = Tables.lineitem(spark, Sf0001)
        .join(Tables.orders(spark, Sf0001).filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(n === expected)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldStatic)
      conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    val conf = spark.conf
    val oldStatic = conf.get("spark.sql.autoBroadcastJoinThreshold")
    // One synthetic hot key owns ~90% of the fact side. With the skew
    // thresholds scaled to test data, AQE's OptimizeSkewedJoin must
    // split the hot partition into multiple task reads (plan tags the
    // join "skew=true") — the runtime half of the story whose static
    // half is q_join_skew_salted.
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    try {
      import spark.implicits._
      val fact = spark.range(0, 200000)
        .select(when(col("id") % 10 < 9, lit(7L)).otherwise(col("id"))
          .as("k"), col("id").as("payload"))
      val dim = spark.range(0, 1000).select(col("id").as("k"),
        (col("id") * 2).as("attr"))
      val j = fact.join(dim, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(col("attr")).as("s"))
      j.collect()
      val fin = j.queryExecution.executedPlan.toString
      assert(fin.contains("isFinalPlan=true"), fin.take(300))
      assert(fin.contains("skew=true"),
        "hot key should trigger a runtime skew split: " + fin.take(1500))
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldStatic)
      conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
  }

  test("q_join_skew_aqe: the gated query's hot partition splits at runtime") {
    // the GATED twin of the synthetic test above: q_join_skew_aqe
    // carries its skew knobs in a child session, so no conf juggling
    // here — run it at sf0.01 (where the hot key's shuffle partition
    // clears the query's 128KB threshold) and pin the skew split in
    // the final adaptive plan.
    val df = SparkEntry.queries("q_join_skew_aqe")(
      spark, "/root/testdata/sf0.01")
    val n = df.collect().length
    assert(n === 5, s"one row per market segment, got $n")
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("isFinalPlan=true"), fin.take(300))
    assert(fin.contains("skew=true"),
      "the 2/3-hot key must trigger a runtime skew split: " + fin.take(1500))
    assert(fin.contains("SortMergeJoin"),
      "the skew demo must stay a shuffle join, not dissolve to broadcast")
  }

  test("AQE coalesces overshooting shuffle partitions") {
    val conf = spark.conf
    val oldParts = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.shuffle.partitions", "64")
    try {
      val agg = Tables.events(spark, Sf0001)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
      agg.collect()
      val fin = agg.queryExecution.executedPlan.toString
      assert(fin.contains("isFinalPlan=true"), fin.take(300))
      assert(fin.contains("coalesced"),
        "64 partitions of 5 groups should coalesce: " + fin.take(1200))
    } finally {
      conf.set("spark.sql.shuffle.partitions", oldParts)
    }
  }
}
