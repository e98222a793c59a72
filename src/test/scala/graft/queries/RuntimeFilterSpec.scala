package graft.queries

import graft.SparkSpec

/** Runtime Bloom-filter injection (InjectRuntimeFilter): when the
  * probe side of a shuffle join is a large scan and the build side
  * carries a selective filter, Spark should inject a
  * `bloom_filter_agg` on the build side and a `might_contain`
  * pre-filter above the probe scan — the mechanism that keeps the
  * fact-table scan of `rel_returned_revenue`'s join shape sparse at
  * 100 TB (rows that cannot join die before the exchange). The
  * default thresholds (10 GB probe-side scan) are sized for real
  * clusters; the test lowers them so the fixture-scale join trips the
  * rule, then asserts the rewritten plan — the config surface is the
  * engine's, the rewrite is Catalyst's.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a Bloom runtime filter on the fact scan") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // fixture-scale: any probe scan qualifies
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      // broadcast joins skip runtime filters (broadcast IS the filter);
      // force the shuffle-join path the rule targets
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val li = graft.Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_extendedprice")
      val urgent = graft.Tables.orders(spark, sfDir)
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val joined = li.join(urgent,
        li("l_orderkey") === urgent("o_orderkey"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no Bloom runtime filter injected:\n$optimized")
      assert(optimized.contains("bloom_filter_agg"),
        s"no Bloom build aggregate on the creation side:\n$optimized")

      // and the rewrite must not change the answer
      val expected = li.join(urgent.hint("broadcast"),
        li("l_orderkey") === urgent("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally prev.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
