package graft.queries

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.SparkSpec

/** AQE skew-join handling: beyond manual salting (E26), Spark's
  * adaptive planner must split oversized shuffle partitions at
  * runtime. This pins that the engine's config surface actually
  * engages OptimizeSkewedJoin on a pathologically skewed key — the
  * runtime complement to the static salting strategy.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed partition in a shuffle join") {
    val conf = spark.conf
    val prev = Map(
      "spark.sql.adaptive.enabled" -> conf.get("spark.sql.adaptive.enabled"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.shuffle.partitions" -> conf.get("spark.sql.shuffle.partitions"),
      "spark.sql.adaptive.forceOptimizeSkewedJoin" ->
        conf.get("spark.sql.adaptive.forceOptimizeSkewedJoin"))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      // no broadcast: force the shuffle-join path AQE has to repair
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // tiny thresholds so the fixture-scale skew trips the optimizer
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // enough partitions that the median is a non-skewed one (with 2,
      // the median IS the skewed partition and detection never fires)
      conf.set("spark.sql.shuffle.partitions", "8")
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")

      // 50k rows on ONE key vs 100 on the rest: one shuffle partition
      // dwarfs the others
      val skewed = (0 until 50000).map(i => (0L, s"pad_$i"))
        .++((1 to 100).map(i => (i.toLong, "x"))).toDF("k", "payload")
      val dim = (0L to 100L).map(i => (i, s"d$i")).toDF("k", "name")
      val joined = skewed.join(dim, "k")
      // execute THIS QueryExecution (count() would build its own plan
      // and the inspected one would stay un-adapted)
      assert(joined.collect().length == 50100)

      val adaptive = joined.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a
      }
      assert(adaptive.nonEmpty, "no adaptive plan")
      // query stages hide their subtrees from TreeNode.collect — assert
      // on the rendered final plan instead
      val finalPlan = adaptive.head.executedPlan.toString
      assert(finalPlan.contains("SortMergeJoin(skew=true)"),
        s"OptimizeSkewedJoin did not engage:\n$finalPlan")
      assert(finalPlan.contains("AQEShuffleRead coalesced and skewed"),
        s"skewed shuffle read missing:\n$finalPlan")
    } finally prev.foreach { case (k, v) => conf.set(k, v) }
  }
}
