package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.Routing

/** Crossover measurement for the two routing formulations (SCALING.md
  * §routing): the `when`-chain default ([[Routing.targetExpr]], O(rules)
  * regex probes per row, all inside one codegen span) vs the broadcast
  * candidate-array join ([[Routing.targetViaJoin]], O(rules-per-(topic,db))
  * probes per row, rules as data). The reference ships 4 rules; an
  * operator deploying hundreds needs to know where the chain stops
  * winning — this main prints one JSON line per (n_rules, variant) so the
  * answer is measured, not guessed.
  *
  * Workload shape: synthetic parsed records over 2 topics × 3 dbs × 997
  * tables (cache-friendly regex cardinality), every rule an anchored
  * single-table regex, so the match rate is sparse and the chain pays its
  * full O(rules) scan on most rows — the honest worst case for the chain.
  */
object RouteScaleBench {

  private def rules(n: Int): Seq[Routing.TransformRule] =
    (0 until n).map { i =>
      Routing.TransformRule(s"flink-${i % 2 + 1}", s"db_${i % 3}",
        s"table_${(i * 7) % 997}$$", s"t-$i")
    }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-route-scale-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = sys.env.getOrElse("GRAFT_ROUTE_ROWS", "2000000").toLong
    val parsed = spark.range(n).select(
      concat(lit("flink-"), ((col("id") % 2) + 1).cast("string")).as("topic"),
      col("id").cast("string").as("key"),
      col("id").cast("string").as("value"),
      lit("u").as("op"),
      concat(lit("db_"), (col("id") % 3).cast("string")).as("db"),
      concat(lit("table_"), (col("id") % 997).cast("string")).as("tbl"))

    def routeChain(rs: Seq[Routing.TransformRule]) = {
      // same single-eval projection + 0-or-1 generator shape as
      // Pipeline.forward
      val target = when(col("op") =!= lit("d"),
        Routing.targetExpr(rs, col("topic"), col("db"), col("tbl")))
      parsed
        .select(col("key"), col("value"), target.as("_route_target"))
        .select(col("key"), col("value"),
          explode(when(col("_route_target").isNotNull,
            array(col("_route_target")))
            .otherwise(array().cast("array<string>"))).as("target_topic"))
    }

    def routeJoin(rs: Seq[Routing.TransformRule]) =
      Routing.targetViaJoin(spark, parsed, rs)
        .select("key", "value", "target_topic")

    for (r <- Seq(10, 30, 100, 300, 1000)) {
      val rs = rules(r)
      for (variant <- Seq("chain", "join")) {
        // Per-variant Throwable guard: the chain formulation HARD-FAILS
        // past a few hundred rules (StackOverflowError analyzing the
        // nested CaseWhen tree) — that cliff is a result this bench
        // exists to report, not a reason to lose the other rows.
        try {
          val df = if (variant == "chain") routeChain(rs) else routeJoin(rs)
          def run(): Double = {
            val t0 = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          run() // warmup (codegen compile, broadcast build)
          val (a, b) = (run(), run())
          val best = math.min(a, b)
          println(f"""{"metric":"route_scale","n_rules":$r,"variant":"$variant","rows":$n,"sec_best":$best%.3f,"sec_worst":${math.max(a, b)}%.3f,"rows_per_sec":${math.round(n / best)}}""")
        } catch {
          case t: Throwable =>
            println(s"""{"metric":"route_scale","n_rules":$r,"variant":"$variant","rows":$n,"error":"${t.getClass.getSimpleName}"}""")
        }
      }
    }
    spark.stop()
  }
}
