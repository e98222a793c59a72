package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Crossover measurement for the two blocklist formulations
  * (SCALING.md §blocklist; operators E177/E186): the literal fold
  * (dictionary folded into the scan — Catalyst rewrites large IN
  * lists to an O(1)-probe InSet, but the list itself lives in the
  * plan) vs the broadcast semi-join (dictionary as data). The E177
  * Scaladoc claims the projection tier wins below ~10⁴ entries; this
  * main measures instead of guessing, one JSON line per
  * (n_terms, variant).
  *
  * Workload: 500k synthetic docs × 50 tokens from a 100k-term
  * vocabulary (hash-uniform, so a k-term blocklist matches a doc with
  * p ≈ 1−(1−k/100k)^50 — sparse at small k, saturating at large k,
  * same as a real abuse list growing from curated to crowdsourced).
  */
object BlocklistScaleBench {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-blocklist-scale-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = sys.env.getOrElse("GRAFT_BLOCKLIST_ROWS", "500000").toLong
    val docs = spark.range(n).select(col("id"),
      expr("array_distinct(transform(sequence(0, 49), " +
        "i -> concat('w', pmod(hash(id, i), 100000))))").as("ws"))

    def terms(k: Int): Seq[String] =
      (0 until k).map(i => s"w$i")

    def literalTier(ts: Seq[String]) =
      docs.select(col("id"),
        (size(filter(col("ws"), t => t.isInCollection(ts))) > 0)
          .as("blocked"))

    def joinTier(ts: Seq[String]) = {
      val dict = broadcast(ts.toDF("term"))
      val hits = docs.select(col("id"), explode(col("ws")).as("term"))
        .join(dict, "term")
        .groupBy("id").agg(count(lit(1)).as("nh"))
      docs.select(col("id")).join(hits, Seq("id"), "left")
        .select(col("id"), col("nh").isNotNull.as("blocked"))
    }

    for (k <- Seq(10, 100, 1000, 10000, 100000)) {
      val ts = terms(k)
      for (variant <- Seq("literal", "join")) {
        try {
          val df = if (variant == "literal") literalTier(ts) else joinTier(ts)
          def run(): Double = {
            val t0 = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          run() // warmup (codegen compile, broadcast build)
          val (a, b) = (run(), run())
          val best = math.min(a, b)
          println(f"""{"metric":"blocklist_scale","n_terms":$k,"variant":"$variant","rows":$n,"sec_best":$best%.3f,"sec_worst":${math.max(a, b)}%.3f,"rows_per_sec":${math.round(n / best)}}""")
        } catch {
          case t: Throwable =>
            println(s"""{"metric":"blocklist_scale","n_terms":$k,"variant":"$variant","rows":$n,"error":"${t.getClass.getSimpleName}"}""")
        }
      }
    }
    spark.stop()
  }
}
