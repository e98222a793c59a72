package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Second-decade scale-witness fixture generator (round-9 verdict
  * task #4): a deterministic ~10x blow-up of an existing SF dir's
  * `documents` and `events` tables, so the 10x slope witness in
  * SCALING.md (sf0.01 -> sf0.1) gets a second decade (sf0.1 -> "sf1")
  * — superlinear growth that hides inside one decade (a candidate
  * join whose pair population is still fixture-small at sf0.1) shows
  * its hand in the second.
  *
  * Construction, replica k in 1..9 over the source rows (replica 0 is
  * the source itself, byte-identical):
  *  - documents: doc_id += k * IdStride; every word is prefixed
  *    `r<k>` (word-space remap). The remap is an isomorphism per
  *    replica: token counts, shingle multisets, Zipf shape, and the
  *    near/exact-dup cluster structure all mirror the original
  *    WITHIN a replica, while sharing no token with other replicas —
  *    so corpus-wide dedup/candidate work grows linearly (10 disjoint
  *    copies of the original's pair population), not quadratically
  *    (which appending a salt suffix would cause: every replica a
  *    near-dup of its source, 45 planted pairs per source row — a
  *    workload NO real 10x corpus growth exhibits).
  *  - events: event_id += k * IdStride, user_id += k * UserStride;
  *    ts/event_type/value/props unchanged — hour-spine cardinality
  *    and per-type rate shape stay fixed while per-hour volume and
  *    user cardinality grow 10x, which is how event volume actually
  *    scales.
  * Everything is pure column arithmetic on the source rows — no RNG,
  * so two runs produce identical parquet and the witness is
  * reproducible from the repo alone.
  *
  *  - embeddings: vec_id += k * IdStride, label += k * LabelStride,
  *    and every replica's vectors pass through a deterministic
  *    per-replica SIGN-FLIP diagonal (dim i negated when
  *    pmod(hash(k, i), 2) = 0). A ±1 diagonal is orthogonal and
  *    sign flips are exact in IEEE arithmetic, so every
  *    within-replica cosine equals its source pair's cosine BIT FOR
  *    BIT — the near-dup pair population mirrors the original per
  *    replica (linear growth), while distinct replicas live in
  *    incoherent orientations (no planted cross-replica structure).
  *    This is what lets the witness carry the adaptive pair tier
  *    (emb_threshold_sweep / emb_semdedup): 10x vectors must mean
  *    10x cells of constant population, not 10x-populated cells.
  *
  * Other tables (TPC-H fixtures) are NOT scaled: the second-decade
  * witness targets the documents/events/embeddings operator
  * families; copy the remaining parquet dirs unchanged if a mixed
  * query set must run (scripts/scale_witness does).
  *
  * Usage: runMain graft.tools.ScaleGen <srcSfDir> <dstDir> [factor]
  */
object ScaleGen {
  /** doc_id / event_id offset between replicas — far above any
    * fixture id and any planting offset the queries add (the largest,
    * DedupQueries.RecallPlantOffset, is 400k).
    */
  val IdStride = 10000000L
  val UserStride = 100000L
  val LabelStride = 100L

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleGen <srcSfDir> <dstDir> [factor]")
    val (src, dst) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = spark.range(factor).select(col("id").cast("int").as("k"))

    val docs = spark.read.parquet(s"$src/documents.parquet")
    docs.crossJoin(broadcast(reps))
      .select(col("k"),
        (col("doc_id") + col("k") * IdStride).as("doc_id"),
        when(col("k") === 0, col("text")).otherwise(
          array_join(
            transform(split(col("text"), " "),
              w => concat(lit("r"), col("k"), w)), " ")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        // replica 0 keeps the source value byte-for-byte; prefixed
        // replicas recompute over the remapped text
        when(col("k") === 0, col("n_chars"))
          .otherwise(length(col("text")).cast("long")).as("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val ev = spark.read.parquet(s"$src/events.parquet")
    ev.crossJoin(broadcast(reps))
      .select(
        (col("event_id") + col("k") * IdStride).as("event_id"),
        col("ts"),
        (col("user_id") + col("k") * UserStride).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    emb.crossJoin(broadcast(reps))
      .select(
        (col("vec_id") + col("k") * IdStride).as("vec_id"),
        when(col("k") === 0, col("embedding")).otherwise(
          expr("transform(embedding, (x, i) -> " +
            "CASE WHEN pmod(hash(k, i), 2) = 0 THEN -x ELSE x END)"))
          .as("embedding"),
        (col("label") + col("k") * LabelStride.toInt).cast("int").as("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    println(s"scaled ${factor}x: " +
      spark.read.parquet(s"$dst/documents.parquet").count() + " docs, " +
      spark.read.parquet(s"$dst/events.parquet").count() + " events, " +
      spark.read.parquet(s"$dst/embeddings.parquet").count() +
      s" embeddings -> $dst")
    spark.stop()
  }
}
