package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.joins.BaseJoinExec
import graft.SparkSpec
import graft.queries.SimilarityQueries

/** Filtered ANN (E234/E235): the predicate must constrain CANDIDATE
  * GENERATION — below the join, full k returned — never the ranked
  * output.
  */
class FilteredAnnSpec extends SparkSpec {
  import spark.implicits._

  test("every returned neighbor satisfies the predicate and every " +
      "query still fills k (a post-ranking filter would under-fill)") {
    val rows = SimilarityQueries.queries("emb_topk_filtered")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") % 3 == 0,
        s"non-matching neighbor ${r.getAs[Long]("neighbor_id")}")
    }
    val perQ = rows.groupBy(_.getAs[Long]("query_id")).view.mapValues(_.length)
    assert(perQ.size == 10)
    assert(perQ.values.forall(_ == 5), s"under-filled k: ${perQ.toMap}")
  }

  test("the filtered result is NOT a post-filter of the unfiltered " +
      "search: some kept neighbor lies outside the unfiltered top-k") {
    val filtered = SimilarityQueries.queries("emb_topk_filtered")(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val unfiltered = SimilarityQueries.queries("emb_topk_mprobe")(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert((filtered -- unfiltered).nonEmpty,
      "filtered top-k is a subset of the unfiltered top-k — the " +
        "predicate is not recruiting deeper candidates")
  }

  test("the predicate sits BELOW the candidate join in the plan — " +
      "non-matching corpus rows are never scored") {
    val df = SimilarityQueries.queries("emb_topk_filtered")(spark, sfDir)
    val plan = df.queryExecution.sparkPlan
    val joins = plan.collect { case j: BaseJoinExec => j }
    assert(joins.nonEmpty, "no join in the filtered-search plan")
    val belowJoin = joins.exists(_.children.exists(side =>
      side.collect {
        case f: FilterExec if f.condition.toString.contains("pmod") => f
      }.nonEmpty))
    assert(belowJoin,
      "pmod predicate not found below any join — it would be " +
        "filtering ranked output instead of candidates")
  }

  test("known layout: a query whose true nearest neighbors all fail " +
      "the predicate still gets k matching results") {
    val vecs = (0L to 20L).map { i =>
      // ids 1,2: nearly parallel to the query (but 1,2 fail id%3==0);
      // matching ids 0,3,6,.. fan out at larger angles
      val theta = if (i == 1 || i == 2) 0.01 * i else 0.1 * i
      (i, 0, Seq(math.cos(theta), math.sin(theta)))
    }.toDF("id", "part", "vec")
    val q = Seq((100L, 0, Seq(1.0, 0.0)))
      .toDF("qid", "part", "qvec")
    val out = Similarity.filteredTopKWithinPartition(
        vecs, q, 3, pmod(col("id"), lit(3)) === 0)
      .select("neighbor_id").as[Long].collect().toSet
    assert(out == Set(0L, 3L, 6L), s"got $out")
  }
}
