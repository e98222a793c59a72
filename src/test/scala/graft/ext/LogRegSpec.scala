package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** In-engine logistic-regression fit (E201/E202): descent sanity on a
  * separable toy set, trajectory contract, zero-variance guard, and
  * run-to-run determinism (the property the oracle replay rests on).
  */
class LogRegSpec extends SparkSpec {
  import spark.implicits._

  /** Separable toy: y = 1 iff x1 > 0; other features pure noise-free
    * constants so their weights must stay ~0 relative to w1.
    */
  private def toy() = (1 to 200).map { i =>
    val x1 = if (i % 2 == 0) 1.0 else -1.0
    (i.toLong, if (x1 > 0) 1.0 else 0.0, x1, 0.0, 0.0, 0.0)
  }.toDF("doc_id", "y", "x1", "x2", "x3", "x4")

  test("loss decreases monotonically and the separating weight grows " +
      "positive on a separable toy set") {
    val feats = toy()
    val x = LogReg.standardized(feats, LogReg.featStats(feats))
    val steps = LogReg.fit(x, steps = 8)
    assert(steps.map(_.step) == (0 to 8))
    val losses = steps.map(_.logLoss)
    assert(losses.zip(losses.tail).forall { case (a, b) => b < a },
      s"log-loss not monotone: $losses")
    assert(steps.last.w1 > 0.5, s"separating weight stayed at ${steps.last.w1}")
    // constant (zero-variance) features standardize with divisor 1 and
    // receive zero gradient: their weights never move
    assert(steps.last.w2 == 0.0 && steps.last.w3 == 0.0 &&
      steps.last.w4 == 0.0)
  }

  test("the fit is bit-deterministic across runs (what the SQL oracle " +
      "replay relies on)") {
    val feats = toy()
    val st = LogReg.featStats(feats)
    val a = LogReg.fit(LogReg.standardized(feats, st), steps = 4)
    val b = LogReg.fit(LogReg.standardized(feats, st), steps = 4)
    assert(a == b)
  }

  test("empty input is rejected rather than fit on undefined stats") {
    val empty = Seq.empty[(Long, Double, Double, Double, Double, Double)]
      .toDF("doc_id", "y", "x1", "x2", "x3", "x4")
    intercept[IllegalArgumentException] { LogReg.featStats(empty) }
  }

  test("lossAt at the final weights reproduces the trajectory's last " +
      "log-loss (same formula, same round point)") {
    val feats = toy()
    val x = LogReg.standardized(feats, LogReg.featStats(feats))
    val steps = LogReg.fit(x, steps = 4)
    val r = LogReg.lossAt(x, steps.last).collect()(0)
    assert(r.getLong(0) == 200L)
    assert(r.getDouble(1) == steps.last.logLoss)
  }

  test("the fit tier trains on the E205 leakage-safe TRAIN split only " +
      "(round-9 verdict task #4): held-out sizes match the assignment " +
      "and no val doc shares a dup-cluster with any train doc") {
    val assign = graft.queries.CurationQueries
      .queries("docs_split_leakage_safe")(spark, sfDir).localCheckpoint()
    val byS = assign.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val vl = graft.queries.TextQueries
      .queries("docs_logreg_val_loss")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the fit's train frame and the held-out val frame are exactly the
    // split's slices — nothing from val/test leaks into the gradient
    assert(vl("train") == byS("train") && vl("val") == byS("val"))
    // and the split boundary is cluster-disjoint: a val doc can never
    // be the near-dup of a train doc (memorized generalization)
    val tr = assign.filter(col("split") === "train")
      .select(col("cluster")).distinct()
    val va = assign.filter(col("split") === "val")
      .select(col("cluster")).distinct()
    assert(tr.join(va, "cluster").count() == 0)
  }
}
