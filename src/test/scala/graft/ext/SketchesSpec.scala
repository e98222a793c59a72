package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL estimate lands within 3x the theoretical error of exact counts") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val est = li.groupBy("l_returnflag")
      .agg(Sketches.hllDistinct(xxhash64(col("l_orderkey"))).as("est"))
      .as[(String, Long)].collect().toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .as[(String, Long)].collect().toMap
    val tol = 3 * 1.04 / math.sqrt(1 << Sketches.DefaultP) // ~7%
    exact.foreach { case (k, n) =>
      val rel = math.abs(est(k).toDouble - n) / n
      assert(rel <= tol, s"group $k: est=${est(k)} exact=$n rel=$rel")
    }
  }

  test("HLL merges are order-insensitive and idempotent") {
    val agg = new Sketches.HllAggregator(8)
    val h1 = (1L to 500L).map(x => x * 0x9E3779B97F4A7C15L)
    val b1 = h1.take(250).foldLeft(agg.zero)(agg.reduce)
    val b2 = h1.drop(250).foldLeft(agg.zero)(agg.reduce)
    val merged = agg.finish(agg.merge(b1, b2))
    val sequential = agg.finish(h1.foldLeft(agg.zero)(agg.reduce))
    assert(merged == sequential)
    // merging a sketch with itself changes nothing
    val b3 = h1.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(b3, b3)) == sequential)
  }

  test("re-aggregating per-day sketches equals one sketch over the union") {
    // The events_hll_merge contract: materialized per-cell sketches
    // merged register-wise give the IDENTICAL estimate a single global
    // sketch would — register max is associative + idempotent, so the
    // cube rollup loses nothing vs re-scanning the base table.
    val ev = graft.Tables.events(spark, sfDir)
    val merged = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(Sketches.hllSketch(xxhash64(col("user_id"))).as("sk"))
      .agg(Sketches.hllMergeEstimate(col("sk")).as("est"))
      .as[Long].head()
    val direct = ev
      .agg(Sketches.hllDistinct(xxhash64(col("user_id"))).as("est"))
      .as[Long].head()
    assert(merged == direct,
      s"merge-of-parts $merged != sketch-of-whole $direct")
  }

  test("HllMergeAggregator rejects sketches of the wrong register width") {
    val agg = new Sketches.HllMergeAggregator(8)
    intercept[IllegalArgumentException] {
      agg.reduce(agg.zero, new Array[Byte](1 << 9))
    }
  }

  test("HllMergeAggregator skips null sketch cells like other aggregates") {
    val agg = new Sketches.HllMergeAggregator(8)
    val one = new Sketches.HllSketchAggregator(8)
    val sk = one.finish(
      (1L to 100L).map(_ * 0x9E3779B97F4A7C15L).foldLeft(one.zero)(one.reduce))
    val withNull = agg.reduce(agg.reduce(agg.zero, sk), null)
    assert(agg.finish(withNull) == agg.finish(agg.reduce(agg.zero, sk)))
  }

  test("small cardinalities use linear counting and are near-exact") {
    val agg = new Sketches.HllAggregator(11)
    val est = agg.finish(
      (1L to 40L).map(x => x * 0x9E3779B97F4A7C15L).foldLeft(agg.zero)(agg.reduce))
    assert(math.abs(est - 40L) <= 2)
  }

  // ---- Misra-Gries ----

  /** Skewed stream: "hot" is 40% of 1000 items; the rest spread over
    * 60 cold keys. With capacity 4, the guarantee covers freq > 200.
    */
  private val mgStream: Seq[String] = {
    val rng = new scala.util.Random(42)
    rng.shuffle(
      (Seq.fill(400)("hot") ++ (0 until 600).map(i => s"cold${i % 60}")).toList)
  }

  test("Misra-Gries keeps every true heavy hitter under arbitrary merge splits") {
    val agg = new Sketches.MisraGriesAggregator(4)
    val n = mgStream.size
    val threshold = n / 5 // capacity+1
    val trueHeavy = mgStream.groupBy(identity).collect {
      case (k, v) if v.size > threshold => k
    }.toSet
    assert(trueHeavy == Set("hot"))
    for (splits <- Seq(Seq(n), Seq(1, n - 1), Seq(250, 250, 250, 250),
        Seq(7, 13, 480, 500))) {
      val chunks = splits.scanLeft(0)(_ + _).sliding(2).map {
        case Seq(a, b) => mgStream.slice(a, b)
      }.toSeq
      val merged = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge)
      val kept = agg.finish(merged).toSet
      assert(trueHeavy.subsetOf(kept), s"splits=$splits kept=$kept")
    }
  }

  test("Misra-Gries buffer never exceeds capacity and ignores nulls") {
    val agg = new Sketches.MisraGriesAggregator(3)
    var b = agg.zero
    mgStream.foreach { x =>
      b = agg.reduce(b, x)
      assert(b.counts.size <= 3)
    }
    val withNulls = agg.reduce(agg.reduce(b, null), null)
    assert(withNulls.counts == b.counts)
    // merge of two full buffers also respects the bound
    val b2 = mgStream.reverse.foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(b, b2).counts.size <= 3)
  }

  test("Misra-Gries counter lower-bounds true frequency") {
    // MG counters only ever under-count (each decrement is shared),
    // so count(k) <= true_freq(k) — the property the estimate
    // interpretation relies on.
    val agg = new Sketches.MisraGriesAggregator(4)
    val b = mgStream.foldLeft(agg.zero)(agg.reduce)
    val exact = mgStream.groupBy(identity).map { case (k, v) => k -> v.size }
    b.counts.foreach { case (k, c) =>
      assert(c <= exact(k), s"$k: counter $c exceeds true ${exact(k)}")
    }
  }

  // ---- Count-Min ----

  test("CMS estimate is >= exact always and within the e*n/width bound") {
    val agg = new Sketches.CountMinAggregator()
    val stream = (1 to 2000).map(i => s"k${i % 37}")
    val table = agg.finish(stream.foldLeft(agg.zero)(agg.reduce))
    val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val slack = math.ceil(math.E * stream.size / Sketches.CmsWidth).toLong
    exact.foreach { case (k, n) =>
      val est = Sketches.cmsEstimate(table, k)
      assert(est >= n, s"$k: CMS under-counted ($est < $n)")
      assert(est <= n + slack, s"$k: est=$est exceeds $n + $slack")
    }
  }

  test("CMS join-size estimate over-estimates deterministically and " +
      "lands within the e*nA*nB/width bound (E223)") {
    val agg = new Sketches.CountMinAggregator()
    val sa = (1 to 1500).map(i => s"u${i % 41}")
    val sb = (1 to 1100).map(i => s"u${i % 29}")
    val ta = agg.finish(sa.foldLeft(agg.zero)(agg.reduce))
    val tb = agg.finish(sb.foldLeft(agg.zero)(agg.reduce))
    val fa = sa.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val fb = sb.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val exact = fa.map { case (k, n) => n * fb.getOrElse(k, 0L) }.sum
    val est = Sketches.cmsJoinEstimate(ta, tb)
    assert(est >= exact, s"join estimate under-counted ($est < $exact)")
    val slack = math.ceil(
      math.E * sa.size.toLong * sb.size.toLong / Sketches.CmsWidth).toLong
    assert(est <= exact + slack, s"est=$est exceeds $exact + $slack")
    // disjoint key spaces: every row's dot product is pure collision
    // noise, and the min over rows must stay within the same bound of 0
    val sc = (1 to 800).map(i => s"w${i % 31}")
    val tc = agg.finish(sc.foldLeft(agg.zero)(agg.reduce))
    val estDisjoint = Sketches.cmsJoinEstimate(ta, tc)
    val slack2 = math.ceil(
      math.E * sa.size.toLong * sc.size.toLong / Sketches.CmsWidth).toLong
    assert(estDisjoint <= slack2,
      s"disjoint-key estimate $estDisjoint exceeds collision bound $slack2")
  }

  test("CMS join-size estimate saturates to Long.MaxValue instead of " +
      "wrapping negative on 100TB-scale counter products (ADVICE r11)") {
    val d = Sketches.CmsDepth
    val w = Sketches.CmsWidth
    // every cell ~1e11: each product is 1e22 >> Long.MaxValue (9.2e18)
    val huge = Array.fill(d * w)(100000000000L).toSeq
    val est = Sketches.cmsJoinEstimate(huge, huge)
    assert(est == Long.MaxValue, s"expected saturation, got $est")
    // one row overflows, another stays finite: the finite row's valid
    // overestimate must win the min (the saturated row never wins)
    val mixed = Array.tabulate(d * w)(i =>
      if (i < w) 100000000000L else 3L).toSeq
    val estMixed = Sketches.cmsJoinEstimate(mixed, mixed)
    assert(estMixed == 9L * w, s"finite row should win: $estMixed")
  }

  test("CMS merge is exactly the sketch of the concatenated stream") {
    // Cell-wise counter addition means split+merge == sequential, bit
    // for bit — stronger than HLL/MG's order-insensitivity.
    val agg = new Sketches.CountMinAggregator()
    val stream = (1 to 999).map(i => s"v${i % 53}")
    val (s1, s2) = stream.splitAt(400)
    val merged = agg.merge(
      s1.foldLeft(agg.zero)(agg.reduce), s2.foldLeft(agg.zero)(agg.reduce))
    val sequential = stream.foldLeft(agg.zero)(agg.reduce)
    assert(merged.table.sameElements(sequential.table))
  }

  test("CMS null items carry no frequency mass") {
    val agg = new Sketches.CountMinAggregator()
    val b = agg.reduce(agg.reduce(agg.zero, null), "x")
    assert(agg.finish(b).sum == Sketches.CmsDepth) // one increment per row
  }

  test("countMin UDAF over partitioned data matches a local sequential sketch") {
    val agg = new Sketches.CountMinAggregator()
    val items = (1 to 500).map(i => s"t${i % 11}")
    val distributed = items.toDF("x").repartition(8)
      .agg(Sketches.countMin(col("x")).as("cms"))
      .as[Array[Long]].head()
    val local = agg.finish(items.foldLeft(agg.zero)(agg.reduce))
    assert(distributed.sameElements(local))
  }

  test("heavyHitters UDAF surfaces the dominant language from documents") {
    val docs = graft.Tables.documents(spark, sfDir)
    val sketch = docs
      .agg(Sketches.heavyHitters(col("lang"), 4).as("s"))
      .as[Array[String]].head()
    // 'en' is ~44% of the fixture — far above the n/5 guarantee line.
    assert(sketch.contains("en"))
    assert(sketch.length <= 4)
    assert(sketch.sorted.sameElements(sketch)) // deterministic order
  }
}
