package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit, max, row_number, sum, udaf, when}

/** Mergeable sketches for approximate analytics at 100 TB (north-star
  * extension; the reference has no aggregation surface at all,
  * SURVEY.md §2.2).
  *
  * [[HllAggregator]] is a from-scratch HyperLogLog (Flajolet et al.'s
  * standard estimator with the small-range linear-counting correction)
  * as a typed [[Aggregator]]: the register array is a fixed 2^p bytes
  * regardless of cardinality, partial aggregation merges register-wise
  * (max), and the shuffle carries one small array per group — the
  * sketch property that makes distinct-counting feasible when
  * `count(DISTINCT x)`'s expand/exchange would dominate.
  *
  * Spark's built-in `approx_count_distinct` is the production default;
  * this implementation exists because the engine must own a sketch it
  * can evolve (e.g. unioning sketches across days, which the built-in
  * cannot expose as a value). Accuracy ≈ 1.04/√(2^p) relative error —
  * p=11 (2048 registers) ≈ 2.3%; SketchesSpec pins the error against
  * exact counts on the fixture.
  */
object Sketches {

  val DefaultP = 11 // 2^11 registers = 2 KiB per group, ~2.3% error

  case class HllBuf(registers: Array[Byte])

  class HllAggregator(p: Int = DefaultP) extends Aggregator[Long, HllBuf, Long] {
    private val m = 1 << p

    def zero: HllBuf = HllBuf(new Array[Byte](m))

    /** Input is a pre-hashed 64-bit value (xxhash64 upstream): top p
      * bits pick the register, the rank of the remaining bits' leading
      * zeros updates it.
      */
    def reduce(b: HllBuf, hash: Long): HllBuf = {
      val idx = (hash >>> (64 - p)).toInt
      val rest = hash << p
      val rank = (java.lang.Long.numberOfLeadingZeros(rest) + 1).min(64 - p + 1)
      if (rank > b.registers(idx)) b.registers(idx) = rank.toByte
      b
    }

    def merge(b1: HllBuf, b2: HllBuf): HllBuf = {
      var i = 0
      while (i < m) {
        if (b2.registers(i) > b1.registers(i)) b1.registers(i) = b2.registers(i)
        i += 1
      }
      b1
    }

    def finish(b: HllBuf): Long = Sketches.hllEstimate(b.registers)

    def bufferEncoder = Encoders.product[HllBuf]
    def outputEncoder = Encoders.scalaLong
  }

  /** Flajolet estimator over a raw register array (factored out so the
    * one-level aggregator and the re-aggregation path share arithmetic).
    */
  def hllEstimate(registers: Array[Byte]): Long = {
    val m = registers.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += 1.0 / (1L << registers(i))
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else raw
    math.round(est)
  }

  /** Untyped UDAF over a pre-hashed long column:
    * `df.groupBy(k).agg(Sketches.hllDistinct(xxhash64(col("x"))))`.
    */
  def hllDistinct(hashed: Column, p: Int = DefaultP): Column =
    udaf(new HllAggregator(p), Encoders.scalaLong)(hashed)

  /** Same accumulation as [[HllAggregator]] but the OUTPUT is the raw
    * register array, not the estimate — the mergeable-sketch half of the
    * pre-aggregation-cube pattern: materialize one 2^p-byte sketch per
    * fine-grained cell (day, partition, tenant), and any coarser rollup
    * is a register-wise max over cell sketches, never a re-scan of the
    * 100 TB base table. This is exactly the capability the scaladoc
    * above names as the reason to own the sketch rather than use
    * `approx_count_distinct` (whose sketch never escapes the plan).
    */
  class HllSketchAggregator(p: Int = DefaultP)
      extends Aggregator[Long, HllBuf, Array[Byte]] {
    private val delegate = new HllAggregator(p)
    def zero: HllBuf = delegate.zero
    def reduce(b: HllBuf, hash: Long): HllBuf = delegate.reduce(b, hash)
    def merge(b1: HllBuf, b2: HllBuf): HllBuf = delegate.merge(b1, b2)
    def finish(b: HllBuf): Array[Byte] = b.registers
    def bufferEncoder = Encoders.product[HllBuf]
    def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Byte]]()
  }

  /** Re-aggregation: fold previously materialized register arrays into
    * one estimate. Register-wise max is associative, commutative, and
    * idempotent, so merging per-cell sketches yields the IDENTICAL
    * register state (hence identical estimate) a single pass over the
    * union would have produced — SketchesSpec pins that equality, not
    * just a tolerance.
    */
  class HllMergeAggregator(p: Int = DefaultP)
      extends Aggregator[Array[Byte], HllBuf, Long] {
    private val m = 1 << p
    def zero: HllBuf = HllBuf(new Array[Byte](m))
    def reduce(b: HllBuf, sketch: Array[Byte]): HllBuf = {
      if (sketch == null) return b // null cell carries no observations
      require(sketch.length == m,
        s"sketch register count ${sketch.length} != 2^p = $m")
      var i = 0
      while (i < m) {
        if (sketch(i) > b.registers(i)) b.registers(i) = sketch(i)
        i += 1
      }
      b
    }
    def merge(b1: HllBuf, b2: HllBuf): HllBuf = {
      var i = 0
      while (i < m) {
        if (b2.registers(i) > b1.registers(i)) b1.registers(i) = b2.registers(i)
        i += 1
      }
      b1
    }
    def finish(b: HllBuf): Long = Sketches.hllEstimate(b.registers)
    def bufferEncoder = Encoders.product[HllBuf]
    def outputEncoder = Encoders.scalaLong
  }

  /** Untyped UDAF: materialize the sketch itself as a binary column. */
  def hllSketch(hashed: Column, p: Int = DefaultP): Column =
    udaf(new HllSketchAggregator(p), Encoders.scalaLong)(hashed)

  /** Untyped UDAF: estimate from a column of materialized sketches. */
  def hllMergeEstimate(sketch: Column, p: Int = DefaultP): Column =
    udaf(new HllMergeAggregator(p),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Byte]]())(sketch)

  case class MgBuf(counts: Map[String, Long])

  /** Misra-Gries heavy-hitters summary as a typed [[Aggregator]] (north-star
    * extension; no reference counterpart — the reference has no aggregation
    * surface, SURVEY.md §2.2).
    *
    * The buffer holds at most `capacity` counters, so the shuffle carries
    * O(capacity) state per group regardless of input size — the property
    * that makes frequent-item mining feasible at 100 TB where an exact
    * per-key groupBy of a high-cardinality column would shuffle every key.
    * Partial buffers merge with the Agarwal et al. (TODS '13) mergeable
    * rule: sum counters pairwise, then subtract the (capacity+1)-largest
    * count from all and drop non-positives, preserving the deterministic
    * guarantee that every item with true frequency > n/(capacity+1)
    * SURVIVES in the summary (the returned set is a superset of the true
    * heavy hitters; exact membership depends on merge order, which is why
    * the driver-checked query asserts the guarantee, not the raw set —
    * same pattern as `events_hll_check`).
    */
  class MisraGriesAggregator(capacity: Int)
      extends Aggregator[String, MgBuf, Array[String]] {
    require(capacity > 0, s"capacity must be positive, got $capacity")

    def zero: MgBuf = MgBuf(Map.empty)

    def reduce(b: MgBuf, item: String): MgBuf = {
      if (item == null) return b // null key carries no frequency mass
      val c = b.counts
      if (c.contains(item)) MgBuf(c.updated(item, c(item) + 1L))
      else if (c.size < capacity) MgBuf(c.updated(item, 1L))
      else {
        // Decrement-all step: every tracked counter pays one unit for the
        // untracked arrival; zeroed counters free their slot.
        MgBuf(c.flatMap { case (k, v) =>
          if (v > 1L) Some(k -> (v - 1L)) else None
        })
      }
    }

    def merge(b1: MgBuf, b2: MgBuf): MgBuf = {
      val summed = b2.counts.foldLeft(b1.counts) { case (acc, (k, v)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + v)
      }
      if (summed.size <= capacity) MgBuf(summed)
      else {
        val kth = summed.values.toArray.sortBy(-_).apply(capacity)
        MgBuf(summed.flatMap { case (k, v) =>
          if (v > kth) Some(k -> (v - kth)) else None
        })
      }
    }

    def finish(b: MgBuf): Array[String] = b.counts.keys.toArray.sorted

    def bufferEncoder = Encoders.product[MgBuf]
    def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  }

  /** Untyped UDAF: `df.agg(Sketches.heavyHitters(col("lang"), 4))` returns
    * the (sorted) candidate set containing every item with frequency
    * > n/(capacity+1).
    */
  def heavyHitters(item: Column, capacity: Int): Column =
    udaf(new MisraGriesAggregator(capacity), Encoders.STRING)(item)

  case class MgEntry(item: String, cnt: Long)

  /** [[MisraGriesAggregator]] with the counter VALUES exposed
    * (E289) — the persistable-artifact form: finish emits the counter
    * map as (item, cnt) entries sorted by item, so a per-shard sketch
    * can be written to parquet and merged later by [[mgMergeEntries]]
    * without re-scanning the shard (the E108/E269 sketch-algebra
    * discipline applied to frequent items). Counter values are
    * merge-order-dependent (unlike HLL/CMS cells), so downstream
    * checks must assert the MG GUARANTEES (superset membership,
    * never-overcount, undercount ≤ n/(capacity+1)) rather than the
    * raw values — the docs_heavy_hitters convention.
    */
  class MgCountsAggregator(capacity: Int)
      extends Aggregator[String, MgBuf, Array[MgEntry]] {
    private val mg = new MisraGriesAggregator(capacity)
    def zero: MgBuf = mg.zero
    def reduce(b: MgBuf, item: String): MgBuf = mg.reduce(b, item)
    def merge(b1: MgBuf, b2: MgBuf): MgBuf = mg.merge(b1, b2)
    def finish(b: MgBuf): Array[MgEntry] =
      b.counts.toArray.sortBy(_._1).map { case (k, v) => MgEntry(k, v) }
    def bufferEncoder = Encoders.product[MgBuf]
    def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[MgEntry]]()
  }

  def mgCounts(item: Column, capacity: Int): Column =
    udaf(new MgCountsAggregator(capacity), Encoders.STRING)(item)

  /** m-way Misra-Gries merge over exploded shard-sketch entries
    * (item, cnt): sum counters per item, and if more than `capacity`
    * items survive, subtract the (capacity+1)-th largest summed count
    * from every counter and keep positives — the Agarwal et al.
    * (TODS '13) mergeable rule generalized one-shot m-way. The
    * potential argument survives the generalization: every
    * subtraction of C (here and inside the shard sketches) removes
    * ≥ (capacity+1)·C total mass, total mass is ≤ n, so the per-item
    * undercount stays ≤ n/(capacity+1) and every item with true
    * frequency above that bound is still present after the merge.
    *
    * Scale shape: the input is |shards|·capacity rows regardless of
    * corpus size — the global rank window below runs on that bounded
    * table, never on data. Tomorrow's merge reads yesterday's
    * persisted sketches plus one new shard; payload rows are never
    * re-scanned.
    */
  def mgMergeEntries(entries: DataFrame, capacity: Int): DataFrame = {
    val summed = entries.groupBy("item").agg(sum(col("cnt")).as("cnt"))
      .localCheckpoint(false) // two consumers: rank probe + subtraction
    val w = Window.orderBy(col("cnt").desc, col("item"))
    val ranked = summed.withColumn("r", row_number().over(w))
    val kth = ranked.agg(coalesce(
      max(when(col("r") === capacity + 1, col("cnt"))), lit(0L)).as("kth"))
    summed.crossJoin(broadcast(kth))
      .select(col("item"), (col("cnt") - col("kth")).as("cnt"))
      .filter(col("cnt") > 0)
  }

  val CmsDepth = 5    // P(overshoot > e·n/width) ≤ e^-depth < 1%
  val CmsWidth = 2048 // 5×2048 longs = 80 KiB per sketch

  case class CmsBuf(table: Array[Long])

  /** Count-Min frequency sketch (Cormode & Muthukrishnan '05) as a typed
    * [[Aggregator]] — the point-frequency member of the sketch trio next
    * to [[HllAggregator]] (distinct) and [[MisraGriesAggregator]] (top
    * items). The buffer is a fixed depth×width counter matrix: partial
    * aggregation merges cell-wise (counter addition is commutative and
    * associative, so the merged sketch is EXACTLY the sketch of the
    * union — no merge-order dependence at all), and the shuffle carries
    * O(depth·width) longs per group regardless of item cardinality.
    * Guarantee: estimate ≥ true count always (counters only overcount
    * on hash collision), and ≤ true + e·n/width with probability
    * 1 − e^-depth. Row hashes are seeded MurmurHash3 over the item —
    * deterministic across JVMs, so the same data always yields the
    * same sketch.
    */
  class CountMinAggregator(depth: Int = CmsDepth, width: Int = CmsWidth)
      extends Aggregator[String, CmsBuf, Array[Long]] {
    require(depth > 0 && width > 0, s"bad CMS shape ${depth}x$width")

    def zero: CmsBuf = CmsBuf(new Array[Long](depth * width))

    def reduce(b: CmsBuf, item: String): CmsBuf = {
      if (item != null) {
        var r = 0
        while (r < depth) {
          b.table(r * width + Sketches.cmsIndex(item, r, width)) += 1L
          r += 1
        }
      }
      b
    }

    def merge(b1: CmsBuf, b2: CmsBuf): CmsBuf = {
      var i = 0
      while (i < b1.table.length) { b1.table(i) += b2.table(i); i += 1 }
      b1
    }

    def finish(b: CmsBuf): Array[Long] = b.table

    def bufferEncoder = Encoders.product[CmsBuf]
    def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Untyped UDAF: `df.agg(Sketches.countMin(col("k")))` yields the raw
    * depth×width counter table (row-major) for [[cmsEstimate]] probes.
    */
  def countMin(item: Column, depth: Int = CmsDepth, width: Int = CmsWidth): Column =
    udaf(new CountMinAggregator(depth, width), Encoders.STRING)(item)

  private[graft] def cmsIndex(item: String, row: Int, width: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.stringHash(item, 0x9e3779b9 * (row + 1))
    java.lang.Math.floorMod(h, width)
  }

  /** Point-frequency estimate: min over the item's cell in each row. */
  def cmsEstimate(table: Seq[Long], item: String,
                  depth: Int = CmsDepth, width: Int = CmsWidth): Long = {
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = table(r * width + cmsIndex(item, r, width))
      if (v < est) est = v
      r += 1
    }
    est
  }

  /** Equi-join SIZE estimate from two Count-Min sketches over the join
    * key (the AGMS/CM inner-product estimator): per hash row,
    * Σᵢ A[r][i]·B[r][i] ≥ Σ_k f_A(k)·f_B(k) — the true join size plus
    * only NON-NEGATIVE collision cross-terms, so each row's product
    * OVERestimates deterministically and the min over depth rows is
    * the tightest; E[overshoot per row] ≤ ‖f_A‖₁·‖f_B‖₁/width, so
    * min over depth rows lands within e·n_A·n_B/width with
    * probability ≥ 1 − e^−depth. This is how a planner prices a join
    * between two 100 TB-scale relations from two 80 KiB summaries —
    * no shuffle, no contact between the relations.
    *
    * Overflow (ADVICE r11): at counter magnitudes ~1e11+ (100 TB-scale
    * streams) a cell product alone exceeds Long — each row accumulates
    * with `multiplyExact`/`addExact` and SATURATES to Long.MaxValue on
    * the first overflow instead of wrapping negative. A saturated row
    * simply never wins the min (its true value is at least that
    * large), so the estimate stays a valid overestimate as long as any
    * row fits; if every row saturates the result is Long.MaxValue —
    * "too large to price", never a silently bogus number.
    */
  def cmsJoinEstimate(a: Seq[Long], b: Seq[Long],
                      depth: Int = CmsDepth, width: Int = CmsWidth): Long = {
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      var dot = 0L
      var i = 0
      try {
        while (i < width) {
          dot = Math.addExact(dot,
            Math.multiplyExact(a(r * width + i), b(r * width + i)))
          i += 1
        }
      } catch { case _: ArithmeticException => dot = Long.MaxValue }
      if (dot < est) est = dot
      r += 1
    }
    est
  }
}
