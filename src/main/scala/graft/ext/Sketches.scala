package graft.ext

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

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

    def finish(b: HllBuf): Long = {
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
        invSum += 1.0 / (1L << b.registers(i))
        if (b.registers(i) == 0) zeros += 1
        i += 1
      }
      val raw = alpha * m * m / invSum
      val est =
        if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
        else raw
      math.round(est)
    }

    def bufferEncoder = Encoders.product[HllBuf]
    def outputEncoder = Encoders.scalaLong
  }

  /** Untyped UDAF over a pre-hashed long column:
    * `df.groupBy(k).agg(Sketches.hllDistinct(xxhash64(col("x"))))`.
    */
  def hllDistinct(hashed: Column, p: Int = DefaultP): Column =
    udaf(new HllAggregator(p), Encoders.scalaLong)(hashed)
}
