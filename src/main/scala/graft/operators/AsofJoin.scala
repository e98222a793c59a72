package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the latest right row whose
  * event time is ≤ the left row's, within the same key (north-star
  * extension — the reference has no joins at all, SURVEY.md §2.2).
  *
  * Spark-first formulation (option (a) of the custom-operator ladder —
  * composition of existing ops, no custom plan node needed): tag both
  * inputs, UNION them, and take `last(value, ignoreNulls)` over a
  * per-key window ordered by (ts, side) with rows up to the current
  * one. One shuffle on the join key, one sort within partitions —
  * exactly the cost profile of a dedicated merge-based as-of operator,
  * and AQE handles key skew. The alternative — an inequality join +
  * per-left-row max — is a range join that Catalyst would execute as
  * a broadcast nested-loop; the union-window form stays O(n log n)
  * per key at any scale.
  *
  * Tie semantics: a right row at exactly left.ts matches (sides sort
  * right-before-left at equal ts), mirroring DuckDB's `ASOF JOIN`
  * (`ON left.ts >= right.ts`), which the correctness oracle uses.
  * Unmatched left rows survive with nulls (left-outer semantics).
  */
object AsofJoin {

  /** @param left      probe side (keeps all its rows)
    * @param right     reference side, columns: key, ts, plus `payload`
    * @param keyCol    equality key column name on both sides
    * @param tsCol     event-time column name on both sides
    * @param payload   right-side columns to carry (prefixed `asof_`)
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               keyCol: String, tsCol: String,
               payload: Seq[String]): DataFrame = {
    val sideTag = "_asof_side"
    val rec = "_asof_rec"
    val carry = left.columns.filterNot(c => c == keyCol || c == tsCol).toSeq
    // The whole right payload rides in ONE struct that is null exactly
    // on left rows: last(rec, ignoreNulls) then picks the latest right
    // ROW, so a right row whose payload value is legitimately NULL
    // still wins over an older non-null one (encoding "no right row"
    // as a null payload column would skip it and return stale data).
    val recType = org.apache.spark.sql.types.StructType(payload.map(right.schema(_)))
    val lCols = Seq(col(keyCol), col(tsCol), lit(1).as(sideTag)) ++
      carry.map(col) :+ lit(null).cast(recType).as(rec)
    val rCols = Seq(col(keyCol), col(tsCol), lit(0).as(sideTag)) ++
      carry.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
      struct(payload.map(col): _*).as(rec)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(sideTag))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    left.select(lCols: _*)
      .unionByName(right.select(rCols: _*))
      .withColumn(rec, last(col(rec), ignoreNulls = true).over(w))
      .filter(col(sideTag) === 1)
      .select(Seq(col(keyCol), col(tsCol)) ++ carry.map(col) ++
        payload.map(p => col(rec).getField(p).as(s"asof_$p")): _*)
  }
}
