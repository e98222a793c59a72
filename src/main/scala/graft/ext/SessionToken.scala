package graft.ext

import org.apache.spark.sql.SparkSession

/** Guaranteed-unique per-session identity for artifact caches (r16,
  * ADVICE): `System.identityHashCode` is NOT unique — two live
  * sessions in one JVM can collide and hand one session DataFrames
  * bound to the other. A `WeakHashMap` keyed on the session OBJECT
  * (identity semantics, entries dropped when the session is
  * collected) assigns each session a UUID once; caches key on
  * `(token, dir)` TUPLES, so no separator character can alias two
  * directories either.
  */
private[graft] object SessionToken {
  private val tokens =
    new java.util.WeakHashMap[SparkSession, String]()

  def of(spark: SparkSession): String = tokens.synchronized {
    val t = tokens.get(spark)
    if (t != null) t
    else {
      val fresh = java.util.UUID.randomUUID().toString
      tokens.put(spark, fresh)
      fresh
    }
  }
}
