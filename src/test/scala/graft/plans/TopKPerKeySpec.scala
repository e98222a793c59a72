package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  /** The comparator KEEPS the rank column: dropping it would make this
    * very plan eligible for RewriteRowNumberTopK (installed session-
    * wide at first operator use), silently comparing the operator with
    * itself. With rk in the output the rewrite guard refuses, so this
    * stays a genuine Window execution.
    */
  private def windowTop3 = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
  }

  test("top-k set equals the window formulation on the orders fixture") {
    val got = TopKPerKey(Tables.orders(spark, sfDir),
      Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
    val expect = windowTop3
    assert(!expect.queryExecution.optimizedPlan.toString.contains("TopKPerKey"),
      "comparator was rewritten — it no longer independently checks the operator")
    // Compare locally: even `expect.drop("rk")` inside an except would
    // re-create the rewrite-eligible Project(Filter(Window)) shape.
    val gotSet = got.select("o_orderkey").as[Long].collect().sorted.toSeq
    val expSet = expect.select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(gotSet == expSet)
  }

  test("plans as partial -> exchange -> final (the map-side-pruning shape)") {
    val got = TopKPerKey(Tables.orders(spark, sfDir),
      Seq("o_custkey"), Seq("o_totalprice" -> false), 3)
    val plan = got.queryExecution.executedPlan.toString
    val execs = "TopKPerKey \\[".r.findAllIn(plan).length
    assert(execs == 2, s"expected partial+final TopKPerKey nodes:\n$plan")
    assert(plan.contains("hashpartitioning(o_custkey"),
      s"no key-clustered exchange between the passes:\n$plan")
    // The exchange must sit between the two passes: partial below it.
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    val firstExec = plan.indexOf("TopKPerKey [")
    assert(firstExec < exchangeIdx && exchangeIdx < plan.lastIndexOf("TopKPerKey ["),
      s"exchange is not between final and partial:\n$plan")
  }

  test("k larger than every group returns the whole input") {
    val df = Seq((1, 10), (1, 20), (2, 5)).toDF("k", "v")
    val got = TopKPerKey(df, Seq("k"), Seq("v" -> false), 100)
    assert(got.count() == 3)
  }

  test("ties break by the secondary sort key, matching the window exactly") {
    val df = Seq((1, 50, "a"), (1, 50, "b"), (1, 50, "c"), (1, 40, "d"))
      .toDF("k", "v", "id")
    val got = TopKPerKey(df, Seq("k"), Seq("v" -> false, "id" -> true), 2)
      .select("id").as[String].collect().sorted
    assert(got.sameElements(Array("a", "b")))
  }

  test("optimizer rule rewrites row_number-filter-drop to the operator") {
    TopKPerKey.install(spark)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val declarative = Tables.orders(spark, sfDir)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select("o_custkey", "o_orderkey")
    val optimized = declarative.queryExecution.optimizedPlan.toString
    assert(optimized.contains("TopKPerKeyNode") ||
      optimized.contains("TopKPerKey"), s"rewrite did not fire:\n$optimized")
    // Answer unchanged: the windowed oracle keeps rk (rewrite guard
    // blocks it there), giving an independent comparator.
    val keepRk = Tables.orders(spark, sfDir)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select("o_custkey", "o_orderkey", "rk")
    assert(declarative.count() == keepRk.count())
    assert(declarative.except(keepRk.drop("rk")).isEmpty)
  }

  test("rewrite guards: rank survival, rank() semantics, and rn = 1 " +
    "all block the rewrite") {
    TopKPerKey.install(spark)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    // rk kept in the output → must stay a Window (ranks are demanded)
    val kept = Tables.orders(spark, sfDir)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select("o_custkey", "rk")
    assert(!kept.queryExecution.optimizedPlan.toString.contains("TopKPerKey"))
    // rank() admits >k rows on ties → different answer, no rewrite
    val rk = Tables.orders(spark, sfDir)
      .withColumn("rk", rank().over(w)).filter(col("rk") <= 3)
      .select("o_custkey", "o_orderkey")
    assert(!rk.queryExecution.optimizedPlan.toString.contains("TopKPerKey"))
  }

  test("many skewed input partitions still produce the exact set") {
    // One hot key spread over 16 input partitions: each partial keeps
    // its local top-2, the final merges to the global top-2.
    val df = (1 to 1000).map(i => (1, i)).toDF("k", "v").repartition(16)
    val got = TopKPerKey(df, Seq("k"), Seq("v" -> false), 2)
      .select("v").as[Int].collect().sorted
    assert(got.sameElements(Array(999, 1000)))
  }

  test("final pass requires a sort, so Spark plans its SPILLABLE SortExec " +
    "between the exchange and the final (no unbounded final-side map)") {
    val got = TopKPerKey(Tables.orders(spark, sfDir),
      Seq("o_custkey"), Seq("o_totalprice" -> false), 3)
    val plan = got.queryExecution.executedPlan.toString
    val sortIdx = plan.indexOf("Sort [")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    val finalIdx = plan.indexOf("TopKPerKey [")
    assert(sortIdx >= 0, s"no SortExec in the final pass's input:\n$plan")
    assert(finalIdx < sortIdx && sortIdx < exchangeIdx,
      s"sort is not between the final pass and the exchange:\n$plan")
  }

  test("memory-pressure flush epochs in the partial pass do not change " +
    "the answer (graceful degradation toward pass-through)") {
    // A tiny byte budget forces the partial map to flush every few rows,
    // exercising the exact path a denied TaskMemoryManager acquisition
    // takes at extreme key cardinality. The final pass re-prunes each
    // epoch's survivors, so the result must stay exactly the window
    // formulation's.
    val before = TopKPerKey.partialFlushes.get()
    TopKPerKey.testMaxPartialBytes = Some(512L)
    try {
      val df = (1 to 500).map(i => (i % 40, i, i)).toDF("k", "v", "tie")
        .repartition(4)
      val got = TopKPerKey(df, Seq("k"), Seq("v" -> false, "tie" -> true), 3)
        .as[(Int, Int, Int)].collect().toSeq.sorted
      val expect = (1 to 500).map(i => (i % 40, i, i))
        .groupBy(_._1).values.flatMap(g =>
          g.sortBy { case (_, v, tie) => (-v, tie) }.take(3))
        .toSeq.sorted
      assert(got == expect)
      assert(TopKPerKey.partialFlushes.get() > before,
        "budget was never hit — the flush path did not run")
    } finally {
      TopKPerKey.testMaxPartialBytes = None
    }
  }

  test("PartialTopKIterator direct: flush epochs at extreme key " +
    "cardinality emit every unique-key row exactly once") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
    import org.apache.spark.sql.types.IntegerType
    // The OOM scenario the hardening targets: every row a distinct key
    // (the map can never prune), driven straight through the iterator
    // with a tiny byte budget — hundreds of flush epochs. k=1 per
    // distinct key ⇒ the union of all epochs must be the input, with
    // no row lost or duplicated across epoch boundaries.
    val attrs = Seq(AttributeReference("k", IntegerType)(),
      AttributeReference("v", IntegerType)())
    val toUnsafe = UnsafeProjection.create(attrs.map(a => a: Expression), attrs)
    val keyProj = UnsafeProjection.create(Seq(attrs.head: Expression), attrs)
    val cmp = RowOrdering.create(
        Seq(SortOrder(attrs(1), Descending)), attrs)
      .asInstanceOf[Ordering[UnsafeRow]]
    TopKPerKey.testMaxPartialBytes = Some(1024L)
    try {
      val n = 20000
      val input = (1 to n).iterator.map(i => InternalRow(i, i): InternalRow)
      val out = new PartialTopKIterator(input, toUnsafe, keyProj, cmp, 1)
        .map(_.getInt(0)).toVector
      assert(out.size == n, s"lost/duplicated rows across flushes: ${out.size}")
      assert(out.sorted == (1 to n).toVector)
    } finally TopKPerKey.testMaxPartialBytes = None
  }

  test("PartialTopKIterator direct: a hot key under flushes still " +
    "never emits more than k rows per epoch and keeps the true top-k") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
    import org.apache.spark.sql.types.IntegerType
    val attrs = Seq(AttributeReference("k", IntegerType)(),
      AttributeReference("v", IntegerType)())
    val toUnsafe = UnsafeProjection.create(attrs.map(a => a: Expression), attrs)
    val keyProj = UnsafeProjection.create(Seq(attrs.head: Expression), attrs)
    val cmp = RowOrdering.create(
        Seq(SortOrder(attrs(1), Descending)), attrs)
      .asInstanceOf[Ordering[UnsafeRow]]
    TopKPerKey.testMaxPartialBytes = Some(1024L)
    try {
      val n = 5000
      val input = (1 to n).iterator.map(i => InternalRow(7, i): InternalRow)
      val out = new PartialTopKIterator(input, toUnsafe, keyProj, cmp, 3)
        .map(_.getInt(1)).toVector
      // Superset contract: the global top-3 must survive SOME epoch
      // (the final pass re-prunes the rest).
      assert(Set(n, n - 1, n - 2).subsetOf(out.toSet),
        s"true top-k lost across flushes: ${out.sorted.takeRight(5)}")
      // And the pruning still bites: far fewer than n rows forwarded.
      assert(out.size < n / 2, s"flush degenerated to full pass-through " +
        s"even though epochs hold 3 rows: ${out.size}")
    } finally TopKPerKey.testMaxPartialBytes = None
  }

  test("partial pass accounts its map against task execution memory " +
    "(reservation visible during the scan, released by completion)") {
    // The accounting path (MemoryConsumer.acquireMemory) only triggers
    // once estimated bytes exceed the first ReserveChunk; a wide value
    // column gets there quickly. We can't observe the TaskMemoryManager
    // from the driver after the fact, so this pins the contract
    // indirectly: a run under default budgets with per-key state far
    // past ReserveChunk completes, stays exact, and frees what it took
    // (a leaked reservation would fail Spark's task-completion leak
    // check, which throws on unreleased managed memory in local mode).
    val wide = (1 to 3000).map(i => (i, "x" * 2048, i)).toDF("k", "pad", "tie")
      .repartition(2)
    val got = TopKPerKey(wide, Seq("k"), Seq("tie" -> true), 1).count()
    assert(got == 3000)
  }
}
