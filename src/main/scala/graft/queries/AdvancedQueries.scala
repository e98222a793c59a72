package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Advanced aggregation shapes: rollup (grouping sets), pivot, exact
  * percentiles, skew-safe salted aggregation, and a bucketed range
  * join — the remaining SURVEY.md §2.2 category rows, each expressed
  * the way it survives 100 TB and verified against DuckDB.
  */
object AdvancedQueries {

  /** The E278 MERGE scenario as a COMMITTED transactional table
    * (E314): version 0 = the pre-merge target, version 1 = the MERGE
    * result. Built once per fixture state.
    */
  private def mergeTxTable(s: SparkSession, dir: String): String =
    Materialize.once("txmerge", dir) { p =>
      val o = Tables.orders(s, dir)
      val target = o.filter(col("o_orderkey") % 4 =!= 3)
      val source = o.filter(col("o_orderkey") % 2 === 1)
        .withColumn("o_totalprice", col("o_totalprice") + 10.0)
        .withColumn("o_orderpriority", lit("X-MERGED"))
        .withColumn("is_delete", col("o_orderkey") % 8 === 5)
      graft.operators.TxTable.commit(target, p)
      graft.operators.TxTable.commit(
        graft.operators.MergeInto(target, source, "o_orderkey",
          "is_delete"), p)
    }


  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * 100).cast("long")

  val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** E309 mergeable-histogram quantiles: fixed GLOBAL equi-width bins
    * (merge algebra demands data-independent breaks), $25k-cent width
    * over the order-price range, 3 persisted shards.
    */
  private val QmBinWidth = 2500000L
  private val QmBins = 20
  private val QmShards = 3

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ROLLUP: subtotal rows per returnflag and a grand total — one
    // expand + one shuffle, null-marked grouping levels.
    "rel_rollup" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum(cents(col("l_extendedprice"))).as("price_cents"),
          count(lit(1)).as("n"))),

    // PIVOT with an explicit value list (never let pivot scan for
    // distinct values at scale — that is a hidden extra job).
    "rel_pivot_events" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy((col("user_id") % 10).as("cohort"))
        .pivot("event_type", EventTypes)
        .agg(count(lit(1)))),

    // UNPIVOT (melt): the wide per-cohort counts back to long form —
    // the inverse surface of `pivot`, one narrow Expand, no shuffle
    // beyond the pivot's own. Zero cells are dropped so the long form
    // equals the direct group-by (which is exactly what the oracle
    // computes).
    "rel_unpivot_events" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy((col("user_id") % 10).as("cohort"))
        .pivot("event_type", EventTypes)
        .agg(count(lit(1)))
        .unpivot(Array(col("cohort")),
          EventTypes.map(col).toArray, "event_type", "n")
        .filter(col("n") > 0)),

    // Exact interpolated percentiles (the exact form is the oracle
    // anchor; at 100 TB swap in approx_percentile and verify its error
    // bound against this query on a sample).
    "rel_percentiles" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          round(percentile(col("l_quantity"), lit(0.5)), 6).as("p50"),
          round(percentile(col("l_quantity"), lit(0.95)), 6).as("p95"),
          round(percentile(col("l_quantity"), lit(0.99)), 6).as("p99"))),

    // Distribution-rank window family (ntile / percent_rank /
    // cume_dist) per market segment: the window partitions on the
    // broadcast-joined segment so no single-partition global sort
    // exists (the scale hazard of an unpartitioned ntile — at 100 TB
    // a GLOBAL decile cut should come from equi-depth cutoffs
    // [rel_price_eqdepth] + the scalable row numbering
    // [docs_global_rownum] instead). Ties broken on o_orderkey so all
    // three rank functions are engine-deterministic; per-decile
    // aggregate output keeps the row count bounded.
    "rel_segment_deciles" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_totalprice"), col("o_orderkey"))
        .withColumn("decile", ntile(10).over(w))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .groupBy("c_mktsegment", "decile")
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("price_cents"),
          round(max(col("pr")), 6).as("max_pct_rank"),
          round(max(col("cd")), 6).as("max_cume_dist"))
    }),

    // Recursive CTE hierarchy rollup (Spark 4's WITH RECURSIVE): a
    // deterministic binary "referral tree" over customer ids
    // (parent = (id-1) DIV 2) walked to the root, then a subtree
    // aggregate per ancestor — the org-chart/category-tree rollup
    // that needed iterative DataFrame loops before Spark 4. Each
    // recursion step is one join; depth is log2(n) (~11 here, bounded
    // by spark.sql.cteRecursionLevelLimit's default 100), so the plan
    // stays shallow even at 100 TB customer counts. For CYCLIC graphs
    // (duplicate clusters) this surface is the wrong tool — UNION ALL
    // recursion would not terminate — which is why connected
    // components stay on the iterative operators (E48/E75).
    "rel_subtree_rollup" -> ((s, dir) => s.sql(
      s"""WITH RECURSIVE anc(ck, anc_key, depth) AS (
         |  SELECT c_custkey, c_custkey, 0 FROM parquet.`$dir/customer.parquet`
         |  UNION ALL
         |  SELECT a.ck, (a.anc_key - 1) DIV 2, a.depth + 1
         |  FROM anc a WHERE a.anc_key > 0
         |)
         |SELECT anc_key AS ancestor, count(*) AS subtree_size,
         |       CAST(max(depth) AS INTEGER) AS max_rel_depth,
         |       CAST(sum(bal_cents) AS BIGINT) AS subtree_bal_cents
         |FROM anc
         |JOIN (SELECT c_custkey,
         |             CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents
         |      FROM parquet.`$dir/customer.parquet`) c
         |  ON anc.ck = c.c_custkey
         |GROUP BY anc_key""".stripMargin)),

    // Salted two-phase aggregation: phase 1 fans each hot key across 8
    // deterministic salts (map-side partial agg still applies), phase 2
    // merges — the standard fix when a handful of keys would otherwise
    // land on single reducers. Result must equal the plain groupBy.
    "events_salted_counts" -> ((s, dir) => {
      val salted = Tables.events(s, dir)
        .withColumn("_salt", pmod(col("event_id"), lit(8)))
        .groupBy(col("event_type"), col("_salt"))
        .agg(count(lit(1)).as("c"), sum(cents(col("value"))).as("v"))
      salted.groupBy("event_type")
        .agg(sum("c").as("n"), sum("v").as("value_cents"))
    }),

    // Global top-k: ORDER BY + LIMIT with a deterministic tie-break.
    // Physically this must be TakeOrderedAndProject (per-partition
    // bounded heaps merged on the driver, O(k) memory) — never a full
    // global sort, which at 100 TB is a corpus-wide range shuffle.
    "rel_top_orders_global" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          cents(col("o_totalprice")).as("price_cents"))
        .orderBy(col("price_cents").desc, col("o_orderkey"))
        .limit(100)),

    // CUBE with grouping_id(): all four grouping sets in one expand +
    // shuffle. ls_n is null for 'F' rows, so the result contains BOTH
    // data nulls and subtotal null markers — gid is what tells them
    // apart (gid bit set = column aggregated away, not a data null).
    "rel_cube" -> ((s, dir) => {
      val lsn = when(col("l_linestatus") === "F", lit(null))
        .otherwise(col("l_linestatus"))
      Tables.lineitem(s, dir)
        .withColumn("ls_n", lsn)
        .cube("l_returnflag", "ls_n")
        .agg(grouping_id().cast("long").as("gid"),
          sum(cents(col("l_extendedprice"))).as("price_cents"),
          count(lit(1)).as("n"))
        .select("l_returnflag", "ls_n", "gid", "price_cents", "n")
    }),

    // Arbitrary GROUPING SETS — (returnflag) and (linestatus) only,
    // neither a rollup nor a cube prefix: one expand (2 replicas/row,
    // vs CUBE's 4) + one shuffle. gid distinguishes which set a row
    // belongs to (bit set = column aggregated away).
    "rel_grouping_sets" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"),
          sum(cents(col("l_extendedprice"))).as("price_cents"),
          count(lit(1)).as("n"))
        .select("l_returnflag", "l_linestatus", "gid", "price_cents", "n")),

    // Range join via time-bucketing: pairs of same-user events within
    // 60 seconds. The probe side joins on (user, minute-bucket) with
    // the build side replicated into its bucket and the next — an
    // equi-join Catalyst can shuffle/broadcast, instead of the
    // nested-loop theta join a raw interval predicate would plan.
    "rel_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val a = ev.select(col("user_id"), col("event_id").as("id_a"),
        col("ts").as("ts_a"),
        floor(unix_timestamp(col("ts")) / 60).as("bucket"))
      val b = ev.select(col("user_id"), col("event_id").as("id_b"),
        col("ts").as("ts_b"),
        explode(array(floor(unix_timestamp(col("ts")) / 60),
          floor(unix_timestamp(col("ts")) / 60) - 1)).as("bucket"))
      a.join(b, Seq("user_id", "bucket"))
        .filter(col("ts_b") > col("ts_a") &&
          col("ts_b") <= col("ts_a") + expr("INTERVAL 60 seconds"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // Manual join salting — the STATIC skew mitigation next to E63's
    // runtime AQE repair and E26's salted aggregation: the probe side
    // carries a deterministic salt in [0,S), the build side is
    // replicated S ways, and the join keys on (key, salt) so one hot
    // key spreads over S shuffle partitions. The merge hint pins a
    // shuffle join — a broadcast would (correctly) make salting moot,
    // but this row exists for the build-side-too-big-to-broadcast
    // regime. Result is identical to the unsalted join, which is
    // exactly what the oracle checks.
    "events_salted_join" -> ((s, dir) => {
      val S = 8
      val ev = Tables.events(s, dir)
        .withColumn("salt", pmod(col("event_id"), lit(S)))
      val dim = Tables.events(s, dir)
        .groupBy("event_type").agg(count(lit(1)).as("type_total"))
        .withColumn("salt",
          explode(sequence(lit(0L), lit(S - 1L))))
      ev.join(dim.hint("merge"), Seq("event_type", "salt"))
        .groupBy("event_type")
        .agg(max("type_total").as("type_total"), count(lit(1)).as("n_joined"))
    }),

    // Data-profiling summary (the pipeline health check a real ingest
    // runs before anything else): row count, per-column null/distinct
    // counts, value bounds, and the money total — one full scan, one
    // 1-row aggregate, every term partial-aggregatable.
    "rel_profile_orders" -> ((s, dir) =>
      Tables.orders(s, dir).agg(
        count(lit(1)).as("n_rows"),
        count(col("o_custkey")).as("custkey_nonnull"),
        countDistinct(col("o_custkey")).as("custkey_distinct"),
        countDistinct(col("o_orderstatus")).as("status_distinct"),
        min(col("o_orderdate")).as("first_order"),
        max(col("o_orderdate")).as("last_order"),
        sum(floor(col("o_totalprice") * 100).cast("long")).as("total_cents"))),

    // Equi-width histogram by plain floor arithmetic (identical IEEE
    // division+floor in both engines); the overflow bucket is clamped.
    "rel_price_histogram" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(least(floor(col("o_totalprice") / 5000), lit(11))
          .cast("int").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))),

    // E309: mergeable-histogram quantiles — the 5th mergeable summary
    // (HLL distinct, CMS frequency, MG top items, PCA moments, now
    // QUANTILES): per-shard equi-width histograms over fixed GLOBAL
    // bins persist as parquet and merge by bin-wise addition (exactly
    // additive — tomorrow's quantiles read yesterday's cells plus one
    // new shard, never re-scan prices); the quantile estimate walks
    // the ≤ QmBins merged cells (rank r = ⌈q·n⌉, estimate = the
    // containing bin's upper edge), and the ERROR BOUND is
    // machine-checked, not assumed: the exact r-th value (global rank
    // via the E101 operator, no one-partition window) must land in
    // the estimate's bin — |est − exact| ≤ bin width by construction,
    // and the verdict says so per quantile. All integers.
    "rel_quantile_merge" -> ((s, dir) => {
      val cents = floor(col("o_totalprice") * 100).cast("long")
      val bin = least(floor(cents / QmBinWidth), lit((QmBins - 1).toLong))
        .cast("long")
      val shardDir = Materialize.once(s"qm_shards:$dir", dir) { p =>
        Tables.orders(s, dir)
          .select((col("o_orderkey") % QmShards).as("shard"), bin.as("bin"))
          .groupBy("shard", "bin").agg(count(lit(1)).as("n"))
          .write.mode("overwrite").parquet(p)
      }
      val merged = s.read.parquet(shardDir)
        .groupBy("bin").agg(sum(col("n")).as("n")).localCheckpoint(false)
      val tot = merged.agg(sum(col("n")).as("nn"))
      val cum = merged.withColumn("cum", sum(col("n")).over(
        Window.orderBy("bin").rowsBetween(Window.unboundedPreceding,
          Window.currentRow))) // ≤ QmBins rows — cells, never data
      import s.implicits._
      val ranked = Seq(25L, 50L, 75L, 95L).toDF("q_pct")
        .crossJoin(broadcast(tot))
        .select(col("q_pct"),
          floor((col("q_pct") * col("nn") + 99) / 100).cast("long").as("r"))
      val est = ranked.join(cum, col("cum") >= col("r"))
        .groupBy("q_pct", "r").agg(min(col("bin")).as("bin"))
      val ordered = graft.operators.GlobalIndex.globalRowNumbers(
        Tables.orders(s, dir)
          .select(cents.as("cents"), col("o_orderkey"))
          .withColumn("ord", struct(col("cents"), col("o_orderkey"))),
        "ord", s.sparkContext.defaultParallelism)
      est.join(ordered.select(col("row_num"), col("cents")),
          col("row_num") === col("r"))
        .select(col("q_pct"), col("r"), col("bin"),
          ((col("bin") + 1) * QmBinWidth).as("est_cents"),
          col("cents").as("exact_cents"),
          (least(floor(col("cents") / QmBinWidth),
            lit((QmBins - 1).toLong)).cast("long") === col("bin"))
            .as("within_bin"))
    }),

    // Incremental aggregate maintenance (E121): a base aggregate (days
    // before the cutoff) and a delta aggregate (the new days) merge by
    // re-aggregating the PARTIAL RESULTS — count and sum are
    // re-aggregatable, so the merge touches aggregate-sized data, never
    // the base table, and equals the full recompute exactly (the oracle
    // IS the full recompute). This is the incremental-ETL contract:
    // at 100 TB the base aggregate is yesterday's materialized table
    // and only the delta's raw rows are ever scanned again.
    "events_incremental_counts" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"),
        col("ts").cast("timestamp").as("ts"),
        floor(col("value") * 100).cast("long").as("cents"))
      val cutoff = lit("2024-01-25").cast("timestamp")
      def part(f: org.apache.spark.sql.Column) = ev.filter(f)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("value_cents"))
      part(col("ts") < cutoff)
        .unionByName(part(col("ts") >= cutoff))
        .groupBy("event_type")
        .agg(sum(col("n")).as("n"), sum(col("value_cents")).as("value_cents"))
    }),

    // Incremental JOIN-view maintenance (E270): the delta-join algebra
    // every materialized join view rests on — with base tables split
    // into old/new slices, the view update is
    //   ΔV = ΔO ⋈ L_old  ∪  O_old ⋈ ΔL  ∪  ΔO ⋈ ΔL
    // and V_old ∪ ΔV must equal the full recompute (the oracle IS the
    // full join — the hash match is the maintenance-loses-nothing
    // claim, E121's contract lifted from aggregates to joins). At
    // 100 TB the three delta joins scan only delta-sized probe sides
    // against partition-pruned base storage (the E222 DPP shape);
    // yesterday's view rows are never recomputed. Raw columns only —
    // the identity is algebraic, not arithmetic.
    "rel_incremental_join" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val l = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"))
      val dO = col("o_orderkey") % 10 === 7
      val dL = col("l_orderkey") % 10 === 3
      val (oOld, oNew) = (o.filter(!dO), o.filter(dO))
      val (lOld, lNew) = (l.filter(!dL), l.filter(dL))
      def j(a: DataFrame, b: DataFrame) =
        a.join(b, col("o_orderkey") === col("l_orderkey"))
      // localCheckpoint stands in for "yesterday's materialized view":
      // the maintenance path reads it, never re-derives it
      val vOld = j(oOld, lOld).localCheckpoint(false)
      vOld.unionByName(j(oNew, lOld))
        .unionByName(j(oOld, lNew))
        .unionByName(j(oNew, lNew))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("l_linenumber"), col("l_partkey"), col("l_quantity"))
    }),

    // MERGE INTO (E278): the lakehouse upsert primitive as one
    // full-outer join — target = o_orderkey % 4 ≠ 3, source delta =
    // odd keys with an updated price (+10.0) and a re-tagged priority,
    // keys ≡ 5 (mod 8) flagged as deletes. The oracle derives the same
    // result as a three-branch kept/updated/inserted UNION — two
    // independent formulations of MERGE, one truth.
    // Since r14 (E314) the upsert runs through the TRANSACTIONAL
    // table: the pre-merge target is committed as version 0, the
    // MERGE result as version 1, and the row reads the snapshot —
    // a reader can never observe the rewrite mid-flight (TxTableSpec
    // plants the torn write), and version 0 stays readable
    // (rel_merge_time_travel gates it).
    "rel_merge_upsert" -> ((s, dir) => {
      graft.operators.TxTable.snapshot(s, mergeTxTable(s, dir))
    }),

    // E314 time travel: the SAME transactional table, read at
    // version 0 — the pre-merge target, byte-identical to the day it
    // was committed even though version 1 has since landed.
    "rel_merge_time_travel" -> ((s, dir) => {
      graft.operators.TxTable.snapshotAt(s, mergeTxTable(s, dir), 0L)
    }),

    // E318 (r15, VERDICT r14 #7): PARTITION-PRUNED snapshot read
    // through the commit log — orders committed hive-partitioned by
    // o_orderstatus (partition values recorded in the manifest's file
    // paths, the Delta add-file partitionValues discipline), read back
    // under a partition predicate. The pruning happens at the MANIFEST:
    // snapshotWhere plans only the matching partitions' files, so the
    // scan's files-read ∝ matching partitions (TxTableSpec pins
    // inputFiles ⊆ the o_orderstatus=F dirs; the oracle pins values).
    "rel_tx_pruned" -> ((s, dir) => {
      val tbl = Materialize.once("txpart", dir) { p =>
        graft.operators.TxTable.commitPartitioned(
          Tables.orders(s, dir), p, Seq("o_orderstatus"))
      }
      graft.operators.TxTable
        .snapshotWhere(s, tbl, Map("o_orderstatus" -> "F"))
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
    }),

    // E328 (r16, VERDICT r15 #6): per-file min/max DATA SKIPPING
    // through the commit log — orders committed range-clustered on
    // o_orderkey (repartitionByRange write → near-disjoint per-file
    // key bounds, recorded in the manifest from the parquet FOOTERS at
    // commit; no data scan), read back under a key range. File
    // selection happens at the MANIFEST (files-read ∝ files whose
    // [min,max] overlaps the range — TxTableSpec pins inputFiles); the
    // exact predicate still applies on the scan, so the oracle is the
    // plain BETWEEN over the source — skipping is a planning
    // optimization, never a semantics change.
    "rel_tx_skipped" -> ((s, dir) => {
      val tbl = Materialize.once("txskip", dir) { p =>
        graft.operators.TxTable.commit(
          Tables.orders(s, dir)
            .repartitionByRange(8, col("o_orderkey")), p)
      }
      graft.operators.TxTable
        .snapshotWhereRange(s, tbl, "o_orderkey", 1000L, 3000L)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // E331 (r16): commit-log COMPACTION — the Delta OPTIMIZE shape. A
    // deliberately messy history (12-file hash-layout commit + a
    // 3-file append) rewrites into 4 range-clustered files as a NEW
    // version; the row reads the full compacted snapshot, so the
    // oracle (plain orders) proves no row was lost or duplicated
    // through commit → append → compact. File-count, skipping repair
    // (hash layout skips nothing; the clustered rewrite prunes), and
    // pre-compaction time travel are pinned in TxTableSpec.
    "rel_tx_compacted" -> ((s, dir) => {
      val tbl = Materialize.once("txcompact", dir) { p =>
        val o = Tables.orders(s, dir)
        graft.operators.TxTable.commit(
          o.filter(col("o_orderkey") % 4 =!= 3).repartition(12), p)
        graft.operators.TxTable.append(
          o.filter(col("o_orderkey") % 4 === 3).repartition(3), p)
        graft.operators.TxTable.compact(s, p, numFiles = 4,
          clusterBy = Seq("o_orderkey"))
      }
      graft.operators.TxTable.snapshot(s, tbl)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
    }),

    // Key-skew profiler (E122): the distribution of per-key group sizes
    // — the diagnostic that decides WHEN the salting/AQE tiers (E26,
    // E63, E99) are needed, shipped as an operator instead of folklore.
    // The full-data pass is one count per key; the distribution summary
    // runs on key-cardinality-sized data.
    "events_key_skew" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id").agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("n_keys"),
          max(col("sz")).as("max_sz"),
          round(percentile(col("sz"), lit(0.5)), 6).as("p50"),
          round(percentile(col("sz"), lit(0.99)), 6).as("p99"),
          round(max(col("sz")) / avg(col("sz")), 6).as("skew_ratio"))),

    // Equi-depth histogram (E123): quartile cutoffs from the exact
    // interpolated percentile (a 1-row aggregate folded back in via a
    // broadcast cross join — the same shape as E121's total), then a
    // when-chain bucket assignment. Complements E98's equi-width
    // buckets; cutoffs are rounded to 6 decimals in both engines before
    // comparison, far below the 2-decimal price granularity, so bucket
    // edges cannot flip between engines.
    "rel_price_eqdepth" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val cuts = o.agg(
        round(percentile(col("o_totalprice"), lit(0.25)), 6).as("c1"),
        round(percentile(col("o_totalprice"), lit(0.5)), 6).as("c2"),
        round(percentile(col("o_totalprice"), lit(0.75)), 6).as("c3"))
      o.crossJoin(broadcast(cuts))
        .select(
          when(col("o_totalprice") < col("c1"), 0)
            .when(col("o_totalprice") < col("c2"), 1)
            .when(col("o_totalprice") < col("c3"), 2)
            .otherwise(3).as("bucket"),
          cents(col("o_totalprice")).as("price_cents"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min(col("price_cents")).as("lo_cents"),
          max(col("price_cents")).as("hi_cents"))
    }),

    // Data-quality assertion suite (E119): the expectations pass an
    // ingest pipeline runs before anything trusts a batch — null keys,
    // domain violations, duplicate primary keys, and referential
    // orphans in both directions, each a bounded 1-row aggregate (the
    // anti-joins shuffle keys only) unioned into one (check, violations)
    // report. All checks pass on the fixture by construction, which is
    // itself the assertion: a fixture regression or a broken check both
    // flip a row away from zero and fail the hash match.
    "rel_dq_checks" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      val c = Tables.customer(s, dir)
      def chk(name: String, viol: org.apache.spark.sql.DataFrame) =
        viol.agg(count(lit(1)).as("violations"))
          .select(lit(name).as("check"), col("violations"))
      // All row-level predicates share ONE orders scan (conditional
      // aggregates unpivoted via stack); only the structural checks
      // (dup PKs, the two orphan anti-joins) need their own passes.
      val rowLevel = o.agg(
          count(when(col("o_custkey").isNull, 1)).as("nullkey"),
          count(when(col("o_totalprice") <= 0, 1)).as("badprice"))
        .select(expr(
          "stack(2, 'orders_null_custkey', nullkey, " +
            "'orders_nonpositive_price', badprice) AS (check, violations)"))
      rowLevel
        .unionByName(chk("orders_dup_pk",
          o.groupBy("o_orderkey").agg(count(lit(1)).as("cnt"))
            .filter(col("cnt") > 1)))
        .unionByName(chk("lineitem_orphans",
          l.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")))
        .unionByName(chk("orders_unknown_cust",
          o.join(c, col("o_custkey") === col("c_custkey"), "left_anti")))
    }),

    // Z-order (Morton) clustering key (E111): bit-interleave of
    // (l_partkey, l_suppkey) as pure shift/and/or Column arithmetic —
    // stays in whole-stage codegen, and the oracle reproduces the
    // identical magic-number spread in DuckDB SQL, so any lane, mask,
    // or interleave-order bug breaks the hash match. The z_bucket is
    // the write-side range-partition key (graft.operators.ZOrder
    // .clusterWrite); ZOrderSpec pins the actual file-skipping win —
    // per-file min/max overlap against a 2-D box — for this layout vs
    // a linear sort of the same rows.
    "rel_zorder_cluster" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.operators.ZOrder.zValue(col("l_partkey"), col("l_suppkey"))
            .as("zval"))
        .withColumn("z_bucket", shiftrightunsigned(col("zval"), 20))))

  val oracles: Map[String, String] = Map(
    "rel_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
        |       count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "rel_pivot_events" -> {
      val cols = EventTypes
        .map(t => s"count(CASE WHEN event_type = '$t' THEN 1 END) AS \"$t\"")
        .mkString(", ")
      s"SELECT user_id % 10 AS cohort, $cols FROM events GROUP BY 1"
    },

    "rel_percentiles" ->
      """SELECT l_returnflag,
        |       round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |       round(quantile_cont(l_quantity, 0.95), 6) AS p95,
        |       round(quantile_cont(l_quantity, 0.99), 6) AS p99
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "rel_subtree_rollup" ->
      """WITH RECURSIVE anc(ck, anc_key, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer
        |  UNION ALL
        |  SELECT a.ck, (a.anc_key - 1) // 2, a.depth + 1
        |  FROM anc a WHERE a.anc_key > 0
        |)
        |SELECT anc_key AS ancestor, count(*) AS subtree_size,
        |       CAST(max(depth) AS INTEGER) AS max_rel_depth,
        |       CAST(sum(bal_cents) AS BIGINT) AS subtree_bal_cents
        |FROM anc
        |JOIN (SELECT c_custkey,
        |             CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents
        |      FROM customer) c
        |  ON anc.ck = c.c_custkey
        |GROUP BY anc_key""".stripMargin,

    "rel_segment_deciles" ->
      """WITH j AS (
        |  SELECT c_mktsegment, o_totalprice,
        |         CAST(ntile(10) OVER w AS INTEGER) AS decile,
        |         percent_rank() OVER w AS pr,
        |         cume_dist() OVER w AS cd
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WINDOW w AS (PARTITION BY c_mktsegment
        |               ORDER BY o_totalprice, o_orderkey))
        |SELECT c_mktsegment, decile, count(*) AS n_orders,
        |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS price_cents,
        |       round(max(pr), 6) AS max_pct_rank,
        |       round(max(cd), 6) AS max_cume_dist
        |FROM j GROUP BY 1, 2""".stripMargin,

    "events_salted_counts" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY event_type""".stripMargin,

    "rel_top_orders_global" ->
      """SELECT o_orderkey, o_custkey,
        |       CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents
        |FROM orders
        |ORDER BY price_cents DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "rel_cube" ->
      """SELECT l_returnflag, ls_n,
        |       CAST(GROUPING(l_returnflag, ls_n) AS BIGINT) AS gid,
        |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
        |       count(*) AS n
        |FROM (SELECT *, nullif(l_linestatus, 'F') AS ls_n FROM lineitem)
        |GROUP BY CUBE (l_returnflag, ls_n)""".stripMargin,

    "rel_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,

    "rel_range_join" ->
      """SELECT a.user_id, count(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND CAST(b.ts AS TIMESTAMP) > CAST(a.ts AS TIMESTAMP)
        | AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL 60 SECONDS
        |GROUP BY a.user_id""".stripMargin,

    "events_salted_join" ->
      """SELECT event_type, count(*) AS type_total, count(*) AS n_joined
        |FROM events GROUP BY event_type""".stripMargin,

    "rel_unpivot_events" ->
      """SELECT user_id % 10 AS cohort, event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "rel_profile_orders" ->
      """SELECT count(*) AS n_rows,
        |       count(o_custkey) AS custkey_nonnull,
        |       count(DISTINCT o_custkey) AS custkey_distinct,
        |       count(DISTINCT o_orderstatus) AS status_distinct,
        |       min(o_orderdate) AS first_order,
        |       max(o_orderdate) AS last_order,
        |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS total_cents
        |FROM orders""".stripMargin,

    "rel_price_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 5000), 11) AS INTEGER) AS bucket,
        |       count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin,

    "events_incremental_counts" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |         AS value_cents
        |FROM events GROUP BY event_type""".stripMargin,

    // E314: version 0 of the transactional MERGE table is the
    // pre-merge target — the oracle derives it straight from orders.
    "rel_merge_time_travel" ->
      "SELECT * FROM orders WHERE o_orderkey % 4 <> 3",

    // E318: the partition-pruned TxTable read must equal a plain
    // predicate over the source — pruning is a planning optimization,
    // never a semantics change.
    "rel_tx_pruned" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderstatus = 'F'""".stripMargin,

    // E328: the stats-skipped range read must equal the plain BETWEEN
    // over the source — file skipping is planning-only.
    "rel_tx_skipped" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_orderkey BETWEEN 1000 AND 3000""".stripMargin,

    // E331: the compacted table is exactly the source — compaction is
    // a layout rewrite, never a semantics change.
    "rel_tx_compacted" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",

    // E278: independent three-branch derivation of MERGE.
    "rel_merge_upsert" ->
      """WITH tgt AS (SELECT * FROM orders WHERE o_orderkey % 4 <> 3),
        |src AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |               o_totalprice + 10.0 AS o_totalprice, o_orderdate,
        |               'X-MERGED' AS o_orderpriority,
        |               (o_orderkey % 8 = 5) AS del
        |        FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus,
        |       t.o_totalprice, t.o_orderdate, t.o_orderpriority
        |FROM tgt t LEFT JOIN src ON src.o_orderkey = t.o_orderkey
        |WHERE src.o_orderkey IS NULL
        |UNION ALL
        |SELECT s.o_orderkey, s.o_custkey, s.o_orderstatus,
        |       s.o_totalprice, s.o_orderdate, s.o_orderpriority
        |FROM src s JOIN tgt ON tgt.o_orderkey = s.o_orderkey
        |WHERE NOT s.del
        |UNION ALL
        |SELECT s.o_orderkey, s.o_custkey, s.o_orderstatus,
        |       s.o_totalprice, s.o_orderdate, s.o_orderpriority
        |FROM src s LEFT JOIN tgt ON tgt.o_orderkey = s.o_orderkey
        |WHERE tgt.o_orderkey IS NULL AND NOT s.del""".stripMargin,

    // E270: the full recompute — matching it is the delta-maintenance
    // claim.
    "rel_incremental_join" ->
      """SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
        |       l.l_linenumber, l.l_partkey, l.l_quantity
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey"""
        .stripMargin,

    "events_key_skew" ->
      """WITH s AS (SELECT user_id, count(*) AS sz FROM events GROUP BY 1)
        |SELECT count(*) AS n_keys, max(sz) AS max_sz,
        |       round(quantile_cont(sz, 0.5), 6) AS p50,
        |       round(quantile_cont(sz, 0.99), 6) AS p99,
        |       round(max(sz) / avg(sz), 6) AS skew_ratio
        |FROM s""".stripMargin,

    // E309: shard histograms, bin-wise merge, rank walk, exact r-th
    // value by (cents, orderkey) order — all integers, verdict pinned.
    "rel_quantile_merge" ->
      s"""WITH h AS (SELECT o_orderkey % $QmShards AS shard,
         |    least(CAST(floor(CAST(floor(o_totalprice * 100) AS BIGINT)
         |      / $QmBinWidth) AS BIGINT), ${QmBins - 1}) AS bin
         |  FROM orders),
         |hs AS (SELECT shard, bin, CAST(count(*) AS BIGINT) AS n
         |       FROM h GROUP BY shard, bin),
         |m AS (SELECT bin, sum(n) AS n FROM hs GROUP BY bin),
         |t AS (SELECT sum(n) AS nn FROM m),
         |c AS (SELECT bin, sum(n) OVER (ORDER BY bin
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |      FROM m),
         |qs AS (SELECT CAST(unnest([25, 50, 75, 95]) AS BIGINT) AS q_pct),
         |r AS (SELECT q_pct,
         |        CAST(floor((q_pct * nn + 99) / 100) AS BIGINT) AS r
         |      FROM qs, t),
         |eb AS (SELECT r.q_pct, r.r, min(c.bin) AS bin
         |       FROM r JOIN c ON c.cum >= r.r GROUP BY r.q_pct, r.r),
         |o AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
         |        row_number() OVER (ORDER BY
         |          CAST(floor(o_totalprice * 100) AS BIGINT), o_orderkey)
         |          AS rn
         |      FROM orders)
         |SELECT eb.q_pct, eb.r, eb.bin,
         |       (eb.bin + 1) * $QmBinWidth AS est_cents,
         |       o.cents AS exact_cents,
         |       (least(CAST(floor(o.cents / $QmBinWidth) AS BIGINT),
         |         ${QmBins - 1}) = eb.bin) AS within_bin
         |FROM eb JOIN o ON o.rn = eb.r""".stripMargin,

    "rel_price_eqdepth" ->
      """WITH c AS (SELECT round(quantile_cont(o_totalprice, 0.25), 6) AS c1,
        |                  round(quantile_cont(o_totalprice, 0.5), 6) AS c2,
        |                  round(quantile_cont(o_totalprice, 0.75), 6) AS c3
        |           FROM orders)
        |SELECT CASE WHEN o_totalprice < c1 THEN 0
        |            WHEN o_totalprice < c2 THEN 1
        |            WHEN o_totalprice < c3 THEN 2 ELSE 3 END AS bucket,
        |       count(*) AS n,
        |       min(CAST(floor(o_totalprice * 100) AS BIGINT)) AS lo_cents,
        |       max(CAST(floor(o_totalprice * 100) AS BIGINT)) AS hi_cents
        |FROM orders CROSS JOIN c
        |GROUP BY 1""".stripMargin,

    "rel_dq_checks" ->
      """SELECT 'orders_null_custkey' AS "check",
        |       count(CASE WHEN o_custkey IS NULL THEN 1 END) AS violations
        |FROM orders
        |UNION ALL
        |SELECT 'orders_nonpositive_price',
        |       count(CASE WHEN o_totalprice <= 0 THEN 1 END) FROM orders
        |UNION ALL
        |SELECT 'orders_dup_pk', count(*) FROM (
        |  SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
        |UNION ALL
        |SELECT 'lineitem_orphans', count(*) FROM lineitem
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |UNION ALL
        |SELECT 'orders_unknown_cust', count(*) FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)""".stripMargin,

    "rel_zorder_cluster" ->
      """WITH base AS (
        |  SELECT l_orderkey, l_linenumber,
        |         l_partkey & 65535 AS x, l_suppkey & 65535 AS y
        |  FROM lineitem),
        |s1 AS (SELECT l_orderkey, l_linenumber,
        |              (x | (x << 8)) & 16711935 AS x,
        |              (y | (y << 8)) & 16711935 AS y FROM base),
        |s2 AS (SELECT l_orderkey, l_linenumber,
        |              (x | (x << 4)) & 252645135 AS x,
        |              (y | (y << 4)) & 252645135 AS y FROM s1),
        |s3 AS (SELECT l_orderkey, l_linenumber,
        |              (x | (x << 2)) & 858993459 AS x,
        |              (y | (y << 2)) & 858993459 AS y FROM s2),
        |s4 AS (SELECT l_orderkey, l_linenumber,
        |              (x | (x << 1)) & 1431655765 AS x,
        |              (y | (y << 1)) & 1431655765 AS y FROM s3)
        |SELECT l_orderkey, l_linenumber,
        |       x | (y << 1) AS zval,
        |       (x | (y << 1)) >> 20 AS z_bucket
        |FROM s4""".stripMargin)
}
