package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Dedup
import graft.operators.AsofJoin

/** Relational + windowed analytics over the TPC-H-ish fixture tables:
  * broadcast-vs-shuffle join strategy, map-side-combinable
  * aggregation, ranking windows, as-of join, and dedup-as-a-filter.
  * (Extensions beyond the reference surface — it has no general joins,
  * aggregations, windows, or sorts at all, SURVEY.md §2.2.)
  *
  * Money math: all currency aggregates sum integer CENTS
  * (`floor(x*100)` per row). Summing doubles would be
  * accumulation-order-dependent and could never hash-match the oracle;
  * floor-to-cents is bit-deterministic in both engines and is the
  * correct idiom for money at 100 TB anyway.
  */
object RelationalQueries {

  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * 100).cast("long")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pricing-summary aggregation (TPC-H Q1 shape): one wide scan, one
    // shuffle on a 4-value grouping key, all partial-aggregatable.
    "rel_pricing_summary" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").cast("long").as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_cents"),
          count(lit(1)).as("n"))),

    // Revenue by nation (TPC-H Q5 shape): big fact tables shuffle-join
    // on their keys; customer->nation are broadcast (small dims) so the
    // plan is two shuffle joins + two broadcasts, AQE-resizable.
    "rel_revenue_by_nation" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      val nat = Tables.nation(s, dir)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"),
          count(lit(1)).as("n_items"))
    }),

    // Shipping-priority (TPC-H Q3 shape): a join-reorder stressor —
    // 3-way fact join where each input carries its own selective
    // filter. Deliberately NO broadcast hint: the filters must reach
    // the parquet scans (PushedFilters) and the optimizer + AQE must
    // pick the broadcast side from size estimates on their own —
    // PlanAuditSpec pins both properties, so an optimizer regression
    // fails CI rather than shipping a shuffle-everything plan.
    "rel_shipping_priority" -> ((s, dir) => {
      val cutoff = lit("1998-06-01").cast("timestamp")
      val cust = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
      val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q18 shape (E89): orders qualified by an aggregated HAVING
    // subquery — the "IN (SELECT ... GROUP BY ... HAVING)" pattern
    // becomes an inner join against the aggregated key set. The
    // aggregate runs on lineitem's grain FIRST (partial-agg friendly,
    // carries only (orderkey, sum) through the shuffle); orders then
    // joins the shrunken set, and the customer decode broadcasts.
    // Quantity sums are whole-valued doubles well inside 2^53, so the
    // long cast is exact in both engines.
    "rel_big_qty_orders" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"))
        .filter(col("sum_qty") > 150)
      Tables.orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, dir).select("c_custkey", "c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), cents(col("o_totalprice")).as("price_cents"),
          col("sum_qty"))
    }),

    // TPC-H Q5 shape (E127), deliberately phrased as PURE SQL through
    // spark.sql over direct parquet.`path` table references — the SQL
    // entry path a reference user migrating their queries would take,
    // with zero DataFrame code. Six-way join with the local-supplier
    // twist (supplier nation must equal customer nation — a second
    // equality on the supplier join), a selective region filter and a
    // date range that must push to the scans; Catalyst plans it from
    // the SQL exactly as it would from the DataFrame form.
    "rel_local_supplier_volume" -> ((s, dir) => s.sql(
      s"""SELECT n_name,
         |       sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
         |                AS BIGINT)) AS revenue_cents
         |FROM parquet.`$dir/customer.parquet` c
         |JOIN parquet.`$dir/orders.parquet`   o  ON c_custkey = o_custkey
         |JOIN parquet.`$dir/lineitem.parquet` l  ON l_orderkey = o_orderkey
         |JOIN parquet.`$dir/supplier.parquet` su ON l_suppkey = s_suppkey
         |                                       AND s_nationkey = c_nationkey
         |JOIN parquet.`$dir/nation.parquet`   n  ON c_nationkey = n_nationkey
         |JOIN parquet.`$dir/region.parquet`   r  ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate <  TIMESTAMP '1997-01-01'
         |GROUP BY n_name""".stripMargin)),

    // TPC-H Q21 shape (E110): suppliers who were the SOLE flagged
    // supplier on a multi-supplier finished order — the canonical
    // EXISTS + NOT EXISTS self-join topology on the fact table. (The
    // fixture lacks commit/receipt dates, so "late" is stood in by
    // l_returnflag = 'R'; the join topology is the point.) Both
    // correlated subqueries become fact-side self-joins on the order
    // key with a supplier-inequality residual: a LEFT SEMI (some other
    // supplier exists) then a LEFT ANTI (no other flagged supplier) —
    // each carries only (orderkey, suppkey) pairs through its shuffle,
    // never payload columns, and the supplier decode broadcasts.
    // PlanAuditSpec pins the semi/anti/broadcast shape.
    "rel_waiting_supplier" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val flagged = li.filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("okey"), col("l_suppkey").as("skey"))
        .distinct()
      val others = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val flaggedOthers = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
      flagged
        .join(others, col("okey") === col("o2") && col("skey") =!= col("s2"),
          "left_semi")
        .join(flaggedOthers,
          col("okey") === col("o3") && col("skey") =!= col("s3"), "left_anti")
        .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_name")),
          col("skey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    // RANGE-frame window (value-based, not row-based): per-customer
    // trailing-30-day revenue. The order key is an integer day offset
    // so the frame bound is a plain numeric range — peers on the same
    // day aggregate together regardless of row order, which is what
    // makes a RANGE frame deterministic where a ROWS frame over a tied
    // sort would not be.
    "rel_trailing_revenue" -> ((s, dir) => {
      val days = datediff(col("o_orderdate"),
        lit("1995-01-01").cast("timestamp")).cast("long")
      val w = Window.partitionBy(col("o_custkey")).orderBy(days)
        .rangeBetween(-29, 0)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(cents(col("o_totalprice"))).over(w).as("rev_30d_cents"))
    }),

    // Correlation / regression statistics from EXACT integer moment
    // sums: builtin corr()/regr_slope() accumulate doubles in
    // partition order (never hash-reproducible across engines), so the
    // five moments are summed as decimal(38,0) — exact, order-free,
    // partial-aggregatable — and the double arithmetic happens once,
    // on scalars, in an operand order the oracle mirrors token for
    // token.
    "rel_corr_stats" -> ((s, dir) => {
      val q = col("l_quantity").cast("decimal(19,0)") // integer-valued
      val p = floor(col("l_extendedprice") * 100).cast("decimal(19,0)")
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast("double").as("n"),
          sum(q).cast("double").as("sx"),
          sum(p).cast("double").as("sy"),
          sum(q * p).cast("double").as("sxy"),
          sum(q * q).cast("double").as("sxx"),
          sum(p * p).cast("double").as("syy"))
        .select(col("l_returnflag"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("corr_qty_price"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6)
            .as("slope_cents_per_qty"))
    }),

    // FULL OUTER join with unmatched keys on BOTH sides (each side
    // pre-filtered differently), completing the join-type coverage row
    // alongside inner/semi/anti/asof/range. Null-safe key coalesce and
    // null aggregate columns survive the hash compare.
    "rel_outer_join" -> ((s, dir) => {
      val cust = Tables.customer(s, dir).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"), col("c_acctbal"))
      val ords = Tables.orders(s, dir).filter(col("o_totalprice") > 300000)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"))
      cust.join(ords, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          cents(col("c_acctbal")).as("acctbal_cents"),
          col("n_big"))
    }),

    // Ranking window: top-3 orders per customer by total price —
    // partitioned ranking, deterministic tie-break on the key.
    "rel_top_orders_per_cust" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("rk"), col("o_orderkey"),
          cents(col("o_totalprice")).as("price_cents"))
    }),

    // The same top-3-per-customer via the CUSTOM PHYSICAL OPERATOR
    // (graft.plans.TopKPerKey — logical node + planner strategy +
    // partial/final exec pair): the exchange carries at most k rows per
    // key per map partition, where the window formulation above
    // shuffles and sorts every order row. Same answer, hash-checked
    // against the same windowed oracle.
    "rel_top_orders_native" -> ((s, dir) =>
      graft.plans.TopKPerKey(Tables.orders(s, dir), Seq("o_custkey"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
        .select(col("o_custkey"), col("o_orderkey"),
          cents(col("o_totalprice")).as("price_cents"))),

    // The DECLARATIVE windowed form of the same top-3, with the
    // RewriteRowNumberTopK optimizer rule installed: the user writes
    // row_number-filter-drop, the Rule[LogicalPlan] swaps in the
    // TopKPerKey operator (the rank column is discarded, so the
    // rewrite is set-equivalent). PlanAuditSpec pins that the rewrite
    // actually fires.
    "rel_top_orders_rewrite" -> ((s, dir) => {
      graft.plans.TopKPerKey.install(s)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          cents(col("o_totalprice")).as("price_cents"))
    }),

    // As-of join: for every error event, the user's most recent
    // purchase value at-or-before that moment (union + per-key window;
    // right side pre-deduped per (user, ts) so ties are well-defined).
    "rel_asof_purchase" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max(cents(col("value"))).as("purchase_cents"))
      AsofJoin.asofJoin(errors, purchases, "user_id", "ts", Seq("purchase_cents"))
        .select("event_id", "user_id", "ts", "asof_purchase_cents")
    }),

    // Dedup as a filter: the corpus with near-duplicates removed —
    // every doc that appears as the higher id of a verified near-dup
    // pair is dropped, keeping one representative per duplicate group.
    "docs_near_dedup_survivors" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // same shingle width + threshold as docs_dedup_near, by construction
      val pairs = DedupQueries.wordNearDupPairs(s, dir) // shared artifact (r16)
      docs.join(pairs.select(col("id_b").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
        .select("doc_id", "lang", "source")
    }),

    // Set operations: customers that placed orders AND hold a high
    // balance, minus nation-0 residents (INTERSECT/EXCEPT both compile
    // to aggregates/anti-joins — shuffle on the key, no sort).
    "rel_set_ops" -> ((s, dir) => {
      val withOrders = Tables.orders(s, dir)
        .select(col("o_custkey").as("custkey")).distinct()
      val rich = Tables.customer(s, dir)
        .filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey"))
      val nationZero = Tables.customer(s, dir)
        .filter(col("c_nationkey") === 0)
        .select(col("c_custkey").as("custkey"))
      withOrders.intersect(rich).except(nationZero)
    }),

    // Multiset set-ops (INTERSECT ALL / EXCEPT ALL): duplicate
    // multiplicity is the semantics under test — min(m_A, m_B) copies
    // survive the intersect, max(0, m−m_C) the except. Spark plans
    // these as count-aggregate + generate replication, not a distinct
    // — the multiset output hash-matching DuckDB pins exactly that
    // per-key counting arithmetic.
    "rel_set_ops_all" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val bigQty = li.filter(col("l_quantity") > 45).select("l_suppkey")
      val returned = li.filter(col("l_returnflag") === "R").select("l_suppkey")
      val finStatus = li.filter(col("l_linestatus") === "F" &&
        col("l_discount") > 0.08).select("l_suppkey")
      bigQty.intersectAll(returned).exceptAll(finStatus)
    }),

    // Distinct aggregation (expand-based plan) + math functions with
    // deterministic double results (sqrt/ln of exact integer sums).
    "rel_distinct_math" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"),
          round(sqrt(sum(cents(col("l_extendedprice"))).cast("double")), 6).as("sqrt_cents"),
          round(log(sum(cents(col("l_extendedprice"))).cast("double")), 6).as("ln_cents"))),

    // Null-safe equality join (`<=>`): NULL keys match each other
    // instead of vanishing — the join-semantics row a plain `=` join
    // cannot express. The NULL bucket hashes to one value like any
    // other key, so the physical plan is an ordinary equi-join.
    "rel_nullsafe_join" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .select(when(col("c_mktsegment") === "BUILDING", lit(null))
          .otherwise(col("c_mktsegment")).as("seg"))
      val dim = cust.distinct().withColumnRenamed("seg", "d_seg")
      cust.join(dim, col("seg") <=> col("d_seg"))
        .groupBy(col("d_seg")).agg(count(lit(1)).as("n"))
    }),

    // Correlated aggregate subquery (TPC-H Q17 shape): line items of a
    // few brands gated by HALF their part's average quantity. Written
    // as the correlated form on purpose — Catalyst must DECORRELATE it
    // (RewriteCorrelatedScalarSubquery) into a per-part aggregate
    // joined back on l_partkey; a per-row re-executed subquery would be
    // O(rows × scan) and could never run at 100 TB. Quantity sums are
    // whole-valued doubles, so avg = exact_sum/count is bit-identical
    // in both engines and the `<` gate is deterministic.
    "rel_small_qty_revenue" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("g_lineitem")
      Tables.part(s, dir).createOrReplaceTempView("g_part")
      s.sql("""
        SELECT p_brand,
               sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS small_qty_cents,
               count(*) AS n_items
        FROM g_lineitem l JOIN g_part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
          AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                              FROM g_lineitem l2
                              WHERE l2.l_partkey = l.l_partkey)
        GROUP BY p_brand""")
    }),

    // LATERAL correlated derived table: top-3 customers by balance per
    // nation. The per-nation ORDER BY + LIMIT inside the lateral body
    // decorrelates to a ranking window over one shuffle — the SQL
    // surface twin of the DataFrame row_number pattern below.
    "rel_lateral_topk" -> ((s, dir) => {
      Tables.nation(s, dir).createOrReplaceTempView("g_nation")
      Tables.customer(s, dir).createOrReplaceTempView("g_customer")
      s.sql("""
        SELECT n.n_name, c.c_custkey,
               CAST(floor(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents
        FROM g_nation n,
        LATERAL (SELECT c_custkey, c_acctbal FROM g_customer
                 WHERE c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 3) c""")
    }),

    // Shipping-priority distribution (TPC-H Q12 shape): fact-fact join
    // with the date filter pushed to the lineitem scan, then a
    // CONDITIONAL aggregation — counts split by a predicate on the
    // joined side's column (`sum(CASE WHEN …)`), the canonical
    // one-pass alternative to two filtered joins. Map-side combinable:
    // the shuffle carries one partial row per (linestatus, flag)
    // group per task.
    "rel_priority_by_status" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
      val ord = Tables.orders(s, dir)
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_linestatus", "l_returnflag")
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
    }),

    // Promotion revenue share (TPC-H Q14 shape): a broadcast dim join
    // feeding TWO conditional sums whose RATIO is the answer — the
    // numerator is gated by a predicate on the dim side. Both sums are
    // exact integer cents, so the final percentage (rounded once) is
    // engine-reproducible; the fact scan keeps its month filter pushed
    // down.
    "rel_promo_revenue" -> ((s, dir) => {
      val lo = lit("1998-03-01").cast("timestamp")
      val hi = lit("1998-04-01").cast("timestamp")
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      val part = Tables.part(s, dir)
      val rev = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev).otherwise(0L))
            .as("promo_cents"),
          sum(rev).as("total_cents"))
        .select(col("promo_cents"), col("total_cents"),
          round(col("promo_cents") * lit(100.0) / col("total_cents"), 6)
            .as("promo_pct"))
    }),

    // Lapsed-customer prospecting (TPC-H Q22 shape): a scalar aggregate
    // subquery (broadcast 1-row join) gates the filter, and an ANTI
    // join removes customers with any RECENT order — the
    // above-average-balance-but-lapsed cohort grouped by market
    // segment. The anti join's build side is the distinct o_custkey
    // column of the date-filtered orders; nothing else of orders is
    // read (filter + column pruning reach the scan), and the build is
    // small enough to broadcast at any scale where "recent" is
    // selective.
    "rel_idle_customers" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("avg_bal"))
      val recent = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select("o_custkey").distinct()
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          sum(cents(col("c_acctbal"))).as("bal_cents"))
    }),

    // Bracketed-discount revenue (TPC-H Q19 shape): an OR of three
    // brand/size/quantity AND-brackets spanning BOTH join sides. The
    // optimizer's CNF extraction must derive each side's disjunctive
    // envelope and push it into the scans (part: brand/size OR-chain;
    // lineitem: quantity OR-chain) so neither table is read in full
    // before the join — the property PlanAuditSpec pins. Revenue in
    // exact integer cents.
    "rel_bracket_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val part = Tables.part(s, dir)
      val bracket =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 15)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(11, 25) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(26, 50) &&
          col("l_quantity").between(20, 45))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .filter(bracket)
        .agg(count(lit(1)).as("n_lines"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue_cents"))
    }),

    // Customer order-count distribution (TPC-H Q13 shape): LEFT OUTER
    // join so zero-order customers keep a row, count the non-null side
    // per customer, then aggregate the aggregate into a histogram.
    // Both aggregations shuffle only keys+counts; the distribution is
    // the classic skew diagnostic for the orders->customer join.
    "rel_cust_order_distribution" -> ((s, dir) =>
      Tables.customer(s, dir).select("c_custkey")
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy(col("n_orders"))
        .agg(count(lit(1)).as("n_cust"))),

    // Forecast-revenue (TPC-H Q6 shape): the pure scan microbenchmark —
    // no join, no groupBy, every predicate (date range, discount band,
    // quantity cap) eligible for parquet pushdown, one partial-agg
    // pass. At 100 TB this is the query whose cost IS the scan; the
    // plan must be scan -> partial agg -> single-row final (no
    // exchange wider than 1 row).
    "rel_forecast_revenue" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(cents(col("l_extendedprice") * col("l_discount")))
          .as("forecast_cents"),
          count(lit(1)).as("n_lines"))),

    // Two-nation shipping volume (TPC-H Q7 shape): the fact table joins
    // BOTH role-played dimension chains (supplier->nation and
    // orders->customer->nation), and the nation-pair disjunction can
    // only be applied after both chains attach. All four dims
    // broadcast; the only shuffles are the lineitem<->orders fact join
    // and the final 3-key aggregation.
    "rel_nation_volume" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      val supp = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      li.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_8") ||
          (col("supp_nation") === "NATION_8" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("volume_cents"),
          count(lit(1)).as("n_lines"))
    }),

    // Market-share (TPC-H Q8 shape): national share of a product
    // type's revenue inside one region, per year — a five-dim star
    // where the NUMERATOR condition (supplier nation) differs from the
    // FILTER condition (customer region). Share is a ratio of exact
    // integer-cent sums, rounded once.
    "rel_market_share" -> ((s, dir) => {
      val asiaNations = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("asia_nationkey"))
      val custAsia = Tables.customer(s, dir)
        .join(broadcast(asiaNations), col("c_nationkey") === col("asia_nationkey"))
        .select("c_custkey")
      val suppNation = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val stdParts = Tables.part(s, dir).filter(col("p_type") === "STANDARD")
        .select("p_partkey")
      val rev = cents(col("l_extendedprice") * (lit(1) - col("l_discount")))
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(stdParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(custAsia), col("o_custkey") === col("c_custkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(sum(when(col("supp_nation") === "NATION_3", rev).otherwise(0L))
          .as("nation_cents"),
          sum(rev).as("total_cents"))
        .select(col("o_year"), col("nation_cents"), col("total_cents"),
          round(col("nation_cents") * lit(100.0) / col("total_cents"), 6)
            .as("share_pct"))
    }),

    // Product-profit (TPC-H Q9 shape): profit by supplier nation and
    // order year over a part-name LIKE filter. The fixture set has no
    // partsupp table, so supply cost is adapted to
    // p_retailprice * l_quantity (documented divergence; the JOIN
    // TOPOLOGY — fact to part + supplier->nation + orders, grouped on
    // a dim attribute and a derived year — is the Q9 shape under
    // test). Profit in exact integer cents, floor per term.
    "rel_product_profit" -> ((s, dir) => {
      val parts = Tables.part(s, dir)
        .filter(col("p_name").contains("widget"))
        .select("p_partkey", "p_retailprice")
      val suppNation = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val profit = cents(col("l_extendedprice") * (lit(1) - col("l_discount"))) -
        cents(col("p_retailprice") * col("l_quantity"))
      Tables.lineitem(s, dir)
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(profit).as("profit_cents"), count(lit(1)).as("n_lines"))
    }),

    // Important-parts (TPC-H Q11 shape): per-key value sums kept only
    // when they exceed a threshold derived from the GLOBAL total — the
    // scalar-aggregate-subquery HAVING. The cut is "share > 1.2x the
    // average part's share", expressed as pure integer math
    // (value * n_parts * 10 > total * 12) so it is bit-deterministic
    // in both engines AND scale-invariant (a fixed fraction of total,
    // TPC-H's literal form, silently empties as part cardinality
    // grows). The global (total, n_parts) pair is a 1-row broadcast.
    "rel_important_parts" -> ((s, dir) => {
      val perPart = Tables.lineitem(s, dir)
        .groupBy("l_partkey")
        .agg(sum(cents(col("l_extendedprice"))).as("value_cents"))
      val total = perPart.agg(sum(col("value_cents")).as("total_cents"),
        count(lit(1)).as("n_parts"))
      perPart.crossJoin(broadcast(total))
        .filter(col("value_cents") * col("n_parts") * 10 >
          col("total_cents") * 12)
        .select("l_partkey", "value_cents")
    }),

    // Top-supplier (TPC-H Q15 shape): an aggregate feeding a
    // max-scalar-subquery filter over ITSELF — revenue per supplier
    // for one quarter, keep the max. Exact integer cents make the
    // equality safe; ties would all be kept, same as the spec. The
    // explicit isNotNull below is load-bearing for SCALE, not
    // semantics: the downstream supplier join pushes
    // isnotnull(l_suppkey) into the MAIN branch's scan only, which
    // de-canonicalizes the two otherwise-identical aggregate subtrees
    // and defeats ReusedExchange — doubling the fact scan. Stating the
    // predicate on the shared subtree re-unifies them (PlanAuditSpec
    // pins the single-scan property).
    "rel_top_supplier" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp") &&
          col("l_suppkey").isNotNull)
        .groupBy("l_suppkey")
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"))
      val best = rev.agg(max(col("revenue_cents")).as("max_cents"))
      rev.crossJoin(broadcast(best))
        .filter(col("revenue_cents") === col("max_cents"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("revenue_cents"))
    }),

    // Part/supplier counts (TPC-H Q16 shape): DISTINCT-count of
    // suppliers per part attribute triple, EXCLUDING a blacklist via
    // anti join (the NOT IN shape; s_suppkey is non-nullable so the
    // null-aware variant degenerates to a plain anti join — the
    // one-column build side broadcasts at any scale). The distinct
    // aggregation is the only wide shuffle.
    "rel_part_supplier_counts" -> ((s, dir) => {
      val bad = Tables.supplier(s, dir).filter(col("s_acctbal") < 0)
        .select("s_suppkey")
      Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(Tables.part(s, dir)
          .select("p_partkey", "p_brand", "p_type", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // Promotion-capable suppliers (TPC-H Q20 shape): nested
    // aggregate-vs-aggregate comparison — suppliers who shipped MORE
    // THAN HALF of a promo part's 1997 volume. The part-level total is
    // a WINDOW over the pair-level aggregate, NOT a self-join of the
    // aggregate against its own rollup: the self-join formulation
    // recomputes the whole pair subtree (Catalyst's exchange reuse is
    // defeated by join-generated isnotnull predicates differing
    // between the branches), i.e. TWO full fact scans at 100 TB. The
    // window costs one extra partkey shuffle of the already-aggregated
    // pairs — rows bounded by suppliers-per-part. Halving test is
    // integer math; supplier dim attaches by broadcast.
    "rel_promo_suppliers" -> ((s, dir) => {
      val pairs = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, dir)
          .filter(col("p_type") === "PROMO").select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("l_quantity").cast("long")).as("pair_qty"))
      pairs
        .withColumn("part_qty",
          sum(col("pair_qty")).over(Window.partitionBy(col("l_partkey"))))
        .filter(col("pair_qty") * 2 > col("part_qty"))
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_dominated_parts"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_dominated_parts"))
    }),

    // Min-cost supplier (TPC-H Q2 shape): for each part of one size,
    // the supplier(s) with the MINIMUM account balance among suppliers
    // that actually shipped it — the correlated-min-subquery shape.
    // The DataFrame form is a min-window over the (part, supplier)
    // bridge; the oracle states the same thing as a correlated scalar
    // subquery, proving the decorrelated formulation equivalent. The
    // p_size filter lands BEFORE the bridge distinct, so the distinct
    // (the only wide shuffle) processes just the qualifying sliver;
    // balance equality is a raw-value compare, no arithmetic.
    "rel_min_cost_supplier" -> ((s, dir) => {
      val pairs = Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
        .join(broadcast(Tables.part(s, dir)
          .filter(col("p_size") === 15).select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .select("p_partkey", "l_suppkey").distinct()
      val w = Window.partitionBy(col("p_partkey"))
      pairs
        .join(broadcast(Tables.supplier(s, dir)
          .select("s_suppkey", "s_name", "s_acctbal")),
          col("l_suppkey") === col("s_suppkey"))
        .withColumn("min_bal", min(col("s_acctbal")).over(w))
        .filter(col("s_acctbal") === col("min_bal"))
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal")
    }),

    // Late-order priority check (TPC-H Q4 shape): EXISTS with a
    // CORRELATED INEQUALITY — orders in one quarter having at least
    // one line shipped more than 60 days after the order date. Plans
    // as a left-semi join whose condition carries both the key
    // equality and the cross-table date comparison; the quarter filter
    // is pushed to the orders scan, and the semi join keeps the output
    // bounded by orders, never multiplying by lines.
    "rel_late_orders" -> ((s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .join(Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))),

    // Ranking window over text: top-3 most frequent tokens per
    // language (explode -> two-level aggregation -> ranked window).
    "docs_top_terms_per_lang" -> ((s, dir) => {
      val tf = Tables.documents(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("token"))
        .groupBy("lang", "token").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n").desc, col("token"))
      tf.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("lang", "rk", "token", "n")
    }))

  val oracles: Map[String, String] = Map(
    "rel_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "rel_revenue_by_nation" ->
      """SELECT n_name,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "rel_big_qty_orders" ->
      """WITH big AS (SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |             FROM lineitem GROUP BY l_orderkey
        |             HAVING CAST(sum(l_quantity) AS BIGINT) > 150)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        |       CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents, sum_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "rel_trailing_revenue" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) OVER (
        |         PARTITION BY o_custkey
        |         ORDER BY date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)
        |         RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT) AS rev_30d_cents
        |FROM orders""".stripMargin,

    "rel_corr_stats" ->
      """WITH a AS (
        |  SELECT l_returnflag,
        |         CAST(count(*) AS DOUBLE) AS n,
        |         CAST(sum(CAST(l_quantity AS HUGEINT)) AS DOUBLE) AS sx,
        |         CAST(sum(CAST(floor(l_extendedprice * 100) AS HUGEINT)) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(l_quantity AS HUGEINT) * CAST(floor(l_extendedprice * 100) AS HUGEINT)) AS DOUBLE) AS sxy,
        |         CAST(sum(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT)) AS DOUBLE) AS sxx,
        |         CAST(sum(CAST(floor(l_extendedprice * 100) AS HUGEINT) * CAST(floor(l_extendedprice * 100) AS HUGEINT)) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |       round((n * sxy - sx * sy) /
        |             (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price,
        |       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_cents_per_qty
        |FROM a""".stripMargin,

    "rel_outer_join" ->
      """SELECT coalesce(c_custkey, o_custkey) AS custkey,
        |       CAST(floor(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
        |       n_big
        |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000) c
        |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_big FROM orders
        |                 WHERE o_totalprice > 300000 GROUP BY o_custkey) o
        |ON c_custkey = o_custkey""".stripMargin,

    "rel_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate  > TIMESTAMP '1998-06-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_cents DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "rel_local_supplier_volume" ->
      """SELECT n_name,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
        |                     AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,

    "rel_waiting_supplier" ->
      """WITH l1 AS (
        |  SELECT DISTINCT l.l_orderkey AS okey, l.l_suppkey AS skey
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_returnflag = 'R' AND o.o_orderstatus = 'F')
        |SELECT s.s_name, count(*) AS numwait
        |FROM l1 JOIN supplier s ON l1.skey = s.s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.okey AND l2.l_suppkey <> l1.skey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.okey
        |                    AND l3.l_suppkey <> l1.skey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name
        |LIMIT 20""".stripMargin,

    "rel_top_orders_per_cust" ->
      """SELECT o_custkey, CAST(rk AS INTEGER) AS rk, o_orderkey,
        |       CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |                                   ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |      FROM orders)
        |WHERE rk <= 3""".stripMargin,

    "rel_asof_purchase" ->
      """WITH l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'error'),
        |r AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |             max(CAST(floor(value * 100) AS BIGINT)) AS purchase_cents
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, l.ts, r.purchase_cents AS asof_purchase_cents
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,

    // reuses the exact shingle CTE + Jaccard predicate of the
    // docs_dedup_near oracle, so the two can never check different
    // semantics
    "docs_near_dedup_survivors" ->
      s"""${DedupQueries.wordShCte},
         |pairs AS (${DedupQueries.jaccardPairsSelect})
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM pairs)""".stripMargin,

    "rel_set_ops" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_nationkey = 0""".stripMargin,

    "rel_set_ops_all" ->
      """SELECT l_suppkey FROM lineitem WHERE l_quantity > 45
        |INTERSECT ALL
        |SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
        |EXCEPT ALL
        |SELECT l_suppkey FROM lineitem
        |WHERE l_linestatus = 'F' AND l_discount > 0.08""".stripMargin,

    "rel_distinct_math" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_orderkey) AS n_orders,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       round(sqrt(CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)), 6) AS sqrt_cents,
        |       round(ln(CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)), 6) AS ln_cents
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "rel_top_orders_rewrite" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders)
        |WHERE rk <= 3""".stripMargin,

    "rel_top_orders_native" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders)
        |WHERE rk <= 3""".stripMargin,

    "rel_nullsafe_join" ->
      """WITH c AS (SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN NULL
        |                       ELSE c_mktsegment END AS seg FROM customer),
        |d AS (SELECT DISTINCT seg AS d_seg FROM c)
        |SELECT d_seg, count(*) AS n
        |FROM c JOIN d ON c.seg IS NOT DISTINCT FROM d.d_seg
        |GROUP BY d_seg""".stripMargin,

    "rel_small_qty_revenue" ->
      """SELECT p_brand,
        |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         AS small_qty_cents,
        |       count(*) AS n_items
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        |  AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
        |                      FROM lineitem l2
        |                      WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p_brand""".stripMargin,

    "rel_lateral_topk" ->
      """SELECT n.n_name, c.c_custkey,
        |       CAST(floor(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents
        |FROM nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer
        |         WHERE c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 3) c""".stripMargin,

    "docs_top_terms_per_lang" ->
      """WITH tf AS (SELECT lang, unnest(string_split(text, ' ')) AS token
        |            FROM documents),
        |counts AS (SELECT lang, token, count(*) AS n FROM tf GROUP BY lang, token)
        |SELECT lang, CAST(rk AS INTEGER) AS rk, token, n
        |FROM (SELECT *, row_number() OVER (PARTITION BY lang
        |                                   ORDER BY n DESC, token) AS rk
        |      FROM counts)
        |WHERE rk <= 3""".stripMargin,

    "rel_priority_by_status" ->
      """SELECT l_linestatus, l_returnflag,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |GROUP BY l_linestatus, l_returnflag""".stripMargin,

    "rel_promo_revenue" ->
      """WITH j AS (
        |  SELECT CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |           AS rev, p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1998-03-01'
        |    AND l_shipdate <  TIMESTAMP '1998-04-01')
        |SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT)
        |         AS promo_cents,
        |       CAST(sum(rev) AS BIGINT) AS total_cents,
        |       round(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
        |             * 100.0 / sum(rev), 6) AS promo_pct
        |FROM j""".stripMargin,

    "rel_idle_customers" ->
      """WITH ab AS (SELECT avg(c_acctbal) AS avg_bal FROM customer
        |            WHERE c_acctbal > 0)
        |SELECT c_mktsegment, count(*) AS n_cust,
        |       CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |         AS bal_cents
        |FROM customer, ab
        |WHERE c_acctbal > ab.avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment""".stripMargin,

    "rel_bracket_revenue" ->
      """SELECT count(*) AS n_lines,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
        |                     AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25
        |       AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50
        |       AND l_quantity BETWEEN 20 AND 45)""".stripMargin,

    "rel_cust_order_distribution" ->
      """WITH pc AS (SELECT c_custkey, count(o_orderkey) AS n_orders
        |            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |            GROUP BY c_custkey)
        |SELECT n_orders, count(*) AS n_cust FROM pc GROUP BY n_orders"""
        .stripMargin,

    "rel_forecast_revenue" ->
      """SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100)
        |                     AS BIGINT)) AS BIGINT) AS forecast_cents,
        |       count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "rel_nation_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
        |                     AS BIGINT)) AS BIGINT) AS volume_cents,
        |       count(*) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey  = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN customer ON o_custkey  = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1999-01-01'
        |  AND ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_8')
        |    OR (sn.n_name = 'NATION_8' AND cn.n_name = 'NATION_3'))
        |GROUP BY 1, 2, 3""".stripMargin,

    "rel_market_share" ->
      """WITH j AS (
        |  SELECT year(o_orderdate) AS o_year,
        |         CAST(floor(l_extendedprice * (1 - l_discount) * 100)
        |              AS BIGINT) AS rev,
        |         sn.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN part     ON l_partkey  = p_partkey
        |  JOIN customer ON o_custkey  = c_custkey
        |  JOIN nation canat ON c_nationkey = canat.n_nationkey
        |  JOIN region   ON canat.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey  = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate <  TIMESTAMP '1998-01-01')
        |SELECT CAST(o_year AS INTEGER) AS o_year,
        |       CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END)
        |            AS BIGINT) AS nation_cents,
        |       CAST(sum(rev) AS BIGINT) AS total_cents,
        |       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END)
        |             * 100.0 / sum(rev), 6) AS share_pct
        |FROM j GROUP BY 1""".stripMargin,

    "rel_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
        |                     AS BIGINT)
        |                - CAST(floor(p_retailprice * l_quantity * 100)
        |                       AS BIGINT)) AS BIGINT) AS profit_cents,
        |       count(*) AS n_lines
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN orders   ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2""".stripMargin,

    "rel_important_parts" ->
      """WITH pp AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
        |              AS BIGINT) AS value_cents
        |  FROM lineitem GROUP BY l_partkey),
        |t AS (SELECT sum(value_cents) AS total_cents, count(*) AS n_parts
        |      FROM pp)
        |SELECT l_partkey, value_cents FROM pp, t
        |WHERE value_cents * n_parts * 10 > total_cents * 12""".stripMargin,

    "rel_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
        |                       AS BIGINT)) AS BIGINT) AS revenue_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate <  TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, revenue_cents
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE revenue_cents = (SELECT max(revenue_cents) FROM rev)"""
        .stripMargin,

    "rel_part_supplier_counts" ->
      """SELECT p_brand, p_type, p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN
        |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin,

    "rel_promo_suppliers" ->
      """WITH pairs AS (
        |  SELECT l_partkey, l_suppkey,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS pair_qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'PROMO'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate <  TIMESTAMP '1998-01-01'
        |  GROUP BY l_partkey, l_suppkey),
        |per_part AS (
        |  SELECT l_partkey, sum(pair_qty) AS part_qty
        |  FROM pairs GROUP BY l_partkey)
        |SELECT s_suppkey, s_name, count(*) AS n_dominated_parts
        |FROM pairs
        |JOIN per_part USING (l_partkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE pair_qty * 2 > part_qty
        |GROUP BY 1, 2""".stripMargin,

    "rel_min_cost_supplier" ->
      """WITH pairs AS (
        |  SELECT DISTINCT p_partkey, l_suppkey
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size = 15),
        |j AS (
        |  SELECT p_partkey, s_suppkey, s_name, s_acctbal
        |  FROM pairs JOIN supplier ON l_suppkey = s_suppkey)
        |SELECT p_partkey, s_suppkey, s_name, s_acctbal FROM j
        |WHERE s_acctbal = (SELECT min(s_acctbal) FROM j j2
        |                   WHERE j2.p_partkey = j.p_partkey)""".stripMargin,

    "rel_late_orders" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin)
}
