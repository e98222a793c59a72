package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** File-format source coverage beyond parquet (SURVEY.md §2.2 "file
  * format scans" — the reference reads only Kafka and one YAML file):
  * CSV and JSON-lines round trips with explicit schemas, verified
  * against the parquet-derived oracle. Explicit schemas, never
  * inference — at 100 TB schema inference is an extra full pass over
  * the data before the first real one.
  */
object SourceQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CSV scan: nation written as quoted CSV with header, read back
    // with the parquet schema, broadcast-joined to region. Quoting
    // round-trips comment text containing delimiters.
    "rel_nation_csv" -> ((s, dir) => {
      val nat = Tables.nation(s, dir)
      val out = Materialize.once(s"nation_csv:$dir", dir) { p =>
        nat.write.mode("overwrite").option("header", "true").csv(p)
      }
      s.read.schema(nat.schema).option("header", "true").csv(out)
        .join(broadcast(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
    }),

    // JSON-lines scan: documents written as JSON (newlines and quotes
    // in text escape per spec), read back with explicit schema,
    // aggregated per language. Reading JSON with a 3-column schema
    // prunes parsing to those fields — same projection-only-decode
    // idea as the CDC envelope parse (R2).
    "docs_json_scan" -> ((s, dir) => {
      val out = Materialize.once(s"docs_json:$dir", dir) { p =>
        Tables.documents(s, dir).write.mode("overwrite").json(p)
      }
      s.read.schema("doc_id LONG, lang STRING, text STRING").json(out)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("total_chars"))
    }),

    // Plain-text scan: documents written as tab-separated lines, read
    // back with the line-oriented text source and parsed with a
    // 3-way bounded split (the fixture text contains no tabs or
    // newlines — asserted by the oracle's full-content hash match).
    // Row-for-row identity is the strongest round-trip check: every
    // byte of every document survives write → read → parse.
    "docs_text_scan" -> ((s, dir) => {
      val out = Materialize.once(s"docs_text:$dir", dir) { p =>
        Tables.documents(s, dir)
          .select(concat_ws("\t",
            col("doc_id"), col("lang"), col("text")).as("value"))
          .write.mode("overwrite").text(p)
      }
      // get() (0-based, null past the end), not element_at: ANSI mode
      // throws on out-of-bounds, and a row with NULL text would
      // serialize to 2 fields (concat_ws skips NULLs)
      s.read.text(out)
        .select(split(col("value"), "\t", 3).as("f"))
        .select(get(col("f"), lit(0)).cast("long").as("doc_id"),
          get(col("f"), lit(1)).as("lang"),
          get(col("f"), lit(2)).as("text"))
    }),

    // ORC scan: documents round-tripped through Spark's native ORC
    // format (predicate pushdown + column pruning apply as in parquet),
    // aggregated per source with a pushed-down id filter.
    "docs_orc_scan" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val out = Materialize.once(s"docs_orc:$dir", dir) { p =>
        docs.write.mode("overwrite").orc(p)
      }
      s.read.schema(docs.schema).orc(out)
        .filter(col("doc_id") % 2 === 0)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("long")).as("total_chars"))
    }),

    // Avro scan (E264): documents round-tripped through hand-built
    // Avro container files (graft.sources.AvroIO — no spark-avro jar
    // in the sandbox; Avro core + avro-mapred are public classpath).
    // The sync-marker-splittable read is the scale half; md5 over the
    // round-tripped text pins byte-exact string fidelity, not just
    // counts.
    "docs_avro_scan" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val out = Materialize.once(s"docs_avro:$dir", dir) { p =>
        graft.sources.AvroIO.write(docs, p)
      }
      graft.sources.AvroIO.read(s, out)
        .filter(col("doc_id") % 3 === 1)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("long")).as("total_chars"),
          min(md5(col("text"))).as("min_text_md5"))
    }),

    // Avro LOGICAL types (E264 upgrade): orders carries a TIMESTAMP
    // column, round-tripped as Avro timestamp-micros — the standard
    // logical annotation — and re-derived as TimestampType from the
    // writer schema. min/max pin microsecond fidelity, not just counts.
    "rel_avro_orders" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      val out = Materialize.once(s"orders_avro:$dir", dir) { p =>
        graft.sources.AvroIO.write(orders, p)
      }
      graft.sources.AvroIO.read(s, out)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_orderdate")).as("first_date"),
          max(col("o_orderdate")).as("last_date"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
    }),

    // Schema evolution on read: two parquet batches written with
    // DIFFERENT schemas (the second adds `source`) merge into one
    // unified scan via mergeSchema — the on-read contract a long-lived
    // ingest layout depends on (old files never rewritten when a
    // column is added). Missing columns surface as NULLs, exactly what
    // the oracle reproduces.
    "docs_schema_evolution" -> ((s, dir) => {
      val out = Materialize.once(s"schema_evo:$dir", dir) { p =>
        val d = Tables.documents(s, dir)
        d.filter(col("doc_id") % 2 === 0).select("doc_id", "lang")
          .write.mode("overwrite").parquet(s"$p/v1")
        d.filter(col("doc_id") % 2 === 1).select("doc_id", "lang", "source")
          .write.mode("overwrite").parquet(s"$p/v2")
      }
      s.read.option("mergeSchema", "true").parquet(s"$out/v1", s"$out/v2")
        .select("doc_id", "lang", "source")
    }),

    // Small-file compaction round trip: a deliberately fragmented
    // 64-file layout rewritten to 4 files (CompactionSpec asserts the
    // physical counts); this row hash-checks that compaction moved
    // every row unchanged — the correctness half of the operation.
    // Since r14 (E314) the rewrite runs through the transactional
    // table: the fragmented layout is version 0, the compacted one
    // version 1 — both readable (CompactionSpec pins the physical
    // 64→4 collapse via the manifests), and a crash mid-compaction
    // leaves version 0 fully served, never a mixed directory.
    "docs_compaction" -> ((s, dir) => {
      val out = Materialize.once(s"compact:$dir", dir) { p =>
        graft.operators.TxTable.commit(
          Tables.documents(s, dir).select("doc_id", "lang", "source")
            .repartition(64), p)
        graft.operators.TxTable.commit(
          graft.operators.TxTable.snapshotAt(s, p, 0L).repartition(4), p)
      }
      graft.operators.TxTable.snapshot(s, out)
    }),

    // E317: EXACTLY-ONCE sink under at-least-once delivery — the
    // foreachBatch(batchId) / Delta-txn idempotence pattern on the
    // E314 commit log: micro-batches 0,1,2 land via appendIdempotent
    // with batches 0 and 1 REPLAYED (the at-least-once engine retry);
    // the (appId, txnVersion) token in the manifest makes each replay
    // a committed no-op, so the snapshot holds every event exactly
    // once and the oracle is the plain full-table derivation. The
    // E114 row pins idempotent-merge arithmetic; this row pins the
    // TRANSACTIONAL sink — replay skipping, token persistence, and
    // append-superset commits all sit on the compared hash.
    "events_txsink_replay" -> ((s, dir) => {
      val tbl = Materialize.once("txsink", dir) { p =>
        val ev = Tables.events(s, dir).select(
          col("event_id"), col("user_id"),
          floor(col("value") * 100).cast("long").as("cents"),
          (col("event_id") % 3).as("batch_id"))
        for (b <- Seq(0L, 1L, 1L, 2L, 0L)) // 1 and 0 replayed
          graft.operators.TxTable.appendIdempotent(
            ev.filter(col("batch_id") === b), p, "sink", b)
      }
      graft.operators.TxTable.snapshot(s, tbl)
    }),

    // E326 (r15): the exactly-once sink ACROSS a commit-log
    // CHECKPOINT — 13 micro-batches cross the every-10th-commit
    // checkpoint boundary, then four PRE-checkpoint tokens are
    // replayed AFTER the checkpoint landed: their no-op decision now
    // rides the checkpoint's accumulated token set + the short
    // manifest tail (TxTableSpec pins the ≤ interval+2 header-read
    // bound), not a full history scan — and the snapshot still holds
    // every event exactly once against the plain full-table oracle.
    // The builder asserts the checkpoint really landed, so this row
    // can never silently degrade into a checkpoint-free replay test.
    "events_txsink_ckpt" -> ((s, dir) => {
      val tbl = Materialize.once("txsinkckpt", dir) { p =>
        val ev = Tables.events(s, dir).select(
          col("event_id"), col("user_id"),
          floor(col("value") * 100).cast("long").as("cents"),
          (col("event_id") % 13).as("batch_id"))
        for (b <- (0L to 12L) ++ Seq(0L, 3L, 7L, 12L))
          graft.operators.TxTable.appendIdempotent(
            ev.filter(col("batch_id") === b), p, "sink", b)
        require(graft.operators.TxTable.latestCheckpoint(s, p)
          .contains(10L), "checkpoint did not land at version 10")
      }
      graft.operators.TxTable.snapshot(s, tbl)
    }),

    // Bucketed co-located join through the real write path (upgrades the
    // E54 bucketing claim from plan-audit-only to oracle-checked): both
    // sides land as 8-bucket tables via saveAsTable, the join reads them
    // back through the catalog, and the DuckDB oracle re-derives the same
    // aggregate from the raw parquet — so bucket layout, catalog metadata,
    // and the shuffle-free read path all sit on the compared hash.
    // PlanAuditSpec separately pins that this physical shape has zero
    // exchanges; this row pins that it computes the right answer.
    // The catalog names carry a fingerprint of the fixture dir: the
    // Materialize.once cache is keyed per dir, so dir-less global names
    // would let a second fixture dir in the same JVM repoint the tables
    // out from under the first dir's cached (skipped) build.
    "rel_bucketed_join" -> ((s, dir) => {
      val tag = Integer.toHexString(dir.hashCode)
      val ordersTbl = s"graft_rbj_orders_$tag"
      val custTbl = s"graft_rbj_cust_$tag"
      Materialize.once(s"bucketjoin:$dir", dir) { p =>
        s.sql(s"DROP TABLE IF EXISTS $ordersTbl")
        s.sql(s"DROP TABLE IF EXISTS $custTbl")
        Tables.orders(s, dir).write.mode("overwrite").format("parquet")
          .bucketBy(8, "o_custkey").option("path", s"$p/orders_b")
          .saveAsTable(ordersTbl)
        Tables.customer(s, dir).write.mode("overwrite").format("parquet")
          .bucketBy(8, "c_custkey").option("path", s"$p/cust_b")
          .saveAsTable(custTbl)
      }
      s.table(ordersTbl)
        .join(s.table(custTbl), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("total_cents"))
    }),

    // Batch twin of E114's idempotent foreachBatch sink
    // (StreamingPipeline.idempotentBatchWriter): three batches land,
    // then batch 1 REPLAYS — the restart-after-commit failure mode
    // exactly-once sinks must absorb. The converged table must hold
    // ONE copy of every batch (the dynamic partition overwrite swaps
    // batch 1's directory instead of appending), so the read-back
    // hash-matches an oracle computed from the raw events alone; an
    // append-mode regression would double batch 1's rows and fail the
    // row/hash check.
    "events_idempotent_replay" -> ((s, dir) => {
      val out = Materialize.once(s"idemreplay:$dir", dir) { p =>
        val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"),
          floor(col("value") * 100).cast("long").as("cents"),
          (col("event_id") % 3).as("bid"))
        val writer =
          graft.streaming.StreamingPipeline.idempotentBatchWriter(s"$p/table")
        Seq(0L, 1L, 2L, 1L).foreach { b =>
          writer(ev.filter(col("bid") === b).drop("bid"), b)
        }
      }
      s.read.parquet(s"$out/table")
        .select(col("event_id"), col("user_id"), col("cents"),
          col("batch_id").cast("long").as("batch_id"))
    }),

    // Row-level provenance via Spark's hidden `_metadata` scan columns
    // (E159): which FILE a row came from and its position IN that file
    // — the lineage key a training pipeline carries so any example in
    // a trained model traces back to its source shard ("filter doc X
    // out and retrain" starts here). Metadata columns come from the
    // reader itself — no window function, no shuffle, no extra pass —
    // so the provenance key is free even at 100 TB (a global-unique
    // alternative to E101's ordering-based ids). Oracle: the fixture
    // writes documents in doc_id order as a single file, so row_index
    // must equal doc_id and file_name is the fixture's basename —
    // asserting BOTH pins that _metadata reports physical positions,
    // not post-shuffle ones.
    "docs_provenance" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          col("_metadata.file_name").as("file_name"),
          col("_metadata.row_index").as("row_idx"),
          concat(col("_metadata.file_name"), lit(":"),
            col("_metadata.row_index")).as("prov_key"))
    }))

  val oracles: Map[String, String] = Map(
    "rel_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS total_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "docs_provenance" ->
      """SELECT doc_id, lang, 'documents.parquet' AS file_name,
        |       doc_id AS row_idx,
        |       'documents.parquet:' || doc_id AS prov_key
        |FROM documents""".stripMargin,

    "rel_nation_csv" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin,

    "docs_json_scan" ->
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang""".stripMargin,

    "docs_text_scan" ->
      "SELECT doc_id, lang, text FROM documents",

    "docs_orc_scan" ->
      """SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE doc_id % 2 = 0 GROUP BY source""".stripMargin,

    "docs_avro_scan" ->
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       min(md5(text)) AS min_text_md5
        |FROM documents WHERE doc_id % 3 = 1 GROUP BY lang""".stripMargin,

    "rel_avro_orders" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       min(o_orderdate) AS first_date,
        |       max(o_orderdate) AS last_date,
        |       min(o_totalprice) AS min_price,
        |       max(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "docs_schema_evolution" ->
      """SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS source
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT doc_id, lang, source FROM documents
        |WHERE doc_id % 2 = 1""".stripMargin,

    "docs_compaction" ->
      """SELECT doc_id, lang, source FROM documents""",

    "events_txsink_replay" ->
      """SELECT event_id, user_id,
        |       CAST(floor(value * 100) AS BIGINT) AS cents,
        |       CAST(event_id % 3 AS BIGINT) AS batch_id
        |FROM events""".stripMargin,

    "events_idempotent_replay" ->
      """SELECT event_id, user_id,
        |       CAST(floor(value * 100) AS BIGINT) AS cents,
        |       CAST(event_id % 3 AS BIGINT) AS batch_id
        |FROM events""".stripMargin,

    // E326: exactly-once across the checkpoint — still the plain
    // full-table derivation (replays are no-ops, whatever read path
    // decided them).
    "events_txsink_ckpt" ->
      """SELECT event_id, user_id,
        |       CAST(floor(value * 100) AS BIGINT) AS cents,
        |       CAST(event_id % 13 AS BIGINT) AS batch_id
        |FROM events""".stripMargin)
}
