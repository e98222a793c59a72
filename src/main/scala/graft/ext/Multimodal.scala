package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (north-star extension, SURVEY.md §7.4).
  *
  * Media assets are modeled the way the reference treats CDC payloads
  * (`kafka.rs:80-82`): an opaque `binary` content column that is never
  * re-encoded, next to typed metadata the engine *can* reason about.
  * That keeps scans prunable — a metadata-only query never deserializes
  * content bytes — and lets content flow through shuffles untouched.
  *
  * Decode/feature-extract runs per partition over iterators (the JVM
  * analogue of an Arrow-batched `mapInPandas`): the Spark-side plumbing
  * (schema, encoders, partition-wise batching) is real; the actual codec
  * call is [[StubCodec]] — a clearly-marked deterministic fake, because
  * this container ships no image/audio libraries. Swapping in a real
  * codec changes one function, not the plan.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque content bytes. */
  case class MmMeta(format: String, nBytes: Long, width: Int, height: Int)

  /** One multimodal record: id + opaque bytes + typed metadata. */
  case class MmRecord(id: Long, content: Array[Byte], meta: MmMeta)

  /** Extracted features: fixed-width vector + decode provenance. */
  case class MmFeatures(id: Long, format: String, feature: Array[Float], decoder: String)

  /** Magic-byte prefixes → sniffed container format. Applied to the
    * first 4 content bytes (lowercase hex), longest prefix wins.
    */
  val MagicPrefixes: Seq[(String, String)] = Seq(
    "89504e47" -> "png",
    "ffd8ff" -> "jpeg",
    "474946" -> "gif",
    "25504446" -> "pdf",
    "52494646" -> "riff")

  /** Build a multimodal table from the fixture `documents` table: the
    * UTF-8 text bytes stand in for media content (deterministic, so the
    * DuckDB oracle can reproduce every derived value), `source` for the
    * claimed format.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        col("source").as("format"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("nBytes"),
        lit(0).as("width"), lit(0).as("height")).as("meta"))

  /** Metadata/sniffing projection — never touches more than the first 4
    * content bytes plus the metadata struct (columnar pruning does the
    * rest). Output: (id, n_bytes, magic_hex, sniffed, claimed).
    */
  def metadata(mm: DataFrame): DataFrame = {
    val magic = lower(hex(substring(col("content"), 1, 4)))
    val sniffed = MagicPrefixes.foldRight(lit("unknown"): org.apache.spark.sql.Column) {
      case ((prefix, fmt), acc) =>
        when(magic.startsWith(prefix), lit(fmt)).otherwise(acc)
    }
    mm.select(
      col("id"),
      col("meta.nBytes").as("n_bytes"),
      magic.as("magic_hex"),
      sniffed.as("sniffed"),
      col("meta.format").as("claimed"))
  }

  /** STUB codec — deterministic fake standing in for a real image/audio
    * decoder (none available in this container). Produces an 8-dim
    * "feature" from content bytes: mean, variance proxy, and 6 coarse
    * byte-histogram buckets, all scaled to [0,1]. Deterministic ⇒
    * testable; replace with a real codec (JNI/ONNX) in production — the
    * call site and batch shape do not change.
    */
  object StubCodec {
    val Name = "stub-v1"
    def features(content: Array[Byte]): Array[Float] = {
      if (content.isEmpty) return Array.fill(8)(0f)
      val n = content.length
      var sum = 0L; var sumSq = 0L
      val hist = new Array[Long](6)
      var i = 0
      while (i < n) {
        val b = content(i) & 0xff
        sum += b; sumSq += b.toLong * b
        hist(b * 6 / 256) += 1
        i += 1
      }
      val mean = sum.toDouble / n
      val varr = sumSq.toDouble / n - mean * mean
      Array(
        (mean / 255.0).toFloat,
        (math.sqrt(math.max(varr, 0)) / 255.0).toFloat) ++
        hist.map(h => (h.toDouble / n).toFloat)
    }
  }

  /** Partition-wise decode: iterate each partition once, decode record
    * by record (a real codec would batch N records per call — the
    * iterator shape supports that without plan changes). No shuffle: a
    * narrow Dataset map stage whose parallelism is the scan's.
    */
  def decodeFeatures(spark: SparkSession, mm: DataFrame): Dataset[MmFeatures] = {
    import spark.implicits._
    mm.as[MmRecord].mapPartitions { it =>
      it.map(r => MmFeatures(r.id, r.meta.format, StubCodec.features(r.content), StubCodec.Name))
    }
  }

  /** Deterministic frame sampling over an opaque "video": pick every
    * k-th block of `blockSize` bytes (a stand-in for every k-th frame).
    * Pure byte arithmetic — the real thing swaps the slicer for a
    * demuxer; partitioning and output schema stay put.
    */
  def sampleBlocks(content: Array[Byte], blockSize: Int, everyK: Int): Seq[Array[Byte]] =
    content.grouped(blockSize).zipWithIndex
      .collect { case (block, i) if i % everyK == 0 => block }
      .toSeq
}
