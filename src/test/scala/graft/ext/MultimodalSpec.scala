package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Multimodal.{MmMeta, MmRecord}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val pngHeader = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a)
  private val jpegHeader = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)

  private def mmDf = Seq(
    MmRecord(1L, pngHeader ++ Array[Byte](1, 2, 3), MmMeta("png", 9, 0, 0)),
    MmRecord(2L, jpegHeader, MmMeta("jpeg", 4, 0, 0)),
    MmRecord(3L, "plain text".getBytes("UTF-8"), MmMeta("txt", 10, 0, 0))).toDF

  test("magic-byte sniffing recognizes known containers and claims") {
    val out = Multimodal.metadata(mmDf)
      .select("id", "sniffed", "claimed").as[(Long, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ("png", "png"))
    assert(out(2L) == ("jpeg", "jpeg"))
    assert(out(3L) == ("unknown", "txt")) // claimed format, sniff disagrees
  }

  test("metadata never exceeds 4 magic bytes and reports true sizes") {
    val out = Multimodal.metadata(mmDf).collect().map(r =>
      r.getAs[Long]("id") -> (r.getAs[String]("magic_hex"), r.getAs[Long]("n_bytes"))).toMap
    assert(out(1L)._1 == "89504e47" && out(1L)._2 == 9L)
    assert(out(2L)._1 == "ffd8ffe0" && out(2L)._2 == 4L)
  }

  test("stub codec is deterministic, unit-scaled, and 8-dimensional") {
    val bytes = Array.tabulate[Byte](256)(_.toByte)
    val f1 = Multimodal.StubCodec.features(bytes)
    val f2 = Multimodal.StubCodec.features(bytes)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 8)
    assert(f1.forall(v => v >= 0f && v <= 1f))
    // histogram buckets sum to 1
    assert(math.abs(f1.drop(2).sum - 1f) < 1e-6)
    assert(Multimodal.StubCodec.features(Array.empty).toSeq == Seq.fill(8)(0f))
  }

  test("decodeFeatures runs partition-wise over the Dataset with real schema") {
    val feats = Multimodal.decodeFeatures(spark, mmDf).collect()
    assert(feats.length == 3)
    assert(feats.forall(_.decoder == Multimodal.StubCodec.Name))
    assert(feats.forall(_.feature.length == 8))
    val byId = feats.map(f => f.id -> f).toMap
    assert(byId(3L).format == "txt")
  }

  test("fromDocuments builds the opaque-content schema from the fixture") {
    val mm = Multimodal.fromDocuments(graft.Tables.documents(spark, sfDir))
    val row = mm.filter(col("id") === 0L).collect().head
    val meta = row.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[Long]("nBytes") == row.getAs[Array[Byte]]("content").length.toLong)
  }

  test("sampleBlocks picks every k-th block deterministically") {
    val content = Array.tabulate[Byte](100)(_.toByte)
    val blocks = Multimodal.sampleBlocks(content, blockSize = 10, everyK = 3)
    assert(blocks.length == 4) // blocks 0,3,6,9
    assert(blocks.head.toSeq == content.slice(0, 10).toSeq)
    assert(blocks(1).toSeq == content.slice(30, 40).toSeq)
  }
}
