package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** E313: the real image-decode tier. PNG round trips must be
  * PIXEL-EXACT (lossless by spec — that is what lets the codec-free
  * DuckDB oracle gate the decode), JPEG decodes must recover the
  * geometry and approximate the signal (lossy by spec — measured, not
  * hash-gated), and junk bytes must surface as null, not a crash.
  */
class ImageDecodeSpec extends SparkSpec {
  import spark.implicits._

  test("PNG encode→ImageIO decode recovers the planted pixels exactly") {
    val docs = Seq((7L, 100L), (8L, 101L), (9L, 205L))
      .toDF("doc_id", "n_chars")
    val got = Multimodal.realPngMedia(docs)
      .select(col("id"), Multimodal.decodeLuma(col("content")).as("luma"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    for ((id, nChars) <- Seq((7L, 100L), (8L, 101L), (9L, 205L))) {
      val (w, h) = Multimodal.plantedDims(nChars)
      val want = (0 until w * h)
        .map(p => Multimodal.plantedPixel(id, p.toLong).toByte).toArray
      assert(got(id) !== null, s"asset $id failed to decode")
      assert(got(id).toSeq === want.toSeq,
        s"asset $id: decoded luma drifted from the planted formula")
    }
  }

  test("mm_phash_real equals DHash32 over the planted pixel stream " +
      "(codec-free recompute, the oracle's derivation)") {
    val got = graft.queries.MultimodalQueries
      .queries("mm_phash_real")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
    assert(got.size === docs.length)
    docs.foreach { r =>
      val (id, nChars) = (r.getLong(0), r.getLong(1))
      val (w, h) = Multimodal.plantedDims(nChars)
      val bytes = (0 until w * h)
        .map(p => Multimodal.plantedPixel(id, p.toLong).toByte).toArray
      assert(got(id) === graft.functions.DHashImpl.dhash(bytes),
        s"asset $id: real-decode dhash drifted")
    }
  }

  test("JPEG decode recovers geometry exactly and the signal " +
      "approximately (lossy by spec, so measured, not hash-gated)") {
    val (w, h) = (24, 16)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 8 + y * 3) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val luma = Seq(Tuple1(bos.toByteArray)).toDF("content")
      .select(Multimodal.decodeLuma(col("content")).as("l"))
      .head().getAs[Array[Byte]](0)
    assert(luma !== null, "JPEG failed to decode")
    assert(luma.length === w * h, "JPEG decode changed the geometry")
    val mae = (0 until w * h).map { p =>
      val want = ((p % w) * 8 + (p / w) * 3) % 256
      math.abs((luma(p) & 0xff) - want)
    }.sum.toDouble / (w * h)
    assert(mae < 8.0, s"JPEG round-trip MAE $mae — decoder is broken, " +
      "not merely lossy")
  }

  test("mm_decode_jpeg: geometry exact per formula, every per-image " +
      "MAE inside the spec'd band (E323)") {
    val rows = graft.queries.MultimodalQueries
      .queries("mm_decode_jpeg")(spark, sfDir).collect()
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length === docs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("id")
      val (w, h) = Multimodal.plantedDims(docs(id))
      assert(r.getAs[Long]("width") === w.toLong, s"asset $id width")
      assert(r.getAs[Long]("height") === h.toLong, s"asset $id height")
      assert(r.getAs[Boolean]("n_pix_ok"), s"asset $id pixel count")
      assert(r.getAs[Boolean]("mae_ok"), s"asset $id MAE out of band")
    }
  }

  test("junk bytes decode to null (and DHash32 to null), not a crash") {
    val junk = Seq(
      Tuple1(Array[Byte](1, 2, 3, 4)),
      Tuple1(Array.empty[Byte]),
      Tuple1(null: Array[Byte])).toDF("content")
    val rows = junk.select(
      Multimodal.decodeLuma(col("content")).as("l"),
      graft.functions.DHash32(Multimodal.decodeLuma(col("content")))
        .as("d")).collect()
    assert(rows.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }
}
