package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave: one bit at a time, no magic numbers —
    * an independent formulation, so a mask/shift bug in the production
    * spread cannot cancel out.
    */
  private def zRef(x: Int, y: Int): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zValue matches the bit-loop reference on edge and pattern cases") {
    val cases = Seq(
      (0, 0), (1, 0), (0, 1), (3, 5), (65535, 0), (0, 65535),
      (65535, 65535), (0xAAAA, 0x5555), (0x5555, 0xAAAA),
      (12345, 54321), (256, 255), (70000, 3)) // >16-bit input is masked
    val got = cases.toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect()
    cases.zip(got).foreach { case ((x, y), z) =>
      assert(z == zRef(x & 0xFFFF, y & 0xFFFF), s"($x, $y): got $z")
    }
  }

  test("z-ordered files skip a 2-D box that a linear sort cannot") {
    // Full 256x256 grid, 64 files of 1024 rows each. Linear layout:
    // each file spans 4 x-values but ALL of y. Z layout: each file is
    // (approximately) one 32x32 Morton tile. The per-file [min, max]
    // overlap test below is exactly the footer statistic a parquet
    // scan prunes on.
    val grid = spark.range(65536)
      .select((col("id") % 256).cast("int").as("x"),
        (col("id") / 256).cast("int").as("y"))
    val dir = Files.createTempDirectory("zorder").toFile
    dir.deleteOnExit()
    val zPath = s"$dir/z"
    val linPath = s"$dir/lin"
    // Near-exact range boundaries for a deterministic statistic: the
    // default 100 samples/partition smears file edges across Morton
    // tiles by up to a file-width, which only blurs the measurement
    // (production layouts amortize boundary smear over thousands of
    // files; here there are 64).
    val sampleKey = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val prev = spark.conf.getOption(sampleKey)
    spark.conf.set(sampleKey, "2000")
    try {
      ZOrder.clusterWrite(grid, col("x"), col("y"), 64, zPath)
      grid.repartitionByRange(64, col("x"), col("y"))
        .sortWithinPartitions(col("x"), col("y"))
        .write.parquet(linPath)
    } finally {
      prev.fold(spark.conf.unset(sampleKey))(spark.conf.set(sampleKey, _))
    }

    def fileStats(path: String) = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("x").as("minx"), max("x").as("maxx"),
          min("y").as("miny"), max("y").as("maxy"))
        .cache()
      assert(stats.count() == 64)
      stats
    }
    def touched(stats: org.apache.spark.sql.DataFrame,
                cond: org.apache.spark.sql.Column): Long =
      stats.filter(cond).count()
    val z = fileStats(zPath)
    val lin = fileStats(linPath)
    val inX = col("maxx") >= 96 && col("minx") <= 127
    val inY = col("maxy") >= 96 && col("miny") <= 127

    // (a) 2-D box, 32x32 aligned = one Morton tile. Linear layout
    // touches every file whose ~4-wide x-slice intersects (its y range
    // is the full domain) → ~8; z touches the tile plus the straddlers
    // repartitionByRange's sampled split points smear it across.
    val z2d = touched(z, inX && inY)
    val lin2d = touched(lin, inX && inY)
    assert(lin2d >= 8, s"linear layout touched $lin2d files")
    assert(z2d <= 3, s"z layout touched $z2d files (expected ~1 tile)")

    // (b) the headline case — a filter on the SECOND column only. The
    // linear sort leaves every file's y range spanning the whole
    // domain: zero pruning, all 64 files read. Z-order keeps y
    // clustered too: only the row of tiles whose y-range intersects
    // (8 ideal, plus straddle) survives the footer check.
    val zY = touched(z, inY)
    val linY = touched(lin, inY)
    assert(linY == 64, s"linear layout should prune nothing, read $linY")
    assert(zY <= 16, s"z layout read $zY of 64 files on a y-only filter")
    z.unpersist(); lin.unpersist()
  }

  test("clusterWrite refuses an input that already has a __z column") {
    val df = spark.range(10).select(col("id").cast("int").as("x"),
      col("id").cast("int").as("y"), col("id").as("__z"))
    val e = intercept[IllegalArgumentException] {
      ZOrder.clusterWrite(df, col("x"), col("y"), 2, "/tmp/never-written")
    }
    assert(e.getMessage.contains("__z"))
  }

  test("clusterWrite round-trips the rows unchanged") {
    val grid = spark.range(1000)
      .select((col("id") % 40).cast("int").as("x"),
        (col("id") / 40).cast("int").as("y"))
    val dir = Files.createTempDirectory("zorder-rt").toFile
    dir.deleteOnExit()
    ZOrder.clusterWrite(grid, col("x"), col("y"), 8, s"$dir/out")
    val back = spark.read.parquet(s"$dir/out")
    assert(back.columns.toSet == Set("x", "y")) // helper column dropped
    assert(back.count() == 1000)
    assert(back.except(grid).isEmpty && grid.except(back).isEmpty)
  }
}
