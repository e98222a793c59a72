package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Multimodal

/** Driver-contract queries + DuckDB oracles for the multimodal column
  * model (SURVEY.md §7.4). The oracle-checkable surface is the metadata
  * path (bytes, sniffing, checksums) — exactly the part that must be
  * column-prunable at 100 TB. The decode path (Multimodal.decodeFeatures)
  * is deterministic-stub-backed and covered by ScalaTest instead: DuckDB
  * cannot replicate a JVM codec, and a rows-only check would be weaker
  * than the unit test's exact expected vectors.
  */
object MultimodalQueries {

  /** r16 (VERDICT r15 #1): synthesized media fixtures are written ONCE
    * per (fixture dir, JVM) and re-read as parquet, so the gate rows
    * measure the operator under test (header parse / real DECODE) and
    * not per-pass fixture ENCODE — the same [[Materialize]] discipline
    * the source round-trip queries use. Fixture CONTENT is unchanged
    * (deterministic generators), so every mm hash is unchanged; the
    * isolated `mm_decode_jpeg` floor stops paying the ImageIO encode
    * half on every bench pass.
    */
  private def mediaOnce(s: SparkSession, dir: String, key: String)(
      gen: => DataFrame): DataFrame = {
    val out = Materialize.once(s"$key:$dir", dir) { p =>
      gen.write.mode("overwrite").parquet(p)
    }
    s.read.parquet(out)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata / magic-byte sniffing over the opaque content column.
    "mm_metadata" -> ((s, dir) =>
      Multimodal.metadata(Multimodal.fromDocuments(Tables.documents(s, dir)))),

    // Header-parse decode: real PNG/JPEG/GIF headers synthesized with
    // dims derived from doc columns, then parsed back by the native
    // media_dims expression (graft.functions.MediaDims — IHDR read,
    // JPEG segment walk to SOF, GIF screen descriptor). The oracle
    // reproduces the expected dimensions from the source columns, so a
    // wrong offset, endianness, or segment skip breaks the hash match.
    "mm_dims" -> ((s, dir) => {
      val mm = mediaOnce(s, dir, "mm_fixture_media")(
        Multimodal.fixtureMedia(Tables.documents(s, dir)))
      mm.select(col("id"), graft.functions.MediaDims(col("content")).as("d"))
        .select(col("id"), col("d.format").as("format"),
          col("d.width").cast("long").as("width"),
          col("d.height").cast("long").as("height"))
    }),

    // EXIF orientation (E283): real APP1/TIFF IFD walk over JPEGs that
    // alternate byte order (II/MM) and hide the 0x0112 tag behind a
    // decoy entry; every fifth doc carries no APP1 and must read 0.
    // The oracle reproduces the expected value from the generator
    // columns, so a wrong endianness branch, a skipped decoy, or a
    // mis-sized segment walk breaks the hash match.
    "mm_exif_orientation" -> ((s, dir) =>
      Multimodal.fixtureExifJpeg(Tables.documents(s, dir))
        .select(col("id"),
          graft.functions.ExifOrientation(col("content"))
            .as("orientation"))),

    // Audio header parse: real RIFF/WAVE fixtures (PCM fmt chunk behind
    // a junk LIST chunk, so fixed-offset parsers fail) parsed back by
    // the native audio_meta expression (graft.functions.AudioMeta —
    // little-endian chunk walk, duration from data bytes / byte rate in
    // exact long arithmetic). The oracle reproduces every field from
    // the source columns, so a wrong offset, endianness, alignment, or
    // rounding step breaks the hash match.
    "mm_audio_meta" -> ((s, dir) => {
      val mm = Multimodal.fixtureAudio(Tables.documents(s, dir))
      mm.select(col("id"), graft.functions.AudioMeta(col("content")).as("a"))
        .select(col("id"), col("a.codec").as("codec"),
          col("a.channels").cast("long").as("channels"),
          col("a.sample_rate").cast("long").as("sample_rate"),
          col("a.bits").cast("long").as("bits"),
          col("a.duration_ms").as("duration_ms"))
    }),

    // Deterministic frame sampling over opaque "video" bytes: every
    // 4th 64-byte block becomes one output row (id, frame_idx,
    // frame_md5). This is the demux plumbing a real pipeline needs —
    // pure byte arithmetic (offset explode + binary substring), narrow
    // except the explode, parallelism = the scan's. A real demuxer
    // replaces the block slicer; schema, partitioning, and row shape
    // stay put. The fixture text is ASCII, so the oracle's VARCHAR
    // offsets are byte-exact against Spark's binary ones.
    "mm_frame_sample" -> ((s, dir) => {
      val mm = Multimodal.fromDocuments(Tables.documents(s, dir))
      val frame = lit(64)
      mm.select(col("id"), col("content"),
          explode(sequence(lit(0),
            floor((greatest(col("meta.nBytes"), lit(1L)) - 1) / 64).cast("int"),
            lit(4))).as("frame_idx"))
        .select(col("id"), col("frame_idx"),
          md5(col("content").substr(col("frame_idx") * frame + 1, frame))
            .as("frame_md5"))
    }),

    // Video header parse: real ISO-BMFF (MP4) fixtures — ftyp brand,
    // junk free box, moov with BOTH mvhd layouts (v0 32-bit / v1
    // 64-bit times) and 1-2 trak boxes, mdat sometimes using the
    // size-0 to-EOF escape — parsed back by the native video_meta
    // expression (graft.functions.VideoMeta — big-endian box walk).
    // The oracle reproduces every field from the source columns, so a
    // wrong offset, a missed version branch, or a broken size escape
    // breaks the hash match.
    "mm_video_meta" -> ((s, dir) => {
      val mm = Multimodal.fixtureVideo(Tables.documents(s, dir))
      mm.select(col("id"), graft.functions.VideoMeta(col("content")).as("v"))
        .select(col("id"), col("v.brand").as("brand"),
          col("v.timescale").as("timescale"),
          col("v.duration_ms").as("duration_ms"),
          col("v.n_tracks").cast("long").as("n_tracks"))
    }),

    // Perceptual dHash per asset (E192): native one-pass codegen
    // expression (graft.functions.DHash32) — 32-cell byte-grid
    // downsample, floor-mean cells, 31 adjacent-gradient bits packed
    // into a long. The oracle recomputes the identical grid/gradient
    // arithmetic from ord() over the fixture bytes (ASCII, so VARCHAR
    // positions are byte-exact), so a wrong cell boundary, floor step,
    // or bit order breaks the hash match.
    "mm_phash" -> ((s, dir) =>
      Multimodal.fromDocuments(Tables.documents(s, dir))
        .select(col("id"), graft.functions.DHash32(col("content")).as("dhash"))),

    // Perceptual near-dup pairs at Hamming ≤ 3 (E192): the image-dedup
    // analogue of docs_simhash_pairs — same 4-chunk pigeonhole banding
    // (8-bit chunks over the 31-bit hash), hash-only shuffle, exact
    // verify on the candidate sliver. The oracle is exact all-pairs
    // Hamming, so banding must be pigeonhole-complete to match.
    "mm_phash_pairs" -> ((s, dir) => {
      val ph = Multimodal.fromDocuments(Tables.documents(s, dir))
        .select(col("id"), graft.functions.DHash32(col("content")).as("dhash"))
      graft.ext.Dedup.simhashPairs(ph, "id", "dhash", PhashMaxHamming, chunkBits = 8)
    }),

    // E313 (VERDICT r13 #3): perceptual dHash over REAL decoded
    // pixels — each document becomes an actual grayscale PNG (encoded
    // by the JDK's ImageIO writer, pixels planted by pure integer
    // arithmetic), the query DECODES it with the real codec
    // (javax.imageio, executor-side) into the luma stream, and the
    // same native DHash32 fingerprints the pixels. The oracle holds
    // no codec: it regenerates the planted pixel values from the
    // formula and replays the identical grid/gradient arithmetic —
    // so the hash match proves the encode→decode round trip recovered
    // every pixel exactly (PNG is lossless by spec). This retires the
    // byte-grid stand-in for images; video/audio payload decode stays
    // genuinely ungated (no demuxer/PCM codec in the JDK).
    // E323 (r15, VERDICT r14 #4): REAL JPEG decode, gated the E66
    // machine-checked-bound way. Each doc's planted pixel pattern is
    // pushed through the JDK's LOSSY JPEG writer; the row then (a)
    // recovers width/height EXACTLY via the real SOF segment walk
    // (MediaDims) — value-hash-matched against the oracle's formula,
    // (b) decodes the payload with javax.imageio and checks the
    // decoded luma's per-image MAE against the planted pixels stays
    // inside the spec'd band (≤ 10.0; measured max 8.80 at both SFs
    // over the sawtooth pattern, avg 5.87 — bit-exact luma is
    // impossible for a lossy codec, so the bound IS the contract),
    // and (c) proves the pixel COUNT matches the geometry. Remaining
    // ungated codecs after this row: video/audio PAYLOAD decode (no
    // demuxer/PCM codec ships in the JDK) — still header-parse +
    // documented stand-ins.
    "mm_decode_jpeg" -> ((s, dir) => {
      val jp = mediaOnce(s, dir, "mm_real_jpeg")(
        Multimodal.realJpegMedia(Tables.documents(s, dir)))
      val withDims = jp.select(col("id"),
        graft.functions.MediaDims(col("content")).as("d"),
        Multimodal.lumaInts(Multimodal.decodeLuma(col("content")))
          .as("luma"))
      val px = withDims.select(col("id"),
        col("d.width").cast("long").as("width"),
        col("d.height").cast("long").as("height"),
        size(col("luma")).cast("long").as("n_pix"),
        posexplode(col("luma")).as(Seq("p", "lb")))
      px.groupBy(col("id"), col("width"), col("height"), col("n_pix"))
        .agg(avg(abs(col("lb") -
          pmod(col("id") * 31 + col("p").cast("long") * 7, lit(256))))
          .as("mae"))
        .select(col("id"), col("width"), col("height"),
          (col("n_pix") === col("width") * col("height")).as("n_pix_ok"),
          (col("mae") <= JpegMaeBand).as("mae_ok"))
    }),

    "mm_phash_real" -> ((s, dir) =>
      mediaOnce(s, dir, "mm_real_png")(
        Multimodal.realPngMedia(Tables.documents(s, dir)))
        .select(col("id"),
          graft.functions.DHash32(Multimodal.decodeLuma(col("content")))
            .as("dhash"))),

    // E197: content-defined chunk table — every asset split at
    // rolling-hash boundaries (graft.functions.BinaryChunks, the
    // FastCDC/rsync family), one row per chunk with its exact length
    // and md5. The universe includes a deterministic prefix-shifted
    // copy of every 9th asset: content-defined boundaries RE-ALIGN
    // after the edit, so the shifted copies share most chunk hashes
    // with their originals — the property (pinned by BinaryChunksSpec)
    // that makes chunk-level dedup work where fixed-size blocks share
    // nothing. The oracle recomputes the rolling hash by direct
    // per-position window sums with the same base/modulus, so the
    // kernel's rolling update and modular-negative handling are
    // value-checked end to end.
    "mm_chunk_boundaries" -> ((s, dir) =>
      chunkTable(Tables.documents(s, dir))),

    // E197: corpus-level chunk-dedup accounting over the same chunk
    // table — unique/total chunk and byte counts plus the achieved
    // dedup ratio (what a binary-asset store would save): exact
    // integers from two tiny aggregations, one final division.
    "mm_chunk_dedup" -> ((s, dir) => {
      val ch = chunkTable(Tables.documents(s, dir))
      val tot = ch.agg(count(lit(1)).as("total_chunks"),
        sum(col("chunk_len")).as("total_bytes"))
      val uq = ch.groupBy("chunk_md5").agg(max(col("chunk_len")).as("l"))
        .agg(count(lit(1)).as("unique_chunks"), sum(col("l")).as("unique_bytes"))
      tot.crossJoin(uq)
        .select(col("total_chunks"), col("unique_chunks"),
          col("total_bytes"), col("unique_bytes"),
          (col("unique_bytes").cast("double") / col("total_bytes").cast("double"))
            .as("dedup_ratio"))
    }),

    // Content checksum + size: the dedup join key for binary assets
    // (the multimodal analogue of docs_dedup_exact).
    "mm_checksum_dedup" -> ((s, dir) => {
      val mm = Multimodal.fromDocuments(Tables.documents(s, dir))
      mm.groupBy(md5(col("content").cast("string")).as("checksum"),
          col("meta.nBytes").as("n_bytes"))
        .agg(min("id").as("id"), count(lit(1)).as("n_copies"))
        .select("id", "n_bytes", "n_copies")
    }))

  /** E323 per-image decoded-luma MAE band: measured max 8.80 (avg
    * 5.87) at both SFs over the planted sawtooth pattern through the
    * JDK JPEG writer at its default quality — 10.0 adds margin
    * without ever passing a broken decoder (junk decodes land ~85,
    * the uniform-expected-difference floor).
    */
  private val JpegMaeBand = 10.0

  /** Hamming radius for the perceptual near-dup tier (mm_phash_pairs);
    * < 4 so the 4-chunk pigeonhole banding is exhaustive.
    */
  val PhashMaxHamming = 3

  /** Chunk-dedup universe synthesis: every Mod-th asset gets a
    * prefix-shifted copy (id offset out of range) so boundary
    * re-alignment — the reason content-defined chunking exists — is
    * exercised and oracle-checked, not just asserted.
    */
  val ChunkShiftMod = 9
  val ChunkShiftOffset = 200000L
  val ChunkShiftPrefix = "XYZ "

  /** (id, chunk_idx, chunk_len, chunk_md5) over the base assets plus
    * the shifted copies. Chunk ends come from the native BinaryChunks
    * pass; starts are derived from the previous end (tiny per-row
    * array lookback, 0-based `get` so ANSI mode cannot throw).
    */
  private def chunkTable(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id").as("id"),
      encode(col("text"), "UTF-8").as("content"))
    val shifted = docs.filter(col("doc_id") % ChunkShiftMod === 0)
      .select((col("doc_id") + ChunkShiftOffset).as("id"),
        encode(concat(lit(ChunkShiftPrefix), col("text")), "UTF-8").as("content"))
    val withEnds = base.unionByName(shifted)
      .select(col("id"), col("content"),
        graft.functions.BinaryChunks(col("content")).as("ends"))
    withEnds
      .select(col("id"), col("content"), col("ends"),
        posexplode(col("ends")).as(Seq("chunk_idx", "e")))
      .withColumn("start",
        when(col("chunk_idx") === 0, lit(0))
          .otherwise(get(col("ends"), col("chunk_idx") - 1)))
      .select(col("id"), col("chunk_idx"),
        (col("e") - col("start")).as("chunk_len"),
        md5(col("content").substr(col("start") + 1, col("e") - col("start")))
          .as("chunk_md5"))
  }

  /** DHash32 recomputed in SQL from first principles: per-byte ord()
    * values (fixture text is ASCII ⇒ VARCHAR position = byte), 32-cell
    * grid by `(p * 32) // n`, floor-mean cell values, a full 0..31 cell
    * spine with empty cells scoring -1 (the kernel's total-order guard
    * for blobs shorter than the grid), gradient bit i = cell(i) >
    * cell(i+1), packed little-endian. Ends in CTE `ph(doc_id, dhash)`.
    */
  /** The 32-cell grid/gradient arithmetic shared by every dHash
    * oracle — parameterized by the `pos(doc_id, n, p, b)` byte source
    * so the text-byte and decoded-pixel variants replay ONE spec.
    */
  private val dhashGridTail: String =
    """agg AS (
      |  SELECT doc_id, (p * 32) // n AS cell,
      |         CAST(sum(b) // count(*) AS BIGINT) AS v
      |  FROM pos GROUP BY doc_id, (p * 32) // n),
      |spine AS (
      |  SELECT doc_id, CAST(g.cell AS BIGINT) AS cell
      |  FROM d, unnest(generate_series(0, 31)) AS g(cell)),
      |grid AS (
      |  SELECT s.doc_id, s.cell, coalesce(a.v, -1) AS v
      |  FROM spine s LEFT JOIN agg a
      |    ON a.doc_id = s.doc_id AND a.cell = s.cell),
      |bits AS (
      |  SELECT lo.doc_id, lo.cell AS i,
      |         CASE WHEN lo.v > hi.v THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      |  FROM grid lo JOIN grid hi
      |    ON lo.doc_id = hi.doc_id AND hi.cell = lo.cell + 1),
      |ph AS (
      |  SELECT doc_id,
      |         CAST(coalesce(sum(bit * (1::BIGINT << CAST(i AS INTEGER))), 0)
      |              AS BIGINT) AS dhash
      |  FROM bits GROUP BY doc_id)""".stripMargin

  private val phashCte: String =
    """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
      |pos AS (
      |  SELECT doc_id, n, CAST(t.i - 1 AS BIGINT) AS p,
      |         ord(substr(text, CAST(t.i AS INTEGER), 1)) AS b
      |  FROM d, unnest(generate_series(1, n)) AS t(i)),
      |""".stripMargin + dhashGridTail

  /** E313 oracle: the byte source is the PLANTED pixel formula
    * (id·31 + p·7) mod 256 over the (n_chars-derived) raster size —
    * no codec in DuckDB, so a hash match proves the Spark side's real
    * ImageIO decode recovered exactly these pixels.
    */
  private val phashRealCte: String =
    """WITH d AS (SELECT doc_id,
      |             (n_chars % 13 + 9) * (n_chars % 7 + 8) AS n
      |           FROM documents),
      |pos AS (
      |  SELECT doc_id, n, CAST(t.i - 1 AS BIGINT) AS p,
      |         (doc_id * 31 + (t.i - 1) * 7) % 256 AS b
      |  FROM d, unnest(generate_series(1, n)) AS t(i)),
      |""".stripMargin + dhashGridTail

  /** BinaryChunks recomputed in SQL from first principles: per-position
    * Karp-Rabin window hashes by DIRECT 16-term sums (b·Base^j with
    * precomputed power literals — an independent formulation from the
    * kernel's rolling add/evict update, so a mirrored modular-arithmetic
    * bug cannot cancel out), boundaries where hash % BoundaryDiv == 0,
    * the blob end appended, chunks rebuilt with lag/row_number. Ends in
    * CTE `chunks(id, chunk_idx, chunk_len, chunk_md5)`.
    */
  private val chunkCte: String = {
    import graft.functions.BinaryChunksImpl.{Base, Mod, Window, BoundaryDiv, MinChunk, MaxChunk}
    val powers = Iterator.iterate(1L)(p => p * Base % Mod)
      .take(Window).toSeq
    val cases = powers.zipWithIndex
      .map { case (pw, j) => s"WHEN $j THEN $pw" }
      .mkString(" ")
    s"""WITH u AS (
       |  SELECT doc_id AS id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + $ChunkShiftOffset, '$ChunkShiftPrefix' || text
       |  FROM documents WHERE doc_id % $ChunkShiftMod = 0),
       |d AS (SELECT id, text, length(text) AS n FROM u),
       |pos AS (
       |  SELECT id, n, CAST(t.i AS BIGINT) AS p,
       |         ord(substr(text, CAST(t.i AS INTEGER), 1)) AS b
       |  FROM d, unnest(generate_series(1, n)) AS t(i)),
       |win AS (
       |  SELECT x.id, x.p,
       |         CAST(sum(CAST(y.b AS BIGINT) * CASE x.p - y.p $cases END)
       |              % $Mod AS BIGINT)
       |           AS h
       |  FROM pos x JOIN pos y
       |    ON y.id = x.id AND y.p BETWEEN x.p - ${Window - 1} AND x.p
       |  WHERE x.p >= $Window GROUP BY x.id, x.p),
       |cand AS (
       |  SELECT id, p AS e,
       |         lag(p, 1, 0) OVER (PARTITION BY id ORDER BY p) AS pc
       |  FROM win WHERE h % $BoundaryDiv = 0),
       |acc AS (SELECT id, e FROM cand WHERE e - pc >= $MinChunk),
       |seg AS (
       |  SELECT s.id, s.e AS a,
       |         coalesce(lead(s.e) OVER (PARTITION BY s.id ORDER BY s.e),
       |                  CAST(d.n AS BIGINT)) AS nxt
       |  FROM (SELECT id, e FROM acc
       |        UNION ALL SELECT id, CAST(0 AS BIGINT) FROM d WHERE n > 0) s
       |  JOIN d ON d.id = s.id),
       |grid AS (
       |  SELECT id, CAST(t.g AS BIGINT) AS e
       |  FROM seg, unnest(generate_series(a + $MaxChunk, nxt - $MinChunk,
       |                                   $MaxChunk)) AS t(g)),
       |ends AS (SELECT DISTINCT id, e FROM (
       |  SELECT id, e FROM acc
       |  UNION ALL SELECT id, e FROM grid
       |  UNION ALL SELECT id, CAST(n AS BIGINT) FROM d WHERE n > 0)),
       |ch AS (
       |  SELECT id, e,
       |         lag(e, 1, 0) OVER (PARTITION BY id ORDER BY e) AS pe,
       |         row_number() OVER (PARTITION BY id ORDER BY e) - 1 AS ci
       |  FROM ends),
       |chunks AS (
       |  SELECT ch.id, CAST(ci AS INTEGER) AS chunk_idx,
       |         CAST(e - pe AS INTEGER) AS chunk_len,
       |         md5(substring(d.text, CAST(pe + 1 AS BIGINT),
       |                       CAST(e - pe AS BIGINT))) AS chunk_md5
       |  FROM ch JOIN d ON d.id = ch.id)""".stripMargin
  }

  /** Magic-prefix sniff as a CASE chain, generated from the same table
    * Multimodal.metadata folds over (first matching prefix wins).
    */
  private val sniffSql: String =
    Multimodal.MagicPrefixes
      .map { case (p, f) => s"WHEN starts_with(m, '$p') THEN '$f'" }
      .mkString("CASE ", " ", " ELSE 'unknown' END")

  val oracles: Map[String, String] = Map(
    "mm_metadata" ->
      s"""WITH mm AS (
         |  SELECT doc_id AS id,
         |         octet_length(encode(text)) AS n_bytes,
         |         substr(lower(hex(encode(substr(text, 1, 4)))), 1, 8) AS m,
         |         source AS claimed
         |  FROM documents)
         |SELECT id, n_bytes, m AS magic_hex, $sniffSql AS sniffed, claimed
         |FROM mm""".stripMargin,

    "mm_checksum_dedup" ->
      """SELECT min(doc_id) AS id, octet_length(encode(text)) AS n_bytes,
        |       count(*) AS n_copies
        |FROM documents GROUP BY md5(text), octet_length(encode(text))""".stripMargin,

    "mm_phash" -> s"$phashCte SELECT doc_id AS id, dhash FROM ph",

    "mm_phash_real" -> s"$phashRealCte SELECT doc_id AS id, dhash FROM ph",

    // E323: geometry from the formula the planted dims derive from;
    // the two fidelity booleans are machine-checked Spark-side (the
    // E66 bound pattern — DuckDB has no JPEG codec to replay).
    "mm_decode_jpeg" ->
      """SELECT doc_id AS id,
        |       CAST(n_chars % 13 + 9 AS BIGINT) AS width,
        |       CAST(n_chars % 7 + 8 AS BIGINT) AS height,
        |       true AS n_pix_ok, true AS mae_ok
        |FROM documents""".stripMargin,

    "mm_chunk_boundaries" ->
      s"$chunkCte SELECT id, chunk_idx, chunk_len, chunk_md5 FROM chunks",

    "mm_chunk_dedup" ->
      s"""$chunkCte,
         |tot AS (SELECT count(*) AS total_chunks,
         |               CAST(sum(chunk_len) AS BIGINT) AS total_bytes
         |        FROM chunks),
         |uq AS (SELECT count(*) AS unique_chunks,
         |              CAST(sum(l) AS BIGINT) AS unique_bytes
         |       FROM (SELECT max(chunk_len) AS l FROM chunks
         |             GROUP BY chunk_md5))
         |SELECT total_chunks, unique_chunks, total_bytes, unique_bytes,
         |       CAST(unique_bytes AS DOUBLE) / CAST(total_bytes AS DOUBLE)
         |         AS dedup_ratio
         |FROM tot, uq""".stripMargin,

    // Exact all-pairs Hamming over the same hash CTE — the banding is
    // pigeonhole-complete, so the LSH result must equal this exactly.
    "mm_phash_pairs" ->
      s"""$phashCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
         |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.dhash, b.dhash)) <= $PhashMaxHamming""".stripMargin,

    "mm_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id AS id, text,
        |         unnest(generate_series(0,
        |           CAST(floor((greatest(length(text), 1) - 1) / 64) AS BIGINT),
        |           4)) AS frame_idx
        |  FROM documents)
        |SELECT id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |       md5(substring(text, CAST(frame_idx * 64 + 1 AS BIGINT), 64))
        |         AS frame_md5
        |FROM f""".stripMargin,

    "mm_audio_meta" ->
      """SELECT doc_id AS id, 'pcm' AS codec,
        |       CAST(1 + doc_id % 2 AS BIGINT) AS channels,
        |       CAST(8000 * (1 + n_chars % 3) AS BIGINT) AS sample_rate,
        |       CAST(8 * (1 + n_chars % 2) AS BIGINT) AS bits,
        |       CAST((octet_length(encode(text)) * 1000)
        |            // (8000 * (1 + n_chars % 3) * (1 + doc_id % 2)
        |               * (1 + n_chars % 2)) AS BIGINT) AS duration_ms
        |FROM documents""".stripMargin,

    "mm_dims" ->
      """SELECT doc_id AS id,
        |       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png'
        |            WHEN 1 THEN 'jpeg' ELSE 'gif' END AS format,
        |       CAST(16 + n_chars % 317 AS BIGINT) AS width,
        |       CAST(16 + n_chars % 211 AS BIGINT) AS height
        |FROM documents""".stripMargin,

    "mm_exif_orientation" ->
      """SELECT doc_id AS id,
        |       CAST(CASE WHEN doc_id % 5 = 0 THEN 0
        |                 ELSE doc_id % 8 + 1 END AS INTEGER)
        |         AS orientation
        |FROM documents""".stripMargin,

    "mm_video_meta" ->
      """SELECT doc_id AS id,
        |       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'isom'
        |            WHEN 1 THEN 'mp41' ELSE 'mp42' END AS brand,
        |       CAST(600 * (1 + n_chars % 3) AS BIGINT) AS timescale,
        |       CAST((n_chars * 50 * 1000)
        |            // (600 * (1 + n_chars % 3)) AS BIGINT) AS duration_ms,
        |       CAST(1 + doc_id % 2 AS BIGINT) AS n_tracks
        |FROM documents""".stripMargin)
}
