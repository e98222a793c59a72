package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Raw-web extraction tier (VERDICT r11 #2): HTML tag-strip + entity
  * decode + boilerplate-line filter — the CCNet/RefinedWeb/Dolma front
  * door. Every production corpus pipeline starts at markup, and until
  * this tier the engine's text surface started at clean text.
  *
  * The heuristic is the classic link-density line filter (jusText /
  * RefinedWeb family): a line whose anchor text makes up more than
  * half of its visible text is navigation/footer chrome, not content.
  * Pipeline per line, in order:
  *
  *  1. tag strip: every `<...>` run becomes one space (comments, void
  *     tags, attribute-laden openers — all match `<[^>]*>`);
  *  2. whitespace collapse + trim → the line's VISIBLE text;
  *  3. keep iff visible text is non-empty AND 2·|anchor text| ≤
  *     |visible text| (integer arithmetic — no float thresholds to
  *     drift between engines); anchor text is measured on the raw
  *     line (`<a ...>inner</a>` captures, concatenated);
  *  4. entity decode on kept lines — the named/numeric entities web
  *     text actually carries (`&lt; &gt; &quot; &#39; &nbsp;`), with
  *     `&amp;` decoded LAST so `&amp;lt;` correctly yields the
  *     literal string `&lt;` (single-pass HTML semantics).
  *
  * A document with no markup passes through byte-identical: the tag
  * regex matches nothing, collapse/trim are no-ops on single-spaced
  * text, and the line join restores the original (HtmlExtractSpec
  * pins this, plus hand-computed extractions).
  *
  * Scale shape: one narrow scan-side projection — split, per-line
  * regex, filter, join; no shuffle, no UDF, nothing leaves the scan
  * stage. The per-line work runs through `transform`/`filter` HOFs
  * (interpreted), but the cost is dominated by the regex engine
  * itself, which is identical either way; the alternative (explode +
  * groupBy(doc) re-assembly) would shuffle the whole corpus text to
  * rebuild documents the array already holds in order. Both engines
  * use the common Java∩RE2 regex subset, so the DuckDB oracle replays
  * the pipeline rule for rule.
  */
object HtmlExtract {

  /** Block-level strips that must run BEFORE the line split and tag
    * removal (VERDICT r12 #5): `<script>`/`<style>` PAYLOADS are code
    * the tag-strip tier would otherwise leak as visible text, and an
    * HTML comment can carry arbitrary markup-looking content. All
    * three patterns are dot-matches-newline (`(?s)`) and lazy, so a
    * block spanning physical lines collapses to one space — in the
    * Java∩RE2 subset both engines share (inline flags, non-greedy
    * quantifiers). Order: script → style → comment, identical in the
    * oracle.
    */
  val ScriptPattern = "(?is)<script[^>]*>.*?</script>"
  val StylePattern = "(?is)<style[^>]*>.*?</style>"
  val CommentPattern = "(?s)<!--.*?-->"

  /** Any tag run: opener, closer, comment remnant, attribute soup. */
  val TagPattern = "<[^>]*>"

  /** Anchor inner text: `<a ...>captured</a>` (no nested tags inside
    * the capture — a nested tag ends the `[^<]*` run, which only
    * UNDER-counts anchor text and therefore only keeps more lines).
    */
  val AnchorPattern = "<[Aa][^>]*>([^<]*)</[Aa]>"

  /** Entity decode order: specific entities first, `&amp;` LAST —
    * `&amp;lt;` must yield the literal `&lt;`, not `<`.
    */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Visible text of one line: tags → space, whitespace collapsed,
    * trimmed.
    */
  def visibleText(line: Column): Column =
    trim(regexp_replace(regexp_replace(line, TagPattern, " "), "\\s+", " "))

  /** Total anchor-text length of one raw line. */
  def anchorLen(line: Column): Column =
    length(array_join(
      regexp_extract_all(line, lit(AnchorPattern), lit(1)), ""))

  /** Literal entity decode, in [[Entities]] order. */
  def decodeEntities(s: Column): Column =
    Entities.foldLeft(s) { case (acc, (ent, ch)) =>
      replace(acc, lit(ent), lit(ch))
    }

  /** Keep rule: non-empty visible text, link density ≤ 1/2. */
  def keepLine(line: Column): Column = {
    val vis = visibleText(line)
    vis =!= "" && anchorLen(line) * lit(2) <= length(vis)
  }

  /** Script/style/comment blocks → one space, pre-split (see the
    * pattern docs above). A block that owned its own physical lines
    * leaves a single all-whitespace line the empty-vis rule drops.
    */
  def stripBlocks(html: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(html,
      ScriptPattern, " "), StylePattern, " "), CommentPattern, " ")

  /** Full extraction of an HTML (or plain-text) column. Returns
    * `struct(text_clean, lines, n_kept, n_dropped)`: kept lines'
    * decoded visible text re-joined with newlines, the SAME kept
    * lines as an array (so downstream line-level tiers — E236 —
    * consume the array directly instead of re-splitting text_clean,
    * which manufactured a phantom '' line for zero-kept docs;
    * ADVICE r12), and the line accounting.
    */
  def extract(html: Column): Column = {
    val lines = split(stripBlocks(html), "\n")
    val kept = filter(lines, l => keepLine(l))
    val clean = transform(kept, l => decodeEntities(visibleText(l)))
    struct(
      array_join(clean, "\n").as("text_clean"),
      clean.as("lines"),
      size(kept).cast("long").as("n_kept"),
      (size(lines) - size(kept)).cast("long").as("n_dropped"))
  }
}
