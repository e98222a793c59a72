package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (north-star extension,
  * SURVEY.md §7.4 — absent from the reference). Everything is Catalyst
  * built-ins (split / HOFs / regexp / md5): no UDFs, whole-stage
  * codegen end to end, and each function has an exact DuckDB analogue
  * for the correctness oracle.
  */
object TextOps {

  /** Whitespace tokens (single-space split — the fixture's separator). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokenizer: letter runs, digit runs, or single
    * non-space symbols — the usual pre-tokenization pass before a BPE
    * merge table is applied.
    */
  val BpeTokenPattern = "[a-z]+|[A-Z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeTokenPattern), lit(0))

  /** Stopword list used by the quality score (tiny, deliberate: the
    * fixture vocabulary is synthetic; the operator shape is what scales).
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Fraction of tokens that are stopwords (0 for empty docs). */
  def stopwordRatio(toks: Column): Column = {
    val hits = size(filter(toks, t => t.isInCollection(Stopwords)))
    when(size(toks) > 0, hits.cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Mean token length in characters (0 for empty docs). */
  def meanTokenLen(toks: Column): Column =
    when(size(toks) > 0,
      aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
      .otherwise(lit(0.0))

  /** Heuristic quality score in [0,1]: rewards mid-length docs and
    * penalizes stopword-free (keyword-stuffed) or stopword-only text.
    * The formula is arbitrary but deterministic — the point is the
    * *shape*: a single narrow projection, no shuffle, pushdown-safe.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val lenScore = least(size(toks).cast("double") / lit(50.0), lit(1.0))
    val swr = stopwordRatio(toks)
    val swScore = lit(1.0) - abs(swr - lit(0.1)) // ideal ~10% stopwords
    round(lenScore * swScore, 6)
  }

  /** Language-marker token sets for the n-gram/stopword lang-ID
    * heuristic. Ordered: ties resolve to the earliest entry.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "y", "que", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  /** Marker-hit count for one language. */
  def langScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  /** Predicted language: argmax of marker-hit counts, first-listed wins
    * ties (a real pipeline would use character n-gram profiles; the
    * operator shape — a handful of scored projections and a greatest —
    * is identical and is what the 100 TB path needs).
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangMarkers.map { case (lang, m) => lang -> langScore(toks, m) }
    val best = greatest(scores.map(_._2): _*)
    // first language reaching the max wins: fold in declared order
    scores.reverse.foldLeft(lit(LangMarkers.last._1)) { case (acc, (lang, s)) =>
      when(s === best, lit(lang)).otherwise(acc)
    }
  }

  /** Canonical text normalization for fingerprinting: lowercase, then
    * collapse every run of non-alphanumerics to a single space, trim.
    * Replacing (not deleting) punctuation keeps word boundaries:
    * "hello...world" must normalize like "hello world", not
    * "helloworld".
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Content fingerprint: 64-bit hex prefix of md5 over the normalized
    * text. Two docs that differ only in case/punct/whitespace collide —
    * the cheap first tier before MinHash ([[Dedup]]) at scale.
    */
  def fingerprint(text: Column): Column =
    substring(md5(normalize(text)), 1, 16)

  /** Unicode folding map for [[foldText]] (E238): accented latin
    * letters to their base letter, curly quotes / en- / em-dashes to
    * their ASCII forms, NBSP to space — the crawl-text variation a
    * tokenizer vocabulary should not have to learn twice. 1:1
    * codepoint pairs (translate semantics, identical in Spark and
    * DuckDB — both verified codepoint-based); the map is the
    * operator's published config, extended per corpus exactly like
    * [[Stopwords]] or [[LangMarkers]].
    */
  val FoldFrom: String =
    "ÀÁÂÄÈÉÊËÌÍÎÏÑÒÓÔÖÙÚÛÜàáâäçèéêëìíîïñòóôöùúûü‘’“”–— "
  val FoldTo: String =
    "AAAAEEEEIIIINOOOOUUUUaaaaceeeeiiiinoooouuuu''\"\"-- "
  require(FoldFrom.length == FoldTo.length, "fold map must be 1:1")

  /** Destructive-but-deterministic text canonicalization (E238) — the
    * normalization pass between HTML extraction and tokenization:
    * fold accents/typographic punctuation ([[FoldFrom]]→[[FoldTo]]),
    * lowercase, collapse whitespace, trim. Unlike [[normalize]] (the
    * fingerprint key, which DELETES punctuation structure), this is a
    * text REWRITE — punctuation survives in canonical form, so the
    * output is still trainable text. Pure codegen projection.
    */
  def foldText(text: Column): Column =
    trim(regexp_replace(lower(translate(text, FoldFrom, FoldTo)),
      "\\s+", " "))

  // -------------------------------------------------------------------
  // Structural content tagging (E245) — the Dolma-tagger shape
  // -------------------------------------------------------------------

  /** A line is code-shaped if the WHOLE line is consumed by either
    * alternative (one match per line, so `regexp_count` = line count):
    * leading 4-space indent / def / import / return / class / a bare
    * closing brace, OR any line ending in `;` or `{`. Deliberately the
    * Java∩RE2 dialect subset ((?m), non-capturing groups, literal
    * classes) so the DuckDB oracle runs the identical pattern.
    */
  val CodeLineRe: String =
    "(?m)^(?:(?:    |def |import |return |class |\\}).*|.*[;{])$"

  /** Bullet/enumeration list lines: `- `, `* `, or `1. ` prefixes.
    * Anchored at line start only — at most one match per line.
    */
  val BulletLineRe: String = "(?m)^(?:- |\\* |[0-9]+\\. )"

  /** Structural content tags for domain routing (the Dolma-style
    * tagger pass): appends (n_lines, code_frac, bullet_frac, tag) —
    * line counts by shape via ONE `regexp_count` per signal over the
    * raw text (no line explode, no HOF, pure codegen projection),
    * then a deterministic routing tag: code_frac ≥ 0.3 → 'code',
    * bullet_frac ≥ 0.5 → 'list', else 'prose' (thresholds compared
    * on the ROUNDED fractions so both engines decide identically).
    *
    * Built as LAYERED projections, not one expression tree: the tag
    * CASE references the fraction columns, which reference the count
    * columns — each regexp is a distinct multi-referenced non-cheap
    * alias, so CollapseProject cannot inline it into its consumers
    * and it evaluates ONCE per row (reusing one Column object in the
    * struct AND the CASE duplicated every regexp 2× — the exact shape
    * PlanAuditSpec's corpus-wide duplication audit exists to catch).
    */
  def contentTags(df: org.apache.spark.sql.DataFrame,
      text: Column): org.apache.spark.sql.DataFrame =
    df.select(col("*"),
        size(split(text, "\n")).cast("long").as("n_lines"),
        regexp_count(text, lit(CodeLineRe)).cast("double").as("cc_"),
        regexp_count(text, lit(BulletLineRe)).cast("double").as("bc_"))
      .select(col("*"),
        round(col("cc_") / col("n_lines"), 6).as("code_frac"),
        round(col("bc_") / col("n_lines"), 6).as("bullet_frac"))
      .select(col("*"),
        when(col("code_frac") >= lit(0.3), lit("code"))
          .when(col("bullet_frac") >= lit(0.5), lit("list"))
          .otherwise(lit("prose")).as("tag"))
      .drop("cc_", "bc_")
}
