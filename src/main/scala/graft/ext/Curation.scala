package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus curation operators for training-data pipelines (north-star
  * extension, SURVEY.md §7.4 — absent from the reference): deterministic
  * sampling, train/val/test splitting, domain (source) mixing by token
  * budget, and PII redaction.
  *
  * Sampling determinism is the load-bearing design point. A 100 TB
  * pipeline cannot use `rand()` — retries and re-runs must select the
  * SAME rows, and the selection must be reproducible from the record key
  * alone so downstream stages (and the DuckDB oracle) can replay it.
  * Every operator here derives its randomness from [[hashBucket]]: the
  * first 4 hex digits of `md5(salt ‖ key)` read as an integer in
  * [0, 65536). md5 (not xxhash64) is deliberate: both engines produce
  * identical digests, which makes the selection *cross-engine*
  * reproducible; the per-row cost is one digest of a short key string —
  * measured ~60× slower than xxhash64 per call, but on keys (not
  * payloads) and embarrassingly parallel. A Spark-only deployment can
  * swap `xxhash64(salt, key) & 0xffff` in one place for the fast path.
  *
  * Every operator is a narrow projection + filter (sampling, split) or
  * adds one O(groups) broadcast join (mixing) — nothing shuffles the
  * corpus.
  */
object Curation {

  /** Buckets in the hash domain: 4 hex digits. */
  val HashBuckets = 65536

  /** Deterministic uniform bucket in [0, 65536): the first 4 hex digits
    * of md5(salt ‖ key). The salt decorrelates independent draws over
    * the same keys (sampling vs splitting must not correlate — a doc
    * sampled *because* its hash is low must not thereby land in "test").
    */
  def hashBucket(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 4), 16, 10)
      .cast("long")

  /** [[hashBucket]] as a double fraction in [0, 1). */
  def hashFraction(key: Column, salt: String): Column =
    hashBucket(key, salt).cast("double") / lit(HashBuckets.toDouble)

  /** Poisson(1) inverse-CDF thresholds over the 16-bit [[hashBucket]]
    * space: entry i is exactly floor(P(X ≤ i)·65536) in IEEE-double
    * arithmetic (cdf += e⁻¹/i!, verified digit-for-digit), weight =
    * the first index whose threshold exceeds the hash (else
    * [[PoissonThresholds]].size = 8, the capped overflow weight).
    * INTEGER literals, so both engines derive the identical weight —
    * no e⁻¹ rounding to reconcile; the oracle CASE chain is GENERATED
    * from this very sequence, so the two engines cannot drift.
    * Truncation at 8 discards < 1.2e−6 of Poisson mass.
    */
  val PoissonThresholds: Seq[Long] =
    Seq(24109L, 48218L, 60273L, 64291L, 65296L, 65497L, 65530L, 65535L)

  /** Deterministic Poisson(1) bootstrap weight for (key, replicate)
    * (E292, the one-pass "Poisson bootstrap" of Chamandy et al. /
    * Kleiner et al.'s resampling-without-rescanning idea): the row's
    * multiplicity in replicate `rep` is a pure function of
    * md5(salt ‖ key:rep) — same weight on any engine, any partitioning,
    * any retry, replayable by the oracle. E[w] ≈ 1, so each replicate
    * is a resample of ≈N rows computed WITHOUT materializing any
    * resample: one exploded pass, B partial-aggregated group cells.
    */
  def bootstrapWeight(key: Column, rep: Column, salt: String): Column = {
    val h = hashBucket(concat_ws(":", key, rep), salt)
    PoissonThresholds.zipWithIndex.foldRight(
      lit(PoissonThresholds.size.toLong)) { case ((t, i), els) =>
      when(h < t, lit(i.toLong)).otherwise(els)
    }
  }

  /** Deterministic Bernoulli(p) sample: keep rows whose bucket falls
    * below ⌊p·65536⌋. Same key + salt + p ⇒ same sample, on any engine,
    * any partitioning, any retry.
    */
  def sampleBernoulli(df: DataFrame, key: Column, p: Double, salt: String): DataFrame = {
    require(p >= 0 && p <= 1, s"fraction out of range: $p")
    df.filter(hashBucket(key, salt) < math.floor(p * HashBuckets).toLong)
  }

  /** Deterministic stratified sampling: per-group keep fractions (with
    * a default for unlisted groups), same hash-bucket mechanism as
    * [[sampleBernoulli]] — so the stratum thresholds fold into one
    * codegen'd `when` chain and the selection stays engine- and
    * run-reproducible. The standard rebalancing move when one stratum
    * (language, source, domain) dwarfs the rest.
    */
  def sampleStratified(df: DataFrame, key: Column, group: Column,
                       fractions: Map[String, Double], default: Double,
                       salt: String): DataFrame = {
    (fractions.values.toSeq :+ default).foreach(p =>
      require(p >= 0 && p <= 1, s"fraction out of range: $p"))
    val thr = fractions.foldLeft(lit(math.floor(default * HashBuckets).toLong)) {
      case (acc, (g, p)) =>
        when(group === lit(g), lit(math.floor(p * HashBuckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(key, salt) < thr)
  }

  /** Deterministic train/val/test assignment from disjoint bucket
    * ranges: [0, test) → "test", [test, test+val) → "val", rest →
    * "train". Keys are stable across runs, so examples never migrate
    * between splits as the corpus grows — the property that prevents
    * train/test contamination across dataset versions.
    */
  /** Deterministic weighted sampling without replacement (Efraimidis &
    * Spirakis '06): each row gets key u^(1/w) with u derived from the
    * same md5 bucket as [[sampleBernoulli]] (shifted to (0,1] so zero
    * weight-independence cannot occur), and the k largest keys win —
    * heavier rows proportionally more often, same sample on any
    * engine/partitioning/retry. Selection is a global top-k
    * (TakeOrderedAndProject: per-partition heaps, never a full sort).
    * Ties (same bucket AND same weight) break on the key column, which
    * both engines order identically.
    */
  def sampleWeighted(df: DataFrame, key: Column, weight: Column, k: Int,
                     salt: String): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val u = (hashBucket(key, salt) + 1).cast("double") / lit(HashBuckets.toDouble)
    val esKey = pow(u, lit(1.0) / greatest(weight.cast("double"), lit(1.0)))
    df.withColumn("es_key", esKey)
      .orderBy(col("es_key").desc, key)
      .limit(k)
      .drop("es_key")
  }

  def assignSplit(key: Column, testP: Double, valP: Double, salt: String): Column = {
    require(testP >= 0 && valP >= 0 && testP + valP <= 1, "split fractions invalid")
    val b = hashBucket(key, salt)
    val t1 = math.floor(testP * HashBuckets).toLong
    val t2 = math.floor((testP + valP) * HashBuckets).toLong
    when(b < t1, lit("test")).when(b < t2, lit("val")).otherwise(lit("train"))
  }

  /** Domain mixing by weight budget: downsample every group to the
    * smallest group's total weight (tokens, bytes — any per-row weight),
    * the equal-budget special case of the target-proportion mixing an
    * LLM data pipeline runs. Each row is kept with probability
    * `min_total / group_total` via [[hashFraction]] — deterministic, so
    * the mix is reproducible row-for-row.
    *
    * Group totals are collected to the driver: O(distinct groups) rows
    * (domains/sources — tens to thousands), the same bounded-scalar
    * pattern as [[Similarity.kmeansIterated]]'s centroid fold. The
    * corpus itself is scanned once — totals pass + filter pass read the
    * same scan; at 100 TB persist `df` (or precompute totals in the
    * catalog) so the two passes share IO. Expected kept weight per group
    * ≈ the min group's total; exact counts vary by hash luck, never by
    * run.
    *
    * @param weight non-negative per-row weight expression
    */
  def weightBudgetMix(df: DataFrame, group: Column, weight: Column,
                      key: Column, salt: String): DataFrame = {
    val totals = df.select(group.as("grp"), weight.as("w"))
      .groupBy("grp").agg(sum(col("w").cast("long")).as("tw"))
      .collect()
      .map(r => (r.get(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
    require(totals.nonEmpty, "empty input: no groups to mix")
    // degenerate groups fail fast rather than silently emptying the
    // mix: a NULL group key can never match the when-chain below (its
    // rows would be dropped while still setting the budget), and a
    // zero/NULL-weight group would set minTotal = 0, filtering out
    // every row of every group
    require(totals.forall(_._1 != null),
      "weightBudgetMix: NULL group key — filter or fill group values first")
    require(totals.forall(_._2 > 0),
      s"weightBudgetMix: group(s) with zero/NULL total weight: " +
        totals.filter(_._2 <= 0).map(_._1).mkString(", "))
    val minTotal = totals.map(_._2).min.toDouble
    // ratio folds in as a literal per group: the keep test is a pure
    // narrow filter, no join at all
    val ratio = totals.foldLeft(lit(null).cast("double")) {
      case (acc, (g, tw)) =>
        when(group === lit(g), lit(minTotal / tw)).otherwise(acc)
    }
    df.filter(hashFraction(key, salt) < ratio)
  }

  /** PII redaction patterns, applied in order. Java and RE2 dialects
    * agree on this subset (char classes, bounded reps, alternation —
    * no backrefs/lookaround), so the same patterns run on Spark and any
    * RE2-based engine.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    // emails before number runs: an email's digits must not be half-eaten
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    // phone-ish: separator-grouped digit runs (one separator mandatory,
    // so bare digit runs fall through to the <NUM> rule below)
    "\\+?[0-9]{1,3}[ .-]?\\(?[0-9]{2,4}\\)?[ .-][0-9]{3,4}([ .-][0-9]{2,4})?" -> "<PHONE>",
    // bare long digit runs (account numbers, SSN-ish)
    "[0-9]{6,}" -> "<NUM>")

  /** Redact PII in-place: sequential `regexp_replace` passes, all
    * codegen'd, no UDF. The fixture corpus contains no PII-shaped
    * strings (verified by [[CurationSpec]]'s planted-input tests), so
    * this op is unit-tested rather than oracle-checked.
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Luhn mod-10 sum over a digit string (E281): from the RIGHTMOST
    * digit, every second digit doubles (minus 9 when that exceeds 9).
    * `offset` shifts the doubling parity — 0 validates a complete
    * number, 1 computes the sum of a prefix whose check digit is about
    * to be appended (the append shifts every prefix digit one position
    * left). The 16-element HOF fold is audit-tier arithmetic, not a
    * hot-path kernel.
    */
  def luhnSum(digits: Column, offset: Int): Column =
    aggregate(sequence(lit(1), length(digits)), lit(0), (acc, i) => {
      val d = element_at(split(reverse(digits), ""), i).cast("int")
      acc + when((i + offset) % 2 === 0,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })

  /** True iff `digits` passes the Luhn checksum — the validation that
    * separates a card number from any other 16-digit run, i.e. the
    * false-positive killer the regex tier (<NUM>) cannot provide.
    */
  def luhnValid(digits: Column): Column = luhnSum(digits, 0) % 10 === 0

  /** The check digit that makes `prefix ++ digit` Luhn-valid. */
  def luhnCheckDigit(prefix: Column): Column =
    (lit(10) - luhnSum(prefix, 1) % 10) % 10

  /** URL canonicalization — the first step of crawl dedup (two fetches
    * of one page must collapse BEFORE content dedup ever runs):
    * lowercase scheme+host, strip default ports (:80/:443), drop the
    * fragment, drop `utm_*` tracking params (other params kept in
    * order), collapse trailing path slashes (bare host → "/"). Pure
    * regex/array built-ins — codegen, no UDF — restricted to the
    * Java∩RE2 dialect subset so the DuckDB oracle replays it verbatim.
    * Path case is preserved (paths are case-sensitive per RFC 3986;
    * only scheme and authority fold).
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport =
      lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    // Default-port stripping is SCHEME-AWARE: https-on-:80 (or
    // http-on-:443) is a genuinely different origin and must survive —
    // only the scheme's own default port is redundant.
    val host = when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .otherwise(hostport)
    val rawPath =
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val stripped = regexp_replace(rawPath, "/+$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val keptQ = array_join(
      filter(split(query, "&"), p => !p.startsWith("utm_")), "&")
    concat(scheme, lit("://"), host, path,
      when(keptQ === "", lit("")).otherwise(concat(lit("?"), keptQ)))
  }

  /** Registered-domain-ish suffix of a canonical URL's host (last two
    * labels) — the grouping key for per-site crawl budgets and
    * domain-mix curation. A non-default `:port` (which canonicalUrl
    * deliberately preserves — it is a distinct origin) is NOT part of
    * the site: `https://a.com:8080` and `https://a.com` must land in
    * the same per-site budget group, so the port is excluded here
    * (ADVICE r04).
    */
  def urlDomain(canonical: Column): Column =
    regexp_extract(canonical,
      "://(?:[^/?#:]*\\.)?([^./?#:]+\\.[^./?#:]+)(?::[0-9]+)?(?:[/?#]|$)", 1)

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling", simplified to
    * unigram bag LMs): per document, the mean log-likelihood RATIO of
    * its tokens under a target-domain LM vs the raw-corpus LM, both
    * add-one smoothed over the raw corpus' vocabulary. Positive weight
    * = "looks more like the target domain than the average crawl" —
    * the principled replacement for hand-written quality gates when a
    * trusted target corpus exists.
    *
    * Scale shape: two vocabulary-sized count aggregations (target
    * counts left-joined onto raw vocabulary so OOV-in-target gets the
    * smoothing floor), a 1-row totals broadcast, and one token→vocab
    * equi-join for scoring — the same plan skeleton as the unigram
    * perplexity tier (E115), with the ratio computed in one projection.
    *
    * `isTarget` is any row predicate over `docs` (a trusted source, a
    * labeled subset); weights are deterministic exact-count arithmetic,
    * rounded at 6dp after the per-doc mean.
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"), isTarget.as("tgt"),
      explode(split(col(textCol), " ")).as("w"))
    val raw = tok.groupBy("w").agg(count(lit(1)).as("cr"))
    val tgt = tok.filter(col("tgt")).groupBy("w").agg(count(lit(1)).as("ct"))
    val lm = raw.join(tgt, Seq("w"), "left_outer")
      .select(col("w"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
    val tots = lm.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"),
      count(lit(1)).as("v"))
    tok.join(lm, "w")
      .crossJoin(broadcast(tots)) // 1-row model-size attach
      .select(col("doc_id"),
        (log((col("ct") + lit(1L)).cast("double") /
            (col("tt") + col("v")).cast("double")) -
          log((col("cr") + lit(1L)).cast("double") /
            (col("tr") + col("v")).cast("double"))).as("lr"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("lr")), 6).as("dsir_weight"))
  }
}
