package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline layer:
  * token counting, quality scoring, language-ID heuristic, fingerprinting.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs), so the whole pipeline stays inside WholeStageCodegen and
  * filters on the derived columns still push down. All functions are also
  * expressible as ANSI SQL (see graft.queries) so a DuckDB oracle can verify
  * them bit-for-bit.
  */
object TextFunctions {

  /** Whitespace-normalized, lowercased text — canonical form for hashing. */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Stable 128-bit document fingerprint over the canonical form. */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Whitespace tokens (the canonical tokenization for counts/shingles). */
  def tokens(c: Column): Column = split(normText(c), " ")

  def tokenCount(c: Column): Column =
    when(length(normText(c)) === 0, 0).otherwise(size(tokens(c)))

  /** A BPE-ish subword proxy: count of alnum runs + count of non-space,
    * non-alnum symbols (each symbol is its own token, like most BPE vocabs).
    */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Ratio of punctuation/symbol chars to total chars, rounded to 4 dp. */
  def punctRatio(c: Column): Column =
    round(
      length(regexp_replace(c, "[A-Za-z0-9\\s]", "")).cast("double") /
        greatest(length(c), lit(1)).cast("double"),
      4)

  /** Mean token length over whitespace tokens, rounded to 4 dp. */
  def meanTokenLen(c: Column): Column =
    round(
      length(regexp_replace(normText(c), " ", "")).cast("double") /
        greatest(tokenCount(c), lit(1)).cast("double"),
      4)

  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "from", "that", "this", "be")

  /** Fraction of tokens that are English stopwords, rounded to 4 dp. */
  def stopwordRatio(c: Column): Column = {
    val stop = array(stopwords.map(lit): _*)
    round(
      size(filter(tokens(c), t => array_contains(stop, t))).cast("double") /
        greatest(tokenCount(c), lit(1)).cast("double"),
      4)
  }

  /** Composite quality score in integer basis points (0..100000): length
    * signal ×5 + stopword signal ×3 + punctuation penalty ×2. Integer
    * arithmetic end-to-end (the 4-dp ratio inputs are scaled to exact ints),
    * so no engine ever hits a float round-half boundary.
    */
  def qualityScoreBp(c: Column): Column = {
    val ai = least(tokenCount(c).cast("bigint") * 100, lit(10000L))
    val bi = least(round(stopwordRatio(c) * 50000, 0).cast("bigint"), lit(10000L))
    val ci = lit(10000L) - least(round(punctRatio(c) * 100000, 0).cast("bigint"), lit(10000L))
    (ai * 5 + bi * 3 + ci * 2).cast("bigint")
  }

  /** Language-ID marker words per language (n-gram/stopword heuristic).
    * Scores are counts of whole-token marker matches; argmax wins, ties
    * broken by language code order. Deterministic and SQL-replicable.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein"),
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in"),
    "es" -> Seq("el", "la", "los", "que", "y", "es", "un"),
    "fr" -> Seq("le", "la", "les", "et", "que", "est", "un"),
    "zh" -> Seq("de", "shi", "le", "wo", "ni", "ta", "zai"))

  def langScore(c: Column, markers: Seq[String]): Column = {
    val set = array(markers.map(lit): _*)
    size(filter(tokens(c), t => array_contains(set, t)))
  }

  /** Predicted language: argmax of marker counts, first-wins on ties. */
  def langId(c: Column): Column = {
    val scored = langMarkers.map { case (code, markers) =>
      struct(langScore(c, markers).as("score"), lit(code).as("code"))
    }
    // array_max on struct(score, code): max score, then max code — to get
    // first-wins-on-ties we compare against reversed code order.
    val best = langMarkers.map { case (code, markers) =>
      (code, langScore(c, markers))
    }
    best.tail.foldLeft(struct(best.head._2.as("s"), lit(best.head._1).as("c"))) {
      case (acc, (code, score)) =>
        struct(
          when(score > acc.getField("s"), score).otherwise(acc.getField("s")).as("s"),
          when(score > acc.getField("s"), lit(code)).otherwise(acc.getField("c")).as("c"))
    }.getField("c")
  }

  /** Word n-gram shingles of the canonical tokens, space-joined.
    *
    * Built from `zip_with` over shifted copies of the token array rather
    * than a `transform(sequence(...))` lambda: any column referenced INSIDE
    * a higher-order-function lambda is re-evaluated per element (the regex
    * tokenization would run O(tokens) times per row); `zip_with` arguments
    * are evaluated once. `concat` (not concat_ws) propagates the nulls that
    * zip_with pads at the tail, which the final filter drops.
    */
  def shingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    val len = size(toks)
    var acc: Column = toks
    for (k <- 1 until n)
      acc = zip_with(acc, slice(toks, lit(k + 1), greatest(len - k, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    array_distinct(filter(acc, x => x.isNotNull))
  }

  /** O(n) codegen'd polynomial rolling hashes over every `window`-char
    * substring (see [[RollingHash]]) — the winnowing / content-defined-
    * chunking kernel, value-identical to the O(n·w) HOF re-fold form.
    */
  def rollingHashes(c: Column, window: Int, base: Long, mod: Long): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(
      RollingHash(GraftShims.expression(c), window, base, mod))
  }
}
