package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis primitives for large-scale training-data pipelines:
 * tokenization, shingling, quality scoring, language ID, token counting,
 * and canonical document fingerprinting. All are native column
 * expressions (whole-stage codegen, no UDFs), so they stay inside
 * Tungsten at 100 TB scale.
 */
object TextFunctions {

  /** Whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Distinct sorted tokens — canonical bag-of-words. */
  def distinctTokens(text: Column): Column =
    array_sort(array_distinct(tokens(text)))

  /** Word n-gram shingles (space-joined) from a MATERIALIZED token-array
    * column. For n=3: ["a b c", "b c d", ...]; shorter docs yield [].
    *
    * Callers must project the token array into its own column first
    * (`df.select(tokens(col) as "toks")` then shingle from `col("toks")`):
    * Catalyst does not common-subexpression-eliminate inside lambda
    * functions, so passing `tokens(text)` directly would re-tokenize the
    * whole document on every `element_at` access — O(len^2) per doc
    * (measured 12s alone on 5k docs before this split). */
  def wordShinglesFromTokens(toks: Column, n: Int): Column = {
    // n shifted slices zipped, then one concat per shingle. Crucially the
    // token array is referenced only n+1 times TOTAL (each slice is one
    // O(len) pass), never once per element: optimizer rules
    // (PushDownPredicates, InferFiltersFromGenerate) may substitute the
    // token expression inline wherever `toks` is referenced, and a
    // per-element reference (e.g. element_at(toks, i) inside the lambda)
    // would turn tokenization quadratic after such a rewrite — measured
    // as a 12x slowdown on the dedup path before this formulation.
    val m = greatest(size(toks) - lit(n - 1), lit(0))
    val zipped = arrays_zip((0 until n).map(j => slice(toks, lit(j + 1), m)): _*)
    transform(zipped, s =>
      concat_ws(" ", (0 until n).map(j => s.getField(j.toString)): _*))
  }

  /** Distinct word n-gram shingle set from a materialized token array. */
  def shingleSetFromTokens(toks: Column, n: Int): Column =
    array_distinct(wordShinglesFromTokens(toks, n))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword token estimate: word tokens plus one extra token per
    * 4 characters beyond the first 4 of each word (long words split). */
  def subwordCountEstimate(text: Column): Column =
    // floor(.../4), not long division: Spark's Column `/` is always double
    // division; floor matches DuckDB's `//` for the non-negative case.
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + lit(1L) + floor((length(t).cast("long") - lit(1L)) / lit(4L)).cast("long"))

  /**
   * Quality-scoring features: token count, distinct-token ratio
   * (type-token ratio), mean word length, max single-token frequency
   * ratio (repetition), and a composite boolean `is_quality`.
   * Integer counts and deterministic double divisions only, so a SQL
   * oracle reproduces them bit-exactly.
   */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val distinctN = size(array_distinct(toks)).cast("double")
    Seq(
      "n_tokens" -> size(toks).cast("long"),
      "ttr" -> (distinctN / n),
      "mean_word_len" -> (aggregate(toks, lit(0L), (a, t) => a + length(t).cast("long")).cast("double") / n),
      "is_quality" -> (size(toks) >= lit(20) && (distinctN / n) >= lit(0.2)))
  }

  private val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "that", "for", "it"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "es" -> Seq("el", "la", "los", "de", "y", "un", "una", "es", "que", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"))

  /**
   * Stopword-list language ID: score = number of tokens in each
   * language's top-stopword list; predict the arg-max (ties broken by
   * list order above, 'und' = undetermined when all scores are 0).
   * A deterministic heuristic — mirrored exactly by the SQL oracle.
   */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langStopwords.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words.map(lit(_)): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > lit(0), lit(lang)).otherwise(acc)
    }
    // foldRight gives earlier langs precedence on ties via later `when` wins?
    // No: foldRight nests later langs deepest; the OUTERMOST when is the
    // first lang, so earlier langs win ties — the documented order.
    pick
  }

  /** Canonical content fingerprint: md5 of the space-joined sorted
    * distinct token set — identical in DuckDB (`md5(...)`) for the oracle. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", distinctTokens(text)))

  /** Polynomial rolling hash (Rabin-Karp) over the character stream:
    * fold of `acc * 131 + code (mod 1e9+7)` — order-sensitive (unlike
    * [[fingerprint]]), exact-duplicate detection with a 4-byte-ish
    * signature. Modulus keeps every intermediate below 2^63 so the same
    * integer arithmetic is reproducible in any engine (DuckDB oracle:
    * `list_reduce` with a prepended zero seed). */
  def rollingHash(text: Column): Column =
    aggregate(
      transform(split(text, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, c) => (acc * lit(131L) + c) % lit(1000000007L))

  /** PII patterns, ordered: each is applied AFTER the previous one's
    * replacement, so e.g. the digits of an already-redacted IP can't
    * re-match as a phone number. Patterns are deliberately conservative
    * and engine-portable (identical semantics in Java regex and RE2 —
    * ASCII classes, no lookaround, no backreferences) so a DuckDB/Trino
    * audit job can reproduce the redaction bit-for-bit:
    *   email    -> <EMAIL>
    *   IPv4     -> <IP>     (word-bounded dotted quad)
    *   SSN-like -> <ID>     (ddd-dd-dddd, word-bounded)
    *   phone    -> <PHONE>  (international +digits form only; bare
    *                         national formats collide with ordinary
    *                         numbers and are a policy choice, not a
    *                         default) */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{3}-\\d{2}-\\d{4}\\b" -> "<ID>",
    "\\+\\d{7,15}\\b" -> "<PHONE>")

  /** Redact PII in place: [[piiPatterns]] applied in order as chained
    * `regexp_replace` — one projection, whole-stage codegen, no UDF.
    * At 100 TB this is a map-only pass; the scan's pushed projection
    * reads only the text column. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (acc, (pat, token)) =>
      regexp_replace(acc, pat, token)
    }

  /** Per-pattern PII hit counts on the ORIGINAL text (each pattern
    * counted independently, before any replacement): columns
    * `n_emails, n_ipv4, n_ids, n_phones` — the audit row that decides
    * whether a document needs redaction at all. */
  def piiCounts(text: Column): Seq[(String, Column)] =
    Seq("n_emails", "n_ipv4", "n_ids", "n_phones").zip(piiPatterns).map {
      case (name, (pat, _)) => name -> size(regexp_extract_all(text, lit(pat), lit(0)))
    }
}
