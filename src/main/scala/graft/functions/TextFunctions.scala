package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines: language ID,
  * quality scoring, token counting, fingerprinting.
  *
  * All pure `Column` expressions (codegen'd, no UDFs), deliberately
  * engine-portable arithmetic so every function has an exact DuckDB oracle:
  * string ops + integer counts + per-row IEEE division only.
  */
object TextFunctions {

  /** Whitespace tokens. Documents are single-space separated; for general
    * text normalize whitespace first (see `normalize`). */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count via separator counting — O(n) single pass. */
  def tokenCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, " ", "")) + 1).cast("long")

  /** BPE-ish subword count: maximal alphabetic or numeric runs. */
  def wordRunCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+"), lit(0))).cast("long")

  /** Characters outside [a-z0-9 ] as a crude punctuation/noise count. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[a-z0-9 ]", "")).cast("long")

  /** Mean token length = (chars - separators) / tokens; per-row double
    * division, deterministic. */
  def meanTokenLen(text: Column): Column =
    (length(text) - (tokenCount(text) - 1)).cast("double") / tokenCount(text)

  // Marker stopwords per language for the n-gram-free heuristic language
  // ID. Tiny by design: the point is the distributed scoring shape, not
  // lexicon quality — swap in real frequency tables for production.
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "es" -> Seq("el", "la", "que", "de", "los"),
    "fr" -> Seq("le", "les", "et", "des", "une"))

  /** Count how many times any of `words` occurs as a whole token in a
    * pre-split token array. A token matches at most one marker word, so
    * one set-membership filter pass equals the per-word sum — token-exact
    * semantics, no substring/overlap edge cases. */
  def markerHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words))).cast("long")

  /** Heuristic language ID over a pre-split token array: argmax of
    * marker-word hits, ties broken by declaration order, no hits → 'und'.
    * Deterministic. Take tokens (not raw text) so callers hoist the split
    * into a projection — splitting inside would re-tokenize once per
    * language. */
  def langIdFromTokens(toks: Column): Column =
    langIdFromScores(langScores(toks))

  /** One (lang, hit-count) column per language — project these ONCE, then
    * feed the attributes to [[langIdFromScores]]: the argmax chain reads
    * each score ~3×, and the marker filter is a CodegenFallback
    * higher-order function, so inlining it into the chain multiplies
    * interpreted array scans per row. */
  def langScores(toks: Column): Seq[(String, Column)] =
    langMarkers.map { case (lang, words) => (lang, markerHits(toks, words)) }

  /** Argmax of the (already-projected) scores: ties break in declaration
    * order, no hits → 'und'. Pure scalar when-chain over the attributes. */
  def langIdFromScores(scored: Seq[(String, Column)]): Column = {
    val best = scored.map(_._2).reduce((a, b) => when(a >= b, a).otherwise(b))
    scored.foldRight(lit("und"): Column) { case ((lang, score), els) =>
      when(score > 0 && score === best, lit(lang)).otherwise(els)
    }
  }

  /** Convenience form over raw text (tokenizes per language — prefer
    * projecting `tokens(text)` once and using `langIdFromTokens`). */
  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  /** Composite quality score in [0,1]: rewards mid-length docs with low
    * punctuation noise and sane token lengths. Deterministic per-row
    * double arithmetic; thresholds are engine-portable integers. */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast("double")
    val lengthOk = when(n >= 100 && n <= 20000, lit(1.0)).otherwise(lit(0.5))
    val punctOk = lit(1.0) - least(punctCount(text).cast("double") / n * 10.0, lit(1.0))
    val tokOk = when(meanTokenLen(text) >= 3.0 && meanTokenLen(text) <= 10.0, lit(1.0))
      .otherwise(lit(0.5))
    (lengthOk * punctOk * tokOk)
  }

  /** Whitespace-normalized lowercase form. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** PII scrub: replace email addresses, long digit runs (phone/account
    * numbers), and IPv4 literals with typed placeholder tags. Patterns
    * deliberately stay in the regex subset Java and RE2 interpret
    * identically (no backreferences, no lookaround, explicit classes —
    * `[0-9]`, not `\d`), so a SQL engine running the same replacements
    * produces byte-identical output. Order matters and is fixed:
    * emails first (an address contains digit runs), then IPs (dotted
    * digits would otherwise be eaten by the digit-run rule), then runs.
    * Single codegen'd projection, no shuffle. */
  def redactPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
    val ipv4 = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
    val digitRun = "[0-9][0-9][0-9][0-9][0-9]+"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "<EMAIL>"),
        ipv4, "<IP>"),
      digitRun, "<NUM>")
  }

  /** Content fingerprint: md5 of the normalized text — the distributed
    * dedup key (exact duplicates collide, whitespace/case variants too). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Rolling (polynomial) document fingerprint over token hashes:
    * fp = fold(0, tokens)((acc, t) => (acc*131 + md5Hash56(t)) mod 2^47).
    * Order-sensitive (unlike `fingerprint`, which is content-set-style on
    * the normalized string) — reordered tokens change the value. All
    * intermediates stay < 2^57, so the arithmetic is exact in any engine
    * with 64-bit integers (no overflow wrap to depend on). One md5 per
    * token, sequential fold — single codegen'd pass. */
  def rollingFingerprint(text: Column): Column = {
    val mask = (1L << 47) - 1
    aggregate(
      transform(tokens(text), t => md5Hash56(t)),
      lit(0L),
      (acc, h) => (acc * lit(131L) + h).bitwiseAND(lit(mask)))
  }

  /** Distinct word n-gram shingle array (single-pass native expression —
    * see [[NGramShingles]] for semantics and the declarative equivalent). */
  def ngramArray(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}
    exprColumn(NGramShingles(columnExpr(text), n))
  }

  /** 56-bit stable hash of a string via md5 — engine-portable (DuckDB
    * computes the identical value from md5 hex arithmetic), unlike
    * xxhash64/murmur whose seeds differ across engines. Implemented as a
    * native single-digest-pass expression ([[Md5Hash56]]); value-equal to
    * `conv(substring(md5(c), 1, 14), 16, 10)`. */
  def md5Hash56(c: Column): Column = {
    import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}
    exprColumn(Md5Hash56(columnExpr(c)))
  }

  /** Unicode NFC canonicalization (run BEFORE content-hash dedup — see
    * [[NfcNormalize]]); oracle twin: DuckDB `nfc_normalize`. */
  def nfcNormalize(c: Column): Column = {
    import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}
    exprColumn(NfcNormalize(columnExpr(c)))
  }

  /** Deflate compression ratio — the Gopher-family repetition/noise
    * signal ([[CompressionRatio]]); engine-internal, spec-gated. */
  def compressionRatio(c: Column): Column = {
    import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}
    exprColumn(CompressionRatio(columnExpr(c)))
  }
}
