package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the dedup / analysis / text
  * operators. All pure `org.apache.spark.sql.functions` compositions —
  * codegen'd, no UDFs (SURVEY.md §7.1: the scalar surface is built-in).
  */
object TextFunctions {

  /** Lowercased whitespace tokens, empties dropped (the reference's
    * WhitespaceAnalyzer default, `AbstractLuceneIndexingJob.java:79-80`). */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** Unicode NFC canonicalization (native codegen expression — see
    * [[graft.functions.expressions.NfcNormalize]]). */
  def nfc(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.NfcNormalize(
      ColumnBridge.expression(text)))
  }

  /** Content-defined chunk boundary positions (native expression — see
    * [[graft.functions.expressions.CdcBoundaries]]). */
  def cdcBoundaries(text: Column, w: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.CdcBoundaries(
      ColumnBridge.expression(text), w))
  }

  /** Distinct winnowing fingerprints of a normalized string (native
    * expression — see [[graft.functions.expressions.WinnowFps]]). */
  def winnowFps(text: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.WinnowFps(
      ColumnBridge.expression(text), k, w))
  }

  /** Distinct n-word shingles of a token array (n-gram units for
    * Jaccard/MinHash dedup). Empty when fewer than n tokens. */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))

  /** ALL n-word grams of a token array, multiplicity preserved (unlike
    * [[wordShingles]], which dedupes for set-Jaccard) — the unit of the
    * Gopher-style intra-document repetition filters, where how often a
    * gram repeats IS the signal. Empty when fewer than n tokens. */
  def wordNGrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Email/phone patterns shared by the PII scrubbing operator and its
    * oracle — deliberately dialect-neutral (no lookarounds, no anchors)
    * so Java regex and DuckDB's RE2 match byte-identically. */
  val EmailRe = "[a-z0-9.]+@[a-z0-9.]+\\.[a-z]+"
  val PhoneRe = "555-[0-9]{4}"

  /** PII-scrubbed text: emails then phones replaced with typed redaction
    * markers. Counts come from `regexp_count` on the same patterns. */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /** A stable 32-bit token hash both engines could reproduce: the first
    * 8 hex chars of md5, as a long in [0, 2^32). */
  def tokenHash32(tok: Column): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long")

  /** 60-bit md5-prefix digest as a positive long (15 hex chars < 63
    * bits) — the "q63 lesson" idiom: shrink a gram/row to 8 bytes
    * BEFORE it crosses a shuffle or broadcast instead of carrying the
    * 32-char hex string. Collision-safe for internal keying (p ≈
    * n²/2^61; deterministic, so a passing run always passes). */
  def digest60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** A stable 64-bit token hash: two md5 hex8 words combined. */
  def tokenHash64(tok: Column): Column =
    shiftleft(conv(substring(md5(tok), 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(md5(tok), 9, 8), 16, 10).cast("long"))

  /** Normalized-document fingerprint: md5 over the canonical token
    * stream (rolling-hash fingerprinting's moral equivalent with a
    * single stable digest; reference digest util `util/DigestUtil
    * .java:34-78`). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** How many tokens of `toks` appear in the marker vocabulary. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(markers.map(lit): _*), t)))
}
