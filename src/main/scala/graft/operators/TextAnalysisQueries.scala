package graft.operators

import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents`: token counting, quality
  * stats, marker-based language ID, and document fingerprinting — the
  * per-document scoring surface of a training-data pipeline, all
  * integer/digest outputs so the oracle compare is exact.
  */
object TextAnalysisQueries extends QueryModule {

  private val EnMarkers = Seq("the", "a")

  /** Token/quality statistics (counts only — no float ratios, exact
    * across engines; ratios are a trivial projection downstream). */
  private def q31TokenStats(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_uniq"),
      array_max(transform(toks, t => length(t))).as("max_tok_len"),
      TextFunctions.markerCount(toks, EnMarkers).as("n_stopwords"))
  }

  private val q31Sql =
    """WITH t AS (
      |  SELECT doc_id,
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0) AS tk
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(LEN(tk) AS INT) AS n_tokens,
      |  CAST(LEN(LIST_DISTINCT(tk)) AS INT) AS n_uniq,
      |  CAST(LIST_MAX(LIST_TRANSFORM(tk, x -> LEN(x))) AS INT) AS max_tok_len,
      |  CAST(LEN(LIST_FILTER(tk, x -> x IN ('the', 'a'))) AS INT) AS n_stopwords
      |FROM t""".stripMargin

  /** Marker-based language ID (the SQL-expressible classifier; the
    * richer char-n-gram profile classifier lives in `text/LangId.scala`
    * (train + classify, `LangIdSpec`) — trained profiles aren't
    * expressible as one SQL oracle). */
  private def q32LangId(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      col("lang"),
      when(TextFunctions.markerCount(toks, EnMarkers) >= 1, lit("en"))
        .otherwise(lit("und")).as("predicted"))
  }

  private val q32Sql =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0) AS tk
      |  FROM documents)
      |SELECT doc_id, lang,
      |  CASE WHEN LEN(LIST_FILTER(tk, x -> x IN ('the', 'a'))) >= 1
      |       THEN 'en' ELSE 'und' END AS predicted
      |FROM t""".stripMargin

  /** Normalized-content fingerprint (md5 over the canonical token
    * stream). */
  private def q33Fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("fp"))

  private val q33Sql =
    """SELECT doc_id,
      |  MD5(ARRAY_TO_STRING(
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0),
      |    ' ')) AS fp
      |FROM documents""".stripMargin

  /** Composite document-quality scoring (C4-style keep/drop heuristics:
    * length band, stopword presence, alphabetic density, token-length
    * sanity). All comparisons in integer cross-multiplication — no
    * float ratios — so both engines agree exactly; each heuristic
    * contributes 25 points to an integer score and `keep` = all four. */
  /** Shared with q50's composed pipeline. */
  private[operators] def qualityScores(docs: DataFrame): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val base = docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      length(regexp_replace(col("text"), "[^A-Za-z]", "")).as("n_alpha"),
      size(toks).as("n_tokens"),
      array_max(transform(toks, t => length(t))).as("max_tok_len"),
      TextFunctions.markerCount(toks, EnMarkers).as("n_stop"))
    val h1 = (col("n_tokens") >= 5 && col("n_tokens") <= 1000).cast("int")
    val h2 = (col("n_stop") * 20 >= col("n_tokens")).cast("int")
    val h3 = (col("n_alpha") * 2 >= col("n_chars")).cast("int")
    val h4 = (col("max_tok_len") <= 25).cast("int")
    base.select(
      col("doc_id"), col("n_chars"), col("n_alpha"), col("n_tokens"),
      ((h1 + h2 + h3 + h4) * 25).as("score"),
      (h1 + h2 + h3 + h4 === 4).cast("int").as("keep"))
  }

  private def q44QualityScore(s: SparkSession, dir: String): DataFrame =
    qualityScores(Tables.documents(s, dir))

  private val q44Sql =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(LEN(text) AS INT) AS n_chars,
      |    CAST(LEN(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) AS INT) AS n_alpha,
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0) AS tk
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, n_chars, n_alpha,
      |    CAST(LEN(tk) AS INT) AS n_tokens,
      |    CAST(LIST_MAX(LIST_TRANSFORM(tk, x -> LEN(x))) AS INT) AS max_tok_len,
      |    CAST(LEN(LIST_FILTER(tk, x -> x IN ('the', 'a'))) AS INT) AS n_stop
      |  FROM t),
      |h AS (
      |  SELECT doc_id, n_chars, n_alpha, n_tokens,
      |    CAST(n_tokens BETWEEN 5 AND 1000 AS INT) AS h1,
      |    CAST(n_stop * 20 >= n_tokens AS INT) AS h2,
      |    CAST(n_alpha * 2 >= n_chars AS INT) AS h3,
      |    CAST(max_tok_len <= 25 AS INT) AS h4
      |  FROM s)
      |SELECT doc_id, n_chars, n_alpha, n_tokens,
      |  (h1 + h2 + h3 + h4) * 25 AS score,
      |  CAST(h1 + h2 + h3 + h4 = 4 AS INT) AS keep
      |FROM h""".stripMargin

  /** PII scrubbing (email/phone redaction + counts) — the compliance
    * pass every training-data pipeline runs before anything else. The
    * synthetic corpus carries no PII, so the query PLANTS deterministic
    * contact lines on every 10th document (the q51 planted-near-dup
    * pattern: both engines construct the identical augmented corpus),
    * then counts matches and fingerprints the redacted text — the md5
    * proves the replacement output byte-identical, not just counted. */
  private def q66PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val planted = Tables.documents(s, dir).select(
      col("doc_id"),
      when(col("doc_id") % 10 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or 555-"),
          lpad(col("doc_id").cast("string"), 4, "0")))
        .otherwise(col("text")).as("t"))
    planted.select(
      col("doc_id"),
      regexp_count(col("t"), lit(TextFunctions.EmailRe)).as("n_emails"),
      regexp_count(col("t"), lit(TextFunctions.PhoneRe)).as("n_phones"),
      md5(TextFunctions.redactPii(col("t"))).as("red_fp"))
  }

  private val q66Sql =
    """WITH p AS (
      |  SELECT doc_id, CASE WHEN doc_id % 10 = 0
      |    THEN text || ' contact user' || CAST(doc_id AS VARCHAR) ||
      |         '@example.com or 555-' || LPAD(CAST(doc_id AS VARCHAR), 4, '0')
      |    ELSE text END AS t
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(LEN(REGEXP_EXTRACT_ALL(t, '[a-z0-9.]+@[a-z0-9.]+\.[a-z]+')) AS INT) AS n_emails,
      |  CAST(LEN(REGEXP_EXTRACT_ALL(t, '555-[0-9]{4}')) AS INT) AS n_phones,
      |  MD5(REGEXP_REPLACE(REGEXP_REPLACE(t,
      |    '[a-z0-9.]+@[a-z0-9.]+\.[a-z]+', '<EMAIL>', 'g'),
      |    '555-[0-9]{4}', '<PHONE>', 'g')) AS red_fp
      |FROM p""".stripMargin

  /** Gopher-style intra-document repetition stats (Rae et al. 2021 §A1:
    * drop docs dominated by a repeated n-gram or by repeated n-grams in
    * aggregate): per doc, the top 2-gram's occurrence count, total
    * occurrences of repeated 2-grams, and the 2-gram count, plus the
    * two keep-flags in integer cross-multiplication (top 2-gram <= 10%
    * of grams; repeated grams <= 20%) — thresholds that split this
    * corpus 489/500 and 497/500, so both flag values are exercised. */
  private[graft] def repetitionStats(docs: DataFrame): DataFrame =
    docs
      // tokens land in a CONCRETE column before the n-gram lambda reads
      // them — inlining tokens(text) into the lambda re-runs the regex
      // split per element_at (the shingleTable lesson, measured 8x; as
      // q67 first shipped it was a 60 s bench timeout at sf0.1)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(TextFunctions.wordNGrams(col("toks"), 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max(col("c")).as("top2"),
        sum(when(col("c") >= 2, col("c")).otherwise(lit(0L))).as("rep_occ"),
        sum(col("c")).as("n2"))
      .select(col("doc_id"), col("top2"), col("rep_occ"), col("n2"),
        (col("top2") * 10 <= col("n2")).as("top_ok"),
        (col("rep_occ") * 5 <= col("n2")).as("rep_ok"))

  private def q67Repetition(s: SparkSession, dir: String): DataFrame =
    repetitionStats(Tables.documents(s, dir))

  private val q67Sql =
    """WITH t AS (
      |  SELECT doc_id,
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0) AS tk
      |  FROM documents),
      |u AS (
      |  SELECT doc_id, UNNEST([tk[i] || ' ' || tk[i+1] FOR i IN RANGE(1, LEN(tk))]) AS g
      |  FROM t WHERE LEN(tk) >= 2),
      |c AS (SELECT doc_id, g, COUNT(*) AS c FROM u GROUP BY doc_id, g)
      |SELECT doc_id,
      |  CAST(MAX(c) AS BIGINT) AS top2,
      |  CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS rep_occ,
      |  CAST(SUM(c) AS BIGINT) AS n2,
      |  MAX(c) * 10 <= SUM(c) AS top_ok,
      |  SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) * 5 <= SUM(c) AS rep_ok
      |FROM c GROUP BY doc_id""".stripMargin

  /** Corpus vocabulary with document frequencies — the tokenizer/vocab-
    * building precursor (and the IDF table for any TF-IDF scoring):
    * per token, total occurrences and document frequency, thresholded
    * on occurrences. A frequency THRESHOLD instead of top-k keeps the
    * output deterministic (top-k ties at the cutoff are engine-
    * dependent); the classic wordcount shape — one shuffle on the
    * token, partial counts map-side combined, so shuffle volume is the
    * distinct-token count per partition, not the corpus token count. */
  /** MEASURED AND REJECTED (r11): an explicit per-partition Misra–Gries
    * heavy-hitter sketch (k=256 counters, candidates broadcast back for
    * an exact recount) was built, oracle-verified, and benched against
    * this plain aggregation: 1.58 vs 0.74 s at sf0.1 and 4.2 vs 0.86 s
    * at 30x-organic — the sketch LOSES at every measurable scale here
    * because Spark's map-side partial aggregation already bounds the
    * token shuffle to per-partition-DISTINCT keys (the hash agg is
    * itself a per-partition summary with spill), so explicit MG adds
    * per-row JVM overhead without saving any shuffle volume. The
    * sketch-then-verify shape earns its keep only where candidates cut
    * a QUADRATIC step (the LSH/banding dedup family), not a linear
    * keyed aggregate. */
  private def q70Vocab(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.tokenTable(Tables.documents(s, dir), "doc_id", "text")
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_occ") >= VocabMinOcc)

  private val VocabMinOcc = 50L

  private val q70Sql =
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'),
       |                       x -> LEN(x) > 0)) AS tok
       |  FROM documents)
       |SELECT tok, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs
       |FROM tok GROUP BY tok HAVING COUNT(*) >= $VocabMinOcc""".stripMargin

  /** BPE MERGE-PAIR COUNTS — the first iteration of byte-pair-encoding
    * tokenizer training: the corpus-wide frequency of every adjacent
    * character pair, which is the statistic the trainer maximizes when
    * choosing the next merge. Computed the way real BPE trainers scale:
    * pairs are enumerated over the DISTINCT-TOKEN VOCABULARY (thousands
    * of types) weighted by each token's corpus count — never over the
    * corpus's token stream (trillions of occurrences re-enumerating the
    * same pairs). An occurrence floor keeps the output deterministic
    * across engines (q70's convention, no top-k ties).
    *
    * Scale shape: one corpus-keyed shuffle builds the vocabulary
    * (map-side combined wordcount); everything after runs on the
    * vocab — the pair explode is |vocab| × avg token length rows and
    * the final pair aggregation is alphabet-squared sized. */
  private def q77BpePairs(s: SparkSession, dir: String): DataFrame =
    bpePairCounts(bpeVocab(s, dir)).filter(col("n_occ") >= BpeMinOcc)

  /** (tok, cnt) corpus vocabulary — the table BPE training runs on. */
  private def bpeVocab(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.tokenTable(Tables.documents(s, dir), "doc_id", "text")
      .select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))

  /** (pair, n_occ) sliding adjacent-char pair counts over the
    * vocabulary, weighted by corpus count — shared by q77 and q86. */
  private def bpePairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(length(col("tok")) >= 2)
      .select(col("tok"), col("cnt"),
        explode(sequence(lit(1), length(col("tok")) - 1)).as("i"))
      .select(col("tok").substr(col("i"), lit(2)).as("pair"), col("cnt"))
      .groupBy("pair").agg(sum(col("cnt")).as("n_occ"))

  private val BpeMinOcc = 100L

  /** Shared vocabulary + pair-count CTE prefix for the BPE oracles
    * (q77, q86) — one literal so a tokenization or counting fix can
    * never land in one oracle and miss the other. */
  private val bpeCte =
    """WITH tok AS (
      |  SELECT UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'),
      |                            x -> LEN(x) > 0)) AS tok
      |  FROM documents),
      |v AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
      |p AS (
      |  SELECT SUBSTRING(tok, i, 2) AS pair, cnt
      |  FROM (SELECT tok, cnt, UNNEST(RANGE(1, LEN(tok))) AS i
      |        FROM v WHERE LEN(tok) >= 2)),
      |pc AS (SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n_occ FROM p GROUP BY pair)""".stripMargin

  private val q77Sql = bpeCte +
    s"\nSELECT pair, n_occ FROM pc WHERE n_occ >= $BpeMinOcc"

  /** BPE MERGE STEP — what the trainer DOES with q77's statistic: pick
    * the top pair (highest count, ties to the lexicographically first —
    * total order, no top-k ambiguity) and report the effect of applying
    * that merge across the vocabulary: how many token types contain it
    * and how many corpus-weighted merge applications happen. Application
    * counts are GREEDY NON-OVERLAPPING (left-to-right REPLACE in both
    * engines — 'aaa' takes ONE 'aa' merge), which is BPE's actual merge
    * semantics and deliberately differs from q77's sliding pair count
    * ('aaa' contains two 'aa' pairs as candidates).
    *
    * Scale shape: everything after the vocabulary wordcount runs on
    * |vocab| rows; the chosen pair is a 1-row broadcast onto the vocab
    * scan, and the report is a single-group aggregation. The corpus
    * itself is touched once, by the wordcount. */
  private def q86BpeMerge(s: SparkSession, dir: String): DataFrame = {
    // materialized: consumed by the pair-count branch AND the apply scan
    // LAZY measured-and-kept (r11 A/B at sf0.1: lazy MIN 0.634 s vs
    // eager 0.638 s — the q122 concurrent-consumer race doesn't bite
    // here; the broadcast branch is tiny)
    val vocab = bpeVocab(s, dir).localCheckpoint(eager = false)
    val top = bpePairCounts(vocab)
      .orderBy(col("n_occ").desc, col("pair").asc).limit(1)
    val occ = ((length(col("tok")) -
      length(replace(col("tok"), col("pair")))) / 2).cast("long")
    vocab.crossJoin(broadcast(top))
      .select(col("pair"), col("n_occ"), col("cnt"), occ.as("occ"))
      .groupBy("pair", "n_occ")
      .agg(sum(when(col("occ") > 0, 1L).otherwise(0L)).as("n_types"),
        sum(col("occ") * col("cnt")).as("n_apply"))
  }

  private val q86Sql = bpeCte + """,
      |top AS (SELECT pair, n_occ FROM pc ORDER BY n_occ DESC, pair LIMIT 1)
      |SELECT top.pair, top.n_occ,
      |  CAST(SUM(CASE WHEN LEN(v.tok) > LEN(REPLACE(v.tok, top.pair, ''))
      |            THEN 1 ELSE 0 END) AS BIGINT) AS n_types,
      |  CAST(SUM((LEN(v.tok) - LEN(REPLACE(v.tok, top.pair, ''))) // 2 * v.cnt)
      |       AS BIGINT) AS n_apply
      |FROM v, top GROUP BY top.pair, top.n_occ""".stripMargin

  /** Number of merges in the fixed BPE merge table q159/q160 apply.
    * Deliberately small: the POINT is the encode mechanics (priority-
    * ordered greedy merge application, a zero-shuffle encode pass), not
    * a realistic 32k-merge tokenizer — the shape is merge-count-
    * independent. */
  private val BpeNumMerges = 8

  /** The fixed merge table as a PERSISTED artifact (rank, pair, sym):
    * top-[[BpeNumMerges]] pairs of q77's static pair statistic,
    * total-ordered (count desc, pair asc — no top-k ties), each
    * assigned a private-use-plane symbol (U+E000+rank) so later merges
    * see earlier merge RESULTS as single symbols. The merge table is
    * the tokenizer MODEL — trained once per corpus, consumed by every
    * encode run — so it lives under its own meta
    * (`DedupArtifacts.cachedTable`) instead of re-running the
    * vocabulary wordcount per invocation. */
  private def bpeMergeTable(s: SparkSession, dir: String): DataFrame =
    graft.dedup.DedupArtifacts.cachedTable(
        s, dir, "bpe_merges", "documents", s"k$BpeNumMerges") {
      import org.apache.spark.sql.expressions.Window
      // rank is the only thing persisted besides the pair: the symbol
      // is the FIXED bijection U+E000+rank, derived at read time (and
      // Spark's chr() wraps at 256, so it couldn't mint these anyway)
      bpePairCounts(bpeVocab(s, dir))
        .orderBy(col("n_occ").desc, col("pair").asc).limit(BpeNumMerges)
        .select(
          (row_number().over(
            Window.orderBy(col("n_occ").desc, col("pair").asc)) - 1).as("rank"),
          col("pair"))
    }

  /** The merge table in priority order, as the (pair, sym) pairs the
    * encode kernels consume. A bounded driver collect — a few rows here
    * to a few 10k rows in production, never corpus-sized. */
  private def bpeMerges(s: SparkSession, dir: String): Seq[(String, String)] = {
    import s.implicits._
    bpeMergeTable(s, dir).orderBy("rank")
      .select("rank", "pair").as[(Int, String)].collect().toSeq
      .map { case (r, p) => (p, (0xE000 + r).toChar.toString) }
  }

  /** (doc_id, n_toks, n_ids, e) per-document encode — shared by
    * q159/q160. The encode pass is MAP-ONLY and ZERO-SHUFFLE (r12
    * rewrite; the first formulation exploded the corpus into a
    * (doc, pos, tok) stream, broadcast-joined the encoded vocabulary
    * back on and re-grouped per doc with an ordered collect — a full
    * token-stream shuffle that benched 3.5 s at sf0.1; this one runs
    * as one streaming pass):
    *
    * each document's normalized token stream is space-joined and the
    * priority-ordered merge table applies in ONE codegen'd kernel
    * evaluation (`BpeEncode` — chain-equivalent semantics at cost
    * independent of the table size; the K=8 `replace` chain remains the
    * differential baseline).
    * PROVABLY equal to encoding each token separately: merge pairs are
    * substrings of vocabulary tokens, so they never contain the space
    * separator, and replacements substitute non-separator symbols, so
    * they never create one — a match can neither span nor manufacture
    * a token boundary, hence text-level REPLACE = concatenation of
    * token-level REPLACEs (greedy left-to-right non-overlapping per
    * merge in both engines, the q86 convention; OperatorsSpec pins the
    * hand-computed result).
    *
    * The only shuffle anywhere is the vocabulary wordcount that
    * DERIVES this demo's merge table from q77's statistic — a
    * production encode consumes a FIXED merge table and is zero-shuffle
    * end to end. */
  private def bpeEncodedDocs(s: SparkSession, dir: String): DataFrame = {
    val merges = bpeMerges(s, dir)
    // the production kernel: one broadcast merge table, per-row cost
    // independent of K (the K=8 replace CHAIN below is its differential
    // baseline, pinned equal by BpeKernelSpec — a 32k-merge table can't
    // be an expression chain)
    val enc = bpeKernelEncode(
      array_join(TextFunctions.tokens(col("text")), " "), merges)
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_toks"),
        enc.as("e"))
      .filter(col("n_toks") > 0)
      .select(col("doc_id"), col("n_toks"),
        // every remaining char is one symbol = one token id, except the
        // n_toks-1 separator spaces (merges can never touch them)
        (length(col("e")) - (col("n_toks") - 1)).cast("long").as("n_ids"),
        col("e"))
  }

  /** The native-kernel encode column ([[graft.functions.expressions.BpeEncode]]). */
  private[graft] def bpeKernelEncode(
      c: org.apache.spark.sql.Column, merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.BpeEncode(
      ColumnBridge.expression(c), merges.map(_._1), merges.map(_._2)))
  }

  /** The K-step replace-chain encode — the kernel's differential
    * baseline (see [[bpeEncodedDocs]]); exposed for BpeKernelSpec. */
  private[graft] def bpeChainEncode(
      c: org.apache.spark.sql.Column, merges: Seq[(String, String)]): org.apache.spark.sql.Column =
    merges.foldLeft(c) { case (acc, (p, sym)) => replace(acc, lit(p), lit(sym)) }

  /** The registered merge table, exposed for BpeKernelSpec's
    * plan-level differential. */
  private[graft] def bpeMergesForSpec(
      s: SparkSession, dir: String): Seq[(String, String)] = bpeMerges(s, dir)

  /** BPE ENCODE — the pass that turns the trained merge table into
    * ACTUAL TRAINING TOKENS (the stage between q77/q86's trainer
    * statistics and q68's sequence packing): apply the fixed
    * [[BpeNumMerges]]-entry merge table to every document, in merge
    * priority order, and report per document the whitespace token
    * count, the encoded TOKEN-ID count (one id per remaining symbol —
    * base chars and merge symbols alike map to ids by codepoint, a
    * fixed bijection, so the symbol string IS the id sequence), and an
    * md5 digest of the space-joined encoded sequence pinning the exact
    * token stream both engines produced. Docs with zero tokens produce
    * no ids and drop out (both engines). Scale shape: see
    * [[bpeEncodedDocs]] — map-only, zero shuffle. */
  private def q159BpeEncode(s: SparkSession, dir: String): DataFrame =
    bpeEncodedDocs(s, dir)
      .select(col("doc_id"), col("n_toks"), col("n_ids"),
        md5(col("e")).as("enc_digest"))

  /** Shared oracle chain for q159/q160: bpeCte (with RECURSIVE enabled
    * — DuckDB requires the keyword on the first WITH) + the merge
    * table + the recursive K-step per-DOCUMENT fold over the
    * space-joined token stream (the same text-level REPLACE the Spark
    * side runs — see [[bpeEncodedDocs]] for the equivalence argument).
    * One literal so the encode semantics can never drift between the
    * two oracles. */
  private val bpeEncCte = bpeCte.replace("WITH tok", "WITH RECURSIVE tok") + s""",
      |m AS (
      |  SELECT pair, CHR(57344 + CAST(rk AS INT) - 1) AS sym, rk FROM (
      |    SELECT pair, ROW_NUMBER() OVER (ORDER BY n_occ DESC, pair) AS rk
      |    FROM pc)
      |  WHERE rk <= $BpeNumMerges),
      |t2 AS (
      |  SELECT doc_id, CAST(LEN(tks) AS BIGINT) AS n_toks,
      |    ARRAY_TO_STRING(tks, ' ') AS txt
      |  FROM (SELECT doc_id,
      |          LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'),
      |                      x -> LEN(x) > 0) AS tks
      |        FROM documents)
      |  WHERE LEN(tks) > 0),
      |e AS (
      |  SELECT doc_id, n_toks, txt AS enc, 0 AS step FROM t2
      |  UNION ALL
      |  SELECT e.doc_id, e.n_toks, REPLACE(e.enc, m.pair, m.sym) AS enc,
      |    e.step + 1
      |  FROM e JOIN m ON m.rk = e.step + 1),
      |d AS (
      |  SELECT doc_id, n_toks,
      |    CAST(LEN(enc) - (n_toks - 1) AS BIGINT) AS n_ids,
      |    MD5(enc) AS enc_digest
      |  FROM e WHERE step = (SELECT COUNT(*) FROM m))""".stripMargin

  private val q159Sql = bpeEncCte +
    "\nSELECT doc_id, n_toks, n_ids, enc_digest FROM d"

  /** BPE-AWARE SEQUENCE PACKING — q68's batch construction run on the
    * lengths the model actually trains on: documents are packed into
    * [[BpePackBudget]]-id samples using q159's encoded token-ID counts
    * (not whitespace token counts — the two distributions differ
    * exactly where the tokenizer compresses well, so packing on raw
    * token counts over- or under-fills every sample). Same distributed
    * formulation as q68: packing is independent per range bucket of
    * doc_ids (embarrassingly parallel, at most one partial sample lost
    * per bucket boundary, sample ids deterministic); the only addition
    * is that the per-doc length arrives from the zero-shuffle encode
    * pass instead of a `size()`.
    *
    * Completes the tokenizer story end-to-end: q77 (pair statistic) →
    * q86 (merge step) → q159 (encode) → q160 (pack) is the full
    * trainer-statistics-to-training-batches chain. */
  private def q160BpePack(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sizes = bpeEncodedDocs(s, dir)
      .select(col("doc_id"), col("n_ids"))
      .withColumn("bucket", expr("doc_id DIV 100"))
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sizes.withColumn("cum", sum(col("n_ids")).over(w))
      .select(col("doc_id"), col("n_ids"),
        (col("bucket") * 10000 +
          expr(s"(cum - n_ids) DIV $BpePackBudget")).as("sample_id"),
        expr(s"(cum - n_ids) % $BpePackBudget").as("offset"))
  }

  private val BpePackBudget = 512L

  // the CASTs are load-bearing (q68's round-7 lesson): DuckDB's
  // windowed SUM promotes to HUGEINT and the promotion survives // and %
  private val q160Sql = bpeEncCte + s""",
      |c AS (
      |  SELECT doc_id, doc_id // 100 AS bucket, n_ids,
      |    SUM(n_ids) OVER (PARTITION BY doc_id // 100 ORDER BY doc_id) AS cum
      |  FROM d)
      |SELECT doc_id, CAST(n_ids AS BIGINT) AS n_ids,
      |  CAST(bucket * 10000 + (cum - n_ids) // $BpePackBudget AS BIGINT) AS sample_id,
      |  CAST((cum - n_ids) % $BpePackBudget AS BIGINT) AS offset
      |FROM c""".stripMargin

  /** PMI CO-OCCURRENCE PAIRS — the pointwise-mutual-information table
    * over skip-gram pairs within a [[PmiWindow]]-token window (the
    * word2vec/GloVe-era corpus statistic, still the standard collocation
    * and phrase-mining signal). PMI = ln(p(a,b) / (p(a)·p(b))) with all
    * probabilities ratios of exact counts — the ratio chain is exact
    * IEEE arithmetic with no accumulation-order noise, but ln() itself
    * is libm-dependent (JVM Math.log vs DuckDB's std::log may differ in
    * the last ulp), so the 6dp rounding per q74's convention is what
    * makes the oracle comparison robust. A pair-count floor bounds the
    * output and keeps it deterministic (no top-k ties).
    *
    * Scale shape: pair generation is MAP-ONLY (two chained position
    * explodes, both doc-local — no self-join, no shuffle until the pair
    * count), consumed exactly once; the pair total n_pairs is computed
    * in closed form from token-array lengths (sum over docs of
    * W·L − W(W+1)/2 for L>W, else L(L−1)/2), so nothing is
    * checkpointed or recomputed. The unigram table and the two scalar
    * totals are tiny aggregates joined back BROADCAST, so the hot-word
    * skew ("the" appears in most pairs) never shuffles; the only
    * corpus-sized shuffle is the (w_a, w_b) pair count, map-side
    * pre-combined. */
  private def q80PmiPairs(s: SparkSession, dir: String): DataFrame = {
    // materialized: three consumers (pair stream, unigram counts, the
    // closed-form pair total) would each re-run the tokenize pipeline —
    // Catalyst does no cross-branch reuse
    val t = graft.dedup.Dedup.tokenTable(Tables.documents(s, dir), "doc_id", "text")
      .select(col("toks").as("tk"))
      // LAZY measured-and-kept (r11 A/B at sf0.1: lazy MIN 0.532 s vs
      // eager 0.571 s over 5 alternating iters)
      .localCheckpoint(eager = false)
    val pr = t.filter(size(col("tk")) >= 2)
      .select(col("tk"), explode(sequence(lit(1), size(col("tk")) - 1)).as("i"))
      .select(col("tk"), col("i"),
        explode(sequence(lit(1),
          least(lit(PmiWindow), size(col("tk")) - col("i")))).as("d"))
      .select(element_at(col("tk"), col("i")).as("w_a"),
        element_at(col("tk"), col("i") + col("d")).as("w_b"))
    val uni = t.select(explode(col("tk")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    // n_pairs in closed form (see docstring) — avoids a second pass
    // over (and checkpoint of) the corpus-sized pair stream.
    val len = size(col("tk"))
    // Column./ is double division, so the per-doc terms ride through
    // DoubleType; every term and the sum are integers < 2^53, so the
    // value is exact — the cast just restores the count's LongType.
    // The len >= 2 guard matters: size(null) = -1 for a NULL-text doc,
    // and (-1)(-2)/2 would add a phantom pair the pair stream (filtered
    // to size >= 2) and the oracle never generate.
    val np = t.agg(sum(when(len > PmiWindow,
        len.cast("long") * PmiWindow - PmiWindow * (PmiWindow + 1) / 2)
      .when(len >= 2, len.cast("long") * (len - 1) / 2)
      .otherwise(lit(0L))).cast("long").as("n_pairs"))
    val tot = uni.agg(sum("c").as("n_tok")).crossJoin(np)
    val cp = pr.groupBy("w_a", "w_b").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= PmiMinPairs)
    cp.join(broadcast(uni.select(col("tok").as("w_a"), col("c").as("c_a"))), "w_a")
      .join(broadcast(uni.select(col("tok").as("w_b"), col("c").as("c_b"))), "w_b")
      .crossJoin(broadcast(tot))
      .select(col("w_a"), col("w_b"),
        round(log((col("c_ab") / col("n_pairs")) /
          ((col("c_a") / col("n_tok")) * (col("c_b") / col("n_tok")))), 6).as("pmi"),
        col("c_ab"))
  }

  private val PmiWindow = 3
  private val PmiMinPairs = 25L

  private val q80Sql =
    s"""WITH t AS (
       |  SELECT LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'),
       |                     x -> LEN(x) > 0) AS tk
       |  FROM documents),
       |pos AS (SELECT tk, UNNEST(RANGE(1, LEN(tk))) AS i FROM t WHERE LEN(tk) >= 2),
       |pr AS (
       |  SELECT tk[i] AS w_a, tk[i + d] AS w_b
       |  FROM (SELECT tk, i,
       |          UNNEST(RANGE(1, LEAST($PmiWindow, LEN(tk) - i) + 1)) AS d
       |        FROM pos)),
       |uni AS (SELECT UNNEST(tk) AS tok FROM t),
       |cu AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY tok),
       |tot AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM uni) AS n_tok,
       |               (SELECT CAST(COUNT(*) AS BIGINT) FROM pr) AS n_pairs),
       |cp AS (SELECT w_a, w_b, CAST(COUNT(*) AS BIGINT) AS c_ab FROM pr
       |       GROUP BY 1, 2 HAVING COUNT(*) >= $PmiMinPairs)
       |SELECT cp.w_a, cp.w_b,
       |  ROUND(LN((cp.c_ab / tot.n_pairs) /
       |           ((ca.c / tot.n_tok) * (cb.c / tot.n_tok))), 6) AS pmi,
       |  cp.c_ab
       |FROM cp
       |JOIN cu ca ON ca.tok = cp.w_a
       |JOIN cu cb ON cb.tok = cp.w_b, tot""".stripMargin

  /** TF-IDF KEYWORD EXTRACTION — the per-document salient-term table
    * (tf · ln(N/df)) for an id-bounded document slice, with the idf
    * statistics computed over the ENTIRE corpus (an idf from the slice
    * alone would be a different — wrong — statistic). Membership is
    * integer-exact (doc slice by id, tf floor [[TfMin]]), so only the
    * rounded tfidf VALUE carries the cross-engine ln() ulp caveat (6dp
    * rounding per q74's convention); row membership cannot flip.
    *
    * Scale shape: tokenization and tf counting are corpus-local; the
    * global df table is ONE (doc, term)-keyed distinct + term agg —
    * vocabulary-sized, so it stays DISTRIBUTED (a 100 TB corpus has a
    * vocab too big to broadcast). The bounded extract side is the one
    * that broadcasts into the join, so the df table never moves. */
  private def q82TfidfTerms(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val toks = graft.dedup.Dedup.tokenTable(docs, "doc_id", "text")
      .select(col("doc_id"), explode(col("toks")).as("term"))
    val df = toks.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val tfSlice = toks.filter(col("doc_id") < TfIdfDocMax)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .filter(col("tf") >= TfMin)
    broadcast(tfSlice).join(df, "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
          .as("tfidf"))
  }

  private val TfIdfDocMax = 100L
  private val TfMin = 3L

  private val q82Sql =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'),
       |                x -> LEN(x) > 0) AS tk
       |  FROM documents),
       |u AS (SELECT doc_id, UNNEST(tk) AS term FROM t),
       |df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       |       FROM u GROUP BY term),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
       |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM u WHERE doc_id < $TfIdfDocMax
       |       GROUP BY 1, 2 HAVING COUNT(*) >= $TfMin)
       |SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |  ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
       |FROM tf JOIN df USING (term), n""".stripMargin

  /** N-GRAM NOVELTY — per-document originality: how many of a doc's
    * distinct 3-shingles appear NOWHERE else in the corpus. The
    * complement of boilerplate detection: low novelty marks templated
    * or syndicated text that per-doc dedup misses, high novelty marks
    * original (or gibberish — pair with q44) content. Counts stay
    * integer-exact; any ratio is the caller's division.
    *
    * Scale shape: novelty only needs membership in the df==1 set, not
    * exact df — and a df==1 gram's OWNER is recoverable inside the
    * gram aggregate itself (`min(doc_id)` of a singleton group), so no
    * join back to the gram stream is ever needed: one gram-keyed
    * shuffle, re-group the survivors by owner, and attach the per-doc
    * shingle count as a map-only `size()` on the scan (never a second
    * explode pass). The hot boilerplate grams that would skew an
    * exact-df join are exactly the ones the df==1 filter drops.
    * Tokens come from [[graft.dedup.Dedup.tokenTable]] — a CONCRETE
    * column behind an exchange, because inlining `tokens(text)` into
    * the shingle lambda re-runs the regex split per element_at (no CSE
    * inside HOF lambdas — Dedup's measured 8x lesson). The per-doc
    * shingle count is the COUNT of the exploded gram stream, never a
    * `size(shingles)` projection: the optimizer pushes cheap-looking
    * projections below the repartition exchange, which re-runs the
    * whole (HOF-interpreted, ~2 ms/doc) shingle construction inside
    * the narrow scan stage — profiled as a single task burning 10.8 s
    * of the query's 9 s wall at sf0.1. Generators are not pushed
    * through exchanges, so counting the exploded stream keeps the
    * expensive work in the wide stage (measured 2.1 s total). */
  private def q95Novelty(s: SparkSession, dir: String): DataFrame = {
    // Two fused tokenize→explode→aggregate passes, DELIBERATELY: r19
    // measured both "one-pass" rewrites as large regressions. (a)
    // checkpointing the per-doc shingle ARRAY table: 0.31 s -> ~10 s —
    // the shingle string arrays are ~3x the corpus text and
    // materializing them costs far more than the saved pass (q74/q147/
    // q80 checkpoint TOKEN arrays to replace >= 2 full passes;
    // different economics). (b) closed-form n_shingles = size(gs) with
    // a size > 0 filter: Catalyst pushes the filter below the
    // projection and INLINES the whole tokenize+shingle expression
    // into the filter condition — the q67 concrete-tokens-column
    // staging is undone and tokenize re-evaluates per element_at,
    // ~11 s (plan captured in the r19 notes). The fused explode+agg
    // passes below never store arrays and never duplicate the lambda.
    val toksT = graft.dedup.Dedup.tokenTable(
      Tables.documents(s, dir), "doc_id", "text")
    val grams = toksT.select(col("doc_id"),
      explode(TextFunctions.wordShingles(col("toks"), 3)).as("g"))
    val novel = grams
      .groupBy("g").agg(count(lit(1)).as("df"), min("doc_id").as("doc_id"))
      .filter(col("df") === 1)
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    grams.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
  }

  private val q95Sql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0) AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, UNNEST(LIST_DISTINCT(
      |    [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN RANGE(1, LEN(t) - 1)])) AS g
      |  FROM toks WHERE LEN(t) >= 3),
      |df AS (SELECT g, COUNT(*) AS df FROM sh GROUP BY g)
      |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
      |  CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
      |FROM sh s JOIN df USING (g) GROUP BY 1""".stripMargin

  /** VOCABULARY GROWTH CURVE (Heaps' law over 3-shingles) — distinct-type
    * accumulation as the corpus grows, the statistic behind "how much new
    * content does the next crawl slice add" and tokenizer-vocab sizing.
    * The corpus is cut into 10 id-deciles; each shingle type is charged to
    * the decile of its FIRST occurrence (min doc_id — decile is monotone
    * in doc_id, so min-decile ≡ decile-of-min), and the running total is
    * the growth curve. Token-level vocab (q70) is degenerate on this
    * corpus (31 types); 3-shingles grow like real text.
    *
    * Scale shape: one shingle-keyed min aggregate (map-side partials) over
    * md5-prefix longs (the gram string dies before the shuffle, q63's
    * lesson), a broadcast 1-row scalar for the decile rule, and a ≤10-row
    * final reduction — the cumulative window runs on those 10 rows only. */
  private def q111VocabGrowth(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val n = docs.agg((max("doc_id") + 1).as("n"))
    val sh = graft.dedup.Dedup.tokenTable(docs, "doc_id", "text")
      .select(col("doc_id"), explode(TextFunctions.wordShingles(col("toks"), 3)).as("gt"))
      .select(col("doc_id"), TextFunctions.digest60(col("gt")).as("g"))
      .crossJoin(broadcast(n))
      .select(col("g"), expr("doc_id * 10 div n").as("decile"))
    // ONE pass over the shingle stream: pre-aggregate to (g, decile)
    // occurrence counts and materialize — both reports below reduce the
    // small result instead of re-running tokenize+shingle+digest per
    // branch (guide §2.4). occ = Σ c per decile and newt = first-decile
    // type counts are exact integer re-aggregations of gd.
    // TWO fused tokenize→shingle→aggregate passes, DELIBERATELY (the
    // r19 one-pass rewrite REVERTED after a calm-window A/B): r19
    // materialized a (g, decile) occurrence pre-aggregate so both
    // reports reduce it, but that checkpoint is ~|distinct shingles|
    // rows — at this corpus' shingle cardinality, writing it costs more
    // than the one fused corpus pass it saves (same-JVM min-of-5 at
    // equal q27 gauge: two-pass 0.459 s vs checkpointed one-pass
    // 0.676 s). The q95 lesson generalizes: a boundary below a
    // shingle-cardinality aggregate only pays when it replaces >= 2
    // expensive passes AND the materialized rows are much smaller than
    // the stream feeding them.
    val newt = sh.groupBy("g").agg(min("decile").as("decile"))
      .groupBy("decile").agg(count(lit(1)).as("new_types"))
    val occ = sh.groupBy("decile").agg(count(lit(1)).as("n_grams"))
    occ.join(newt, Seq("decile"), "left")
      .select(col("decile"), col("n_grams"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .withColumn("cum_types", sum("new_types").over(
        Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  private val q111Sql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0) AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, UNNEST(LIST_DISTINCT(
      |    [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN RANGE(1, LEN(t) - 1)])) AS g
      |  FROM toks WHERE LEN(t) >= 3),
      |m AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
      |firsts AS (
      |  SELECT g, CAST(MIN(doc_id) * 10 // n AS BIGINT) AS decile
      |  FROM sh, m GROUP BY g, n),
      |newt AS (SELECT decile, COUNT(*) AS new_types FROM firsts GROUP BY decile),
      |occ AS (
      |  SELECT CAST(doc_id * 10 // n AS BIGINT) AS decile, COUNT(*) AS n_grams
      |  FROM sh, m GROUP BY 1)
      |SELECT o.decile, CAST(o.n_grams AS BIGINT) AS n_grams,
      |  CAST(COALESCE(nt.new_types, 0) AS BIGINT) AS new_types,
      |  CAST(SUM(COALESCE(nt.new_types, 0)) OVER (ORDER BY o.decile) AS BIGINT) AS cum_types
      |FROM occ o LEFT JOIN newt nt USING (decile)""".stripMargin

  /** ZIPF FREQUENCY-SPECTRUM FIT — the corpus-health power-law check
    * (a crawl slice whose token distribution stops being Zipfian is
    * usually boilerplate- or spam-dominated). Fitted WITHOUT the
    * textbook rank-frequency regression, whose rank column needs a
    * GLOBAL sort of the vocabulary: instead regress over the frequency
    * SPECTRUM — for Zipf(s), the number of types occurring exactly f
    * times falls as f^-(1+1/s), so log(n_types) on log(f) has slope
    * -(1+1/s) and the fit needs only (freq → type count) pairs.
    * Singleton-heavy tails bias nothing out of the ordinary here: the
    * fit is the diagnostic, not an estimator of record.
    *
    * Scale shape: one token-keyed shuffle (pre-combined) for the
    * frequency table, one TINY shuffle keyed on the frequency value
    * (≤ max df distinct keys), then a 1-row `regr_slope` aggregate over
    * ≤ thousands of spectrum points — no window, no global sort, no
    * vocabulary ever ordered. Doubles appear only inside regr_* and the
    * final 6dp round (the spectrum coordinates are exact-count logs,
    * identical on both engines). */
  private def q149ZipfSpectrum(s: SparkSession, dir: String): DataFrame = {
    val freq = Tables.documents(s, dir)
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("f"))
    freq.groupBy("f").agg(count(lit(1)).as("n_types"))
      .agg(count(lit(1)).as("spectrum_points"),
        round(expr("regr_slope(ln(n_types), ln(f))"), 6).as("slope"),
        round(expr("regr_intercept(ln(n_types), ln(f))"), 6).as("intercept"))
  }

  private val q149Sql =
    """WITH tok AS (
      |  SELECT UNNEST(LIST_FILTER(
      |    REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0)) AS tok
      |  FROM documents),
      |freq AS (SELECT tok, COUNT(*) AS f FROM tok GROUP BY tok),
      |spec AS (SELECT f, COUNT(*) AS n_types FROM freq GROUP BY f)
      |SELECT CAST(COUNT(*) AS BIGINT) AS spectrum_points,
      |  ROUND(REGR_SLOPE(LN(n_types), LN(f)), 6) AS slope,
      |  ROUND(REGR_INTERCEPT(LN(n_types), LN(f)), 6) AS intercept
      |FROM spec""".stripMargin

  /** PER-SOURCE DISTRIBUTION DIVERGENCE — total-variation distance
    * between each source's token distribution and the whole corpus:
    * the domain-shift diagnostic behind mixture design and "this crawl
    * slice looks wrong" alerts. TV = ½·Σ|p_s(t) − p_c(t)| is computed
    * EXACTLY as integers by cross-multiplication — the per-term value
    * is |cs·N_c − cc·N_s| summed in DECIMAL(38,0) (order-independent,
    * overflow-safe by width), and vocabulary terms ABSENT from a source
    * fold into the closed form (N_c − Σ_present cc)·N_s, so no
    * source×vocabulary cross join ever materializes. The only doubles
    * are one final division (operand order mirrored in the oracle) and
    * a 6dp round.
    *
    * Scale shape: one (source, token)-keyed count shuffle; the corpus
    * vocabulary table and the per-source totals broadcast onto it;
    * final aggregate has ≤|sources| groups with map-side partials. */
  private def q115SourceDivergence(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val tok = Tables.documents(s, dir)
      .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("t"))
    // ONE tokenize pass: (source, t) counts materialize, and the corpus
    // term counts (cc = Σ_sources cs) and per-source totals both derive
    // from the small result — previously the tokenize pipeline ran three
    // times (corpus agg, perSrc under the main join, perSrc under
    // totals; guide §2.4)
    // THREE fused tokenize→aggregate passes, DELIBERATELY (the r19
    // one-pass materialization REVERTED after a calm-window A/B,
    // q111's twin): the (source, t) checkpoint is ~|vocabulary×sources|
    // rows, and writing it cost more than the two fused corpus passes
    // it saved (same-JVM min-of-5 at equal q27 gauge: three-pass
    // 0.736 s vs checkpointed 0.914 s; the old 0.697 floor agrees).
    // Each pass is tokenize+explode+agg fused in one stage — the corpus
    // text never shuffles, only (key, count) partials do.
    val perSrc = tok.groupBy("source", "t").agg(count(lit(1)).as("cs"))
    val corpus = tok.groupBy("t").agg(count(lit(1)).as("cc"))
    val totals = tok.groupBy("source").agg(count(lit(1)).as("n_s"))
    // grand total off the |sources|-row totals, NOT a fourth
    // scan-and-tokenize pass over the corpus
    val grand = totals.agg(sum("n_s").as("n_c"))
    perSrc.join(broadcast(corpus), "t")
      .join(broadcast(totals), "source")
      .crossJoin(broadcast(grand))
      .groupBy("source")
      .agg(
        sum(abs(col("cs").cast(dec) * col("n_c").cast(dec) -
                col("cc").cast(dec) * col("n_s").cast(dec))).as("num_present"),
        sum(col("cc").cast(dec)).as("cc_present"),
        max("n_s").as("n_s"), max("n_c").as("n_c"))
      .select(col("source"), col("n_s").as("n_toks"),
        round((col("num_present") +
            (col("n_c").cast(dec) - col("cc_present")) * col("n_s").cast(dec))
            .cast("double") /
          (lit(2.0) * col("n_s").cast("double") * col("n_c").cast("double")), 6)
          .as("tv"))
  }

  private val q115Sql =
    """WITH tok AS (
      |  SELECT source,
      |    UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0)) AS t
      |  FROM documents),
      |sc AS (SELECT source, t, CAST(COUNT(*) AS HUGEINT) AS cs FROM tok GROUP BY 1, 2),
      |cc AS (SELECT t, CAST(COUNT(*) AS HUGEINT) AS cc FROM tok GROUP BY 1),
      |ns AS (SELECT source, CAST(SUM(cs) AS HUGEINT) AS n_s FROM sc GROUP BY 1),
      |nc AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n_c FROM tok),
      |present AS (
      |  SELECT s.source,
      |    SUM(ABS(s.cs * n.n_c - c.cc * x.n_s)) AS num_present,
      |    SUM(c.cc) AS cc_present
      |  FROM sc s JOIN cc c USING (t) JOIN ns x USING (source) CROSS JOIN nc n
      |  GROUP BY s.source)
      |SELECT p.source, CAST(x.n_s AS BIGINT) AS n_toks,
      |  ROUND(CAST(p.num_present + (n.n_c - p.cc_present) * x.n_s AS DOUBLE)
      |        / (2.0 * CAST(x.n_s AS DOUBLE) * CAST(n.n_c AS DOUBLE)), 6) AS tv
      |FROM present p JOIN ns x USING (source) CROSS JOIN nc n""".stripMargin

  /** CHARSET / ENCODING AUDIT — per-source counts of the mojibake
    * signals a crawl-ingest gate rejects on: U+FFFD replacement chars
    * (the decoder already gave up), C0/DEL control characters (binary
    * bleed-through; TAB/LF/CR are legitimate and excluded), and the
    * non-ASCII volume that calibrates expected-vs-observed per
    * language. All counts are integers, so the cross-engine compare is
    * exact; counts are by code point in both engines (Spark
    * `length`/Java regex and DuckDB LEN/RE2 both match a supplementary
    * character as one).
    *
    * Scale shape: a pure map over the scan followed by a |sources|-group
    * aggregate with map-side partials — the corpus never shuffles. */
  private def q119CharsetAudit(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val ctrl = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
    Tables.documents(s, dir).select(col("source"),
        (instr(t, "�") > 0).cast("long").as("has_repl"),
        (length(t) - length(regexp_replace(t, ctrl, ""))).cast("long").as("n_ctrl"),
        (length(t) - length(regexp_replace(t, "[^\\x00-\\x7F]", ""))).cast("long")
          .as("n_nonascii"),
        length(t).cast("long").as("n_cp"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("has_repl").as("n_repl_docs"),
        sum("n_ctrl").as("ctrl_chars"),
        sum("n_nonascii").as("nonascii_chars"),
        sum("n_cp").as("total_chars"))
  }

  private val q119Sql =
    """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN STRPOS(text, CHR(65533)) > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_repl_docs,
      |  CAST(SUM(LEN(text) -
      |    LEN(REGEXP_REPLACE(text, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'))) AS BIGINT)
      |    AS ctrl_chars,
      |  CAST(SUM(LEN(text) -
      |    LEN(REGEXP_REPLACE(text, '[^\x00-\x7F]', '', 'g'))) AS BIGINT) AS nonascii_chars,
      |  CAST(SUM(LEN(text)) AS BIGINT) AS total_chars
      |FROM documents GROUP BY 1""".stripMargin

  /** LINE-LEVEL BOILERPLATE FILTER (the C4 cleaning rule, Raffel et al.
    * 2020 §2.2): a line survives only as prose — ≥ 3 words, terminal
    * punctuation, none of the menu/legal markers ("cookie",
    * "javascript") — and the document is re-assembled in original line
    * order. The output is a per-rule AUDIT (how many lines each rule
    * rejected — the numbers a cleaning run reports before anyone
    * commits to the rule-set) plus the md5 of the cleaned text, so the
    * oracle pins the EXACT reassembled string, not just counts. The
    * rules partition the lines: short + nopunct + marker + kept =
    * n_lines, an invariant the unit spec asserts.
    *
    * Scale shape: entirely map-side — one split, array filters, one
    * join back to a string; no explode and no shuffle at all (the row
    * count never changes). Each filter output is consumed from its own
    * projection step and CollapseProject never inlines a non-cheap
    * expression into multiple consumers (the q67/q95 lesson, encoded). */
  private def q120LineFilter(s: SparkSession, dir: String): DataFrame = {
    def nw(l: Column) = size(split(trim(l), "\\s+"))
    def punctOk(l: Column) = substring(trim(l), -1, 1).isin(".", "!", "?", "\"", "'")
    def marker(l: Column) = lower(l).contains("cookie") || lower(l).contains("javascript")
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), "\n").as("ls"))
      .select(col("doc_id"), size(col("ls")).as("n_lines"),
        size(filter(col("ls"), l => nw(l) < 3)).as("n_short"),
        size(filter(col("ls"), l => nw(l) >= 3 && !punctOk(l))).as("n_nopunct"),
        size(filter(col("ls"), l => nw(l) >= 3 && punctOk(l) && marker(l))).as("n_marker"),
        filter(col("ls"), l => nw(l) >= 3 && punctOk(l) && !marker(l)).as("kept"))
      .select(col("doc_id"), col("n_lines"), col("n_short"), col("n_nopunct"),
        col("n_marker"), size(col("kept")).as("n_kept"),
        array_join(col("kept"), "\n").as("clean"))
      .select(col("doc_id"), col("n_lines"), col("n_short"), col("n_nopunct"),
        col("n_marker"), col("n_kept"),
        length(col("clean")).as("clean_chars"), md5(col("clean")).as("clean_digest"))
  }

  // DuckDB's ARRAY_TO_STRING(<empty list>) is NULL where Spark's
  // array_join is '' — the COALESCE aligns the all-lines-rejected case;
  // the CASE keeps a NULL input document NULL on both sides
  private val q120Sql =
    """WITH k AS (
      |  SELECT doc_id, STR_SPLIT(text, CHR(10)) AS ls FROM documents),
      |a AS (
      |  SELECT doc_id, LEN(ls) AS n_lines,
      |    LEN(LIST_FILTER(ls, x ->
      |      LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(x), '\s+')) < 3)) AS n_short,
      |    LEN(LIST_FILTER(ls, x ->
      |      LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(x), '\s+')) >= 3
      |      AND RIGHT(TRIM(x), 1) NOT IN ('.', '!', '?', '"', ''''))) AS n_nopunct,
      |    LEN(LIST_FILTER(ls, x ->
      |      LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(x), '\s+')) >= 3
      |      AND RIGHT(TRIM(x), 1) IN ('.', '!', '?', '"', '''')
      |      AND (CONTAINS(LOWER(x), 'cookie') OR CONTAINS(LOWER(x), 'javascript'))))
      |      AS n_marker,
      |    LIST_FILTER(ls, x ->
      |      LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(x), '\s+')) >= 3
      |      AND RIGHT(TRIM(x), 1) IN ('.', '!', '?', '"', '''')
      |      AND NOT CONTAINS(LOWER(x), 'cookie')
      |      AND NOT CONTAINS(LOWER(x), 'javascript')) AS kept
      |  FROM k),
      |j AS (SELECT doc_id, n_lines, n_short, n_nopunct, n_marker, LEN(kept) AS n_kept,
      |        CASE WHEN kept IS NULL THEN NULL
      |             ELSE COALESCE(ARRAY_TO_STRING(kept, CHR(10)), '') END AS clean
      |      FROM a)
      |SELECT doc_id, CAST(n_lines AS INT) AS n_lines, CAST(n_short AS INT) AS n_short,
      |  CAST(n_nopunct AS INT) AS n_nopunct, CAST(n_marker AS INT) AS n_marker,
      |  CAST(n_kept AS INT) AS n_kept,
      |  CAST(LEN(clean) AS INT) AS clean_chars, MD5(clean) AS clean_digest
      |FROM j""".stripMargin

  /** UNICODE CANONICALIZATION AUDIT (NFC) — how much of each source
    * arrives in non-canonical form (decomposed accents, compatibility
    * leftovers): the byte-different-but-equal strings that silently
    * split exact dedup (q24), vocabulary counts (q70), and term lookups
    * (q126) unless ingest canonicalizes. Normalization runs through the
    * native codegen [[graft.functions.expressions.NfcNormalize]]
    * expression (a UDF here would box every row out of whole-stage
    * codegen); the oracle recomputes with DuckDB's `NFC_NORMALIZE` —
    * both are UAX #15 NFC.
    *
    * Scale shape: a pure map (with an allocation-free fast path for
    * already-normalized text) into one |sources|-group pre-combined
    * aggregate; the corpus never shuffles. */
  private def q133NfcAudit(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), col("text"), TextFunctions.nfc(col("text")).as("norm"))
      .select(col("source"),
        (col("text") =!= col("norm")).cast("long").as("changed"),
        length(col("text")).cast("long").as("pre_cp"),
        length(col("norm")).cast("long").as("post_cp"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("changed").as("n_changed"),
        sum("pre_cp").as("pre_chars"), sum("post_cp").as("post_chars"))

  private val q133Sql =
    """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN text <> NFC_NORMALIZE(text) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_changed,
      |  CAST(SUM(LEN(text)) AS BIGINT) AS pre_chars,
      |  CAST(SUM(LEN(NFC_NORMALIZE(text))) AS BIGINT) AS post_chars
      |FROM documents GROUP BY 1""".stripMargin

  /** TOKEN-ENTROPY QUALITY SIGNAL — per-document Shannon entropy of the
    * token distribution (nats), the information-density filter beside
    * q44's heuristics and q67's repetition counts: keyboard-mash and
    * template-spam docs sit at the entropy extremes that token counts
    * alone miss (the CCNet/quality-classifier-era signal). Uses the
    * one-pass identity H = ln(n) − (Σ c·ln c)/n over per-token counts.
    *
    * Scale shape: MAP-ONLY — zero shuffle. Token counts come from
    * run-lengths over the per-doc SORTED token array (array HOFs:
    * run starts by adjacent-inequality, counts by consecutive-start
    * differences, one `aggregate` fold for Σ c·ln c), so the corpus
    * never explodes into a (doc, token) stream and nothing is keyed by
    * token. 6dp rounding per the q74 convention (the fold's float
    * accumulation order differs from the oracle's SUM). */
  private def q156TokenEntropy(s: SparkSession, dir: String): DataFrame = {
    val tk = TextFunctions.tokens(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"), sort_array(tk).as("st"))
      .filter(size(col("st")) > 0)
      .select(col("doc_id"), col("st"), size(col("st")).as("n"),
        filter(sequence(lit(1), size(col("st"))), i =>
          i === 1 || element_at(col("st"), i) =!= element_at(col("st"), i - 1))
          .as("starts"))
      .select(col("doc_id"), col("n"),
        transform(sequence(lit(1), size(col("starts"))), j =>
          // ANSI mode: element_at past the end THROWS, so the last
          // run's end is guarded explicitly (n + 1), not coalesced
          when(j < size(col("starts")), element_at(col("starts"), j + 1))
            .otherwise(col("n") + 1) -
            element_at(col("starts"), j))
          .as("counts"))
      .select(col("doc_id"),
        col("n").cast("long").as("n_tokens"),
        size(col("counts")).cast("long").as("n_uniq"),
        round(
          log(col("n").cast("double")) -
            aggregate(col("counts"), lit(0.0d),
              (acc, c) => acc + c.cast("double") * log(c.cast("double"))) /
              col("n").cast("double"),
          6).as("entropy"))
  }

  private val q156Sql =
    """WITH t AS (
      |  SELECT doc_id,
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0) AS tk
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, tok, COUNT(*) AS c
      |  FROM (SELECT doc_id, UNNEST(tk) AS tok FROM t WHERE LEN(tk) > 0)
      |  GROUP BY doc_id, tok),
      |a AS (
      |  SELECT doc_id, SUM(c) AS n, SUM(c * LN(c)) AS s, COUNT(*) AS n_uniq
      |  FROM c GROUP BY doc_id)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
      |  CAST(n_uniq AS BIGINT) AS n_uniq,
      |  ROUND(LN(n) - s / n, 6) AS entropy
      |FROM a""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q31_token_stats", q31TokenStats, Some(q31Sql)),
    Q("q156_token_entropy", q156TokenEntropy, Some(q156Sql)),
    Q("q133_nfc_audit", q133NfcAudit, Some(q133Sql)),
    Q("q119_charset_audit", q119CharsetAudit, Some(q119Sql)),
    Q("q120_line_filter", q120LineFilter, Some(q120Sql)),
    Q("q111_vocab_growth", q111VocabGrowth, Some(q111Sql)),
    Q("q149_zipf_spectrum", q149ZipfSpectrum, Some(q149Sql)),
    Q("q115_source_divergence", q115SourceDivergence, Some(q115Sql)),
    Q("q95_novelty", q95Novelty, Some(q95Sql)),
    Q("q32_lang_id", q32LangId, Some(q32Sql)),
    Q("q33_fingerprint", q33Fingerprint, Some(q33Sql)),
    Q("q44_quality_score", q44QualityScore, Some(q44Sql)),
    Q("q66_pii_redact", q66PiiRedact, Some(q66Sql)),
    Q("q67_repetition", q67Repetition, Some(q67Sql)),
    Q("q70_vocab", q70Vocab, Some(q70Sql)),
    Q("q77_bpe_pairs", q77BpePairs, Some(q77Sql)),
    Q("q159_bpe_encode", q159BpeEncode, Some(q159Sql)),
    Q("q160_bpe_pack", q160BpePack, Some(q160Sql)),
    Q("q80_pmi_pairs", q80PmiPairs, Some(q80Sql)),
    Q("q82_tfidf_terms", q82TfidfTerms, Some(q82Sql)),
    Q("q86_bpe_merge", q86BpeMerge, Some(q86Sql)))
}
