package graft.operators

import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed training-data pipeline — the operators working
  * TOGETHER, which is what the engine exists for: quality-filter the
  * corpus, keep one canonical document per exact-duplicate group, and
  * emit the export manifest (id + content fingerprint + size). Each
  * stage is a verified operator elsewhere (q44, q24, q33); this query
  * proves the composition end-to-end against one SQL oracle.
  */
object PipelineQueries extends QueryModule {

  private def q50PipelineExport(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // canonical = smallest doc_id per exact content digest (q24 shape)
    val canonical = docs
      .groupBy(md5(col("text")).as("digest"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val kept = TextAnalysisQueries.qualityScores(docs)
      .filter(col("keep") === 1)
      .select("doc_id", "n_tokens")
    docs.join(canonical, "doc_id")
      .join(kept, "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        TextFunctions.fingerprint(col("text")).as("fp"))
  }

  private val q50Sql =
    """WITH canonical AS (
      |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY MD5(text)),
      |t AS (
      |  SELECT doc_id,
      |    CAST(LEN(text) AS INT) AS n_chars,
      |    CAST(LEN(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) AS INT) AS n_alpha,
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0) AS tk
      |  FROM documents),
      |h AS (
      |  SELECT doc_id, CAST(LEN(tk) AS INT) AS n_tokens,
      |    CAST(LEN(tk) BETWEEN 5 AND 1000 AS INT) +
      |    CAST(LEN(LIST_FILTER(tk, x -> x IN ('the', 'a'))) * 20 >= LEN(tk) AS INT) +
      |    CAST(n_alpha * 2 >= n_chars AS INT) +
      |    CAST(LIST_MAX(LIST_TRANSFORM(tk, x -> LEN(x))) <= 25 AS INT) AS hits
      |  FROM t),
      |kept AS (SELECT doc_id, n_tokens FROM h WHERE hits = 4)
      |SELECT d.doc_id, k.n_tokens,
      |  MD5(ARRAY_TO_STRING(
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(d.text)), '\s+'), x -> LEN(x) > 0),
      |    ' ')) AS fp
      |FROM documents d
      |JOIN canonical c ON c.doc_id = d.doc_id
      |JOIN kept k ON k.doc_id = d.doc_id""".stripMargin

  /** SEQUENCE PACKING — the batch-construction step of a pretraining
    * pipeline: documents are concatenated into a token stream and split
    * every `PackBudget` tokens; each document reports the sample (bin)
    * its first token lands in and its offset inside it. Packing is done
    * independently per RANGE BUCKET of doc_ids (100 docs here), which
    * is the distributed formulation: a global running sum would be one
    * sequential window over the corpus — a single task at any scale —
    * while bucketed packing is embarrassingly parallel, loses at most
    * one partially-filled sample per bucket boundary, and keeps sample
    * ids deterministic (bucket * 10_000 + chunk). At 100 TB the bucket
    * key would be the ingest shard; the shape is identical. */
  private def q68SeqPack(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sizes = Tables.documents(s, dir).select(
      col("doc_id"),
      expr("doc_id DIV 100").as("bucket"),
      size(TextFunctions.tokens(col("text"))).cast("long").as("n_toks"))
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sizes.withColumn("cum", sum(col("n_toks")).over(w))
      .select(col("doc_id"), col("n_toks"),
        (col("bucket") * 10000 +
          expr(s"(cum - n_toks) DIV $PackBudget")).as("sample_id"),
        expr(s"(cum - n_toks) % $PackBudget").as("offset"))
  }

  private val PackBudget = 512L

  private val q68Sql =
    s"""WITH t AS (
       |  SELECT doc_id, doc_id // 100 AS bucket,
       |    CAST(LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'),
       |                         x -> LEN(x) > 0)) AS BIGINT) AS n_toks
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, bucket, n_toks,
       |    SUM(n_toks) OVER (PARTITION BY bucket ORDER BY doc_id) AS cum FROM t)
       |SELECT doc_id, n_toks,
       |  CAST(bucket * 10000 + (cum - n_toks) // $PackBudget AS BIGINT) AS sample_id,
       |  CAST((cum - n_toks) % $PackBudget AS BIGINT) AS offset
       |FROM c""".stripMargin
  // ^ the CASTs are load-bearing: DuckDB's windowed SUM(BIGINT)
  // promotes to HUGEINT and the promotion survives // and %, so
  // without them the oracle's sample_id/offset hash differently from
  // Spark's longs even when every value is identical (round-7 q68).

  /** DECONTAMINATION — benchmark n-gram overlap (the PaLM/GPT-3-style
    * eval-leakage check): flag every corpus document sharing at least
    * one word 3-gram with the eval set, reporting how many distinct
    * eval grams it hits. The eval set here is docs with doc_id <
    * [[EvalSetMax]] (deterministic, both engines construct it
    * identically); in production it is the benchmark suites.
    *
    * Scale shape: eval sets are MBs while the corpus is TBs, so the
    * distinct eval-gram set is BROADCAST — the corpus side streams
    * through a map-side hash semi-join with no shuffle of the corpus
    * grams at all; the only shuffle is the per-doc hit count, keyed on
    * doc_id (pre-combined map-side). */
  private def q69Contamination(s: SparkSession, dir: String): DataFrame = {
    // tokenTable = concrete tokens column before the shingle lambda
    // (q67 lesson) + the narrow-input spread, so the gram explode isn't
    // pinned to the scan's task count
    val grams = graft.dedup.Dedup.tokenTable(Tables.documents(s, dir), "doc_id", "text")
      .select(col("doc_id"),
        explode(TextFunctions.wordShingles(col("toks"), 3)).as("g"))
    val evalGrams = grams.filter(col("doc_id") < EvalSetMax)
      .select("g").distinct()
    grams.filter(col("doc_id") >= EvalSetMax)
      .join(broadcast(evalGrams), "g")
      // wordShingles dedupes per doc, so this counts DISTINCT shared grams
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  private val EvalSetMax = 20L

  private val q69Sql =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'), x -> LEN(x) > 0) AS t
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    LIST_DISTINCT([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN RANGE(1, LEN(t)-1)]) AS s
       |  FROM toks WHERE LEN(t) >= 3),
       |eg AS (SELECT DISTINCT UNNEST(s) AS g FROM sh WHERE doc_id < $EvalSetMax),
       |cg AS (SELECT doc_id, UNNEST(s) AS g FROM sh WHERE doc_id >= $EvalSetMax)
       |SELECT cg.doc_id, COUNT(*) AS n_hits
       |FROM cg JOIN eg USING (g) GROUP BY cg.doc_id""".stripMargin

  /** DECONTAMINATION, near-duplicate flavor — q69 catches verbatim
    * n-gram leakage; this catches lightly-edited eval copies (the
    * "benchmark got paraphrased into the crawl" case) as MinHash+LSH
    * near-dup pairs BETWEEN the eval slice and the corpus, every
    * candidate re-verified with exact Jaccard >= [[DecontamThreshold]].
    * The q26/q53 pairing argument applies across the set boundary too:
    * the oracle is the exact cross-set Jaccard join, so the banded
    * approximation must reproduce the exact answer.
    *
    * Scale shape (see [[graft.dedup.Dedup.minHashCrossPairs]]): the
    * eval side's band buckets are BROADCAST, so candidate generation is
    * a map-side hash join over the corpus's banded table — unlike the
    * q25 self-join, the corpus never shuffles on (band, bucket); the
    * exact-verify stage then touches only candidate pairs. */
  private def q83DecontamMinhash(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.minHashCrossPairs(Tables.documents(s, dir),
      "doc_id", "text", EvalSetMax, n = 3, threshold = DecontamThreshold,
      k = 32, bands = 16)

  private val DecontamThreshold = 0.8

  private val q83Sql =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'), x -> LEN(x) > 0) AS t
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    LIST_DISTINCT([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN RANGE(1, LEN(t)-1)]) AS s
       |  FROM toks WHERE LEN(t) >= 3)
       |SELECT a.doc_id AS doc_i, b.doc_id AS doc_j
       |FROM sh a JOIN sh b
       |  ON a.doc_id < $EvalSetMax AND b.doc_id >= $EvalSetMax
       |WHERE CAST(LEN(LIST_INTERSECT(a.s, b.s)) AS DOUBLE) /
       |      LEN(LIST_DISTINCT(LIST_CONCAT(a.s, b.s))) >= $DecontamThreshold""".stripMargin

  /** STRATIFIED REBALANCING — cap every language stratum at
    * [[StratumCap]] documents (the "don't let the dominant language
    * drown the mix" downsampling step of corpus construction; the en
    * stratum is ~40% of this corpus). Per-stratum keep probability is
    * cap/n, applied DETERMINISTICALLY: doc kept iff its 16-bit md5
    * bucket falls under the stratum's threshold, compared by integer
    * cross-multiplication (bucket·n < cap·2^16) so both engines agree
    * exactly — `rand()` sampling is irreproducible across engines AND
    * across retried tasks, which is why hash sampling is the only kind
    * this contract registers (q08 is the uniform flavor).
    *
    * Scale shape: stratum counts are one tiny aggregation broadcast
    * back onto the corpus; the keep decision is then map-side — the
    * corpus itself never shuffles. */
  private def q71StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val rates = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val bucket = md5Bucket16(col("doc_id"), salt = "", hexOffset = 1)
    docs.join(broadcast(rates), "lang")
      .filter(bucket * col("n") < lit(StratumCap) * 65536L)
      .select("doc_id", "lang")
  }

  /** Exact per-source sample quota for q118 — small enough that the
    * cut binds even at sf0.01's ~25 docs/source, so the gate verifies
    * the selection, not a pass-through. */
  private val GroupQuota = 10

  /** Salt fan-out for q118's first-pass window. 8 buckets × 32 cores is
    * already far beyond |sources|; at 1000 executors raise it with the
    * cluster, the algebra is salt-count-independent. */
  private val QuotaSalts = 8

  /** EXACT-QUOTA PER-GROUP SAMPLE — take exactly [[GroupQuota]] documents
    * per source (fewer only when the stratum is smaller), chosen
    * DETERMINISTICALLY by md5 rank so the draw is uniform-ish,
    * engine-reproducible, and stable under retries — the fixed-size
    * cousin of q71's rate-based stratified sampler (an eval-set /
    * human-review draw wants an exact count per stratum, not a rate).
    *
    * Scale shape: a plain `row_number over (partition by source)` drags
    * EVERY row of a huge source through one window partition — the
    * classic few-giant-groups skew. Instead the top-N is taken twice:
    * first within (source, salt) — [[QuotaSalts]]× the parallelism,
    * each salt bucket keeping its own local top-[[GroupQuota]] — then
    * the global top-[[GroupQuota]] over the ≤ quota·salts survivors per
    * source. The union of per-salt top-N is a superset of the global
    * top-N for ANY assignment of rows to salts, so the result is
    * EXACTLY the single-window answer (the oracle runs that single
    * window) while the heavy window never sees more than
    * quota·salts rows per source. */
  private def q118GroupQuotaSample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir).select(col("source"), col("doc_id"),
      md5(col("doc_id").cast("string")).as("rk"))
    val localW = Window.partitionBy("source", "salt").orderBy(col("rk"), col("doc_id"))
    val local = docs
      .withColumn("salt", pmod(col("doc_id"), lit(QuotaSalts.toLong)))
      .withColumn("lr", row_number().over(localW))
      .filter(col("lr") <= GroupQuota)
    val globalW = Window.partitionBy("source").orderBy(col("rk"), col("doc_id"))
    local
      .withColumn("rank", row_number().over(globalW))
      .filter(col("rank") <= GroupQuota)
      .select(col("source"), col("doc_id"), col("rank"))
  }

  private val q118Sql =
    s"""WITH r AS (
       |  SELECT source, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rank
       |  FROM documents)
       |SELECT source, doc_id, CAST(rank AS INT) AS rank
       |FROM r WHERE rank <= $GroupQuota""".stripMargin

  /** Per-stratum token budget for q128. */
  private val DrawBudget = 1000L

  /** TOKEN-BUDGETED STRATUM DRAW — fill each source's token budget
    * greedily in deterministic md5-rank order: a doc is admitted iff
    * the tokens consumed BEFORE it are still under [[DrawBudget]] (the
    * standard "take documents until the eval budget is full" rule; the
    * last admitted doc may overshoot). q71 samples by rate, q118 by
    * doc quota — this one by TOKEN mass, which is what an eval-set or
    * annotation budget is actually denominated in.
    *
    * Scale shape: a doc needs ≥ 1 token to be admitted, so at most
    * [[DrawBudget]] docs per source can ever be admitted — the q118
    * salted top-N prefilter with quota = budget therefore bounds the
    * exact cumulative window to ≤ budget·salts rows per source however
    * large the stratum; the prefix-sum itself cannot be salted (it is
    * order-dependent), bounding its input is the scale lever. */
  /** DETERMINISTIC WEIGHTED SAMPLE WITHOUT REPLACEMENT — the
    * Efraimidis–Spirakis exponential race (IPL 2006): each doc gets key
    * −ln(u)/w with u uniform and w its weight (chars here; any quality
    * score in production), and the k SMALLEST keys are a weighted
    * without-replacement draw. u derives from a salted md5 of the id
    * (the q81/q118/q145 determinism convention), so the "random" draw
    * is bit-reproducible on any engine and the oracle replays it
    * exactly — the missing member of the sampling family: q08 is
    * unweighted Bernoulli, q118/q128 are quota draws, this is
    * probability-proportional-to-size.
    *
    * Scale shape: one scan computes keys map-side; the k smallest ride
    * a TakeOrdered (per-partition top-k then a k-row driver merge,
    * never a global sort) — constant memory in corpus size. The only
    * doubles are the shared −ln(u)/w expression whose ORDERING both
    * engines agree on (md5-spread keys never tie within ulp); the
    * registered output carries ids and integer weights only. */
  private def q153WeightedSample(s: SparkSession, dir: String): DataFrame = {
    val u = (conv(substring(md5(concat(lit("wsr1:"), col("doc_id"))), 1, 13),
      16, 10).cast("double") + 1.0) / 4503599627370497.0 // (2^52)+1: u in (0,1]
    Tables.documents(s, dir)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"), (-log(u) / col("n_chars")).as("k"))
      .orderBy("k").limit(WsrK)
      .select(col("doc_id"), col("n_chars"))
  }

  private val WsrK = 100

  private val q153Sql =
    s"""SELECT doc_id, n_chars FROM (
       |  SELECT doc_id, n_chars,
       |    -LN((CAST(CAST('0x' || SUBSTR(MD5('wsr1:' || doc_id), 1, 13) AS BIGINT)
       |         AS DOUBLE) + 1.0) / 4503599627370497.0) / n_chars AS k
       |  FROM documents WHERE n_chars > 0)
       |ORDER BY k LIMIT $WsrK""".stripMargin

  private def q128BudgetSample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(s, dir).select(col("source"), col("doc_id"),
        size(TextFunctions.tokens(col("text"))).as("n_tok"),
        md5(col("doc_id").cast("string")).as("rk"))
      .filter(col("n_tok") > 0)
    val localW = Window.partitionBy("source", "salt").orderBy(col("rk"), col("doc_id"))
    val pre = base
      .withColumn("salt", pmod(col("doc_id"), lit(QuotaSalts.toLong)))
      .withColumn("lr", row_number().over(localW))
      .filter(col("lr") <= DrawBudget)
      .drop("salt", "lr")
    val cumW = Window.partitionBy("source").orderBy(col("rk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pre.withColumn("cum", sum("n_tok").over(cumW))
      .filter(col("cum") - col("n_tok") < DrawBudget)
      .select(col("source"), col("doc_id"), col("n_tok"),
        col("cum").cast("long").as("cum_tokens"))
  }

  // CAST(... AS BIGINT): DuckDB's windowed SUM(BIGINT) promotes to
  // HUGEINT (the q68 lesson)
  private val q128Sql =
    s"""WITH t AS (
       |  SELECT source, doc_id,
       |    LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'),
       |                    x -> LEN(x) > 0)) AS n_tok,
       |    MD5(CAST(doc_id AS VARCHAR)) AS rk
       |  FROM documents),
       |c AS (
       |  SELECT source, doc_id, n_tok,
       |    SUM(n_tok) OVER (PARTITION BY source ORDER BY rk, doc_id
       |                     ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM t WHERE n_tok > 0)
       |SELECT source, doc_id, CAST(n_tok AS INT) AS n_tok,
       |  CAST(cum AS BIGINT) AS cum_tokens
       |FROM c WHERE cum - n_tok < $DrawBudget""".stripMargin

  /** DATA-MIXING BUDGET — the sampling-proportion table a pretraining
    * run is configured from: each source's contribution to a
    * [[TokenBudget]]-token draw, with dominant sources CAPPED at
    * [[SourceCap]] tokens before normalization (the "don't let one
    * crawl drown the mixture" rule; weights-by-capped-share is the
    * integer-exact cousin of the usual temperature reweighting, chosen
    * because a sqrt/power weight needs an accumulation-ordered float
    * sum that no two engines reproduce bit-for-bit). `epochs` > 1
    * means the source is oversampled (multiple passes), < 1
    * subsampled — exactly the knob a trainer's data loader reads.
    * All inputs are exact longs; the two emitted ratios are single
    * exact-long divisions rounded to 6dp (q74's convention).
    *
    * Scale shape: one |sources|-group aggregation with map-side
    * partials over doc-local token counts; the grand total is a
    * broadcast scalar. The corpus never shuffles. */
  private def q84MixBudget(s: SparkSession, dir: String): DataFrame = {
    val perDoc = Tables.documents(s, dir)
      .select(col("source"),
        size(TextFunctions.tokens(col("text"))).as("n_tok"))
      .filter(col("n_tok") > 0)
    // materialized: |sources| rows consumed by BOTH the grand total and
    // the output join — without this the corpus tokenization upstream
    // runs once per branch (no cross-branch reuse in Catalyst)
    val bySrc = perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok").cast("long")).as("n_tokens"))
      .withColumn("alloc", least(col("n_tokens"), lit(SourceCap)))
      // LAZY measured-and-kept (r11 A/B at sf0.1: lazy MIN 0.302 s vs
      // eager 0.303 s — a tie; lazy avoids the extra up-front job)
      .localCheckpoint(eager = false)
    val total = bySrc.agg(sum("alloc").as("total_alloc"))
    bySrc.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("alloc"),
        round(col("alloc").cast("double") / col("total_alloc"), 6).as("mix_frac"),
        // divide twice rather than multiplying the two long denominators:
        // total_alloc * n_tokens can pass 2^63 at real corpus scale and
        // Spark 4's ANSI mode throws on long overflow (the numerator is
        // bounded by constants: TokenBudget * SourceCap = 4e9)
        round((lit(TokenBudget) * col("alloc")).cast("double") /
          col("total_alloc") / col("n_tokens"), 6).as("epochs"))
  }

  private val TokenBudget = 200000L
  private val SourceCap = 20000L

  private val q84Sql =
    s"""WITH d AS (
       |  SELECT source,
       |    LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'),
       |                    x -> LEN(x) > 0)) AS n_tok
       |  FROM documents),
       |s AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       |    LEAST(CAST(SUM(n_tok) AS BIGINT), $SourceCap) AS alloc
       |  FROM d WHERE n_tok > 0 GROUP BY source),
       |t AS (SELECT CAST(SUM(alloc) AS BIGINT) AS total_alloc FROM s)
       |SELECT s.source, s.n_docs, s.n_tokens, s.alloc,
       |  ROUND(CAST(s.alloc AS DOUBLE) / t.total_alloc, 6) AS mix_frac,
       |  ROUND(CAST($TokenBudget * s.alloc AS DOUBLE) /
       |        t.total_alloc / s.n_tokens, 6) AS epochs
       |FROM s, t""".stripMargin

  /** Uniform 16-bit bucket from an id: 4 hex chars of md5(id || salt)
    * starting at `hexOffset`, as a long in [0, 65536). One definition
    * for every deterministic-sampling decision in this module — the
    * 4-char width and the 65536 threshold scale (and the floor(f·2^16)
    * cut constants) must move together or buckets silently skew. */
  private def md5Bucket16(id: Column, salt: String, hexOffset: Int): Column = {
    val hashed = if (salt.isEmpty) id.cast("string")
      else concat(id.cast("string"), lit(salt))
    conv(substring(md5(hashed), hexOffset, 4), 16, 10).cast("long")
  }

  private val StratumCap = 100L

  private val q71Sql =
    s"""WITH r AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang)
       |SELECT d.doc_id, d.lang
       |FROM documents d JOIN r USING (lang)
       |WHERE CAST('0x' || SUBSTRING(MD5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS BIGINT) * n
       |      < $StratumCap * 65536""".stripMargin

  /** KEEP-BEST-PER-KEY — URL-level dedup: one canonical document per
    * `source`, the longest one, ties to the smallest doc_id (the
    * CommonCrawl "keep the longest capture of each URL" step; the
    * reference's canonical-per-group shape is q50's min-per-digest).
    *
    * Shape: a single `max_by` aggregation keyed on the (n_chars,
    * -doc_id) struct — NOT a window. A window needs a full sort of
    * every group and carries all rows to one partition per key; max_by
    * partial-aggregates map-side, so each executor forwards ONE
    * candidate row per source it saw, and the shuffle is |sources|
    * rows regardless of corpus size. Struct ordering is lexicographic
    * in both engines' argmax tie-break here because the tie-break is
    * encoded IN the key (bigger n_chars wins, then bigger -doc_id =
    * smaller doc_id), making the winner total-order-deterministic. */
  private def q72KeepBest(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .groupBy("source")
      .agg(max_by(
        struct(col("doc_id"), col("n_chars")),
        struct(col("n_chars"), (-col("doc_id")).as("neg_id"))).as("best"))
      .select(col("source"), col("best.doc_id").as("doc_id"),
        col("best.n_chars").as("n_chars"))
  }

  private val q72Sql =
    """SELECT source, doc_id, n_chars FROM documents
      |QUALIFY ROW_NUMBER() OVER (
      |  PARTITION BY source ORDER BY n_chars DESC, doc_id) = 1""".stripMargin

  /** DOCUMENT CHUNKING — the context-window construction step: each
    * document's token stream is cut into [[ChunkSize]]-token windows
    * every [[ChunkStride]] tokens (overlapping, stride < size, as
    * training pipelines do so no boundary context is lost). Output is
    * one row per chunk: its 1-based token start, its real length
    * (tail chunks are short), and a content digest.
    *
    * Shape: `sequence(1, n, stride)` builds the (tiny) start-offset
    * array, one generator explode per chunk, then the slice/digest are
    * PLAIN row-at-a-time expressions on the exploded rows — no
    * higher-order lambdas re-evaluating per element (the q63 lesson:
    * HOF trees evaluate interpreted and re-inline their inputs).
    * Map-only: no shuffle at any scale; chunk count ~ n/stride rows
    * per doc is the unavoidable output size. */
  private def q73DocChunks(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) > 0)
    toks
      .select(col("doc_id"), col("tk"),
        explode(sequence(lit(1), size(col("tk")), lit(ChunkStride))).as("start"))
      .select(col("doc_id"), col("start"),
        least(lit(ChunkSize), size(col("tk")) - col("start") + 1).as("chunk_len"),
        md5(concat_ws(" ", slice(col("tk"), col("start"), lit(ChunkSize)))).as("chunk_fp"))
  }

  private val ChunkSize = 64
  private val ChunkStride = 48

  private val q73Sql =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'),
       |                x -> LEN(x) > 0) AS tk
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, tk, UNNEST(RANGE(1, LEN(tk) + 1, $ChunkStride)) AS start
       |  FROM t WHERE LEN(tk) > 0)
       |SELECT doc_id, CAST(start AS INT) AS start,
       |  CAST(LEAST($ChunkSize, LEN(tk) - start + 1) AS INT) AS chunk_len,
       |  MD5(ARRAY_TO_STRING(tk[start : start + ${ChunkSize - 1}], ' ')) AS chunk_fp
       |FROM c""".stripMargin

  /** UNIGRAM-LM SCORING — the cheap perplexity proxy used for corpus
    * quality filtering (CCNet-style): score each document by the mean
    * negative log-probability of its tokens under the corpus's own
    * unigram distribution. Rare-token-laden (gibberish) docs score
    * high, boilerplate scores low. Rounded to 6dp on both sides; the
    * probabilities are ratios of exact counts, so the doubles agree
    * before rounding (q56's convention).
    *
    * Scale shape: the unigram table is Zipf-skewed but TINY relative
    * to the corpus (millions of types vs trillions of tokens), so it
    * is BROADCAST and the per-token lookup is a map-side hash join —
    * broadcasting also dissolves the "the"-key skew a shuffled join
    * would suffer. The only corpus-keyed shuffle is the final per-doc
    * mean, pre-combined map-side. Token totals ride the same broadcast
    * (a 1-row cross join folded into it). */
  private def q74UnigramLm(s: SparkSession, dir: String): DataFrame = {
    // materialized per-doc ARRAY table (q80's measured pattern): the
    // token stream feeds the freq aggregate AND the scored main join —
    // and the corpus token total comes in closed form from the array
    // sizes (one fewer pass over the exploded stream; guide §2.4).
    // size() is -1 on a NULL array, hence the >0 guard.
    val t = Tables.documents(s, dir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))
      .localCheckpoint(eager = false)
    val tok = t.select(col("doc_id"), explode(col("tk")).as("tok"))
    val freq = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .crossJoin(t.agg(sum(when(size(col("tk")) > 0,
        size(col("tk")).cast("long")).otherwise(0L)).as("total")))
    tok.join(broadcast(freq), "tok")
      .groupBy("doc_id")
      .agg(round(avg(-log(col("cnt") / col("total"))), 6).as("lm_score"))
  }

  private val q74Sql =
    """WITH tok AS (
      |  SELECT doc_id, UNNEST(LIST_FILTER(
      |    REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0)) AS tok
      |  FROM documents),
      |freq AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
      |tot AS (SELECT COUNT(*) AS total FROM tok)
      |SELECT t.doc_id, ROUND(AVG(-LN(f.cnt / tot.total)), 6) AS lm_score
      |FROM tok t JOIN freq f USING (tok), tot
      |GROUP BY t.doc_id""".stripMargin

  /** STUPID-BACKOFF BIGRAM LM SCORING — the step up from q74's unigram
    * proxy to the LM actually used for corpus filtering at scale
    * (Brants et al. 2007, "Large Language Models in Machine
    * Translation": score S(w2|w1) = c(w1 w2)/c(w1) when the bigram
    * count clears a prune threshold, else back off to alpha *
    * c(w2)/total with NO normalization — the scheme designed
    * specifically so a distributed LM needs only pruned count tables,
    * never a normalization pass). Per doc: mean of -log S over all
    * positions (the first token has no context and scores as unigram).
    * Scores are ratios of exact counts combined with one multiply/log,
    * rounded to 6dp on both sides (q74's convention).
    *
    * Scale shape: this is WHY stupid backoff exists. The pruned bigram
    * table (count >= [[BoMinCount]]) is tiny relative to the corpus —
    * Zipf pruning discards the long tail of singleton bigrams that
    * dominates type counts — and the unigram table is the vocabulary.
    * The three lookup joins carry NO broadcast hints on purpose: AQE
    * broadcasts them while they fit (every suite scale) and falls back
    * to shuffled hash joins when the vocabulary outgrows the threshold,
    * which is the honest 100 TB shape — Brants et al. shard their LM
    * counts rather than replicate them, and a forced broadcast was
    * MEASURED here to invert cold/warm timings at 30x-organic vocab
    * (ScaleProbe: 35.9 s warm vs 8.8 s cold). The (tok, prev) pairs
    * are built from each doc's token array with one indexed
    * `transform` — no self-join, no second explode. */
  private def q147BackoffLm(s: SparkSession, dir: String): DataFrame = {
    // materialized: the token table feeds THREE gram passes below (the
    // unigram aggregate, the bigram aggregate, the scored main stream) —
    // without the boundary the tokenize pipeline re-runs per branch
    // (q80's measured pattern: checkpoint the per-doc ARRAY table, never
    // the exploded stream; guide §2.4)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) > 0)
      .localCheckpoint(eager = false)
    val grams = docs.select(col("doc_id"), explode(
        transform(col("tk"), (x, i) => struct(
          x.as("tok"),
          when(i === 0, lit(null).cast("string"))
            .otherwise(get(col("tk"), i - 1)).as("prev")))).as("g"))
      .select(col("doc_id"), col("g.tok").as("tok"), col("g.prev").as("prev"))
    // the gram total in closed form from the per-doc array sizes (every
    // token emits exactly one gram row), q80's n_pairs trick — saves a
    // full pass over the exploded gram stream; vocab-sized result
    // materialized because it joins the main stream TWICE (tok + prev)
    val uni = grams.groupBy("tok").agg(count(lit(1)).as("c_uni"))
      .crossJoin(docs.agg(sum(size(col("tk")).cast("long")).as("total")))
      .localCheckpoint(eager = false)
    val big = grams.filter(col("prev").isNotNull)
      .groupBy("prev", "tok").agg(count(lit(1)).as("c_big"))
      .filter(col("c_big") >= BoMinCount)
    grams
      .join(uni, "tok")
      .join(uni.select(col("tok").as("prev"),
        col("c_uni").as("c_prev")), Seq("prev"), "left")
      .join(big, Seq("prev", "tok"), "left")
      .groupBy("doc_id")
      .agg(round(avg(
        when(col("prev").isNull, -log(col("c_uni") / col("total")))
          .when(col("c_big").isNotNull, -log(col("c_big") / col("c_prev")))
          .otherwise(-log(lit(BoAlpha) * col("c_uni") / col("total")))), 6)
        .as("bo_score"))
  }

  private val BoMinCount = 3L
  private val BoAlpha = 0.4

  private val q147Sql =
    s"""WITH t AS (
       |  SELECT doc_id, LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'),
       |                             x -> LEN(x) > 0) AS tk
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, tk, UNNEST(RANGE(1, LEN(tk) + 1)) AS i
       |  FROM t WHERE LEN(tk) > 0),
       |grams AS (
       |  SELECT doc_id, tk[i] AS tok,
       |         CASE WHEN i = 1 THEN NULL ELSE tk[i - 1] END AS prev
       |  FROM g),
       |uni AS (SELECT tok, COUNT(*) AS c_uni FROM grams GROUP BY tok),
       |tot AS (SELECT COUNT(*) AS total FROM grams),
       |big AS (
       |  SELECT prev, tok, COUNT(*) AS c_big FROM grams
       |  WHERE prev IS NOT NULL GROUP BY prev, tok
       |  HAVING COUNT(*) >= $BoMinCount)
       |SELECT gr.doc_id, ROUND(AVG(CASE
       |    WHEN gr.prev IS NULL THEN -LN(u.c_uni / tot.total)
       |    WHEN b.c_big IS NOT NULL THEN -LN(b.c_big / pu.c_uni)
       |    ELSE -LN($BoAlpha * u.c_uni / tot.total) END), 6) AS bo_score
       |FROM grams gr
       |JOIN uni u USING (tok)
       |LEFT JOIN uni pu ON pu.tok = gr.prev
       |LEFT JOIN big b ON b.prev = gr.prev AND b.tok = gr.tok, tot
       |GROUP BY gr.doc_id""".stripMargin

  /** PARAGRAPH-LEVEL EXACT DEDUP — the Gopher/RefinedWeb boilerplate
    * removal step: segment every document into paragraphs, drop every
    * paragraph whose exact content recurs in MORE THAN ONE document
    * (navigation chrome, license notices, templated headers — all
    * copies go, the step removes boilerplate rather than electing a
    * canonical copy), and report per document how much survived plus a
    * digest of the surviving sequence. This corpus has no newlines, so
    * "paragraph" is a fixed [[ParaBlock]]-token block — the
    * segmentation rule is corpus-specific, the operator shape is not.
    *
    * Scale shape: one shuffle keyed on the paragraph digest builds the
    * document-frequency table (map-side partial counts); the repeated
    * set (df > 1) is a small fraction of distinct paragraphs in real
    * corpora and joins back digest-keyed — the document text itself is
    * never shuffled, only (doc_id, start, 16-byte digest) rows. The
    * per-doc reassembly aggregation collects ~n_tokens/[[ParaBlock]]
    * digests per doc: bounded, and the sort_array+transform runs once
    * per doc on that small array, not per element of the corpus. */
  private def q75ParaDedup(s: SparkSession, dir: String): DataFrame = {
    // materialized: three consumers below (df table, anti-join left
    // side, per-doc block counts) — without this the tokenize + explode
    // + md5 pipeline runs once per DAG branch
    val blocks = Tables.documents(s, dir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col("doc_id"), col("tk"),
        explode(sequence(lit(1), size(col("tk")), lit(ParaBlock))).as("start"))
      .select(col("doc_id"), col("start"),
        md5(concat_ws(" ", slice(col("tk"), col("start"), lit(ParaBlock)))).as("dg"))
      // LAZY measured-and-kept (r11 A/B at sf0.1: lazy MIN 0.374 s vs
      // eager 0.387 s over 5 alternating iters)
      .localCheckpoint(eager = false)
    val hot = blocks.groupBy("dg")
      .agg(countDistinct(col("doc_id")).as("ddf"))
      .filter(col("ddf") > 1).select("dg")
    val kept = blocks.join(hot, Seq("dg"), "left_anti")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_kept"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("start"), col("dg")))),
          x => x.getField("dg")))).as("kept_fp"))
    blocks.groupBy("doc_id").agg(count(lit(1)).as("n_blocks"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        // md5 of the empty string = the digest of a fully-deduped doc
        coalesce(col("kept_fp"), lit("d41d8cd98f00b204e9800998ecf8427e"))
          .as("kept_fp"))
  }

  private val ParaBlock = 20

  private val q75Sql =
    s"""WITH t AS (
       |  SELECT doc_id, LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'),
       |                             x -> LEN(x) > 0) AS tk
       |  FROM documents),
       |b AS (
       |  SELECT doc_id, start,
       |    MD5(ARRAY_TO_STRING(tk[start : start + ${ParaBlock - 1}], ' ')) AS dg
       |  FROM (SELECT doc_id, tk, UNNEST(RANGE(1, LEN(tk) + 1, $ParaBlock)) AS start
       |        FROM t WHERE LEN(tk) > 0)),
       |hot AS (SELECT dg FROM b GROUP BY dg HAVING COUNT(DISTINCT doc_id) > 1),
       |k AS (SELECT doc_id, start, dg FROM b ANTI JOIN hot USING (dg)),
       |ka AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |         MD5(STRING_AGG(dg, ' ' ORDER BY start)) AS kept_fp
       |       FROM k GROUP BY doc_id),
       |na AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_blocks FROM b GROUP BY doc_id)
       |SELECT na.doc_id, na.n_blocks,
       |  COALESCE(ka.n_kept, CAST(0 AS BIGINT)) AS n_kept,
       |  COALESCE(ka.kept_fp, MD5('')) AS kept_fp
       |FROM na LEFT JOIN ka USING (doc_id)""".stripMargin

  /** DSIR-STYLE IMPORTANCE WEIGHTS (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score each
    * document by how much more likely its tokens are under a TARGET
    * domain's hashed-n-gram distribution than under the raw corpus's —
    * the log importance weight Σ_tok log(p_target(b)/p_raw(b)), with
    * tokens hashed into [[DsirBuckets]] buckets and both distributions
    * Laplace-smoothed. Sampling against these weights tilts a crawl
    * toward the target domain (here: the `lang = 'en'` slice; in
    * production, a trusted high-quality corpus). Rounded to 6dp — the
    * bucket probabilities are ratios of exact counts (q74's convention)
    * and the per-doc sum's accumulation-order noise is ~1e-12, far
    * below the rounding granularity.
    *
    * Scale shape: both distributions are tiny fixed-size aggregations
    * (≤ [[DsirBuckets]] rows, map-side partial counts) folded into ONE
    * broadcast lookup of per-bucket log-ratios; the corpus-side scan
    * then maps each token to its bucket and the only corpus-keyed
    * shuffle is the per-doc sum, pre-combined map-side. Broadcasting
    * dissolves the Zipf head skew a shuffled bucket join would suffer
    * (the hottest bucket holds "the"). */
  private def q76DsirWeights(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("lang"),
        pmod(conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"),
          lit(DsirBuckets.toLong)).as("b"))
    // BOTH distributions in ONE aggregation pass (raw count + filtered
    // target count per bucket), totals derived from the tiny result —
    // the corpus is scanned exactly twice (distributions, then scoring),
    // which is DSIR's inherent two-pass shape; a naive
    // raw/target/totals split re-tokenized it four times
    val dist = tok.groupBy("b").agg(
      count(lit(1)).as("rc"),
      count(when(col("lang") === "en", 1)).as("tc"))
    val totals = dist.agg(sum("rc").as("r"), sum("tc").as("t"))
    val lookup = dist.crossJoin(totals)
      .select(col("b"),
        log(((col("tc") + 1) / (col("t") + DsirBuckets)) /
            ((col("rc") + 1) / (col("r") + DsirBuckets))).as("lr"))
    tok.join(broadcast(lookup), "b")
      .groupBy("doc_id").agg(round(sum(col("lr")), 6).as("dsir_w"))
  }

  private val DsirBuckets = 1024

  private val q76Sql =
    s"""WITH tok AS (
       |  SELECT doc_id, lang,
       |    UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'),
       |                       x -> LEN(x) > 0)) AS tok
       |  FROM documents),
       |tb AS (
       |  SELECT doc_id, lang,
       |    CAST('0x' || SUBSTRING(MD5(tok), 1, 8) AS BIGINT) % $DsirBuckets AS b
       |  FROM tok),
       |raw AS (SELECT b, COUNT(*) AS rc FROM tb GROUP BY b),
       |tgt AS (SELECT b, COUNT(*) AS tc FROM tb WHERE lang = 'en' GROUP BY b),
       |tot AS (SELECT COUNT(*) AS r, COUNT(*) FILTER (lang = 'en') AS t FROM tb),
       |lk AS (
       |  SELECT raw.b,
       |    LN(((COALESCE(tc, 0) + 1.0) / (t + $DsirBuckets)) /
       |       ((rc + 1.0) / (r + $DsirBuckets))) AS lr
       |  FROM raw LEFT JOIN tgt USING (b), tot)
       |SELECT tb.doc_id, ROUND(SUM(lr), 6) AS dsir_w
       |FROM tb JOIN lk USING (b) GROUP BY tb.doc_id""".stripMargin

  /** CORPUS REPORT CARD — the per-slice health summary every corpus
    * curation run ends with: for each (source, lang) stratum, document
    * and token counts, how many documents are exact-duplicate copies
    * (non-canonical under the q24 digest rule), and how many clear the
    * q44 quality bar. Pure composition of verified operators, reduced
    * to integer-exact aggregates.
    *
    * Scale shape: the digest canonical-set is one hash-keyed
    * aggregation (16-byte digest rows, map-side partials), the quality
    * columns are map-only expressions, both joins are id-keyed
    * equi-joins, and the final aggregation has |sources × langs| groups
    * — every stage linear, nothing corpus-sized ever broadcast. */
  private def q79CorpusReport(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val canonical = docs
      .groupBy(md5(col("text")).as("digest"))
      .agg(min("doc_id").as("doc_id"))
      .select(col("doc_id"), lit(1).as("is_canon"))
    val quality = TextAnalysisQueries.qualityScores(docs)
      .select("doc_id", "n_tokens", "keep")
    docs.select("doc_id", "source", "lang")
      .join(canonical, Seq("doc_id"), "left")
      .join(quality, "doc_id")
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("n_tokens"),
        sum(when(col("is_canon").isNull, 1L).otherwise(0L)).as("n_dupes"),
        // keep is NULL for zero-token docs (array_max of an empty array);
        // the oracle's SUM(CASE ...) counts those as 0, so mirror that
        // exactly — a plain sum(keep) would emit NULL for an all-empty
        // stratum and hash-diverge
        sum(when(col("keep") === 1, 1L).otherwise(0L)).as("n_keep"))
  }

  private val q79Sql =
    """WITH canonical AS (
      |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY MD5(text)),
      |t AS (
      |  SELECT doc_id,
      |    CAST(LEN(text) AS INT) AS n_chars,
      |    CAST(LEN(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) AS INT) AS n_alpha,
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0) AS tk
      |  FROM documents),
      |h AS (
      |  SELECT doc_id, CAST(LEN(tk) AS INT) AS n_tokens,
      |    CAST(LEN(tk) BETWEEN 5 AND 1000 AS INT) +
      |    CAST(LEN(LIST_FILTER(tk, x -> x IN ('the', 'a'))) * 20 >= LEN(tk) AS INT) +
      |    CAST(n_alpha * 2 >= n_chars AS INT) +
      |    CAST(LIST_MAX(LIST_TRANSFORM(tk, x -> LEN(x))) <= 25 AS INT) AS hits
      |  FROM t)
      |SELECT d.source, d.lang,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(h.n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dupes,
      |  CAST(SUM(CASE WHEN h.hits = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
      |FROM documents d
      |LEFT JOIN canonical c ON c.doc_id = d.doc_id
      |JOIN h ON h.doc_id = d.doc_id
      |GROUP BY 1, 2""".stripMargin

  /** TRAIN/VAL/TEST SPLIT + SHARD ASSIGNMENT — the last step before a
    * corpus ships to a trainer: every document is routed to a split
    * (90/5/5) and a shard within it, DETERMINISTICALLY, by hashing the
    * stable document id — never `rand()`, which is irreproducible
    * across engines, retried tasks, and reruns (the q71 argument; the
    * salt `:split` decorrelates this routing from q71's sampling
    * buckets so the two decisions are independent). The registered
    * output is the (split, shard) manifest — doc and char counts per
    * cell — which is what a training job actually consumes to size its
    * data loader.
    *
    * Scale shape: the assignment is MAP-ONLY (one md5 per row, two
    * substring/conv extractions — no join, no lookup table), and the
    * manifest aggregation has 3 × [[NumShards]] groups with map-side
    * partials, so the shuffle is |cells| rows per executor regardless
    * of corpus size. At 100 TB this is the shape you want: routing is
    * a pure function of the row, so shards can be written directly by
    * a partitioned writer with no global coordination. */
  private def q81TrainSplit(s: SparkSession, dir: String): DataFrame = {
    val b = md5Bucket16(col("doc_id"), salt = ":split", hexOffset = 1)
    val shard = md5Bucket16(col("doc_id"), salt = ":split", hexOffset = 5) % NumShards
    Tables.documents(s, dir)
      .select(
        when(b < TrainCut, "train").when(b < ValCut, "val").otherwise("test")
          .as("split"),
        shard.as("shard"), col("n_chars"))
      .groupBy("split", "shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
  }

  // 16-bit bucket thresholds: floor(0.90 * 65536), floor(0.95 * 65536)
  private val TrainCut = 58982L
  private val ValCut   = 62259L
  private val NumShards = 8L

  private val q81Sql =
    s"""WITH a AS (
       |  SELECT n_chars,
       |    CAST('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR) || ':split'), 1, 4) AS BIGINT) AS b,
       |    CAST('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR) || ':split'), 5, 4) AS BIGINT) % $NumShards AS shard
       |  FROM documents)
       |SELECT CASE WHEN b < $TrainCut THEN 'train'
       |            WHEN b < $ValCut THEN 'val' ELSE 'test' END AS split,
       |  shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS n_chars
       |FROM a GROUP BY 1, 2""".stripMargin

  /** PACKING-EFFICIENCY HISTOGRAM — the sizing study BEFORE committing
    * to a packing budget (q68's `PackBudget`): document token lengths
    * in power-of-two buckets, with the padding a pad-to-budget loader
    * would burn and the sample count a concat-and-chunk packer (q68)
    * would emit. The bucket key is the binary magnitude of the length
    * — `LENGTH(BIN(n)) - 1` — computed with integer/string ops only:
    * `FLOOR(LOG2(n))` lands on libm and misrounds exact powers of two
    * on some platforms, which would shift a bucket boundary
    * cross-engine.
    *
    * Scale shape: one pass, map-only per-doc arithmetic into a
    * ≤64-group aggregate with map-side partials — the histogram never
    * sees more than one row per magnitude. */
  private def q88PackEfficiency(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(size(TextFunctions.tokens(col("text"))).cast("long").as("n"))
      .filter(col("n") > 0)
      .groupBy((length(bin(col("n"))) - 1).cast("int").as("len_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n").as("sum_tokens"),
        sum((lit(PackBudget) - col("n") % PackBudget) % PackBudget)
          .as("pad_tokens"),
        sum(expr(s"(n + ${PackBudget - 1}) DIV $PackBudget")).as("n_samples"))

  private val q88Sql =
    s"""WITH t AS (
       |  SELECT CAST(LEN(LIST_FILTER(
       |    REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'),
       |    x -> LEN(x) > 0)) AS BIGINT) AS n
       |  FROM documents)
       |SELECT CAST(LENGTH(BIN(n)) - 1 AS INT) AS len_bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n) AS BIGINT) AS sum_tokens,
       |  CAST(SUM(($PackBudget - n % $PackBudget) % $PackBudget) AS BIGINT)
       |    AS pad_tokens,
       |  CAST(SUM((n + ${PackBudget - 1}) // $PackBudget) AS BIGINT)
       |    AS n_samples
       |FROM t WHERE n > 0 GROUP BY 1""".stripMargin

  /** PER-SOURCE QUALITY TERCILES — the CCNet head/middle/tail
    * partition, cut WITHIN each source: rank every document by its
    * unigram-LM score (q74, the perplexity proxy) among its source's
    * documents and split each source into three equal tiers. The
    * per-(source, tier) mass answers the curation question "which
    * sources are worth keeping at which quality cut" — a global
    * tercile would let one large low-quality source absorb the whole
    * tail tier and hide every other source's tail.
    *
    * Scale shape: scoring is q74's broadcast lookup; the NTILE window
    * is partitioned BY SOURCE — a per-key range sort, never a global
    * single-partition window (q68's lesson). Ties are broken by
    * doc_id so the tier assignment is deterministic in both engines.
    * Tier stats are min/max picks of already-6dp-rounded doubles plus
    * integer sums — no summation-order hazard (the q80 lesson: never
    * re-aggregate unrounded doubles cross-engine). */
  private def q90PplTerciles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val scored = q74UnigramLm(s, dir)
    val meta = docs.select(col("doc_id"), col("source"),
      size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
    val w = Window.partitionBy("source").orderBy(col("lm_score"), col("doc_id"))
    meta.join(scored, "doc_id")
      .withColumn("tier", ntile(3).over(w))
      .groupBy("source", "tier")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"),
        min("lm_score").as("min_score"), max("lm_score").as("max_score"))
  }

  private val q90Sql =
    """WITH tok AS (
      |  SELECT doc_id, UNNEST(LIST_FILTER(
      |    REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0)) AS tok
      |  FROM documents),
      |freq AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
      |tot AS (SELECT COUNT(*) AS total FROM tok),
      |scored AS (
      |  SELECT t.doc_id, ROUND(AVG(-LN(f.cnt / tot.total)), 6) AS lm_score
      |  FROM tok t JOIN freq f USING (tok), tot
      |  GROUP BY t.doc_id),
      |ranked AS (
      |  SELECT d.source, s.lm_score,
      |    CAST(LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(d.text)), '\s+'),
      |      x -> LEN(x) > 0)) AS BIGINT) AS n_tokens,
      |    NTILE(3) OVER (PARTITION BY d.source ORDER BY s.lm_score, s.doc_id) AS tier
      |  FROM scored s JOIN documents d USING (doc_id))
      |SELECT source, CAST(tier AS INT) AS tier,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
      |  MIN(lm_score) AS min_score, MAX(lm_score) AS max_score
      |FROM ranked GROUP BY 1, 2""".stripMargin

  /** SPAN-CORRUPTION MASK GENERATION (T5/UL2 denoising prep) — for
    * every full 20-token block, one deterministic 3-token mask span
    * whose offset is hash-derived from (doc_id, block): a 15% mask
    * rate with reproducible placement (NEVER `rand()` — the q81 rule:
    * a mask that changes between runs poisons caching, resumption,
    * and any train/eval split downstream). The verified artifact is
    * the mask POSITION SET, pinned as an order-independent integer
    * sum of per-position hashes (`mask_fp`) — collect_list orderings
    * never enter the comparison.
    *
    * Scale shape: block and offset enumeration are generator chains
    * over the token-count table (map-only after one exchange); the
    * per-doc rollup is a count+sum aggregate with map-side partials;
    * docs too short for a block survive via the left join with zero
    * spans. */
  private def q101SpanCorruption(s: SparkSession, dir: String): DataFrame = {
    val nT = graft.dedup.Dedup.tokenTable(Tables.documents(s, dir), "doc_id", "text")
      .select(col("doc_id"), size(col("toks")).cast("long").as("n"))
    val spans = nT.filter(col("n") >= SpanBlock)
      .select(col("doc_id"),
        explode(sequence(lit(0L), expr(s"n DIV $SpanBlock") - 1)).as("b"))
      .withColumn("start",
        TextFunctions.tokenHash32(
          concat(col("doc_id").cast("string"), lit(":"), col("b").cast("string")))
          % (SpanBlock - SpanLen + 1) + 1)
    val masked = spans
      .select(col("doc_id"), col("b"),
        explode(sequence(col("start"), col("start") + (SpanLen - 1))).as("off"))
      .select(col("doc_id"), (col("b") * SpanBlock + col("off")).as("pos"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_masked"),
        sum(TextFunctions.tokenHash32(
          concat(col("doc_id").cast("string"), lit(":"), col("pos").cast("string"))))
          .as("mask_fp"))
    nT.join(masked, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n").as("n_tokens"),
        expr(s"n DIV $SpanBlock").as("n_spans"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        coalesce(col("mask_fp"), lit(0L)).as("mask_fp"))
  }

  private val SpanBlock = 20L
  private val SpanLen = 3L

  private val q101Sql =
    s"""WITH toks AS (
       |  SELECT doc_id, LIST_FILTER(
       |    REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'), x -> LEN(x) > 0) AS t
       |  FROM documents),
       |nt AS (SELECT doc_id, CAST(LEN(t) AS BIGINT) AS n FROM toks),
       |b AS (
       |  SELECT doc_id, UNNEST(GENERATE_SERIES(0, n // $SpanBlock - 1)) AS b
       |  FROM nt WHERE n >= $SpanBlock),
       |s AS (
       |  SELECT doc_id, b,
       |    CAST('0x' || SUBSTR(MD5(doc_id || ':' || b), 1, 8) AS BIGINT)
       |      % (${SpanBlock - SpanLen + 1}) + 1 AS start
       |  FROM b),
       |o AS (
       |  SELECT doc_id, b, UNNEST(GENERATE_SERIES(start, start + ${SpanLen - 1})) AS off
       |  FROM s),
       |f AS (
       |  SELECT doc_id, COUNT(*) AS n_masked,
       |    SUM(CAST('0x' || SUBSTR(MD5(doc_id || ':' || (b * $SpanBlock + off)), 1, 8)
       |        AS BIGINT)) AS mask_fp
       |  FROM o GROUP BY 1)
       |SELECT nt.doc_id, nt.n AS n_tokens,
       |  CAST(nt.n // $SpanBlock AS BIGINT) AS n_spans,
       |  CAST(COALESCE(f.n_masked, 0) AS BIGINT) AS n_masked,
       |  CAST(COALESCE(f.mask_fp, 0) AS BIGINT) AS mask_fp
       |FROM nt LEFT JOIN f USING (doc_id)""".stripMargin

  /** MODEL-BASED QUALITY FILTER (fastText / DCLM-classifier shape): score
    * each document with a hashed bag-of-words linear model — bucket each
    * token into [0, [[ClsBuckets]]) by md5, look up the bucket's weight, keep
    * documents whose mean weight is positive. The weights here are a closed
    * form of the bucket (w(b) = b - (B-1)/2, zero-mean over buckets) so both
    * engines state the SAME model without shipping a weights file; in
    * production the bucket→weight lookup is a broadcast float array and the
    * plan shape is IDENTICAL: a pure map over the token stream (hash →
    * weight, no shuffle, no UDF) into one doc-keyed combine. The margin is
    * summed as an exact INTEGER — `keep` can never flip on float
    * associativity — and the only double op is one final division, rounded.
    * Complements q44 (hand-written rules) and q74 (corpus-derived unigram
    * LM): this is the learned-classifier stage of a C4/DCLM-style pipeline. */
  private val ClsBuckets = 997L

  private def q107HashClassifier(s: SparkSession, dir: String): DataFrame = {
    val tok = graft.dedup.Dedup.tokenTable(Tables.documents(s, dir), "doc_id", "text")
      .select(col("doc_id"), explode(col("toks")).as("tok"))
    val half = (ClsBuckets - 1) / 2 // 498: w(b) in [-498, 498]
    tok.select(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("long")
          % ClsBuckets - half).as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        round(sum(col("w")).cast("double") / (count(lit(1)) * half.toDouble), 6)
          .as("score"),
        (sum(col("w")) > 0).as("keep"))
  }

  private val q107Sql =
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'),
       |                       x -> LEN(x) > 0)) AS tok
       |  FROM documents),
       |s AS (
       |  SELECT doc_id,
       |    CAST('0x' || SUBSTRING(MD5(tok), 1, 4) AS BIGINT) % $ClsBuckets
       |      - ${(ClsBuckets - 1) / 2} AS w
       |  FROM tok)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
       |  ROUND(CAST(SUM(w) AS DOUBLE) / (COUNT(*) * ${(ClsBuckets - 1) / 2}.0), 6) AS score,
       |  SUM(w) > 0 AS keep
       |FROM s GROUP BY 1""".stripMargin

  /** RANGE-PARTITIONED EXPORT MANIFEST (the global-sort / shard-layout
    * stage): split the corpus into 4 size-balanced shards by document
    * length and report each shard's count / min / max / total — the
    * manifest a range-partitioned writer ships alongside the shards.
    *
    * Scale shape: the quantile boundaries are computed on the COMPRESSED
    * HISTOGRAM (one row per distinct length — a keyed aggregate with
    * map-side partials), not by sorting the corpus; the single-partition
    * running sum below runs over that histogram's ≤|distinct lengths| rows,
    * which is the standard distributed-quantile reduction (at 100 TB the
    * histogram of an int key is still tiny). Routing is then a map-side
    * comparison against the broadcast 1-row boundary set — the corpus is
    * never globally sorted and never shuffled except the final ≤4-group
    * aggregate. Boundary rule matches SQL PERCENTILE_DISC: smallest value
    * whose cumulative count reaches q·n (integer cross-multiplication, no
    * division). */
  private def q108RangeShards(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NULL lengths are excluded on both sides: PERCENTILE_DISC ignores
    // NULLs, and a NULL histogram group would otherwise sort first and
    // inflate every cumulative count (and n) on this side only
    val docs = Tables.documents(s, dir).select(col("n_chars"))
      .filter(col("n_chars").isNotNull)
    val hist = docs.groupBy("n_chars").agg(count(lit(1)).as("c"))
    // n comes off the HISTOGRAM (sum of group counts), not a third
    // full-table scan
    val cum = hist
      .withColumn("cum", sum("c").over(
        Window.orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(hist.agg(sum("c").as("n"))))
    val bounds = cum.agg(
      min(when(col("cum") * 4 >= col("n"), col("n_chars"))).as("b1"),
      min(when(col("cum") * 2 >= col("n"), col("n_chars"))).as("b2"),
      min(when(col("cum") * 4 >= col("n") * 3, col("n_chars"))).as("b3"))
    docs
      .crossJoin(broadcast(bounds))
      .select(
        when(col("n_chars") <= col("b1"), 0)
          .when(col("n_chars") <= col("b2"), 1)
          .when(col("n_chars") <= col("b3"), 2)
          .otherwise(3).as("shard"),
        col("n_chars"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"),
        sum("n_chars").as("sum_chars"))
  }

  private val q108Sql =
    """WITH b AS (
      |  SELECT PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY n_chars) AS b1,
      |         PERCENTILE_DISC(0.5)  WITHIN GROUP (ORDER BY n_chars) AS b2,
      |         PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY n_chars) AS b3
      |  FROM documents)
      |SELECT CASE WHEN n_chars <= b1 THEN 0 WHEN n_chars <= b2 THEN 1
      |            WHEN n_chars <= b3 THEN 2 ELSE 3 END AS shard,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
      |  CAST(MAX(n_chars) AS BIGINT) AS max_chars,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents, b WHERE n_chars IS NOT NULL GROUP BY 1""".stripMargin

  /** SEQUENCE-LENGTH HISTOGRAM, power-of-2 buckets — the packing-design
    * input q68/q88 consume: how document token lengths distribute
    * across log2 buckets (bucket k holds lengths in [2^k, 2^(k+1))),
    * with doc counts and token mass per bucket. The mass column is what
    * sets the context-length/packing trade-off: a corpus whose token
    * mass sits in bucket 10 (1-2k tokens) packs 4k contexts very
    * differently from one massed in bucket 6.
    *
    * The bucket is INTEGER-exact on both engines: len(bin(n)) - 1 is
    * floor(log2(n)) computed on the binary string, immune to the
    * floating log2 rounding that misbuckets exact powers of two.
    *
    * Scale shape: map-only tokenize + projection into a ≤64-group
    * pre-combined aggregate — one shuffle of ≤64 rows per partition. */
  private def q141LenHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(size(TextFunctions.tokens(col("text"))).cast("long").as("n"))
      .filter(col("n") >= 1)
      .withColumn("bucket", (length(bin(col("n"))) - 1).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"))

  private val q141Sql =
    """WITH toks AS (
      |  SELECT LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'),
      |                     x -> LEN(x) > 0) AS t
      |  FROM documents),
      |n AS (SELECT CAST(LEN(t) AS BIGINT) AS n FROM toks WHERE LEN(t) >= 1)
      |SELECT CAST(LEN(BIN(n)) - 1 AS BIGINT) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n) AS BIGINT) AS n_tokens
      |FROM n GROUP BY 1""".stripMargin

  /** Shard count for q145. At 100 TB this is large (100k+ shards of
    * ~1 GB), which keeps each shard's position window small; 16 here
    * exercises the same plan at test scale. */
  private val NShards = 16

  /** DETERMINISTIC GLOBAL SHUFFLE + SHARD MANIFEST — the export step
    * that turns a curated corpus into training shards: every document
    * gets a pseudo-random but REPRODUCIBLE position (md5 of a salted
    * id — any engine and any rerun produce the identical permutation,
    * the property a training run's data order must have for exact
    * resumption), a shard from the same digest's leading byte, and a
    * 0-based position within its shard in permutation order. The
    * webdataset/TFRecord-style manifest a 100 TB pipeline writes last.
    *
    * Scale shape: one codegen md5 projection, one hash shuffle on the
    * shard key, and a per-shard window whose size is |corpus|/NShards —
    * bounded by choosing NShards, never a global sort. */
  private def q145ShuffleManifest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(concat(lit("shuf:"), col("doc_id"))).as("r"))
      .withColumn("shard",
        (conv(substring(col("r"), 1, 2), 16, 10).cast("int") % NShards)
          .cast("int"))
    ranked
      .withColumn("pos", row_number()
        .over(Window.partitionBy("shard").orderBy(col("r"), col("doc_id")))
        .cast("long") - 1)
      .select("doc_id", "shard", "pos")
  }

  private val q145Sql =
    s"""WITH r AS (
       |  SELECT doc_id, MD5('shuf:' || CAST(doc_id AS VARCHAR)) AS r
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, r,
       |    CAST(CAST('0x' || SUBSTRING(r, 1, 2) AS INT) % $NShards AS INT) AS shard
       |  FROM r)
       |SELECT doc_id, shard,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY r, doc_id) - 1
       |       AS BIGINT) AS pos
       |FROM s""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q145_shuffle_manifest", q145ShuffleManifest, Some(q145Sql)),
    Q("q141_len_histogram", q141LenHistogram, Some(q141Sql)),
    Q("q79_corpus_report", q79CorpusReport, Some(q79Sql)),
    Q("q107_hash_classifier", q107HashClassifier, Some(q107Sql)),
    Q("q108_range_shards", q108RangeShards, Some(q108Sql)),
    Q("q101_span_corruption", q101SpanCorruption, Some(q101Sql)),
    Q("q88_pack_efficiency", q88PackEfficiency, Some(q88Sql)),
    Q("q90_ppl_terciles", q90PplTerciles, Some(q90Sql)),
    Q("q81_train_split", q81TrainSplit, Some(q81Sql)),
    Q("q84_mix_budget", q84MixBudget, Some(q84Sql)),
    Q("q50_pipeline_export", q50PipelineExport, Some(q50Sql)),
    Q("q68_seq_pack", q68SeqPack, Some(q68Sql)),
    Q("q69_contamination", q69Contamination, Some(q69Sql)),
    Q("q83_decontam_minhash", q83DecontamMinhash, Some(q83Sql)),
    Q("q71_stratified_sample", q71StratifiedSample, Some(q71Sql)),
    Q("q118_group_quota_sample", q118GroupQuotaSample, Some(q118Sql)),
    Q("q128_budget_sample", q128BudgetSample, Some(q128Sql)),
    Q("q153_weighted_sample", q153WeightedSample, Some(q153Sql)),
    Q("q72_keep_best", q72KeepBest, Some(q72Sql)),
    Q("q73_doc_chunks", q73DocChunks, Some(q73Sql)),
    Q("q74_unigram_lm", q74UnigramLm, Some(q74Sql)),
    Q("q147_backoff_lm", q147BackoffLm, Some(q147Sql)),
    Q("q75_para_dedup", q75ParaDedup, Some(q75Sql)),
    Q("q76_dsir_weights", q76DsirWeights, Some(q76Sql)))
}
