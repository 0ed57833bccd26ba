package graft.operators

import graft.Tables
import graft.dedup.{Dedup, DedupArtifacts}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (LLM-pipeline surface).
  * Near-dup queries (MinHash, exact n-gram, SimHash) share one oracle:
  * the exact 3-shingle Jaccard self-join in DuckDB — the approximate
  * paths must reproduce the exact answer because every candidate is
  * re-verified with exact Jaccard (precision exact; recall is a banding
  * parameter, generous here).
  */
object DedupQueries extends QueryModule {

  // canonical pipeline parameters live in DedupArtifacts — ONE source
  // of truth shared with the ingest-time artifact build, so the
  // persisted pair/cluster artifacts can never be built under different
  // banding than the from-scratch proving queries (q25/q26/q53)
  private val N = DedupArtifacts.N
  private val Threshold = DedupArtifacts.Threshold

  /** Shared DuckDB oracle: exact 3-shingle Jaccard pairs >= 0.8. */
  private val jaccardSql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0) AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    LIST_DISTINCT([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN RANGE(1, LEN(t)-1)]) AS s
      |  FROM toks WHERE LEN(t) >= 3)
      |SELECT a.doc_id AS doc_i, b.doc_id AS doc_j
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE CAST(LEN(LIST_INTERSECT(a.s, b.s)) AS DOUBLE) /
      |      LEN(LIST_DISTINCT(LIST_CONCAT(a.s, b.s))) >= 0.8""".stripMargin

  /** Exact dedup by content digest (hash groupBy). */
  private def q24DedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(Tables.documents(s, dir), "doc_id", "text")

  private val q24Sql =
    """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY MD5(text)""".stripMargin

  /** MinHash + LSH banding + exact verify. */
  private def q25DedupMinHash(s: SparkSession, dir: String): DataFrame =
    Dedup.minHashDedupPairs(Tables.documents(s, dir), "doc_id", "text",
      N, Threshold, k = 32, bands = 16)

  /** Exact n-gram Jaccard via inverted-index self-join. */
  private def q26DedupNgram(s: SparkSession, dir: String): DataFrame =
    Dedup.exactJaccardPairs(Tables.documents(s, dir), "doc_id", "text", N, Threshold)

  /** The frequency-CUT n-gram variant, diffed against the UNCUT oracle:
    * shingles in more than `MaxShingleFreq` docs are dropped before the
    * quadratic candidate join (at 100 TB the cut is what keeps the
    * inverted index viable — a df-F shingle alone generates F^2
    * candidate rows), and candidates are re-verified against the full
    * shingle sets. Matching the uncut oracle proves the cut is
    * recall-only on this corpus: every true pair still shares at least
    * one below-cut shingle (DedupCutSpec pins the margin).
    *
    * Runs the cut machinery over the PERSISTED shingle index — exactly
    * the plan the cut_pairs artifact build executes at ingest, making
    * this query literally that build recomputed under the full
    * from-raw-text SQL oracle (the index is itself spec-pinned equal to
    * the from-scratch shingle table; q26 keeps the full tokenize→pairs
    * path exercised from raw docs).
    *
    * MEASURED AND KEPT (r11): consuming the persisted hot_shingles df
    * cut instead of re-aggregating document frequency was A/B'd
    * same-JVM at sf0.1 — recomputed-df MIN 1.87 s vs persisted-hot
    * 2.33 s over 4 alternating iterations. The df-aggregate subtree
    * gives Catalyst small size estimates that keep the docHot and
    * pair-stream joins BROADCAST; sourcing hot from a raw artifact
    * scan degraded those joins to sort-merge plus an extra shuffle of
    * the pair stream. The aggregate is cheaper than the planning it
    * buys. (A broadcast hint on docHot would pin the fast plan but is
    * scale-unsafe: docHot has one row per doc containing a hot
    * shingle — potentially corpus-sized; the q147 lesson.)
    *
    * DELIBERATE ORACLE ANCHOR — this floor will not shrink; see
    * README "Anchor-budget policy". */
  private def q53DedupNgramCut(s: SparkSession, dir: String): DataFrame =
    Dedup.exactJaccardPairsFromShingles(DedupArtifacts.shingles(s, dir),
      Threshold, maxShingleFreq = MaxShingleFreq)

  private[graft] val MaxShingleFreq = DedupArtifacts.MaxShingleFreq

  /** SimHash fingerprints + banded hamming candidates + exact verify.
    * DELIBERATE ORACLE ANCHOR at the generous hamming ≤ 10 budget —
    * this floor will not shrink; q146 gates the production knob. See
    * README "Anchor-budget policy". */
  private def q27DedupSimHash(s: SparkSession, dir: String): DataFrame =
    Dedup.simHashDedupPairs(Tables.documents(s, dir), "doc_id", "text", N, Threshold)

  /** The PRODUCTION hamming budget: web-scale simhash dedup runs
    * maxHamming <= 3 (Manku et al., WWW'07), where the pigeonhole
    * banding gets 4 bands of 16 bits — 2^16-value buckets and
    * near-linear candidate volume. Same code as q27; this is the knob
    * the 100 TB deployment sets, oracle-gated here rather than
    * probe-only (exact duplicates sit at hamming 0, so the tier is
    * non-empty on any corpus with exact copies). */
  private def q146DedupSimhashH3(s: SparkSession, dir: String): DataFrame =
    Dedup.simHashDedupPairs(Tables.documents(s, dir), "doc_id", "text",
      N, Threshold, maxHamming = 3)

  /** SimHash-semantics oracle: recompute the 64-bit md5-based SimHash in
    * SQL (two 32-bit halves — DuckDB's 64-bit left shift overflows),
    * pair on hamming <= `maxHamming`, then exact-Jaccard >= 0.8. Matches
    * the Spark operator's definition bit for bit at any scale factor;
    * SimHash recall on short docs is part of the semantics, not noise. */
  private def simHashSql(maxHamming: Int) =
    raw"""WITH toks AS (
      |  SELECT doc_id,
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0) AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    LIST_DISTINCT([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN RANGE(1, LEN(t)-1)]) AS s
      |  FROM toks WHERE LEN(t) >= 3),
      |tok AS (SELECT doc_id, UNNEST(t) AS tok FROM toks),
      |h AS (
      |  SELECT doc_id, CAST('0x' || SUBSTRING(MD5(tok), 1, 16) AS UBIGINT) AS h FROM tok),
      |votes AS (
      |  SELECT doc_id, bb.b AS b,
      |    SUM(CASE WHEN (h >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      |  FROM h CROSS JOIN (SELECT UNNEST(RANGE(0, 64)) AS b) bb
      |  GROUP BY doc_id, bb.b),
      |fp AS (
      |  SELECT doc_id,
      |    SUM(CASE WHEN v > 0 AND b < 32 THEN 1::BIGINT << b ELSE 0 END) AS lo,
      |    SUM(CASE WHEN v > 0 AND b >= 32 THEN 1::BIGINT << (b - 32) ELSE 0 END) AS hi
      |  FROM votes GROUP BY doc_id),
      |cand AS (
      |  SELECT a.doc_id AS doc_i, b.doc_id AS doc_j
      |  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
      |  WHERE BIT_COUNT(XOR(a.lo, b.lo)) + BIT_COUNT(XOR(a.hi, b.hi)) <= $maxHamming)
      |SELECT c.doc_i, c.doc_j FROM cand c
      |JOIN sh sa ON sa.doc_id = c.doc_i
      |JOIN sh sb ON sb.doc_id = c.doc_j
      |WHERE CAST(LEN(LIST_INTERSECT(sa.s, sb.s)) AS DOUBLE) /
      |      LEN(LIST_DISTINCT(LIST_CONCAT(sa.s, sb.s))) >= 0.8""".stripMargin

  private val q27Sql = simHashSql(10)

  /** Near-dup pairs -> dedup CLUSTERS via connected components; the
    * canonical representative is min(doc_id) per component. Oracle =
    * recursive-CTE transitive closure over the same exact-Jaccard edge
    * set (MinHash pairs are verified-exact, so both engines agree on
    * the edges). Every document appears; singletons are their own
    * representative.
    *
    * Reads the INGEST-TIME artifact ([[DedupArtifacts.clusters]]): the
    * MinHash banding + pointer-jumping build runs once per corpus at
    * prepare time and every cluster consumer (this, q85, q100, q117)
    * reads the persisted assignment — production economics; the first
    * query to touch the artifact pays the build, exactly like q16's
    * index build and q99's bucketed writes. The oracle stays the full
    * from-scratch closure SQL, so the artifact content is hash-checked
    * against a complete recomputation every round. */
  private def q49DedupClusters(s: SparkSession, dir: String): DataFrame =
    DedupArtifacts.clusters(s, dir)

  /** DEDUP CLUSTERS AFTER AN INCREMENTAL TAKEDOWN (r19 — the delete
    * verb reaching the DEDUP tier): the maintained stores retire docs
    * via tombstones, but a takedown must ALSO propagate to dedup
    * decisions, and rebuilding the pair artifacts per GDPR batch is
    * exactly the cost the incremental family exists to avoid. The
    * EXACT incremental maintenance: near-dup pair membership is a
    * per-pair property of its two endpoints alone (jaccard between two
    * docs doesn't depend on the rest of the corpus), so the pair set of
    * corpus-minus-takedowns IS the persisted pair artifact minus pairs
    * touching a takedown id — a FILTER, nothing re-shingled — and the
    * cluster assignment is one components contraction over that
    * filtered edge list (edge-scale, not corpus-scale; splits that
    * removing a bridge doc causes fall out of the connectivity rerun
    * for free, where a read-time membership filter would silently keep
    * split clusters merged). The oracle recomputes the FULL closure
    * over the reduced corpus from raw text — artifact-filter-plus-
    * contraction must equal the from-scratch answer exactly. */
  private def q180ClustersAfterTakedown(s: SparkSession, dir: String): DataFrame = {
    val isDel = DedupArtifacts.isDeltaId _
    val kept = DedupArtifacts.minHashPairs(s, dir)
      .filter(!isDel(col("doc_i")) && !isDel(col("doc_j")))
      .select(col("doc_i").as("src"), col("doc_j").as("dst"))
    Components.connectedComponents(
        Tables.documents(s, dir).filter(!isDel(col("doc_id")))
          .select(col("doc_id").as("id")), kept)
      .select(col("id").as("doc_id"), col("comp").as("cluster_rep"))
  }

  // derived from the ONE shared closure literal (the parameterized
  // corpusWhere — never a copy that a future pairsCte fix could miss)
  private val q180Sql = closureCteFor(" WHERE doc_id % 7 <> 6") +
    "\nSELECT id AS doc_id, MIN(r) AS cluster_rep FROM reach GROUP BY id"

  /** Shared exact-Jaccard pair CTE prefix (toks → shingle sets →
    * threshold pairs) for every oracle needing the edge set (q49, q85,
    * q87). One literal so a fix can never land in one oracle and miss
    * another (the MaxFpFreq lesson: duplicated constants silently
    * diverged once). */
  private def pairsCteFor(corpusWhere: String): String =
    s"""WITH RECURSIVE toks AS (
      |  SELECT doc_id,
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'), x -> LEN(x) > 0) AS t
      |  FROM documents$corpusWhere),
      |sh AS (
      |  SELECT doc_id,
      |    LIST_DISTINCT([t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN RANGE(1, LEN(t)-1)]) AS s
      |  FROM toks WHERE LEN(t) >= 3),
      |pairs AS (
      |  SELECT a.doc_id AS pa, b.doc_id AS pb
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE CAST(LEN(LIST_INTERSECT(a.s, b.s)) AS DOUBLE) /
      |        LEN(LIST_DISTINCT(LIST_CONCAT(a.s, b.s))) >= 0.8)""".stripMargin

  private val pairsCte = pairsCteFor("")

  /** Pair prefix + transitive closure, for the cluster oracles —
    * `corpusWhere` restricts BOTH the shingled corpus and the closure
    * universe (the q183 `extraWhere` pattern: parameterize the one
    * literal instead of copying it, so a fix can never land in one
    * oracle and miss another). */
  private def closureCteFor(corpusWhere: String): String =
    pairsCteFor(corpusWhere) + s""",
      |edges AS (
      |  SELECT pa AS ea, pb AS eb FROM pairs
      |  UNION ALL SELECT pb, pa FROM pairs),
      |reach AS (
      |  SELECT doc_id AS id, doc_id AS r FROM documents$corpusWhere
      |  UNION
      |  SELECT e.eb AS id, reach.r FROM reach JOIN edges e ON e.ea = reach.id)""".stripMargin

  private val closureCte = closureCteFor("")

  private val q49Sql = closureCte +
    "\nSELECT id AS doc_id, MIN(r) AS cluster_rep FROM reach GROUP BY id"

  /** SYNDICATION REPORT — the cross-source view of the q49 dedup
    * clusters: for every multi-document near-dup cluster, how many
    * documents it holds and how many distinct sources and languages it
    * spans. n_sources > 1 is the "same article syndicated across
    * sites" signal (CommonCrawl's dominant duplication mode) that
    * decides whether dedup should be source-local or global; a cluster
    * confined to one source is re-crawl noise instead. Pure
    * composition of verified parts: q25's verified-exact edges, q49's
    * components, one metadata join.
    *
    * Scale shape: the cluster assignment is q49's persisted artifact;
    * the per-cluster rollup joins cluster ids to (source, lang) metadata
    * id-keyed and aggregates |clusters| groups with map-side partials.
    * The count_distinct carries at most |sources| values per group. */
  private def q85Syndication(s: SparkSession, dir: String): DataFrame =
    q49DedupClusters(s, dir)   // same edges, banding, and components wiring
      .join(Tables.documents(s, dir).select("doc_id", "source", "lang"), "doc_id")
      .groupBy("cluster_rep")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("source").as("n_sources"),
        countDistinct("lang").as("n_langs"))
      .filter(col("n_docs") >= 2)

  private val q85Sql = closureCte + """,
      |comp AS (SELECT id AS doc_id, MIN(r) AS cluster_rep FROM reach GROUP BY id)
      |SELECT c.cluster_rep, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(DISTINCT d.source) AS BIGINT) AS n_sources,
      |  CAST(COUNT(DISTINCT d.lang) AS BIGINT) AS n_langs
      |FROM comp c JOIN documents d USING (doc_id)
      |GROUP BY c.cluster_rep HAVING COUNT(*) >= 2""".stripMargin

  /** COPY MATRIX — the provenance view of the near-dup mass: for every
    * unordered source pair, how many verified near-dup pairs connect
    * them. The off-diagonal cells are mirror/syndication detection at
    * site granularity (finer than q85's per-cluster source span: it
    * says WHICH sites share content, and how much); diagonal cells
    * (source_a = source_b) are within-source re-crawl duplication. The
    * unordered key is least/greatest on the source strings — binary
    * collation in both engines, so the fold is deterministic.
    *
    * Scale shape: the pair set is the (bounded) dedup output, the two
    * metadata attachments are id-keyed equi-joins, and the rollup has
    * at most |sources|² groups with map-side partials. */
  private def q87CopyMatrix(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val meta = docs.select(col("doc_id"), col("source"))
    DedupArtifacts.minHashPairs(s, dir)   // the persisted q25 pair set
      .join(meta.select(col("doc_id").as("doc_i"), col("source").as("source_i")), "doc_i")
      .join(meta.select(col("doc_id").as("doc_j"), col("source").as("source_j")), "doc_j")
      .select(least(col("source_i"), col("source_j")).as("source_a"),
        greatest(col("source_i"), col("source_j")).as("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_pairs"))
  }

  private val q87Sql = pairsCte + """
      |SELECT LEAST(da.source, db.source) AS source_a,
      |  GREATEST(da.source, db.source) AS source_b,
      |  CAST(COUNT(*) AS BIGINT) AS n_pairs
      |FROM pairs p
      |JOIN documents da ON da.doc_id = p.pa
      |JOIN documents db ON db.doc_id = p.pb
      |GROUP BY 1, 2""".stripMargin

  /** WINNOWING near-dup pairs (MOSS fingerprint selection): character
    * 8-grams, window 4, Jaccard >= 0.5 over the selected fingerprints,
    * with the MOSS `-m` boilerplate cut — fingerprints matching more
    * than [[MaxFpFreq]] documents are ignored entirely (excluded from
    * every document's set). The cut is part of the algorithm's
    * published semantics AND the scale guarantee: the inverted-index
    * join is bounded by m·|fp table|/2 rows (measured: 95M uncut →
    * 203K cut join rows at sf0.1, and 3.1× row growth for 10× data).
    * Fingerprint SELECTION order is md5-hex on both engines; the oracle
    * recomputes the same selections with list comprehensions and
    * applies the identical df cut. (The Spark side carries each
    * selected hash as its 60-bit prefix long rather than the hex
    * string — order-preserving, w.h.p.-identical sets; see
    * [[graft.dedup.Dedup.winnowFingerprints]].) */
  private def q63DedupWinnow(s: SparkSession, dir: String): DataFrame =
    Dedup.winnowDedupPairs(Tables.documents(s, dir), "doc_id", "text",
      k = 8, w = 4, threshold = 0.5, maxFpFreq = MaxFpFreq)

  private[graft] val MaxFpFreq = 20L

  // MaxFpFreq is interpolated so the two engines share one source of
  // truth for the cut (a hardcoded 20 here silently diverged once)
  private val q63Sql =
    s"""WITH n AS (
      |  SELECT doc_id, TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')) AS s
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, [MD5(SUBSTRING(s, i, 8)) FOR i IN RANGE(1, LEN(s) - 8 + 2)] AS hashes
      |  FROM n WHERE LEN(s) >= 8),
      |w AS (
      |  SELECT doc_id, CASE WHEN LEN(hashes) >= 4
      |    THEN LIST_DISTINCT([LIST_AGGREGATE(hashes[j:j+3], 'min')
      |                        FOR j IN RANGE(1, LEN(hashes) - 4 + 2)])
      |    ELSE [LIST_AGGREGATE(hashes, 'min')] END AS fps FROM g),
      |fa AS (SELECT doc_id, UNNEST(fps) AS fp FROM w),
      |hot AS (SELECT fp FROM fa GROUP BY fp HAVING COUNT(*) > $MaxFpFreq),
      |f AS (SELECT doc_id, fp FROM fa ANTI JOIN hot USING (fp)),
      |sz AS (SELECT doc_id, COUNT(*) AS sz FROM f GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS i
      |  FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT doc_i, doc_j FROM inter
      |JOIN sz si ON si.doc_id = inter.doc_i
      |JOIN sz sj ON sj.doc_id = inter.doc_j
      |WHERE CAST(i AS DOUBLE) / (si.sz + sj.sz - i) >= 0.5""".stripMargin

  /** CONTENT-DEFINED CHUNKING dedup survey — the storage-side sibling
    * of winnowing (q63): chunk boundaries are declared wherever the
    * hash of the local `CdcW`-char gram clears a 1-in-16 condition
    * (first md5 hex nibble '0' — the LBFS/FastCDC idea reduced to the
    * suite's hash), so an insertion early in a document only re-chunks
    * its neighborhood instead of shifting every fixed-width block.
    * Reported: total chunks, distinct chunks, and the duplicated chars
    * a chunk-store would NOT re-store (copies beyond each digest's
    * first). Position 1 is always a boundary, making the interior
    * boundary stream and the leading chunk one generate-filter pass —
    * no union branch.
    *
    * Scale shape: boundary detection is content-LOCAL and runs as ONE
    * native-expression call per document
    * ([[graft.functions.expressions.CdcBoundaries]]): the per-position
    * md5 loop lives in a JVM kernel with a thread-reused digest and an
    * ASCII zero-allocation fast path, so the plan never materializes
    * the corpus×doc-length position stream the composed formulation
    * (explode → codegen md5 → filter → LEAD window) paid — measured
    * 1.87 s floor composed vs sub-second with the kernel at sf0.1.
    * Chunk extents come from zipping the boundary array with its own
    * tail IN the array domain (~n/16 elements per doc — small, unlike
    * per-char arrays, the q63 HOF caveat does not bite) — no window,
    * no shuffle before the digest-keyed count, which ships only
    * (digest, len) pairs. */
  private def q92CdcChunks(s: SparkSession, dir: String): DataFrame = {
    val perDigest = Tables.documents(s, dir)
      .filter(length(col("text")) >= CdcW)
      .select(col("doc_id"), col("text"),
        graft.functions.TextFunctions.cdcBoundaries(col("text"), CdcW).as("b"))
      .select(col("text"), explode(
        transform(sequence(lit(0), size(col("b")) - 1), k =>
          struct(get(col("b"), k).as("i"),
            coalesce(get(col("b"), k + 1), length(col("text")) + 1)
              .as("nxt")))).as("c"))
      .select(md5(col("text").substr(col("c.i"), col("c.nxt") - col("c.i")))
          .as("dg"),
        (col("c.nxt") - col("c.i")).cast("long").as("clen"))
      .groupBy("dg").agg(count(lit(1)).as("cnt"), min("clen").as("len"))
    perDigest.agg(sum("cnt").as("n_chunks"),
      count(lit(1)).as("n_unique"),
      sum((col("cnt") - 1) * col("len")).as("dup_chars"))
  }

  private val CdcW = 16

  private val q92Sql =
    s"""WITH d AS (SELECT doc_id, text FROM documents WHERE LEN(text) >= $CdcW),
       |p AS (
       |  SELECT doc_id, text,
       |    UNNEST(GENERATE_SERIES(1, LEN(text) - ${CdcW - 1})) AS i
       |  FROM d),
       |s AS (
       |  SELECT doc_id, text, i FROM p
       |  WHERE i = 1 OR SUBSTR(MD5(SUBSTR(text, i, $CdcW)), 1, 1) = '0'),
       |c AS (
       |  SELECT doc_id, text, i,
       |    COALESCE(LEAD(i) OVER (PARTITION BY doc_id ORDER BY i),
       |             LEN(text) + 1) AS nxt
       |  FROM s),
       |g AS (
       |  SELECT MD5(SUBSTR(text, i, nxt - i)) AS dg, COUNT(*) AS cnt,
       |    MIN(nxt - i) AS len
       |  FROM c GROUP BY 1)
       |SELECT CAST(SUM(cnt) AS BIGINT) AS n_chunks,
       |  CAST(COUNT(*) AS BIGINT) AS n_unique,
       |  CAST(SUM((cnt - 1) * len) AS BIGINT) AS dup_chars
       |FROM g""".stripMargin

  /** LEXICAL-vs-SEMANTIC DEDUP AGREEMENT — the curation cross-check
    * the two dedup families enable together: MinHash-verified Jaccard
    * pairs (q25's exact-verified output) set against embedding-cosine
    * pairs (q28's threshold), bucketed into `both` / `lexical_only` /
    * `semantic_only`. `lexical_only` mass is surface copies whose
    * embeddings drifted (templated text); `semantic_only` is
    * paraphrase-like mass that no n-gram dedup will ever catch — the
    * number that justifies running the semantic pass at all.
    *
    * Scale shape: both inputs are PERSISTED dedup artifacts (pair
    * lists, not corpora — [[DedupArtifacts.minHashPairs]] and
    * [[DedupArtifacts.semPairs]]); the full-outer join keys on the pair
    * and the rollup is three groups. The heavy lifting happened once at
    * ingest inside the two already-verified operators with their own
    * 100 TB shapes. */
  private def q93DedupAgreement(s: SparkSession, dir: String): DataFrame = {
    val lex = DedupArtifacts.minHashPairs(s, dir)   // persisted q25 pairs
      .select(col("doc_i").as("id_i"), col("doc_j").as("id_j"),
        lit(1).as("lex"))
    val sem = DedupArtifacts.semPairs(s, dir)       // persisted q28 pairs
      .withColumn("sem", lit(1))
    lex.join(sem, Seq("id_i", "id_j"), "full_outer")
      .select(when(col("lex").isNotNull && col("sem").isNotNull, "both")
        .when(col("lex").isNotNull, "lexical_only")
        .otherwise("semantic_only").as("agreement"))
      .groupBy("agreement").agg(count(lit(1)).as("n_pairs"))
  }

  private val SemThreshold = DedupArtifacts.SemThreshold // q28's threshold

  private val q93Sql = pairsCte + s""",
      |sem AS (
      |  SELECT a.vec_id AS pa, b.vec_id AS pb
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |  WHERE LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
      |                               CAST(b.embedding AS DOUBLE[])) >= $SemThreshold),
      |j AS (
      |  SELECT CASE WHEN l.pa IS NOT NULL AND s.pa IS NOT NULL THEN 'both'
      |              WHEN l.pa IS NOT NULL THEN 'lexical_only'
      |              ELSE 'semantic_only' END AS agreement
      |  FROM pairs l FULL OUTER JOIN sem s ON l.pa = s.pa AND l.pb = s.pb)
      |SELECT agreement, CAST(COUNT(*) AS BIGINT) AS n_pairs
      |FROM j GROUP BY 1""".stripMargin

  /** DEDUP FUNNEL — the capstone budget number: how many documents and
    * tokens survive each dedup stage. `raw` is the whole corpus;
    * `exact` keeps min(doc_id) per content digest (q24's rule);
    * `neardup` keeps the exact survivors that are ALSO q49 cluster
    * representatives — an explicit intersection, because "reps ⊆ exact
    * canonicals" only holds for docs long enough to shingle: exact
    * copies under 3 tokens have empty shingle sets, get no MinHash
    * edge, and would each be their own singleton rep, letting a pure
    * reps stage RESURRECT docs the exact stage removed. Composing the
    * stages keeps n_raw >= n_exact >= n_neardup a true funnel for
    * every input.
    *
    * Scale shape: ONE pass — tokenize map, two id-keyed indicator
    * joins (the exact-canonical set from the digest hash-agg, the
    * cluster representatives from the PERSISTED assignment,
    * [[DedupArtifacts.clusters]] via q49), then a single 1-row
    * aggregate whose stage sums compose the indicators (`neardup` =
    * ex·rep, the funnel intersection, with no second semi-join).
    * Every input is consumed exactly once, so nothing checkpoints and
    * no union branch re-runs the tokenize or digest work (the shape
    * the earlier three-branch form needed two eager checkpoints to
    * approximate). */
  private def q100DedupFunnel(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val toks = docs.select(col("doc_id"),
      size(graft.functions.TextFunctions.tokens(col("text"))).cast("long")
        .as("n_tokens"))
    val exact = docs.groupBy(md5(col("text")).as("digest"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val reps = q49DedupClusters(s, dir)
      .filter(col("doc_id") === col("cluster_rep")).select("doc_id")
    val row = toks
      .join(exact.withColumn("ex", lit(1L)), Seq("doc_id"), "left")
      .join(reps.withColumn("rp", lit(1L)), Seq("doc_id"), "left")
      .select(col("n_tokens"),
        coalesce(col("ex"), lit(0L)).as("ex"),
        coalesce(col("rp"), lit(0L)).as("rp"))
      .agg(count(lit(1)).as("n_raw"), sum("n_tokens").as("t_raw"),
        sum(col("ex")).as("n_ex"),
        sum(col("n_tokens") * col("ex")).as("t_ex"),
        sum(col("ex") * col("rp")).as("n_nd"),
        sum(col("n_tokens") * col("ex") * col("rp")).as("t_nd"))
    row.select(explode(array(
        struct(lit("raw").as("stage"), col("n_raw").as("n_docs"),
          col("t_raw").as("n_tokens")),
        struct(lit("exact").as("stage"), col("n_ex").as("n_docs"),
          col("t_ex").as("n_tokens")),
        struct(lit("neardup").as("stage"), col("n_nd").as("n_docs"),
          col("t_nd").as("n_tokens")))).as("s"))
      .select(col("s.stage"), col("s.n_docs"), col("s.n_tokens"))
  }

  private val q100Sql = closureCte + """,
      |comp AS (SELECT id AS doc_id, MIN(r) AS rep FROM reach GROUP BY id),
      |tk AS (SELECT doc_id, CAST(LEN(t) AS BIGINT) AS n_tokens FROM toks),
      |ex AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY MD5(text))
      |SELECT 'raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens FROM tk
      |UNION ALL
      |SELECT 'exact' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens FROM tk JOIN ex USING (doc_id)
      |UNION ALL
      |SELECT 'neardup' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(t.n_tokens) AS BIGINT) AS n_tokens
      |FROM tk t JOIN comp c ON c.doc_id = t.doc_id AND c.doc_id = c.rep
      |JOIN ex ON ex.doc_id = t.doc_id""".stripMargin

  /** SOURCE CONTENT-OVERLAP MATRIX — per unordered source pair, how
    * many distinct 3-shingles BOTH sources contain. Where q87 counts
    * verified near-dup documents between sites, this measures shared
    * content mass below the document threshold — the stylistic/
    * templated overlap that informs domain grouping and mixture design
    * even when no single document pair clears the dedup bar. Counts
    * are integer-exact; Jaccard is the caller's division (sizes ride
    * along).
    *
    * The q53 hot-shingle cut IS APPLIED, as part of the operator's
    * semantics (mirrored in the oracle, like q63's MOSS `-m` cut):
    * shingles in more than [[MaxShingleFreq]] documents are boilerplate
    * — a shingle in EVERY source contributes the complete |sources|²
    * matrix and no discriminating information, and each hot shingle
    * costs its own |sources having it|² join rows. Cutting before the
    * self-join bounds the quadratic step by the df cut; the overlap
    * counts are then over the INFORMATIVE shared content, which is the
    * number domain grouping actually wants.
    *
    * Scale shape: distinct (source, shingle) is one shingle-keyed
    * aggregate; the pair counts come from the inverted-index self-join
    * on the below-cut shingles, whose fan-out per shingle is bounded by
    * |sources|² — not corpus size. */
  private def q105SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    // the PERSISTED per-source shingle incidence (distinct below-cut
    // (source, sh)) — the whole upstream of this report is corpus-
    // stable, so it is built once at ingest (anti-join against the hot
    // cut + broadcast metadata join + distinct) and every run here is
    // just the sizes aggregate and the bounded self-join. Three parquet
    // scans of a small artifact replace the earlier per-run pipeline
    // (4.4 s tokenize-twice -> 2.6 s checkpointed -> 2.0 s shingle-
    // artifact rebuild -> this).
    val sv = DedupArtifacts.sourceShingles(s, dir)
    val sizes = sv.groupBy("source").agg(count(lit(1)).as("n"))
    sv.select(col("source").as("source_a"), col("sh"))
      .join(sv.select(col("source").as("source_b"), col("sh")), "sh")
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_common"))
      .join(broadcast(sizes
        .select(col("source").as("source_a"), col("n").as("n_a"))), "source_a")
      .join(broadcast(sizes
        .select(col("source").as("source_b"), col("n").as("n_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("n_common"),
        col("n_a"), col("n_b"))
  }

  // MaxShingleFreq interpolated — one source of truth for the cut on
  // both engines (the MaxFpFreq lesson)
  private val q105Sql =
    s"""WITH toks AS (
      |  SELECT doc_id,
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+'), x -> LEN(x) > 0) AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, UNNEST(LIST_DISTINCT(
      |    [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN RANGE(1, LEN(t) - 1)])) AS g
      |  FROM toks WHERE LEN(t) >= 3),
      |hot AS (SELECT g FROM sh GROUP BY g HAVING COUNT(*) > $MaxShingleFreq),
      |shc AS (SELECT doc_id, g FROM sh ANTI JOIN hot USING (g)),
      |sv AS (
      |  SELECT DISTINCT d.source, s.g
      |  FROM shc s JOIN documents d USING (doc_id)),
      |sizes AS (SELECT source, COUNT(*) AS n FROM sv GROUP BY 1)
      |SELECT a.source AS source_a, b.source AS source_b,
      |  CAST(COUNT(*) AS BIGINT) AS n_common,
      |  CAST(MIN(sa.n) AS BIGINT) AS n_a, CAST(MIN(sb.n) AS BIGINT) AS n_b
      |FROM sv a JOIN sv b ON a.g = b.g AND a.source < b.source
      |JOIN sizes sa ON sa.source = a.source
      |JOIN sizes sb ON sb.source = b.source
      |GROUP BY 1, 2""".stripMargin

  /** SUBSTRING-LEVEL DEDUP PROFILE (ExactSubstr, Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better"): per document, how many of
    * its [[DupW]]-token sliding windows also occur in ANOTHER document, and the
    * longest run of consecutive duplicated windows — the span an ExactSubstr
    * pass would cut. Complements q92 (chunk store granularity), q95 (novelty
    * counts distinct shingles; this profiles positions/runs) and q67
    * (intra-doc repetition; this is strictly cross-doc — a window repeated
    * only within its own document is NOT flagged).
    *
    * Scale shape: one codegen md5 per window, immediately shrunk to a 60-bit
    * prefix long (q63's lesson — the 32-char hex string never crosses a
    * shuffle); the cross-doc window set is a digest-keyed aggregate; the
    * run/island computation is one doc-keyed window over ONLY the flagged
    * rows. A true suffix array is a sequential build; this sliding-window
    * formulation is the join-friendly equivalent and every stage is a plain
    * keyed shuffle.
    */
  private val DupW = 8

  private def q106DupSubstring(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Dedup.tokenTable(Tables.documents(s, dir), "doc_id", "text")
    val win = toks
      .select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.wordNGrams(col("toks"), DupW))
          .as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"),
        graft.functions.TextFunctions.digest60(col("g")).as("h"))
    // windows seen in >= 2 DISTINCT docs (intra-doc repeats are q67's
    // signal, not this one's)
    val dup = win.select("doc_id", "h").distinct()
      .groupBy("h").agg(count(lit(1)).as("d"))
      .filter(col("d") >= 2).select("h")
    // gaps-and-islands over the flagged positions only: run id =
    // pos - row_number is constant within each consecutive stretch
    val flagged = win.join(dup, Seq("h"), "left_semi")
    val runs = flagged
      .withColumn("grp",
        col("pos") - row_number().over(Window.partitionBy("doc_id").orderBy("pos")))
      .groupBy("doc_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("doc_id")
      .agg(sum("len").as("n_dup"), max("len").as("longest_run"))
    // per-doc window count straight off the token array — no second
    // pass over the exploded stream
    toks.select(col("doc_id"),
        (size(col("toks")) - (DupW - 1)).cast("long").as("n_win"))
      .filter(col("n_win") >= 1)
      .join(runs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_win"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        coalesce(col("longest_run"), lit(0L)).as("longest_run"))
  }

  private val q106Sql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0) AS t
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, UNNEST(
      |    [{'pos': i, 'g': ARRAY_TO_STRING(t[i:i+7], ' ')} FOR i IN RANGE(1, LEN(t) - 6)],
      |    recursive := true)
      |  FROM toks WHERE LEN(t) >= 8),
      |dup AS (SELECT g FROM w GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
      |fl AS (SELECT doc_id, pos FROM w WHERE g IN (SELECT g FROM dup)),
      |runs AS (
      |  SELECT doc_id, pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |  FROM fl),
      |rl AS (SELECT doc_id, COUNT(*) AS len FROM runs GROUP BY doc_id, grp),
      |agg AS (
      |  SELECT doc_id, CAST(SUM(len) AS BIGINT) AS n_dup,
      |    CAST(MAX(len) AS BIGINT) AS longest_run
      |  FROM rl GROUP BY doc_id)
      |SELECT t.doc_id, CAST(LEN(t.t) - 7 AS BIGINT) AS n_win,
      |  COALESCE(a.n_dup, 0) AS n_dup,
      |  COALESCE(a.longest_run, 0) AS longest_run
      |FROM toks t LEFT JOIN agg a USING (doc_id) WHERE LEN(t.t) >= 8""".stripMargin

  /** INCREMENTAL INGEST DEDUP — dedup a delta batch against an existing
    * base corpus WITHOUT reprocessing the base: each delta document is
    * classified `dup_base` (its fingerprint already exists in the base),
    * `dup_delta` (an earlier document in the same batch claims it), or
    * `new`. The fingerprint is the md5 of the first [[HeadW]] normalized
    * tokens (head fingerprint — the practical ingest key when exact
    * bytes drift but openings don't); the base/delta split here is a
    * deterministic id rule so both engines construct the same batches.
    *
    * Scale shape: the base (the 100 TB side) is probed with the DELTA's
    * digest set BROADCAST — the base is never shuffled and at real scale
    * the probe is a scan of the persisted digest index, not the corpus.
    * The (small, ≤|delta|) hit set broadcasts back onto the delta; the
    * intra-batch first-claim is one window over the delta's own digest
    * shuffle. Everything big moves zero times; everything broadcast is
    * bounded by the ingest batch. */
  private val HeadW = 16

  private def q109IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = Dedup.tokenTable(Tables.documents(s, dir), "doc_id", "text")
      .filter(size(col("toks")) >= HeadW)
      .select(col("doc_id"),
        // 60-bit long, not the 32-char hex: dg is a window partition
        // key, a broadcast-set element, AND a join key below (q63's
        // lesson; the oracle only compares doc_id/status, so the
        // internal key representation is free)
        graft.functions.TextFunctions.digest60(
          concat_ws(" ", slice(col("toks"), 1, HeadW))).as("dg"),
        (col("doc_id") % 5 === 4).as("is_delta"))
    val base = keyed.filter(!col("is_delta")).select("dg")
    val delta = keyed.filter(col("is_delta")).select("doc_id", "dg")
    val hits = base
      .join(broadcast(delta.select("dg").distinct()), "dg")
      .select("dg").distinct()
      .withColumn("in_base", lit(true))
    delta
      .withColumn("first_id", min("doc_id").over(Window.partitionBy("dg")))
      .join(broadcast(hits), Seq("dg"), "left")
      .select(col("doc_id"),
        when(coalesce(col("in_base"), lit(false)), "dup_base")
          .when(col("doc_id") > col("first_id"), "dup_delta")
          .otherwise("new").as("status"))
  }

  private val q109Sql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0) AS t
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, MD5(ARRAY_TO_STRING(t[1:16], ' ')) AS dg,
      |    doc_id % 5 = 4 AS is_delta
      |  FROM toks WHERE LEN(t) >= 16),
      |base AS (SELECT DISTINCT dg FROM d WHERE NOT is_delta),
      |delta AS (SELECT doc_id, dg FROM d WHERE is_delta),
      |f AS (SELECT dg, MIN(doc_id) AS first_id FROM delta GROUP BY dg)
      |SELECT delta.doc_id,
      |  CASE WHEN base.dg IS NOT NULL THEN 'dup_base'
      |       WHEN delta.doc_id > f.first_id THEN 'dup_delta'
      |       ELSE 'new' END AS status
      |FROM delta LEFT JOIN base ON delta.dg = base.dg
      |JOIN f ON delta.dg = f.dg""".stripMargin

  /** QUALITY-AWARE CANONICAL SELECTION — for every near-dup cluster keep
    * the BEST document, not the lowest id: the RefinedWeb/FineWeb rule
    * (when duplicates differ by truncation or boilerplate, keeping the
    * arbitrary first copy throws away the better text). Quality proxy
    * here is n_chars (integer-exact; in production the q74/q107 score
    * plugs into the same argmax) with the doc_id tiebreak making the
    * pick deterministic.
    *
    * Scale shape: the persisted cluster assignment (q49's artifact
    * read) plus ONE id-keyed metadata join; the per-cluster pick is a
    * `max_by` partial aggregate on a (quality, -id) struct key —
    * |clusters| shuffle rows, never a per-cluster window sort (q72's
    * argument). */
  private def q117QualityCanonical(s: SparkSession, dir: String): DataFrame =
    q49DedupClusters(s, dir)
      .join(Tables.documents(s, dir).select("doc_id", "n_chars"), "doc_id")
      .groupBy("cluster_rep")
      .agg(count(lit(1)).as("n_docs"),
        expr("max_by(named_struct('doc_id', doc_id, 'n_chars', n_chars)," +
          " named_struct('q', n_chars, 'tb', -doc_id))").as("best"))
      .select(col("cluster_rep"), col("n_docs"),
        col("best.doc_id").as("keep_id"), col("best.n_chars").as("keep_chars"))

  private val q117Sql = closureCte + """,
      |comp AS (SELECT id AS doc_id, MIN(r) AS rep FROM reach GROUP BY id),
      |j AS (SELECT c.rep, c.doc_id, d.n_chars
      |      FROM comp c JOIN documents d USING (doc_id)),
      |r AS (SELECT rep, doc_id, n_chars,
      |        ROW_NUMBER() OVER (PARTITION BY rep ORDER BY n_chars DESC, doc_id) AS rn,
      |        COUNT(*) OVER (PARTITION BY rep) AS n_docs
      |      FROM j)
      |SELECT rep AS cluster_rep, CAST(n_docs AS BIGINT) AS n_docs,
      |  doc_id AS keep_id, n_chars AS keep_chars
      |FROM r WHERE rn = 1""".stripMargin

  /** SNAPSHOT DIFF (SCD/CDC between two table versions) — classify every
    * doc_id across two corpus snapshots as added / removed / changed /
    * unchanged by comparing content digests, the audit a versioned data
    * lake runs between drops. The two versions here are DERIVED by a
    * deterministic rule both engines state identically (v1 drops ids
    * ≡9 mod 10, v2 drops ids ≡0 mod 10 and appends a marker to ids ≡3
    * mod 7) — in production they are two partitions of a versioned
    * table; the operator under test is the digest compare, not the
    * version rule.
    *
    * Scale shape: each side is a map-only digest projection; the FULL
    * OUTER join is id-keyed with both sides co-partitioned by the same
    * key (one shuffle each, no broadcast needed at any size); the
    * output is a 4-group count with map-side partials. */
  private def q116SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    def version(drop: Int, marked: Boolean): DataFrame =
      Tables.documents(s, dir)
        .filter(col("doc_id") % 10 =!= drop)
        .select(col("doc_id"), md5(
          if (marked)
            when(col("doc_id") % 7 === 3, concat(col("text"), lit(" v2")))
              .otherwise(col("text"))
          else col("text")).as("dg"))
    val v1 = version(9, marked = false)
    val v2 = version(0, marked = true)
    // presence comes from explicit flags, NOT digest nullity: md5(NULL
    // text) is NULL, which would make a NULL-text doc present in both
    // versions look 'added'; changed uses the null-safe compare so two
    // NULL digests count as unchanged in both engines
    v1.select(col("doc_id"), col("dg").as("dg1"), lit(true).as("p1"))
      .join(v2.select(col("doc_id"), col("dg").as("dg2"), lit(true).as("p2")),
        Seq("doc_id"), "full_outer")
      .select(
        when(col("p1").isNull, "added")
          .when(col("p2").isNull, "removed")
          .when(!(col("dg1") <=> col("dg2")), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("status").agg(count(lit(1)).as("n"))
  }

  private val q116Sql =
    """WITH v1 AS (
      |  SELECT doc_id, MD5(text) AS dg, TRUE AS p1
      |  FROM documents WHERE doc_id % 10 <> 9),
      |v2 AS (
      |  SELECT doc_id,
      |    MD5(CASE WHEN doc_id % 7 = 3 THEN text || ' v2' ELSE text END) AS dg,
      |    TRUE AS p2
      |  FROM documents WHERE doc_id % 10 <> 0)
      |SELECT CASE WHEN p1 IS NULL THEN 'added'
      |            WHEN p2 IS NULL THEN 'removed'
      |            WHEN v1.dg IS DISTINCT FROM v2.dg THEN 'changed'
      |            ELSE 'unchanged' END AS status,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM v1 FULL OUTER JOIN v2 USING (doc_id)
      |GROUP BY 1""".stripMargin

  /** NEAR-DUP GRAPH DEGREE HISTOGRAM — the duplicate graph's degree
    * distribution (degree 0 = unique doc), the QC readout a dedup run
    * publishes before anyone trusts its clusters: a heavy tail means
    * template families whose components (q49) will be large and whose
    * canonical selection (q117) matters; mass at degree 0 means the
    * corpus is mostly unique and near-dup spend is wasted.
    *
    * Scale shape: the pair set is the PERSISTED q53 hot-shingle-cut
    * artifact ([[DedupArtifacts.cutPairs]]; held to the same UNCUT
    * oracle — the cut is recall-only on this corpus, DedupCutSpec pins
    * the margin), so the query itself is a pair-list scan plus two
    * keyed aggregates with map-side partials — the inverted-index
    * machinery runs once per corpus at ingest, not per report. */
  private def q122DupDegreeHist(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // both endpoints come out of a single explode, and the degree-0
    // bucket is derived from the HISTOGRAM (n_in = Σ n_docs) rather
    // than a second read of the degree table. Only the few-row
    // histogram is consumed twice, so only it checkpoints (eager —
    // a lazy checkpoint lets concurrent stages race the
    // materialization).
    val pairs = DedupArtifacts.cutPairs(s, dir)   // the persisted q53 pair set
    val deg = pairs
      .select(explode(array(col("doc_i"), col("doc_j"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("degree"))
    val hist = deg.groupBy("degree").agg(count(lit(1)).as("n_docs"))
      .localCheckpoint(eager = true)
    val zero = docs.agg(count(lit(1)).as("n_total"))
      .crossJoin(broadcast(hist.agg(sum("n_docs").as("n_in"))))
      .select(lit(0L).as("degree"), (col("n_total") - col("n_in")).as("n_docs"))
    hist.unionAll(zero).filter(col("n_docs") > 0)
  }

  private val q122Sql =
    s"""WITH p AS (SELECT * FROM ($jaccardSql)),
       |deg AS (
       |  SELECT doc_id, COUNT(*) AS degree FROM (
       |    SELECT doc_i AS doc_id FROM p
       |    UNION ALL SELECT doc_j AS doc_id FROM p) GROUP BY 1),
       |hist AS (SELECT degree, COUNT(*) AS n_docs FROM deg GROUP BY 1),
       |zero AS (SELECT 0 AS degree,
       |  (SELECT COUNT(*) FROM documents) - (SELECT COUNT(*) FROM deg) AS n_docs)
       |SELECT CAST(degree AS BIGINT) AS degree, CAST(n_docs AS BIGINT) AS n_docs
       |FROM hist
       |UNION ALL
       |SELECT CAST(degree AS BIGINT), CAST(n_docs AS BIGINT) FROM zero
       |WHERE n_docs > 0""".stripMargin

  /** PER-SOURCE DEDUP RATE — the funnel (q100) broken out by source:
    * how many of each source's documents survive the exact stage and
    * the near-dup stage (q100's composed rule: cluster representatives
    * ∩ exact canonicals, so the per-source numbers sum to the global
    * funnel's totals). The report that decides which crawls/feeds are
    * mostly re-crawl noise (low exact survival), which are syndication
    * sinks (low near-dup survival), and which deliver unique text —
    * the per-provider quality sheet every corpus ingest publishes.
    *
    * Scale shape: the exact stage is the digest hash-agg; the near-dup
    * stage reads the persisted cluster artifact; attribution is two
    * id-keyed left joins of indicator columns onto the (doc_id, source)
    * projection, rolled up into |sources| groups with map-side
    * partials. */
  private def q140DedupRateBySource(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val exact = docs.groupBy(md5(col("text")).as("dg"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
      .localCheckpoint(eager = true)   // read by the nd stage AND the join below
    val nd = DedupArtifacts.clusters(s, dir)
      .filter(col("doc_id") === col("cluster_rep")).select("doc_id")
      .join(exact, Seq("doc_id"), "left_semi")
    docs.select("doc_id", "source")
      .join(exact.withColumn("is_ex", lit(1L)), Seq("doc_id"), "left")
      .join(nd.withColumn("is_nd", lit(1L)), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("is_ex"), lit(0L))).as("n_exact"),
        sum(coalesce(col("is_nd"), lit(0L))).as("n_neardup"))
  }

  private val q140Sql = closureCte + """,
      |comp AS (SELECT id AS doc_id, MIN(r) AS rep FROM reach GROUP BY id),
      |ex AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY MD5(text)),
      |nd AS (SELECT c.doc_id FROM comp c JOIN ex USING (doc_id)
      |       WHERE c.doc_id = c.rep)
      |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(ex.doc_id) AS BIGINT) AS n_exact,
      |  CAST(COUNT(nd.doc_id) AS BIGINT) AS n_neardup
      |FROM documents d
      |LEFT JOIN ex ON ex.doc_id = d.doc_id
      |LEFT JOIN nd ON nd.doc_id = d.doc_id
      |GROUP BY 1""".stripMargin

  /** INCREMENTAL CLUSTER MAINTENANCE — merge today's delta batch into
    * yesterday's PERSISTED cluster assignment without reprocessing the
    * base corpus: the 100 TB dedup operation as it actually runs in
    * production (a full-history components recompute per ingest is the
    * thing no pipeline can afford). The delta rule is the stated
    * [[DedupArtifacts.DeltaMod]] split; "yesterday's run" is the
    * persisted base_clusters artifact.
    *
    * Today's work touches ONLY the delta's neighborhoods: cross pairs
    * delta×base via the broadcast-probe LSH path (the base corpus
    * never shuffles for candidate generation), delta-internal pairs
    * over the small batch, then LABEL CONTRACTION — each new pair is
    * mapped to its endpoints' current labels (the persisted base rep,
    * or the delta doc itself), components run over the AFFECTED LABEL
    * GRAPH only (nodes bounded by the new pair count, never corpus
    * size), and the merged mapping broadcasts back onto the corpus in
    * one map join. The iterative step never touches the corpus — the
    * incremental-CC shape that stays constant-cost per batch at any
    * history depth.
    *
    * Correctness of the contraction: every base label IS the min doc
    * id of its cluster, so components of the contracted graph have the
    * same min (= representative) as components of the full graph, and
    * connectivity is preserved because pairs are pairwise properties
    * (base-internal pairs ride inside their labels; every pair
    * touching the delta is regenerated). The oracle is q49's
    * FULL-RECOMPUTE transitive closure: the incremental result must
    * hash-match recomputing everything from scratch. */
  private def q142IncrementalClusters(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val isDelta =
      col("doc_id") % DedupArtifacts.DeltaMod === DedupArtifacts.DeltaRem
    // today's new pairs, from the PERSISTED candidate/verification
    // state: banded rows and doc sets are per-doc properties, so
    // filtering the artifacts IS the subset's tables — the merge
    // re-hashes nothing (no tokenize, no MinHash, no shingle agg).
    // Cross (delta x base, probe side broadcast — the base corpus never
    // shuffles for candidates) plus delta-internal, verified in ONE
    // pass over the shared persisted doc sets.
    val banded = DedupArtifacts.banded(s, dir)
    val cand = Dedup.crossCandidatesFromBanded(banded, isDelta)
      .unionByName(Dedup.lshCandidatesFromBanded(banded.filter(isDelta)))
    val newPairs = Dedup.verifyPairsWithSets(
      cand, DedupArtifacts.docSets(s, dir), Threshold)
    mergeAssignments(docs.select(col("doc_id")),
      DedupArtifacts.baseClusters(s, dir), newPairs)
  }

  /** LABEL-CONTRACTION merge — the incremental-CC step shared by q142
    * and the multi-batch composition proof (DedupArtifactsSpec): map
    * each new pair to its endpoints' current labels (the persisted base
    * rep, or the doc itself when unassigned), run components over the
    * AFFECTED LABEL GRAPH only (nodes bounded by the new pair count,
    * never corpus size), and broadcast the merged mapping back onto the
    * corpus in one map join. Composes: the output is again a label
    * assignment whose labels are min ids of their clusters, i.e. a
    * valid `baseAssign` for the next batch. */
  private[graft] def mergeAssignments(
      universe: DataFrame, baseAssign: DataFrame, newPairs: DataFrame): DataFrame = {
    // current label per doc: persisted base rep, or self for new docs;
    // consumed by the two endpoint joins AND the final map join —
    // eager, per the q122 rule (lazy checkpoints race concurrent
    // consumer stages; measured 7-18 s vs 3.5 s there)
    val lbl = universe.select(col("doc_id"))
      .join(baseAssign, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_rep"), col("doc_id")).as("lbl"))
      .localCheckpoint(eager = true)
    // materialized: consumed TWICE inside connectedComponents (the
    // symmetrized-edge checkpoint AND the initial node-label checkpoint
    // via lblNodes) — without this the whole newPairs subtree (the
    // banded candidate join in q154's case, ~1.1 s at sf0.1) runs once
    // per consumer. Eager per the q122 rule: both consumers are
    // checkpoint actions. Measured on q154: floor 3.98 -> 2.64 s (full-run floor).
    val lblEdges = newPairs
      .join(lbl.select(col("doc_id").as("doc_i"), col("lbl").as("src")), "doc_i")
      .join(lbl.select(col("doc_id").as("doc_j"), col("lbl").as("dst")), "doc_j")
      .select("src", "dst").filter(col("src") =!= col("dst"))
      .localCheckpoint(eager = true)
    val lblNodes = lblEdges.select(col("src").as("id"))
      .union(lblEdges.select(col("dst").as("id"))).distinct()
    // tiny iterative step: |nodes| <= 2x new pairs, NEVER corpus-sized
    val merged = Components.connectedComponents(lblNodes, lblEdges)
    lbl.join(broadcast(merged.select(col("id").as("lbl"), col("comp"))),
        Seq("lbl"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("lbl")).as("cluster_rep"))
  }

  /** CLUSTER LABEL-PURITY AUDIT — the cross-modal QC joining the two
    * spaces the engine deduplicates in: for every multi-document
    * LEXICAL near-dup cluster (q49's artifact), how many distinct
    * EMBEDDING labels its members carry, reported as a
    * (cluster size, label count) histogram. Pure clusters
    * (n_labels = 1) mean the text dedup agrees with the semantic space;
    * mixed clusters are either label noise or template families whose
    * members genuinely diverge semantically — the SemDeDup-era sanity
    * check that lexical dedup is not merging semantically distinct
    * content. Documents without an embedding row drop out (inner join;
    * the audit is over the embedded subset by definition).
    *
    * Scale shape: persisted cluster assignment + one id-keyed join to
    * the (id, label) projection; per-cluster rollup with map-side
    * partials (count_distinct carries at most |labels| values), then a
    * tiny histogram aggregate. */
  private def q144ClusterLabelPurity(s: SparkSession, dir: String): DataFrame =
    DedupArtifacts.clusters(s, dir)
      .join(Tables.embeddings(s, dir)
        .select(col("vec_id").as("doc_id"), col("label")), "doc_id")
      .groupBy("cluster_rep")
      .agg(count(lit(1)).as("n_docs"), countDistinct("label").as("n_labels"))
      .filter(col("n_docs") >= 2)
      .groupBy("n_docs", "n_labels").agg(count(lit(1)).as("n_clusters"))

  private val q144Sql = closureCte + """,
      |comp AS (SELECT id AS doc_id, MIN(r) AS rep FROM reach GROUP BY id),
      |cl AS (
      |  SELECT c.rep, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(COUNT(DISTINCT e.label) AS BIGINT) AS n_labels
      |  FROM comp c JOIN embeddings e ON e.vec_id = c.doc_id
      |  GROUP BY c.rep HAVING COUNT(*) >= 2)
      |SELECT n_docs, n_labels, CAST(COUNT(*) AS BIGINT) AS n_clusters
      |FROM cl GROUP BY 1, 2""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q24_dedup_exact", q24DedupExact, Some(q24Sql)),
    Q("q144_cluster_label_purity", q144ClusterLabelPurity, Some(q144Sql)),
    Q("q142_incremental_clusters", q142IncrementalClusters, Some(q49Sql)),
    Q("q180_clusters_after_takedown", q180ClustersAfterTakedown, Some(q180Sql)),
    Q("q140_dedup_rate_by_source", q140DedupRateBySource, Some(q140Sql)),
    Q("q122_dup_degree_hist", q122DupDegreeHist, Some(q122Sql)),
    Q("q106_dup_substring", q106DupSubstring, Some(q106Sql)),
    Q("q109_incr_dedup", q109IncrementalDedup, Some(q109Sql)),
    Q("q116_snapshot_diff", q116SnapshotDiff, Some(q116Sql)),
    Q("q117_quality_canonical", q117QualityCanonical, Some(q117Sql)),
    Q("q92_cdc_chunks", q92CdcChunks, Some(q92Sql)),
    Q("q93_dedup_agreement", q93DedupAgreement, Some(q93Sql)),
    Q("q100_dedup_funnel", q100DedupFunnel, Some(q100Sql)),
    Q("q105_source_overlap", q105SourceOverlap, Some(q105Sql)),
    Q("q25_dedup_minhash", q25DedupMinHash, Some(jaccardSql)),
    Q("q26_dedup_ngram", q26DedupNgram, Some(jaccardSql)),
    Q("q53_dedup_ngram_cut", q53DedupNgramCut, Some(jaccardSql)),
    Q("q27_dedup_simhash", q27DedupSimHash, Some(q27Sql)),
    Q("q146_dedup_simhash_h3", q146DedupSimhashH3, Some(simHashSql(3))),
    Q("q49_dedup_clusters", q49DedupClusters, Some(q49Sql)),
    Q("q85_syndication", q85Syndication, Some(q85Sql)),
    Q("q87_copy_matrix", q87CopyMatrix, Some(q87Sql)),
    Q("q63_dedup_winnow", q63DedupWinnow, Some(q63Sql)))
}
