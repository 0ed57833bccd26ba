package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions — the scale properties the engine
  * depends on, pinned as regression tests: filters pushed to the
  * parquet scan, column pruning in ReadSchema, broadcast joins for
  * small dimensions, TakeOrderedAndProject for top-k (no global sort),
  * and whole-stage codegen over the hot paths. */
class PlanShapeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("PlanShapeSpec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // PushedFilters lists get elided at the default 100 chars, which
    // would make the assertions below pass/fail on string luck
    .config("spark.sql.maxMetadataStringLength", "1000")
    // getOrCreate applies builder configs onto a shared session, so an
    // earlier suite (BucketingSpec) may have left auto-broadcast OFF;
    // re-pin the default or every unhinted-broadcast assertion becomes
    // suite-order-dependent
    .config("spark.sql.autoBroadcastJoinThreshold", "10485760")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("EQ filter is pushed to the parquet scan and columns are pruned") {
    val df = SparkEntry.queries("q02_filter_eq")(spark, sfDir)
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]"),
      s"expected pushed EQ filter, got:\n$p")
    // only the selected + filtered columns reach the reader
    assert(p.contains("ReadSchema") && !p.contains("props"),
      "untouched wide column 'props' must not be read")
  }

  test("small-dimension join broadcasts (no shuffle of the fact side)") {
    val p = plan(SparkEntry.queries("q09_join_broadcast")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"))
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(SparkEntry.queries("q07_topk")(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("pricing summary aggregates with partial (map-side) HashAggregate") {
    val p = plan(SparkEntry.queries("q01_pricing_summary")(spark, sfDir))
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_"), "expected map-side partial aggregation")
  }

  test("native dot product stays inside whole-stage codegen") {
    val emb = Tables.embeddings(spark, sfDir).limit(10)
    val a = emb.select(col("vec_id").as("i"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("j"), col("embedding").as("vb"))
    val df = a.crossJoin(b)
      .select(graft.functions.Vectors.dot(col("va"), col("vb")).as("d"))
    assert(df.collect().length == 100) // finalize the (adaptive) plan
    val p = plan(df)
    // `*(n)` marks a whole-stage-codegen stage in the tree string; the
    // projection computing dot_product must carry it (no fallback)
    assert("""\*\(\d+\) Project \[dot_product""".r.findFirstIn(p).isDefined,
      s"dot_product must stay inside a codegen stage:\n$p")
  }

  test("pruned-scan residuals on typed columns reach PushedFilters") {
    import graft.query.{And, Eq, PrunedScanner}
    import graft.build.IndexBuilder
    val work = s"/root/repo/target/test_planresid_${System.nanoTime()}"
    Tables.events(spark, sfDir).repartition(2).write.parquet(s"$work/data")
    IndexBuilder.build(spark, s"$work/data", Seq("event_type", "user_id"), s"$work/index")
    val df = PrunedScanner.scan(spark, s"$work/data",
      And(Eq("event_type", "click"), Eq("user_id", "7")), s"$work/index")
    val p = plan(df)
    assert(p.contains("EqualTo(user_id,7)"),
      s"numeric EQ residual must push to parquet (min/max + dictionary skipping):\n$p")
    assert(p.contains("EqualTo(event_type,click)"), p)
  }

  test("postings lookup prunes index partitions by column") {
    // build a small index, then check the lookup scan carries a
    // partition filter on `column`
    import graft.build.IndexBuilder
    val work = s"/root/repo/target/test_plan_${System.nanoTime()}"
    Tables.events(spark, sfDir).repartition(2).write.parquet(s"$work/data")
    IndexBuilder.build(spark, s"$work/data", Seq("event_type"), s"$work/index")
    val lookup = IndexBuilder.postings(spark, s"$work/index")
      .filter(col("column") === "event_type" && col("value") === "error")
    val p = plan(lookup)
    assert(p.contains("PartitionFilters") && p.contains("event_type"),
      s"expected partition pruning on the postings directory:\n$p")
  }

  test("prefix term compiles to range bounds pushed into the postings scan") {
    // q65's scale guarantee: a trailing-* term must reach the postings
    // parquet as min/max-prunable [p, p-next) bounds, not a residual
    // the scan evaluates row by row after reading everything
    val df = SparkEntry.queries("q65_text_prefix")(spark, sfDir)
    val p = plan(df)
    assert(p.contains("GreaterThanOrEqual(term,s)") && p.contains("LessThan(term,t)"),
      s"expected [s, t) range bounds in PushedFilters:\n$p")
    assert(p.contains("StringStartsWith(term,s)"),
      s"expected the startsWith residual pushed too:\n$p")
  }

  test("sequence packing windows per bucket, never a single global partition") {
    // q68's scale property: the running token sum must partition by the
    // range bucket — a global-order window plans Exchange SinglePartition
    // and serializes the corpus through one task
    val p = plan(SparkEntry.queries("q68_seq_pack")(spark, sfDir))
    assert(p.contains("Window"), p)
    assert(!p.contains("SinglePartition"),
      s"packing window must not serialize into one partition:\n$p")
    assert(p.contains("hashpartitioning(bucket"),
      s"expected the window exchange keyed on the pack bucket:\n$p")
  }

  test("contamination check broadcasts the eval-gram set (no corpus-side shuffle join)") {
    // q69's scale property: eval sets are MBs while the corpus is TBs —
    // the gram join must be a broadcast hash join, never a shuffled
    // SortMergeJoin that moves every corpus gram
    val p = plan(SparkEntry.queries("q69_contamination")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast of eval grams:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus grams must not shuffle for the eval join:\n$p")
  }

  test("vocab aggregation is partial (map-side combine) before the token shuffle") {
    val p = plan(SparkEntry.queries("q70_vocab")(spark, sfDir))
    assert(p.contains("partial_"),
      s"wordcount must combine map-side so shuffle volume is distinct tokens:\n$p")
  }

  test("range join stays an equi-join on the bin key, never a nested loop") {
    // q64's reason to exist: a bare BETWEEN with no equi-key plans
    // BroadcastNestedLoopJoin (O(n*m) compares); the bin decomposition
    // must give the planner a hash-joinable key
    val p = plan(SparkEntry.queries("q64_range_join")(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"bin decomposition must avoid the nested-loop join:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), s"expected an equi-join on the bin:\n$p")
  }

  test("stratified sample broadcasts stratum rates; the corpus is not shuffled") {
    val p = plan(SparkEntry.queries("q71_stratified_sample")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast of stratum counts:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus must not shuffle for the rate join:\n$p")
  }

  test("keep-best is a partial aggregation, not a per-key window sort") {
    // q72's reason to be max_by: a window carries every row of a key to
    // one partition and sorts it; partial max_by ships one candidate
    // per key per map task
    val p = plan(SparkEntry.queries("q72_keep_best")(spark, sfDir))
    assert(!p.contains("Window"), s"keep-best must not plan a Window:\n$p")
    assert(p.contains("partial_"),
      s"expected map-side partial max_by before the shuffle:\n$p")
  }

  test("doc chunking is map-only: no exchange anywhere in the plan") {
    val p = plan(SparkEntry.queries("q73_doc_chunks")(spark, sfDir))
    assert(!p.contains("Exchange"), s"chunking must not shuffle the corpus:\n$p")
  }

  test("unigram-LM lookup broadcasts the frequency table onto the tokens") {
    val p = plan(SparkEntry.queries("q74_unigram_lm")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"expected the unigram table broadcast onto the token stream:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the token stream must not shuffle for the frequency join:\n$p")
  }

  test("paragraph dedup anti-joins the repeated set on the digest, never a nested loop") {
    val p = plan(SparkEntry.queries("q75_para_dedup")(spark, sfDir))
    assert(p.contains("LeftAnti"),
      s"expected an anti-join dropping repeated paragraphs:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"paragraph dedup must stay digest-keyed:\n$p")
    // (no pruning assertion here: q75's blocks table is localCheckpoint'd,
    // which replaces the documents scan with a LogicalRDD in the executed
    // plan — a pruning check against it would be vacuously green)
  }

  test("DSIR weighting broadcasts the bucket log-ratio lookup onto the tokens") {
    val p = plan(SparkEntry.queries("q76_dsir_weights")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"expected the <=1024-row log-ratio table broadcast onto the token stream:\n$p")
    // column pruning: doc_id + lang + text reach the scan, nothing else
    assert(!p.contains("n_chars#") && !p.contains("source#"),
      s"untouched documents columns must be pruned:\n$p")
  }

  test("train split is map-only routing into one bounded-key aggregation") {
    val p = plan(SparkEntry.queries("q81_train_split")(spark, sfDir))
    assert(!p.contains("Join"), s"split routing must be a pure row function:\n$p")
    assert(p.contains("partial_"),
      s"expected map-side partials for the (split, shard) manifest:\n$p")
    // only doc_id + n_chars reach the scan
    assert(!p.contains("text#") && !p.contains("source#"),
      s"untouched documents columns must be pruned:\n$p")
  }

  test("tfidf broadcasts the bounded doc slice; the global df table never moves") {
    val p = plan(SparkEntry.queries("q82_tfidf_terms")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"expected the bounded tf slice broadcast onto the df table:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the vocabulary-sized df table must not shuffle for the join:\n$p")
  }

  test("cross-set decontamination broadcasts the eval band buckets over the corpus") {
    // the candidate stage directly (the full query hides it behind the
    // banded table's checkpoint boundary): the probe side's broadcast
    // is HINTED, so this holds under any threshold conf
    val sh = graft.dedup.Dedup.shingleTable(
      Tables.documents(spark, sfDir), "doc_id", "text", 3)
    val pc = plan(graft.dedup.Dedup.crossCandidates(sh, 20L, 32, 16))
    assert(pc.contains("BroadcastHashJoin"),
      s"expected the eval side's banded buckets broadcast:\n$pc")
    assert(!pc.contains("SortMergeJoin"),
      s"the corpus banded table must not shuffle for candidates:\n$pc")
    // and the full query never degenerates into a cartesian pair join
    val p = plan(SparkEntry.queries("q83_decontam_minhash")(spark, sfDir))
    assert(!p.contains("CartesianProduct"),
      s"candidate generation must stay (band, bucket)-keyed:\n$p")
  }

  test("mix budget is one bounded-key aggregation plus a broadcast scalar") {
    val p = plan(SparkEntry.queries("q84_mix_budget")(spark, sfDir))
    assert(p.contains("partial_"),
      s"expected map-side partials for the per-source token counts:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the grand total must attach as a broadcast scalar:\n$p")
  }

  test("BPE pair counting and PMI pair counting pre-combine map-side") {
    for (q <- Seq("q77_bpe_pairs", "q80_pmi_pairs")) {
      val p = plan(SparkEntry.queries(q)(spark, sfDir))
      assert(p.contains("partial_"),
        s"$q: expected map-side partial aggregation of the pair stream:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"$q: pair generation must be doc-local, never a cartesian join:\n$p")
      // (q80's scalar totals legitimately attach via a 1-row
      // BroadcastNestedLoopJoin — the scalar-subquery shape — so no
      // blanket BNLJ ban here; the corpus-sized joins are asserted
      // broadcast-hash above and in the q82/q83 pins)
    }
  }

  test("build-scan path canonicalization is a codegen expression, not a scalar UDF") {
    import graft.build.IndexBuilder
    val work = s"/root/repo/target/test_canon_${System.nanoTime()}"
    Tables.events(spark, sfDir).limit(100).write.parquet(work)
    val probe = IndexBuilder.listDataFiles(spark, work).head
    val canon = IndexBuilder.canonicalizeExpr(spark, probe)
    val df = spark.read.parquet(work)
      .select(canon(col("_metadata.file_path")).as("file")).distinct()
    // exact: expression agrees with the driver-side function on real paths
    val got = df.collect().map(_.getString(0)).toSet
    assert(got == IndexBuilder.listDataFiles(spark, work).map(_.path).toSet)
    // and no ScalaUDF anywhere in the plan (probe verified the prefix)
    val p = plan(df)
    assert(!p.contains("UDF"), s"expected UDF-free canonicalization:\n$p")
  }

  test("bucketed join reads both fact sides without an exchange on the key") {
    val p = plan(SparkEntry.queries("q99_bucketed_join")(spark, sfDir))
    assert(!"Exchange hashpartitioning\\(l_orderkey".r.findFirstIn(p).isDefined,
      s"bucketed layout must make the join exchange-free on the key:\n$p")
  }

  test("pack efficiency is map-only arithmetic into one partial aggregation") {
    val p = plan(SparkEntry.queries("q88_pack_efficiency")(spark, sfDir))
    assert(p.contains("partial_"), s"expected map-side partials:\n$p")
    assert(!p.contains("Window") && !p.contains("Join"),
      s"the histogram must not sort or join:\n$p")
  }

  test("sessionize and funnel share one per-user sort; no self-join") {
    val sess = plan(SparkEntry.queries("q91_sessionize")(spark, sfDir))
    // both windows and the first aggregation ride the same (user_id)
    // hash partitioning: exactly one shuffle of the event stream
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(sess).size == 1,
      s"sessionize must shuffle events exactly once:\n$sess")
    val fun = plan(SparkEntry.queries("q94_funnel")(spark, sfDir))
    assert(!fun.contains("Join"), s"the funnel must not self-join the log:\n$fun")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(fun).size == 1,
      s"funnel stages must reuse one per-user partitioning:\n$fun")
  }

  test("quality terciles window by source, never a single global partition") {
    val p = plan(SparkEntry.queries("q90_ppl_terciles")(spark, sfDir))
    // the ntile window itself must be keyed by source (q74's broadcast
    // build contains a benign 1-row SinglePartition total, so a blanket
    // no-SinglePartition assertion would be wrong)
    assert("ntile\\(3\\) windowspecdefinition\\(source".r.findFirstIn(p).isDefined,
      s"the tercile window must partition by source:\n$p")
  }

  test("cdc chunk windows stay doc-local; digest rollup pre-combines") {
    val p = plan(SparkEntry.queries("q92_cdc_chunks")(spark, sfDir))
    assert(!p.contains("Exchange SinglePartition") || p.contains("partial_"),
      s"chunk stats must pre-combine before any single-partition step:\n$p")
    assert("Exchange hashpartitioning\\(doc_id".r.findAllIn(p).size <= 1,
      s"boundary stream may shuffle at most once on doc_id:\n$p")
  }

  test("hash classifier is inference-as-map: no join, no window, one doc-keyed agg") {
    val p = plan(SparkEntry.queries("q107_hash_classifier")(spark, sfDir))
    assert(!p.contains("Join"), s"model scoring must not join:\n$p")
    assert(!p.contains("Window"), s"model scoring must not window:\n$p")
    assert(p.contains("partial_"),
      s"the doc margin must pre-combine map-side:\n$p")
  }

  test("substring-dup profile: digest semi-join, never a nested loop; run window doc-keyed") {
    val p = plan(SparkEntry.queries("q106_dup_substring")(spark, sfDir))
    assert(p.contains("LeftSemi"),
      s"flagged windows must come from a digest semi-join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop anywhere in the dup profile:\n$p")
    assert("windowspecdefinition\\(doc_id".r.findFirstIn(p).isDefined,
      s"the island window must partition by doc_id:\n$p")
  }

  test("incremental dedup probes the base with broadcasts; the base never shuffle-joins") {
    val p = plan(SparkEntry.queries("q109_incr_dedup")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"base probe and hit-set lookup must broadcast the delta-bounded side:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the base side must never shuffle for a join:\n$p")
    assert("windowspecdefinition\\(dg".r.findFirstIn(p).isDefined,
      s"the intra-batch first-claim must be a window over the delta's digest shuffle:\n$p")
  }

  test("banded incremental semantic pairs: no nested loop anywhere; delta-bounded sides broadcast") {
    val p = plan(SparkEntry.queries("q161_banded_incr_sem_pairs")(spark, sfDir))
    // the whole point of the q161 twin vs the q157 anchor: candidate
    // generation is (band, bucket)-keyed and verification is id-keyed,
    // so NOTHING in the plan may evaluate a pair predicate over an
    // unbounded cross product
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"banded maintenance must never plan a nested loop / cross product:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the delta probe and candidate verify must broadcast the batch-bounded side:\n$p")
    // every join side that isn't the (streaming) base/corpus is bounded
    // by the delta's bucket neighborhoods, so NOTHING may shuffle for a
    // join — the only exchanges are the two candidate distincts
    assert(!p.contains("SortMergeJoin"),
      s"no join in the banded pair merge may shuffle both sides:\n$p")
  }

  test("banded incremental semantic clusters: no nested loop, contraction graph broadcast back") {
    val p = plan(SparkEntry.queries("q163_banded_incr_sem_clusters")(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"banded cluster maintenance must never plan a nested loop / cross product:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the merged label mapping must broadcast back onto the corpus:\n$p")
  }

  test("table checksum is a join-free map into one pre-combined aggregate") {
    val p = plan(SparkEntry.queries("q110_table_checksum")(spark, sfDir))
    assert(!p.contains("Join"), s"a table checksum must not join:\n$p")
    assert(p.contains("partial_"),
      s"the xor/min/max must pre-combine map-side:\n$p")
  }

  test("vocab growth pre-combines the type-min aggregate; grams cross shuffles as longs") {
    val p = plan(SparkEntry.queries("q111_vocab_growth")(spark, sfDir))
    assert(p.contains("partial_min") || p.contains("partial_"),
      s"first-occurrence must reduce map-side:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the 10-row decile join must broadcast:\n$p")
  }

  test("table profile is one scan: expand-based multi-distinct, no per-column union") {
    val p = plan(SparkEntry.queries("q112_table_profile")(spark, sfDir))
    assert(!p.contains("Union"),
      s"the profile must not re-scan the table per column:\n$p")
    assert(p.contains("Expand"),
      s"multiple exact countDistincts should plan as one Expand pass:\n$p")
    assert("FileScan|Scan parquet".r.findAllIn(p).size <= 1,
      s"exactly one table scan expected:\n$p")
  }

  test("ref integrity audits in one pass per child; small parents broadcast") {
    val p = plan(SparkEntry.queries("q113_ref_integrity")(spark, sfDir))
    assert("BroadcastHashJoin.*LeftOuter".r.findFirstIn(p).isDefined,
      s"the dimension-keyed checks must broadcast the parent keys:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"every check is keyed — no nested loops:\n$p")
    // one scan per child: n_rows and n_orphans come from the SAME left
    // join, so each child table appears exactly once in the plan
    // one scan per ROLE: lineitem is child only; orders and customer
    // are each a child in one check and a parent in another
    Seq("lineitem.parquet" -> 1, "orders.parquet" -> 2, "customer.parquet" -> 2)
      .foreach { case (t, roles) =>
        val hits = java.util.regex.Pattern.quote(t).r.findAllIn(p).size
        assert(hits <= roles,
          s"$t must be scanned once per role (<= $roles), found $hits scans:\n$p")
      }
  }

  test("event paths: one user-keyed sort, no self-join, path counts pre-combine") {
    val p = plan(SparkEntry.queries("q114_event_paths")(spark, sfDir))
    assert(!p.contains("Join"), s"sequence mining must not self-join:\n$p")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      s"exactly one user-keyed shuffle expected:\n$p")
    assert(p.contains("partial_count"),
      s"path counts must pre-combine map-side:\n$p")
  }

  test("source divergence broadcasts vocab and totals onto the (source, token) counts") {
    val p = plan(SparkEntry.queries("q115_source_divergence")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"corpus vocabulary and per-source totals must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the (source, token) counts must not shuffle again for the joins:\n$p")
  }

  test("snapshot diff: id-keyed full outer join, counts pre-combined") {
    val p = plan(SparkEntry.queries("q116_snapshot_diff")(spark, sfDir))
    assert(p.contains("FullOuter"), s"version compare must be a full outer join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"the id-keyed join must never be a nested loop:\n$p")
    assert(p.contains("partial_count"),
      s"status counts must pre-combine map-side:\n$p")
  }

  test("range shards: boundaries from the compressed histogram, corpus never globally sorted") {
    val p = plan(SparkEntry.queries("q108_range_shards")(spark, sfDir))
    // the single-partition running sum is over the length HISTOGRAM
    // (post-aggregate), so a partial aggregate must sit below it
    assert(p.contains("partial_"),
      s"histogram must pre-combine before the boundary reduction:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"boundary routing must be a broadcast, not a shuffle join:\n$p")
  }

  test("dup degree histogram reduces the pair table once: no re-run per union branch") {
    val p = plan(SparkEntry.queries("q122_dup_degree_hist")(spark, sfDir))
    // the pair table is localCheckpoint'd: both degree branches and the
    // zero-degree count must read materialized RDDs, not re-plan the
    // candidate join (the only remaining join is the 1-row x 1-row
    // scalar cross for the degree-0 bucket)
    assert(p.contains("Scan ExistingRDD"),
      s"the graph reduction must reuse the materialized pairs:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no shuffle join may appear above the materialized pairs:\n$p")
    assert(p.contains("partial_count"),
      s"degree and histogram counts must pre-combine map-side:\n$p")
  }

  test("pq codes broadcast the codebook and pre-combine the argmin") {
    val p = plan(SparkEntry.queries("q123_pq_codes")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"the 128-row codebook must broadcast onto the subvectors:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the embeddings must never shuffle for the codebook join:\n$p")
    assert(p.contains("partial_min"),
      s"the per-(vector, subspace) argmin must pre-combine map-side:\n$p")
  }

  test("group mode: max_by partial aggregate, never a per-source window sort") {
    val p = plan(SparkEntry.queries("q139_group_mode")(spark, sfDir))
    assert(!p.contains("Window"), s"mode must not window-sort per source:\n$p")
    assert(p.contains("partial_max_by"),
      s"the argmax must combine map-side:\n$p")
  }

  test("tumbling window: map-side window struct, one pre-combined aggregate") {
    val p = plan(SparkEntry.queries("q138_tumbling_window")(spark, sfDir))
    assert(p.contains("partial_count"),
      s"hourly counts must pre-combine map-side:\n$p")
    assert(!p.contains("Join"),
      s"the event-time grid is a projection, never a time-dim join:\n$p")
  }

  test("pivot with a pinned value list: one aggregate pass, no distinct-values job") {
    val p = plan(SparkEntry.queries("q137_pivot")(spark, sfDir))
    assert(p.contains("partial_"), s"pivot counts must pre-combine map-side:\n$p")
    assert(!p.contains("Join"), s"reshape must not join:\n$p")
    // Spark's pivot is two-phase: a (day, type) count, then the day-keyed
    // reshape over those ALREADY-COMPACTED |days|x|types| rows — the
    // second shuffle never carries event rows
    assert("Exchange hashpartitioning\\(day".r.findAllIn(p).size == 2,
      s"the (day, type) pre-aggregate and the compact day reshape:\n$p")
  }

  test("local volume (tpch q5): dimension chain broadcasts, no nested loop") {
    val p = plan(SparkEntry.queries("q134_local_volume")(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"region/nation/customer/supplier must broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"every join edge is an equi-join:\n$p")
  }

  test("rollup: one Expand pass over the broadcast-joined base, no shuffle join") {
    val p = plan(SparkEntry.queries("q135_rollup")(spark, sfDir))
    assert(p.contains("Expand"), s"ROLLUP must plan a single Expand:\n$p")
    assert(!p.contains("SortMergeJoin"), s"all dims must broadcast:\n$p")
  }

  test("approx quantile check: sketch and exact percentiles in one aggregate pass") {
    val p = plan(SparkEntry.queries("q136_approx_quantile")(spark, sfDir))
    assert(p.contains("ObjectHashAggregate"),
      s"percentile aggregates plan as ObjectHashAggregate:\n$p")
    assert(p.contains("partial_"), s"sketches must pre-combine map-side:\n$p")
    assert(!p.contains("Join"), s"one pass, no join:\n$p")
  }

  test("nfc audit: native expression in the map, no UDF, one pre-combined aggregate") {
    val p = plan(SparkEntry.queries("q133_nfc_audit")(spark, sfDir))
    assert(!p.contains("ScalaUDF"),
      s"normalization must be the native expression, never a boxed UDF:\n$p")
    assert(p.contains("partial_"), s"audit sums must pre-combine map-side:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"the audit is a pure map + aggregate:\n$p")
  }

  test("skew report: checkpointed counts feed both readers; top-5 is TakeOrdered") {
    val p = plan(SparkEntry.queries("q132_skew_report")(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"),
      s"the hottest-key pick must never globally sort:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"the key counts must be materialized once for both readers:\n$p")
    assert(!p.contains("SortMergeJoin"), s"stats must broadcast:\n$p")
  }

  test("horizon dedup: one (user, type)-keyed sort, join-free, pre-combined") {
    val p = plan(SparkEntry.queries("q131_horizon_dedup")(spark, sfDir))
    assert(!p.contains("Join"), s"debounce must not self-join:\n$p")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      s"exactly one (user, type)-keyed shuffle expected:\n$p")
    assert(p.contains("partial_count"),
      s"the per-type audit must pre-combine map-side:\n$p")
  }

  test("int8 quantization is a pure map: no exchange, no join") {
    val p = plan(SparkEntry.queries("q130_int8_quant")(spark, sfDir))
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"quantization must not move the embeddings:\n$p")
  }

  test("phash buckets: reads the persisted hash artifact, pre-combined, join-free") {
    val p = plan(SparkEntry.queries("q129_phash_buckets")(spark, sfDir))
    // feature extraction moved to ingest (DedupArtifacts.phashes): the
    // report plan must scan the 8-byte fingerprint artifact, never the
    // payloads — no typed map, no decode, in the per-report plan
    assert(p.contains("graft_dedup") && p.contains("phashes"),
      s"the profile must scan the persisted phash artifact:\n$p")
    assert(!p.contains("MapPartitions"),
      s"no per-report re-hashing of payloads:\n$p")
    assert(p.contains("partial_count"),
      s"the hash-keyed dedup must pre-combine map-side:\n$p")
    assert(!p.contains("Join"), s"the bucket profile must not join:\n$p")
  }

  test("shipping priority: broadcast dims, decimal revenue, top-k without global sort") {
    val p = plan(SparkEntry.queries("q127_shipping_priority")(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-10 must never plan a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the filtered customer dim must broadcast:\n$p")
    assert(p.contains("PushedFilters"),
      s"date and segment filters must reach the parquet scans:\n$p")
  }

  test("weighted sample: top-k without global sort, no join") {
    val p = plan(SparkEntry.queries("q153_weighted_sample")(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"),
      s"the k smallest keys must never plan a global sort:\n$p")
    assert(!p.contains("Join"), s"the draw must not join:\n$p")
  }

  test("budget sample: salted prefilter bounds the cumulative window input") {
    val p = plan(SparkEntry.queries("q128_budget_sample")(spark, sfDir))
    assert("windowspecdefinition\\(source[#\\d]*, salt".r.findFirstIn(p).isDefined,
      s"the quota prefilter must window on (source, salt):\n$p")
    assert(p.contains("Join") == false, s"the draw must not join:\n$p")
  }

  test("incremental media pairs: base artifact streams through, no payload re-hash") {
    val p = plan(SparkEntry.queries("q150_incr_phash_pairs")(spark, sfDir))
    // the persisted pair artifact is a filter+union input, never joined
    // or re-shuffled (the r11 distinct-scope fix: only the cross side
    // dedupes), and no binary is ever re-decoded per run
    assert(p.contains("phash_pairs"),
      s"the base pair artifact must be scanned:\n$p")
    assert(!p.contains("MapPartitions"),
      s"no per-run payload re-hashing:\n$p")
    // exactly one HashAggregate pair (partial+final distinct) — over
    // the cross side only, not the union of base + cross
    val unionIdx = p.indexOf("Union")
    val aggIdx = p.indexOf("HashAggregate")
    assert(unionIdx >= 0 && aggIdx > unionIdx,
      s"the distinct must sit BELOW the union (cross side only):\n$p")
  }

  test("incremental media clusters: checkpointed inputs, merge map broadcast") {
    val p = plan(SparkEntry.queries("q154_incr_media_clusters")(spark, sfDir))
    // the iterative contraction ran in upstream checkpoint jobs, so the
    // FINAL plan is exactly the one map join: checkpointed label table
    // (ExistingRDD) + the merged mapping broadcast back onto the corpus
    assert(p.contains("BroadcastHashJoin"),
      s"the merged label mapping must broadcast back onto the corpus:\n$p")
    assert(p.contains("ExistingRDD"),
      s"the label table must come from the materialized checkpoint:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("MapPartitions"),
      s"the final merge is one broadcast map join, nothing heavier:\n$p")
  }

  test("incremental semantic pairs: artifact streams, delta broadcasts, base never shuffle-joins") {
    val p = plan(SparkEntry.queries("q157_incr_sem_pairs")(spark, sfDir))
    assert(p.contains("base_sem_pairs"),
      s"base-internal pairs must come from the persisted artifact:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"nothing in the merge may shuffle-join the base:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the cross evaluation must ride a delta broadcast:\n$p")
  }

  test("BPE encode pass is map-only: no exchange, no join, no explode") {
    // the merge-table DERIVATION (vocab wordcount + top-k collect) runs
    // eagerly at build time as its own bounded job; the RETURNED encode
    // plan must be one streaming scan→fold-replace→project pass
    val p = plan(SparkEntry.queries("q159_bpe_encode")(spark, sfDir))
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"the encode pass must not move the corpus:\n$p")
    assert(!p.contains("Generate"),
      s"the corpus must never explode into a token stream:\n$p")
  }

  test("token entropy is map-only: no exchange, no join, no explode") {
    val p = plan(SparkEntry.queries("q156_token_entropy")(spark, sfDir))
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"the entropy scan must not move the corpus:\n$p")
    assert(!p.contains("Generate"),
      s"token counts come from in-array run-lengths, never an explode:\n$p")
  }

  test("production media hamming tier: artifact scan, banded equi-join, no cartesian") {
    val p = plan(SparkEntry.queries("q155_phash_h3")(spark, sfDir))
    assert(p.contains("phashes"),
      s"the tier must scan the persisted phash artifact:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidates must come from the (band, bucket) equi-join:\n$p")
    assert(!p.contains("MapPartitions"),
      s"no per-report re-hashing of payloads:\n$p")
  }

  test("fuzzy terms: query variants broadcast onto the deletion index, verify codegen") {
    val p = plan(SparkEntry.queries("q126_fuzzy_terms")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"the query-side deletion variants must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the vocabulary index must never shuffle for the lookup:\n$p")
    assert(p.contains("levenshtein"),
      s"the exact verify must be the built-in (codegen) levenshtein:\n$p")
  }

  test("salted join shuffles on (key, salt) and replicates the dim by explode") {
    val p = plan(SparkEntry.queries("q125_salted_join")(spark, sfDir))
    assert("hashpartitioning\\(user_id[#\\dL]*, __salt".r.findFirstIn(p).isDefined,
      s"the fact side must shuffle on the SALTED key:\n$p")
    assert(p.contains("Generate explode"),
      s"the dim must be replicated once per salt:\n$p")
    assert(!p.contains("BroadcastHashJoin ["),
      s"a broadcast join would have no shuffle to salt — the hint failed:\n$p")
  }

  test("pq-adc scores via broadcast table over the codes; raw vectors only reranked") {
    // r19: q124's registered plan now materializes the kernel result
    // once for recallCheck's two consumers (a LogicalRDD boundary), so
    // the ADC shape must be asserted on the KERNEL's own plan — same
    // corpus/queries/params as q124 builds it
    val emb = graft.Tables.embeddings(spark, sfDir)
    val p = plan(graft.similarity.Ann.pqAdcTopK(
      emb, emb.filter(org.apache.spark.sql.functions.col("vec_id") < 3),
      5, shortlist = 50))
    assert(p.contains("BroadcastHashJoin"),
      s"the ADC distance table and shortlist must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"neither codes nor corpus may shuffle-join:\n$p")
    assert(p.contains("partial_sum"),
      s"the per-(query, vector) ADC sum must pre-combine map-side:\n$p")
    // and the registered query keeps the broadcast-only reduction above
    // the materialized kernel rows
    val q = plan(SparkEntry.queries("q124_pq_adc")(spark, sfDir))
    assert(q.contains("Scan ExistingRDD"),
      s"q124 must reduce the once-materialized kernel result:\n$q")
    assert(!q.contains("SortMergeJoin"),
      s"the recall reduction must stay broadcast-only:\n$q")
  }

  test("group-quota sample: salted pre-window bounds the per-source window input") {
    val p = plan(SparkEntry.queries("q118_group_quota_sample")(spark, sfDir))
    // two window passes: (source, salt) local top-N, then source global
    assert("Window \\[row_number".r.findAllIn(p).size == 2,
      s"expected the salted two-pass top-N, got:\n$p")
    assert("windowspecdefinition\\(source[#\\d]*, salt".r.findFirstIn(p).isDefined,
      s"first window must partition by (source, salt):\n$p")
    assert(!p.contains("Join"), s"sampling must not join:\n$p")
  }

  test("charset audit: map-only scan into one pre-combined source aggregate") {
    val p = plan(SparkEntry.queries("q119_charset_audit")(spark, sfDir))
    assert(p.contains("partial_"), s"audit sums must pre-combine map-side:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"the audit is a pure map + aggregate:\n$p")
    assert("Exchange hashpartitioning\\(source".r.findAllIn(p).size <= 1,
      s"only the |sources|-group aggregate may shuffle:\n$p")
  }

  test("line filter is entirely map-side: no shuffle, no join, no explode") {
    val p = plan(SparkEntry.queries("q120_line_filter")(spark, sfDir))
    assert(!p.contains("Exchange"), s"line filtering must not shuffle:\n$p")
    assert(!p.contains("Generate"),
      s"lines are filtered in-array, never exploded to rows:\n$p")
  }

  test("source octiles: window runs over the histogram, totals broadcast") {
    val p = plan(SparkEntry.queries("q121_source_octiles")(spark, sfDir))
    // the cumulative window must sit ABOVE the histogram aggregate —
    // i.e. a partial_count exists below the windowed branch
    assert(p.contains("partial_count"),
      s"histogram must pre-combine before the cumulative window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"per-source totals must broadcast onto the histogram:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join at histogram size:\n$p")
  }

  test("dedup-QC reports read the persisted artifacts, never rebuild the machinery") {
    // the ingest-pays-once contract at plan level: a report's plan scans
    // the artifact parquet — no shingle hashing (xxhash64), no MinHash
    // aggregate, no pointer-jumping joins anywhere in it
    for (q <- Seq("q122_dup_degree_hist", "q85_syndication",
        "q117_quality_canonical", "q93_dedup_agreement",
        "q105_source_overlap")) {
      val p = plan(SparkEntry.queries(q)(spark, sfDir))
      // q122 materializes the artifact-derived histogram at build time
      // (eager checkpoint), so its final plan shows the checkpointed
      // ExistingRDD rather than the artifact FileScan itself; the
      // cluster map is served from its doc_id-BUCKETED catalog table
      // (graft_clusters_*, v12 layout) — still the persisted artifact,
      // one bucketed copy removed from the parquet tree
      assert(p.contains("graft_dedup") || p.contains("graft_clusters_") ||
        p.contains("graft_media_clusters_") || p.contains("ExistingRDD"),
        s"$q must consume the persisted artifact:\n$p")
      assert(!p.contains("xxhash64"),
        s"$q must not re-hash shingles per report:\n$p")
    }
  }
}
