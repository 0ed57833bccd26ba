package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
    user_id: Long, event_type: String, value: Double)

final case class UserSession(user_id: Long, n_events: Long,
    total_value: Double, first_ts: java.sql.Timestamp, last_ts: java.sql.Timestamp)

final case class KeptEvent(event_id: Long, user_id: Long,
    event_type: String, ts: java.sql.Timestamp)

/** Structured Streaming surface over the `events` table shape: windowed
  * aggregation with watermarked late-data handling, and custom
  * sessionization state via `flatMapGroupsWithState` — the streaming
  * operator set a training-data ingest pipeline needs (the reference is
  * batch-only; SURVEY §2.9 plans these as extensions).
  *
  * All transforms take the streaming DataFrame as input so they run
  * identically under `readStream` (production) and a batch DataFrame
  * (tests use `Trigger.AvailableNow` + memory sink for determinism).
  */
object EventStreams {

  /** 5-minute tumbling windows per event type, 10-minute watermark:
    * late rows beyond the watermark are dropped, state is bounded. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** STREAM-STATIC ENRICHMENT — the dimension-join every ingest
    * pipeline performs: the unbounded event stream joined to a small
    * static lookup (plans as a broadcast hash join per micro-batch; the
    * static side is re-resolved each batch, so a replaced dimension
    * file picks up without restarting the query). Left join keeps
    * events with no dimension row — an inner join would silently drop
    * them, the classic enrichment data-loss bug. */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(dim, Seq(key), "left")

  /** Per-user session accumulation with processing-time timeout —
    * mapGroupsWithState-style custom state (KeyValueGroupedDataset). */
  def sessionize(events: Dataset[EventRow], timeoutMs: Long = 60000): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSession, UserSession](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[UserSession]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.iterator
            state.remove()
            out
          } else {
            val batch = rows.toSeq
            val prev = state.getOption
            val merged = (prev.toSeq ++ batch.map(r =>
              UserSession(userId, 1L, r.value, r.ts, r.ts)))
              .reduceOption { (a, b) =>
                UserSession(userId, a.n_events + b.n_events,
                  a.total_value + b.total_value,
                  if (a.first_ts.before(b.first_ts)) a.first_ts else b.first_ts,
                  if (a.last_ts.after(b.last_ts)) a.last_ts else b.last_ts)
              }
            merged.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(timeoutMs)
            }
            Iterator.empty
          }
      }
  }

  /** 1-hour tumbling windows per event type — the STREAMING side of
    * q138's batch grid (same window width, same output shape), with a
    * watermark bounding state: closed windows emit once and their state
    * drops; late rows beyond the watermark are discarded. Append-mode
    * output is therefore exactly the batch aggregate restricted to
    * windows the watermark has closed — the stream ≡ batch equivalence
    * StreamingOpsSpec pins. */
  def tumblingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** TIME-HORIZON DEBOUNCE — the STREAMING side of q131's batch rule:
    * an event is kept iff the previous occurrence of the same
    * (user, type) is more than `horizonUs` older (or absent). State per
    * key is ONE long (the last occurrence's epoch-micros), matching the
    * batch LAG-against-previous-occurrence semantics — not
    * previous-KEPT, which would be a different (sequential) rule.
    *
    * Within each micro-batch the group's rows sort by (event time,
    * event_id) — the batch window's ORDER BY — so ties are broken
    * identically; across batches the single-long state carries the
    * chain. Contract: batches arrive event-time ordered per key (true
    * for replay/backfill sources; a production deployment adds a
    * watermark-delay buffer ahead of this stage for out-of-order
    * arrivals). */
  def debounce(events: Dataset[EventRow], horizonUs: Long): Dataset[KeptEvent] = {
    import events.sparkSession.implicits._
    def micros(ts: java.sql.Timestamp): Long =
      ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L
    events.groupByKey(r => (r.user_id, r.event_type))
      .flatMapGroupsWithState[Long, KeptEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((_, _), rows, state) =>
          val sorted = rows.toArray.sortBy(r => (micros(r.ts), r.event_id))
          var prev = state.getOption
          val kept = Vector.newBuilder[KeptEvent]
          sorted.foreach { r =>
            val us = micros(r.ts)
            if (prev.forall(p => us - p > horizonUs))
              kept += KeptEvent(r.event_id, r.user_id, r.event_type, r.ts)
            prev = Some(us)
          }
          prev.foreach(state.update)
          kept.result().iterator
      }
  }

  /** Streaming exact dedup by content digest — the ingest-side
    * counterpart of `Dedup.exactDedup`: keep the first arrival of each
    * digest, with state bounded by the event-time watermark
    * (`dropDuplicatesWithinWatermark`: duplicates later than the
    * watermark interval MAY reappear; that is the documented contract —
    * bounded state is the price of infinite streams, and the downstream
    * batch dedup sweep catches stragglers). */
  def dedupStream(docs: DataFrame, tsCol: String, textCol: String,
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__digest", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** Streaming MinHash NEAR-dup detection against a persisted base
    * index — the ingest-side counterpart of the q142 delta merge: new
    * documents stream in, and each emits the (new_id, base_id) pairs it
    * near-duplicates (Jaccard >= threshold) in the already-ingested
    * corpus, whose banded LSH table and verification doc-set table are
    * the STATIC sides (`DedupArtifacts.banded` / `.docSets` filtered to
    * the base).
    *
    * Everything stream-side is MAP-ONLY — per-doc shingle-hash ARRAY
    * via higher-order functions (no explode-aggregate, which a stream
    * would need a watermark for), k signature mins via `array_min` over
    * the array, banded buckets from signature slices — followed by two
    * STREAM-STATIC joins (candidates on (band, bucket), verification
    * sets on base_id), a codegen size-ratio cut, and the exact
    * `array_intersect` Jaccard check. Identical semantics to the batch
    * path by construction: `wordShingles` dedupes at string level, so
    * the per-doc hash array equals the shingle table's row set, and a
    * min over an array equals the batch groupBy min
    * (StreamingOpsSpec pins stream ≡ batch cross pairs row-level).
    *
    * Multi-band hits dedupe on the pair key; `dropDuplicates` keeps the
    * pair state indefinitely — a production deployment bounds it with
    * `dropDuplicatesWithinWatermark` on the ingest timestamp, same
    * contract as [[dedupStream]]. */
  def nearDupAgainstBase(
      docs: DataFrame, baseBanded: DataFrame, baseSets: DataFrame,
      idCol: String, textCol: String,
      n: Int, threshold: Double, k: Int = 32, bands: Int = 16): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val shsCol = sort_array(transform(
      graft.functions.TextFunctions.wordShingles(
        graft.functions.TextFunctions.tokens(col(textCol)), n),
      x => xxhash64(x)))
    val withSets = docs
      .select(col(idCol).as("new_id"), shsCol.as("shs"))
      .filter(size(col("shs")) > 0)
      .withColumn("sz", size(col("shs")).cast("long"))
    val sig = (0 until k).map(i =>
      array_min(transform(col("shs"), x => xxhash64(lit(i), x))).as(s"h$i"))
    val signed = withSets.select(
      Seq(col("new_id"), col("shs"), col("sz")) ++ sig: _*)
    val bandCols = (0 until bands).map { b =>
      val cols = (0 until r).map(j => col(s"h${b * r + j}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bucket"))
    }
    val exploded = signed
      .select(col("new_id"), col("shs"), col("sz"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("new_id"), col("shs"), col("sz"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    exploded
      .join(baseBanded.select(col("doc_id").as("base_id"),
        col("band"), col("bucket")), Seq("band", "bucket"))
      .filter(col("base_id") =!= col("new_id"))
      .join(baseSets.select(col("doc_id").as("base_id"),
        col("shs").as("shs_b"), col("sz").as("sz_b")), "base_id")
      .filter(col("sz") >= col("sz_b") * threshold &&
        col("sz_b") >= col("sz") * threshold)
      .withColumn("inter",
        size(array_intersect(col("shs"), col("shs_b"))).cast("long"))
      .filter(col("inter").cast("double") /
        (col("sz") + col("sz_b") - col("inter")) >= threshold)
      .select(col("new_id"), col("base_id"))
      .dropDuplicates("new_id", "base_id")
  }

  /** Streaming PERCEPTUAL-HASH near-dup detection against a persisted
    * base phash table — the media twin of [[nearDupAgainstBase]] and
    * the ingest-side counterpart of the q154 cluster merge: new media
    * stream in, and each emits the (new_id, base_id) pairs within
    * `maxHamming` bits of an already-ingested item
    * (`DedupArtifacts.phashes` filtered to the base is the static
    * side).
    *
    * Stream side is MAP-ONLY: the 64-bit aHash per payload (real
    * ImageIO path for decodable images, the deterministic stub
    * otherwise — the same dispatch the batch phash artifact uses for
    * `kind`) and `maxHamming + 1` pigeonhole band rows per item
    * ([[graft.dedup.Dedup.simHashBands]], the q143/q155 machinery).
    * Then ONE stream-static join on (band, bucket) and a codegen
    * `bit_count` verify — hamming IS the definition here, so unlike
    * the MinHash twin there is no second verification join. Multi-band
    * hits dedupe on the pair key; the same
    * `dropDuplicatesWithinWatermark` production note as
    * [[nearDupAgainstBase]] applies.
    *
    * At 100 TB the static band table is the persisted phash artifact
    * re-banded per micro-batch (11 cheap projections of an 8-byte
    * column) — or, since v13, the PERSISTED band table itself
    * (`DedupArtifacts.phashBanded`): pass it to [[mediaNearDupBatch]]
    * inside `foreachBatch` and each micro-batch's bucket neighborhoods
    * prune the artifact scan to matching `pb` directories, the media
    * twin of [[semNearDupBatch]]. The budget knob is the same q155
    * story: h <= 3 keeps the stream's bucket neighborhoods sparse. */
  def mediaNearDupAgainstBase(
      media: DataFrame, basePhashes: DataFrame,
      idCol: String, payloadCol: String, kind: String,
      maxHamming: Int): DataFrame =
    mediaHits(
      graft.dedup.Dedup.simHashBands(
        mediaFingerprints(media, idCol, payloadCol, kind), maxHamming),
      graft.dedup.Dedup.simHashBands(
        basePhashes.select(col("media_id").as("doc_id"),
          col("phash").as("simhash")), maxHamming),
      maxHamming)
      .dropDuplicates("new_id", "base_id")

  /** The foreachBatch FORM of the media near-dup probe over the
    * PERSISTED v13 band table (`DedupArtifacts.phashBanded`, the
    * `Layout.writeBucketDirs` pb layout): the micro-batch is a plain
    * DataFrame here, so its bucket neighborhoods CAN be collected and
    * `Layout.pruneToProbe` cuts the artifact scan to matching
    * directories before the join — the media twin of
    * [[semNearDupBatch]], same kernel as [[mediaNearDupAgainstBase]]
    * (StreamingOpsSpec pins foreachBatch ≡ stateless ≡ brute-force and
    * measures the files-read drop). The batch's banding is
    * localCheckpointed so the pruning collect and the join execute it
    * once. */
  def mediaNearDupBatch(
      batch: DataFrame, baseBanded: DataFrame,
      idCol: String, payloadCol: String, kind: String,
      maxHamming: Int): DataFrame = {
    val streamBands = graft.dedup.Dedup.simHashBands(
        mediaFingerprints(batch, idCol, payloadCol, kind), maxHamming)
      .localCheckpoint(eager = false)
    mediaHits(streamBands,
        graft.build.Layout.pruneToProbe(baseBanded, streamBands), maxHamming)
      .dropDuplicates("new_id", "base_id")
  }

  /** Map-only per-payload 64-bit aHash (real ImageIO path for decodable
    * images, the deterministic stub otherwise — the same dispatch the
    * batch phash artifact uses for `kind`). Null/empty payloads are
    * excluded BEFORE the typed map — the batch phash artifact is built
    * from docs.filter(length > 0), so an empty item must not hash
    * (aHashStub would give it 0L and pair it with any near-zero base
    * phash, breaking stream ≡ batch), and a null payload would NPE the
    * whole streaming query inside aHashImage. */
  private def mediaFingerprints(
      media: DataFrame, idCol: String, payloadCol: String,
      kind: String): DataFrame = {
    import media.sparkSession.implicits._
    media
      .select(col(idCol).cast("long").as("id"),
        col(payloadCol).cast("binary").as("p"))
      .filter(col("id").isNotNull && col("p").isNotNull && length(col("p")) > 0)
      .as[(Long, Array[Byte])]
      .map { case (id, p) =>
        val h = (if (kind == "image") graft.multimodal.Multimodal.aHashImage(p)
          else None).getOrElse(graft.multimodal.Multimodal.aHashStub(p))
        (id, h)
      }.toDF("doc_id", "simhash")
  }

  /** Shared un-deduped media hit stream behind both forms — ONE
    * definition of "a qualifying (new, base) pair" (the semNearDupHits
    * rule): join on (band, bucket), codegen `bit_count` verify —
    * hamming IS the definition here, no second set join. The base side
    * may carry extra columns (the artifact's `pb`); only the four the
    * join needs are selected. */
  private def mediaHits(streamBands: DataFrame, baseBands: DataFrame,
      maxHamming: Int): DataFrame =
    streamBands
      .join(baseBands.select(col("doc_id").as("base_id"),
        col("simhash").as("base_sim"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("base_id") =!= col("doc_id"))
      .filter(bit_count(col("simhash").bitwiseXOR(col("base_sim"))) <= maxHamming)
      .select(col("doc_id").as("new_id"), col("base_id"))

  /** Streaming EMBEDDING-COSINE near-dup detection against a persisted
    * base embedding table — the semantic twin of [[nearDupAgainstBase]]
    * / [[mediaNearDupAgainstBase]], completing the streaming tier of
    * the third dedup modality (the ingest-side counterpart of the q161
    * banded delta merge): new vectors stream in, and each emits the
    * (new_id, base_id) pairs whose cosine reaches `threshold` in the
    * already-ingested corpus.
    *
    * Candidate generation is the persisted sign-LSH banded signature
    * index (`DedupArtifacts.semBanded`, q161's): the stream side bands
    * ITSELF map-only against the base's planes (one signature + `bands`
    * projections per vector, no action, no state), and the join is a
    * stateless stream-static EQUI-join on (band, bucket) — each
    * micro-batch touches only its matching buckets, never the full
    * base (the scale fix for the previous full-base theta-join, whose
    * per-batch cost grew with |base|). Survivors are exact-cosine
    * verified with the SAME dot/(na*nb)-in-doubles kernel as the batch
    * path, so precision is exact and recall is the banding pigeonhole
    * budget — at the production threshold the budget covers every
    * qualifying pair, making stream ≡ batch ≡ exact (StreamingOpsSpec
    * pins it row-level), including the NULL-on-zero-norm convention (a
    * zero-norm vector's cosine is NULL under `try_divide`, which every
    * threshold comparison excludes, so it pairs with nothing on either
    * path — LshNearDupSpec pins it). Multi-band hits duplicate a
    * pair, so the pair key dedups per the banded twins'
    * `dropDuplicates` (production: `dropDuplicatesWithinWatermark`
    * bounds the state, as [[nearDupAgainstBase]] documents).
    *
    * The banded artifact ships in the `Layout.writeBucketDirs` layout
    * (v12: pb directories, bucket-sorted files) — the same persisted
    * state the q161 batch merge probes. This stateless form joins the
    * whole artifact map-side (the stream's bucket set is unknown at
    * plan time); a deployment that wants per-batch FILE skipping runs
    * [[semNearDupBatch]] inside `foreachBatch`, where
    * `Layout.pruneToProbe` cuts the scan to the micro-batch's bucket
    * neighborhoods' directories (files-read drop measured in
    * StreamingOpsSpec). */
  def semNearDupAgainstBase(
      vecs: DataFrame, baseEmb: DataFrame, baseBanded: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      nPlanes: Int = graft.dedup.DedupArtifacts.SemPlanes,
      bands: Int = graft.dedup.DedupArtifacts.SemBands,
      seed: Long = graft.dedup.DedupArtifacts.SemSeed): DataFrame =
    semNearDupHits(vecs, baseEmb, baseBanded, idCol, vecCol, threshold,
      nPlanes, bands, seed, carryCols = Nil)
      .select("new_id", "base_id")
      .dropDuplicates("new_id", "base_id")

  /** The PRODUCTION form of [[semNearDupAgainstBase]]: the pair-key
    * dedup state is BOUNDED by the stream's event-time watermark
    * (`dropDuplicatesWithinWatermark`) instead of kept forever — the
    * same contract [[dedupStream]] documents, now offered in code so
    * the state bound is an overload, not prose. Multi-band hits of one
    * pair arrive in the same micro-batch (they are projections of one
    * input row), so any non-degenerate delay dedups them; the window
    * only matters for a REPLAYED source re-emitting old rows, which is
    * exactly what a watermark bounds. Output carries `tsCol` (the
    * first-arrival event time) alongside the pair. */
  def semNearDupAgainstBaseWithinWatermark(
      vecs: DataFrame, baseEmb: DataFrame, baseBanded: DataFrame,
      idCol: String, vecCol: String, tsCol: String, delay: String,
      threshold: Double,
      nPlanes: Int = graft.dedup.DedupArtifacts.SemPlanes,
      bands: Int = graft.dedup.DedupArtifacts.SemBands,
      seed: Long = graft.dedup.DedupArtifacts.SemSeed): DataFrame =
    semNearDupHits(vecs.withWatermark(tsCol, delay), baseEmb, baseBanded,
      idCol, vecCol, threshold, nPlanes, bands, seed, carryCols = Seq(tsCol))
      .select("new_id", "base_id", tsCol)
      .dropDuplicatesWithinWatermark("new_id", "base_id")

  /** The foreachBatch FORM of the semantic near-dup probe — the shape a
    * deployment uses when it wants per-batch FILE skipping on top of
    * the stateless join's rows-read bound: each micro-batch is a plain
    * DataFrame here, so its bucket neighborhoods CAN be collected and
    * `Layout.pruneToProbe` cuts the banded-artifact scan to the
    * matching `pb` directories before the join (the stream-static form
    * cannot — the stream's buckets are unknown at plan time). Same
    * kernel, same planes, same verify as [[semNearDupAgainstBase]]:
    * StreamingOpsSpec pins foreachBatch ≡ stateless ≡ exact, and
    * measures the files-read drop directly on this kernel.
    *
    * Usage: {{{
    * stream.writeStream.foreachBatch { (batch, id) =>
    *   EventStreams.semNearDupBatch(batch, baseEmb, baseBanded, ...)
    *     .write.mode("append").parquet(out)
    * }
    * }}} */
  def semNearDupBatch(
      batch: DataFrame, baseEmb: DataFrame, baseBanded: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      nPlanes: Int = graft.dedup.DedupArtifacts.SemPlanes,
      bands: Int = graft.dedup.DedupArtifacts.SemBands,
      seed: Long = graft.dedup.DedupArtifacts.SemSeed,
      dim: Int = -1): DataFrame =
    semNearDupHits(batch, baseEmb, baseBanded, idCol, vecCol, threshold,
      nPlanes, bands, seed, carryCols = Nil, dimHint = dim,
      pruneBase = (base, probe) => graft.build.Layout.pruneToProbe(base, probe),
      matProbe = true)
      .select("new_id", "base_id")
      .dropDuplicates("new_id", "base_id")

  /** Shared un-deduped hit stream behind ALL three forms (plain,
    * watermarked, foreachBatch) — one definition of "a qualifying
    * (new, base) pair" so the forms can never diverge in semantics,
    * only in how state is bounded and what the base scan reads.
    * `pruneBase` receives (baseBanded, probeBandedRows) and may cut the
    * base scan (the foreachBatch form's per-batch directory pruning —
    * a streaming probe must keep the identity default: pruning needs a
    * collect). `dimHint > 0` skips the base-dimension lookup job —
    * foreachBatch callers compute it once outside the loop. `matProbe`
    * localCheckpoints the (batch-sized) probe banding so the pruning
    * collect and the candidate join execute it ONCE per trigger instead
    * of re-banding the micro-batch for each (streaming-illegal, so only
    * the foreachBatch form sets it; blocks are freed by the context
    * cleaner when the batch plan is collected). */
  private def semNearDupHits(
      vecs: DataFrame, baseEmb: DataFrame, baseBanded: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      nPlanes: Int, bands: Int, seed: Long,
      carryCols: Seq[String],
      dimHint: Int = -1,
      pruneBase: (DataFrame, DataFrame) => DataFrame = (base, _) => base,
      matProbe: Boolean = false): DataFrame = {
    // dim comes from the STATIC base (one head() at plan construction —
    // the stream side must never need an action), so the stream bands
    // itself with exactly the base index's hyperplanes
    val dim =
      if (dimHint > 0) dimHint
      else baseEmb.select(size(col("embedding"))).head().getInt(0)
    val planes = graft.similarity.Ann.hyperplanes(nPlanes, dim, seed)
    val d0 = graft.similarity.Ann.bandedRows(
        vecs.select(col(idCol).cast("long").as("new_id") +:
          col(vecCol).as("vb") +: carryCols.map(col): _*),
        "new_id", "vb", planes, bands, extraCols = carryCols)
      .withColumn("nb", graft.functions.Vectors.norm(col("vb")))
    val d = if (matProbe) d0.localCheckpoint(eager = false) else d0
    // prune FIRST (the artifact carries pb), join vectors after: the
    // directory cut applies to the banded scan itself
    val b = pruneBase(baseBanded, d).join(
        baseEmb.select(col("vec_id"), col("embedding").as("va"),
          graft.functions.Vectors.norm(col("embedding")).as("na")),
        "vec_id")
      .select(col("vec_id").as("base_id"), col("va"), col("na"),
        col("band"), col("bucket"))
    d.join(b, Seq("band", "bucket"))
      .filter(graft.functions.Vectors.cosineFromNorms(
        col("va"), col("vb"), col("na"), col("nb")) >= threshold)
  }
}
