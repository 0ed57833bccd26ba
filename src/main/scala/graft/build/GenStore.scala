package graft.build

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE gen-stamped-store lifecycle protocol, shared by every
  * persisted maintained structure in the engine — the vector indexes
  * (`graft.similarity.AnnIndex`: raw-IVF, IVF-PQ, banded LSH, the
  * point-fetch vector store) and the text postings store
  * (`graft.text.PostingsStore`). Extracted in r18 so the regimes cannot
  * drift between structures (the r17 verdict's unification item): one
  * definition of the meta, the generation reservation, the staged
  * compact/recover swap, the three read regimes, and the staleness
  * counters.
  *
  * PROTOCOL (see `AnnIndex`'s class doc for the full economics):
  *  - BUILD writes the corpus as `gen=0` and the `_INDEX_META` marker
  *    LAST (completion marker; a crash mid-build leaves no meta and the
  *    next build deletes the partial tree);
  *  - APPEND reserves the next generation from the meta (O(1)), writes
  *    ONLY the delta into its own `gen=N` directory with overwrite
  *    semantics (file-idempotent replays), and commits by rewriting the
  *    meta — gen counter, history flags, staleness counters, last
  *    applied streaming batch — atomically ([[MetaIO.write]]);
  *  - READS resolve through three regimes decided by the meta: PLAIN
  *    (append-only history — no shuffle, probe filters push into the
  *    scan), BOUNDED tracked-upsert (resolution bounded by the recorded
  *    upsert generations), UNTRUSTED (full latest-gen resolution);
  *  - COMPACT rebuilds at gen 0 in a sibling `.compact.tmp` tree and
  *    swaps (delete + rename); the delete→rename crash gap is adopted
  *    by [[recover]].
  *
  * STALENESS COUNTERS (exact since r18): `rows0`/`rowsa` are LIVE row
  * counters — rows of gen 0 / of append generations that a full
  * latest-gen resolution would return. Declared (`newIds = true`)
  * appends on trusted histories add their written rows to `rowsa` and
  * touch nothing else (the declaration guarantees no supersession — the
  * common case pays zero extra work). An UNDECLARED append (or any
  * append onto an untrusted history) additionally counts the live rows
  * its ids supersede with one broadcast semi-join of the (delta-scale)
  * id set against the committed generations' (key, gen) columns — a
  * column-pruned thin scan, output O(|delta|) — and moves them out of
  * the counters, so `appendRows / (baseRows + appendRows)` IS the live
  * append-row fraction exactly, on every history shape (the r17 ≤2×
  * upsert band is gone). Metas from before the counters (`-1`) stay
  * legacy: [[metaStaleness]] returns None and the structure's reader
  * falls back to its O(index) scan.
  *
  * SENTINELS AND TOMBSTONES (r19 — the counters count what readers
  * serve): some structures write rows that exist only for SUPERSESSION,
  * never for serving — the text store's empty-doc sentinel (term = "")
  * and every structure's DELETE tombstone. Those rows occupy their key's
  * generation (so resolution drops the superseded live rows) but the
  * live views filter them out after resolution, so the counters must
  * exclude them too: generation writers count only serving rows as
  * `written`, and [[deadCounts]] takes a per-row `weight` (0 for
  * sentinel/tombstone rows) so a superseded sentinel never moves a
  * phantom row out of the counters. `staleness` therefore stays the
  * exact live SERVED-row append fraction on delete-bearing histories.
  *
  * DELETE (r19 — the lifecycle's last CRUD verb): a takedown batch is an
  * UNDECLARED append of tombstone rows — one row per deleted key,
  * encoded per structure so the shared machinery needs no schema change
  * (text: the sentinel row `term = ""`; IVF/PQ assignments: `cell = -1`
  * with a null payload; banded: `band = -1`; point-fetch vecs: a null
  * vector). Deletion then falls out of the existing regimes: the delete
  * generation is recorded as an upsert gen, so the bounded read's
  * anti-join removes the deleted keys from the untouched branch, the
  * resolve picks the tombstone as the key's latest row, and the
  * post-resolution filter drops it — no read path changes shape.
  * Tombstones count `written = 0` and move the rows they supersede out
  * of the counters (`weight` above), so staleness stays exact; compact
  * rebuilds from the caller's corpus (minus the takedowns) and drops
  * them. RE-ADDING a deleted key MUST be an undeclared append: a
  * `newIds = true` declaration means never-before-seen — a re-add under
  * it would land in a non-upsert generation and the bounded regime's
  * anti-join (keyed by the delete gen's ids) would remove the new row.
  * Deletes add no live rows, so they don't raise staleness; a
  * delete-heavy deployment compacts on tracked-generation count
  * (`upsertGens.size`) instead.
  */
private[graft] object GenStore {

  /** The store's durable control state: `gen` is the next-append
    * generation (commit pointer: only gens below it are visible),
    * `appendOnly` keeps the plain live view, `trusted` says `newIds`
    * declarations held for the whole history (false after an in-stream
    * compact), `upsertGens` are the generations whose append was an
    * upsert (bounded-resolution read path), `batch` is the last applied
    * streaming batch, `params` the model parameters.
    *
    * `baseRows`/`appendRows` are the O(1) exact staleness counters (see
    * class doc); -1 = legacy meta without counters. */
  final case class Meta(
      gen: Long, appendOnly: Boolean, batch: Long,
      trusted: Boolean = true, upsertGens: Seq[Long] = Nil,
      baseRows: Long = -1L, appendRows: Long = -1L,
      params: Map[String, String] = Map.empty)

  private val ReservedKeys =
    Set("gen", "plain", "batch", "trust", "ugens", "rows0", "rowsa")

  def metaPath(dir: String): String = s"$dir/_INDEX_META"

  private def fsOf(s: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Missing keys default CONSERVATIVELY: an ambiguous or legacy meta
    * must route readers through full upsert resolution (`plain` and
    * `trust` default false — serving a truncated/foreign meta as a
    * plain read could return superseded duplicate rows; resolving an
    * actually-append-only history is merely slower, never wrong). */
  def readMeta(s: SparkSession, dir: String): Option[Meta] =
    MetaIO.read(s.sparkContext.hadoopConfiguration, new Path(metaPath(dir)))
      .flatMap { line =>
        val kv = line.split(';').flatMap { f =>
          f.split('=') match { case Array(k, v) => Some(k -> v); case _ => None }
        }.toMap
        for (g <- kv.get("gen").flatMap(_.toLongOption))
          yield Meta(g,
            kv.get("plain").exists(_ == "true"),
            kv.get("batch").flatMap(_.toLongOption).getOrElse(-1L),
            kv.get("trust").exists(_ == "true"),
            kv.get("ugens").toSeq.flatMap(_.split(',').flatMap(_.toLongOption)),
            kv.get("rows0").flatMap(_.toLongOption).getOrElse(-1L),
            kv.get("rowsa").flatMap(_.toLongOption).getOrElse(-1L),
            kv -- ReservedKeys)
      }

  /** Meta writes are ATOMIC ([[MetaIO.write]]: temp file + overwrite-
    * rename): an in-place create would truncate the old marker before
    * the new bytes land, so a crash mid-write on an APPEND would
    * destroy the completion marker of a perfectly intact index — and
    * the next maintenance pass would treat it as partial and rebuild
    * from one micro-batch. */
  def writeMeta(s: SparkSession, dir: String, m: Meta): Unit = {
    val extra = m.params.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
    val ugens =
      if (m.upsertGens.isEmpty) Nil else Seq(s"ugens=${m.upsertGens.mkString(",")}")
    val rows =
      if (m.baseRows < 0 || m.appendRows < 0) Nil
      else Seq(s"rows0=${m.baseRows}", s"rowsa=${m.appendRows}")
    MetaIO.write(s.sparkContext.hadoopConfiguration, new Path(metaPath(dir)),
      (Seq(s"gen=${m.gen}", s"plain=${m.appendOnly}", s"batch=${m.batch}",
        s"trust=${m.trusted}") ++ ugens ++ rows ++ extra).mkString(";"))
  }

  /** Whether a COMPLETE store lives at `dir` — true only once the
    * build's meta (written after every data file) landed. */
  def isComplete(s: SparkSession, dir: String): Boolean =
    readMeta(s, dir).isDefined

  /** The last streaming batch id applied (-1 when none) — the replay
    * guard for exactly-once foreachBatch maintenance. The batch id
    * rides the SAME meta write as the append's gen/flag/counter update,
    * so "recorded" always means "fully applied". */
  def lastAppliedBatch(s: SparkSession, dir: String): Long =
    readMeta(s, dir).map(_.batch).getOrElse(-1L)

  /** Upsert generations tracked for bounded resolution before the
    * history degrades to untrusted full resolution: past this many
    * undeclared appends the per-read isin/anti-join machinery stops
    * paying relative to one resolve (and staleness should have
    * compacted long before). */
  val MaxTrackedUpsertGens = 64

  /** Next-append bookkeeping shared by every structure: reserve the
    * generation from the meta (O(1)); an undeclared (possibly-upsert)
    * append flips the plain flag off AND records its generation, which
    * is what keeps the read-side resolution bounded. Returns
    * (reserved gen, the meta to commit after the write, the PREVIOUS
    * meta — the appender needs its flags to decide whether the exact
    * dead-row count must run). A meta-less tree is a partial or legacy
    * build and must be rebuilt, not appended to — throws. */
  def reserveGen(s: SparkSession, dir: String, newIds: Boolean,
      batchId: Long): (Long, Meta, Meta) =
    readMeta(s, dir) match {
      case Some(m) =>
        val ugens = if (newIds) m.upsertGens else m.upsertGens :+ m.gen
        val next =
          if (ugens.size > MaxTrackedUpsertGens)
            m.copy(gen = m.gen + 1, appendOnly = false,
              batch = math.max(m.batch, batchId),
              trusted = false, upsertGens = Nil)
          else m.copy(gen = m.gen + 1, appendOnly = m.appendOnly && newIds,
            batch = math.max(m.batch, batchId), upsertGens = ugens)
        (m.gen, next, m)
      case None => throw new IllegalStateException(
        s"no complete index at $dir (missing ${metaPath(dir)}): build it " +
          "first — a legacy/partial tree must be rebuilt, not appended to")
    }

  /** Validate caller-passed model parameters against the meta's — a
    * mismatched append or read would silently operate under a DIFFERENT
    * model, the failure mode persisting the parameters exists to
    * prevent. A meta without the parameter is a pre-params legacy tree:
    * rebuilt, never guessed at. */
  def requireParam(m: Meta, dir: String, key: String, expected: Long): Unit =
    m.params.get(key).flatMap(_.toLongOption) match {
      case Some(v) if v == expected => ()
      case Some(v) => throw new IllegalArgumentException(
        s"index at $dir was built with $key=$v, caller passed $expected — " +
          "parameters are fixed at build time; compact/rebuild to change them")
      case None => throw new IllegalStateException(
        s"index at $dir has no persisted $key (pre-params legacy tree): rebuild it")
    }

  /** The meta as the READ-SIDE contract: a meta-less tree is partial or
    * legacy and must not be silently served. */
  def metaOrThrow(s: SparkSession, dir: String): Meta =
    readMeta(s, dir).getOrElse(throw new IllegalStateException(
      s"no complete index at $dir (missing ${metaPath(dir)}): build it " +
        "first — a legacy/partial tree must be rebuilt, not read"))

  /** Footer-only row count of a just-written generation directory. An
    * EMPTY partitioned write leaves only _SUCCESS (no schema to infer),
    * which must count as 0 — not crash the append: a zero-row streaming
    * micro-batch would otherwise wedge the maintenance loop forever
    * (the meta never advances, so the batch replays into the same
    * failure). */
  def countWritten(s: SparkSession, out: String): Long =
    try s.read.parquet(out).count()
    catch { case _: org.apache.spark.sql.AnalysisException => 0L }

  /** The counter-derived EXACT live append-row fraction, when the meta
    * carries the counters (see class doc; None = legacy meta, the
    * caller falls back to its O(index) scan). */
  def metaStaleness(m: Meta): Option[Double] =
    if (m.baseRows < 0 || m.appendRows < 0) None
    else {
      val total = m.baseRows + m.appendRows
      Some(if (total == 0) 0.0 else m.appendRows.toDouble / total)
    }

  /** Commit an append's counters: the written generation's rows join
    * the live append set; the superseded live rows (`dead` = base,
    * append split) leave theirs. Legacy counter-less metas stay
    * legacy. */
  def appendCounters(m: Meta, written: Long, dead: (Long, Long)): Meta =
    if (m.baseRows < 0 || m.appendRows < 0) m
    else m.copy(baseRows = m.baseRows - dead._1,
      appendRows = m.appendRows - dead._2 + written)

  /** The EXACT superseded-live-row count behind [[appendCounters]]:
    * among the committed generations' rows (`raw` — only the `keyCol`,
    * `gen`, and weight-input columns are read, a column-pruned thin
    * scan), the live rows whose key appears in the (broadcast,
    * delta-scale) `ids` set, split (gen-0 rows, append-gen rows).
    * Exactness rests on one invariant that holds in EVERY regime: a
    * key's live generation is its MAX generation over the raw rows
    * (declared appends never re-add an existing id on trusted
    * histories; untrusted histories resolve by global max-gen by
    * definition). Every row of a key's live generation counts (one-row
    * structures have exactly one), weighted by `weight` — 1 for serving
    * rows, 0 for sentinel/tombstone rows (class doc): a sentinel decides
    * its key's live generation but never counts as a live row, because
    * the views never serve it. */
  def deadCounts(raw: DataFrame, keyCol: String, ids: DataFrame,
      weight: Column = lit(1L), baseGen: Long = 0L): (Long, Long) = {
    val matched = raw
      .select(col(keyCol), col("gen").cast("long").as("gen"),
        weight.cast("long").as("w"))
      .join(broadcast(ids.select(col(keyCol))), Seq(keyCol), "left_semi")
    val liveRows = matched
      .join(matched.groupBy(keyCol).agg(max("gen").as("gen")), Seq(keyCol, "gen"))
    // base vs append split at `baseGen`, NOT a literal 0: after a
    // HORIZON compact the base generation is the squash point (the gen
    // clock is preserved so as-of reads keep working), and a superseded
    // squashed-base row must leave `baseRows`, not `appendRows`
    val r = liveRows.agg(
      coalesce(sum(when(col("gen") === baseGen, col("w"))), lit(0L)).as("d0"),
      coalesce(sum(when(col("gen") > baseGen, col("w"))), lit(0L)).as("da")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Whether an append must pay the [[deadCounts]] job: undeclared
    * appends always (their ids may supersede); declared appends only on
    * UNTRUSTED histories (the declarations themselves are unreliable
    * there — content-identical re-appends after an in-stream compact).
    * Declared appends on trusted histories — the common streaming case —
    * pay nothing. */
  def needsDeadCount(prev: Meta, newIds: Boolean): Boolean =
    !newIds || !prev.trusted

  /** The meta RESTRICTED to generations ≤ `n` — the AS-OF read
    * (time-travel): stores retain their full generation history until
    * compact, so "the corpus as of generation N" is the same three-
    * regime view over the prefix. The restricted meta's commit pointer
    * is `n + 1` (callers' raw reads filter `gen < meta.gen`, so the
    * later generations' files are partition-pruned away), its upsert
    * gens are the recorded ones inside the prefix, and the regime
    * decision re-derives: a trusted history whose recorded upserts all
    * land AFTER `n` was append-only as of `n` — plain read; an
    * untrusted history (in-stream compact, or upsert tracking
    * overflowed) stays untrusted — the prefix's declarations can't be
    * reconstructed, so the as-of read pays full resolution of the
    * prefix (correct, conservatively). Counters describe the FULL
    * history, so the restricted meta drops them (staleness is not an
    * as-of concept). `n` at or past the last committed generation is
    * just the live view.
    *
    * RETENTION: the as-of horizon ends at the last FULL compact —
    * compaction rewrites the store as one generation, deliberately
    * discarding the history it resolves (that IS its storage/read-cost
    * win); the generation clock restarting at 0 makes a post-compact
    * as-of(n) read the compacted state for every n, never a silent
    * wrong answer. A deployment with a reproducibility window keeps it
    * open with the HORIZON compact instead (`PostingsStore
    * .compactThrough` / `AnnIndex.compactThrough`): generations ≤ h are
    * squashed into ONE resolved base generation AT clock h — tombstoned
    * keys dropped, the gen clock preserved — while every later
    * generation survives byte-identical, so `asOf(n ≥ h)` still
    * reproduces exactly and the read/storage cost of the deep history
    * is reclaimed. Below the squash point the history no longer exists:
    * the meta records `horizon = h` and an `asOf(n < h)` THROWS (the
    * snapshot-before-compacting advice, enforced) — never a silent
    * approximation by the squashed state. */
  def asOf(m: Meta, n: Long): Meta = {
    val h = horizonOf(m)
    if (n < h) throw new IllegalArgumentException(
      s"as-of generation $n predates the store's compaction horizon $h: " +
        "generations below the horizon were squashed by compactThrough " +
        "and cannot be reconstructed — snapshot the store tree before " +
        "horizon-compacting if older reads must stay reproducible")
    val g = math.min(m.gen, n + 1)
    val ug = m.upsertGens.filter(_ < g)
    m.copy(gen = g,
      appendOnly = m.appendOnly || (m.trusted && ug.isEmpty),
      upsertGens = ug, baseRows = -1L, appendRows = -1L)
  }

  /** The store's squash point: generations below it no longer exist
    * (horizon compact); 0 on never-horizon-compacted stores. This is
    * also the BASE generation for the staleness counters' split —
    * appenders pass it to [[deadCounts]]. */
  def horizonOf(m: Meta): Long =
    m.params.get("horizon").flatMap(_.toLongOption).getOrElse(0L)

  /** Meta surgery after a horizon squash at `h`: the upsert gens inside
    * the squashed prefix are resolved away, the regime re-derives
    * (a trusted history whose remaining tracked upserts are gone reads
    * PLAIN again), and squashing the ENTIRE history (h = head) restores
    * full trust — the squashed generation is single-gen-per-key by
    * construction, exactly a fresh build's shape, so even an untrusted
    * store comes back plain-readable. Counters are set by the caller
    * (recounted from the staged tree); the streaming batch clock is
    * PRESERVED — a horizon compact must not reopen replayed batches. */
  def horizonMeta(m: Meta, h: Long): Meta = {
    val ug = m.upsertGens.filter(_ > h)
    val headSquash = h == m.gen - 1
    m.copy(
      appendOnly = m.appendOnly || (m.trusted && ug.isEmpty) || headSquash,
      trusted = m.trusted || headSquash,
      upsertGens = ug,
      params = m.params + ("horizon" -> h.toString))
  }

  /** Stage a HORIZON compact: byte-copy what the squash KEEPS into the
    * staged sibling — model files, codebooks, and each data subtree's
    * tail generations (`gen > h`) — nothing recomputed, and crucially
    * nothing of the squashed prefix copied only to be thrown away (the
    * prefix is the BULK of a deep store; copying it would double the
    * compact's I/O for no reason). The meta is NOT copied: the staged
    * tree must read as INCOMPLETE until the caller's final meta write —
    * a crash mid-stage must never leave an adoptable tmp. The caller
    * then writes the resolved base generation at `gen=h` and the meta
    * LAST. Byte copy, not move: the live tree stays intact until
    * [[stagedCompact]]'s swap (object stores do this server-side; the
    * cost is tail + model I/O only, no shuffle or recompute). */
  def horizonStage(s: SparkSession, dir: String, tmp: String,
      h: Long, dataSubdirs: Seq[String]): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val fs = fsOf(s, dir)
    if (fs.exists(new Path(tmp))) fs.delete(new Path(tmp), true)
    fs.mkdirs(new Path(tmp))
    def copy(src: Path, dst: Path): Unit =
      if (!org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, true, conf))
        throw new java.io.IOException(s"horizon stage: could not copy $src to $dst")
    val keepGen = (p: Path) => {
      val n = p.getName
      n.startsWith("gen=") && n.stripPrefix("gen=").toLongOption.exists(_ > h)
    }
    for (child <- fs.listStatus(new Path(dir))) {
      val name = child.getPath.getName
      if (name == metaPath(dir).split('/').last) () // never copy the meta
      else if (dataSubdirs.contains(name)) {
        // a gen-stamped subtree: keep only the tail generations
        fs.mkdirs(new Path(s"$tmp/$name"))
        for (g <- fs.listStatus(child.getPath) if keepGen(g.getPath))
          copy(g.getPath, new Path(s"$tmp/$name/${g.getPath.getName}"))
      } else copy(child.getPath, new Path(s"$tmp/$name"))
    }
  }

  // ------------------------------------------- retired-key sidecar

  /** The RETIRED-KEY SIDECAR (`<dir>/retired`, one key column): a
    * horizon squash drops a tombstoned key's rows from the squashed
    * base — which would also destroy the only durable record that the
    * key was TAKEN DOWN. That record is load-bearing: `retiredIds`
    * feeds the in-stream full compact's source exclusion, and a source
    * directory still physically holds deleted ids' rows, so losing it
    * would let the next full compact RESURRECT every takedown the
    * squash absorbed. The squash therefore writes the dropped keys
    * (unioned with any prior sidecar) into the staged tree — atomic
    * under the swap — and `retiredIds` unions the sidecar back in
    * (minus currently-live keys, so a re-add leaves the set). A FULL
    * compact/build wipes the tree including the sidecar: that is the
    * existing full-compact contract — it consumes the retired set at
    * rebuild time (the corpus passed in is already takedown-filtered),
    * after which takedown durability belongs to the source pipeline. */
  def retiredPath(dir: String): String = s"$dir/retired"

  /** The sidecar's keys, if one exists (None on never-squashed or
    * delete-free stores — zero cost there). */
  def readRetired(s: SparkSession, dir: String, keyCol: String): Option[DataFrame] = {
    val p = new Path(retiredPath(dir))
    if (fsOf(s, dir).exists(p))
      Some(s.read.parquet(retiredPath(dir)).toDF(keyCol))
    else None
  }

  /** Persist the sidecar into a staged tree (tiny: one row per retired
    * key, coalesced to one file). */
  def writeRetired(keys: DataFrame, tmpDir: String): Unit =
    keys.distinct().coalesce(1)
      .write.mode("overwrite").parquet(retiredPath(tmpDir))

  /** Keys whose latest-generation state in `raw` is a TOMBSTONE — the
    * retired-as-of set a horizon squash must record before dropping
    * them ([[retiredPath]]). One resolution over `raw` (callers pass
    * the prefix being squashed — compact-scale). */
  def tombstonedKeys(raw: DataFrame, keyCol: String, tomb: Column): DataFrame = {
    val r = raw.select(col(keyCol), col("gen").cast("long").as("gen"),
      tomb.as("tomb"))
    r.join(r.groupBy(keyCol).agg(max("gen").as("gen")), Seq(keyCol, "gen"))
      .filter(col("tomb")).select(keyCol).distinct()
  }

  // ------------------------------------------------------ staged compact

  private def compactTmp(dir: String) = s"${dir.stripSuffix("/")}.compact.tmp"

  /** The shared staged-swap protocol behind every compact: the rebuild
    * lands in a sibling `.compact.tmp` tree (meta last), and only then
    * swaps in (delete old, rename). A crash mid-rebuild leaves the OLD
    * store fully intact and complete; the delete→rename gap is covered
    * by [[recover]]. */
  def stagedCompact(s: SparkSession, dir: String)(build: String => Unit): Unit = {
    recover(s, dir)
    val tmp = compactTmp(dir)
    build(tmp)
    val fs = fsOf(s, dir)
    fs.delete(new Path(dir), true)
    if (!fs.rename(new Path(tmp), new Path(dir)))
      throw new java.io.IOException(
        s"compact swap failed: could not rename $tmp over $dir")
  }

  /** Adopt a completed-but-unswapped compaction: if the store tree is
    * missing/partial while a COMPLETE `.compact.tmp` sits beside it
    * (crash between the swap's delete and rename), rename it in.
    * Returns whether a recovery happened. Safe to call any time —
    * no-op unless exactly that state is found. */
  def recover(s: SparkSession, dir: String): Boolean = {
    val tmp = compactTmp(dir)
    if (!isComplete(s, dir) && isComplete(s, tmp)) {
      val fs = fsOf(s, dir)
      fs.delete(new Path(dir), true)
      fs.rename(new Path(tmp), new Path(dir))
    } else false
  }

  // ------------------------------------------------------- live views

  /** The three-regime latest-gen-wins machinery for ONE-ROW-PER-KEY
    * structures (IVF assignments, PQ code rows, the point-fetch vector
    * store): plain read / BOUNDED resolution over the recorded upsert
    * generations / full resolution, per the meta. `postFilter` follows
    * the regime discipline — pushed into the plain and untouched
    * branches, applied AFTER the reduce on resolving branches (pruning
    * a superseded key's old partition out from under the reduce would
    * resurrect its stale row); a caller whose filter is on the REDUCE
    * KEY itself (it then commutes with the reduce) prefilters `rows`
    * and passes identity. The reduce orders by struct(gen, dataCols):
    * gen leads, so the trailing payload columns never decide. */
  def liveView(meta: Meta, rows: DataFrame, keyCol: String,
      dataCols: Seq[String], postFilter: DataFrame => DataFrame,
      resolveAll: Boolean): DataFrame = {
    def resolve(r: DataFrame): DataFrame = r
      .groupBy(keyCol)
      .agg(max(struct(col("gen") +: dataCols.map(col): _*)).as("m"))
      .select(col(keyCol) +: dataCols.map(c => col(s"m.$c").as(c)) :+
        col("m.gen").as("gen"): _*)
    if (resolveAll) postFilter(resolve(rows))
    else if (meta.appendOnly) postFilter(rows)
    else if (meta.trusted && meta.upsertGens.nonEmpty) {
      val ug = meta.upsertGens
      // the upsert gens' directories are delta-scale: partition-pruned
      // scans, a broadcast-small id set, a reduce bounded by them
      val upRows = rows.filter(col("gen").isin(ug: _*))
      val upIds = upRows.select(keyCol).distinct()
      val untouched = postFilter(rows.filter(!col("gen").isin(ug: _*)))
        .join(broadcast(upIds), Seq(keyCol), "left_anti")
      untouched.unionByName(postFilter(resolve(upRows)))
    } else postFilter(resolve(rows))
  }

  /** [[liveView]]'s MULTI-ROW-PER-KEY twin (banded signatures: `bands`
    * rows per vector; text postings: one row per (term, doc)): the
    * latest generation PER KEY wins and every row of that generation
    * survives — resolution is a join against the per-key max-gen
    * instead of a one-row struct reduce. Same three regimes, same
    * postFilter discipline. Output keeps all of `rows`' columns
    * (including gen); callers project. */
  def keyedLiveView(meta: Meta, rows: DataFrame, keyCol: String,
      postFilter: DataFrame => DataFrame, resolveAll: Boolean): DataFrame = {
    def resolve(r: DataFrame): DataFrame =
      r.join(r.groupBy(keyCol).agg(max("gen").as("gen")), Seq(keyCol, "gen"))
    if (resolveAll) postFilter(resolve(rows))
    else if (meta.appendOnly) postFilter(rows)
    else if (meta.trusted && meta.upsertGens.nonEmpty) {
      val ug = meta.upsertGens
      val upRows = rows.filter(col("gen").isin(ug: _*))
      val upIds = upRows.select(keyCol).distinct()
      val untouched = postFilter(rows.filter(!col("gen").isin(ug: _*)))
        .join(broadcast(upIds), Seq(keyCol), "left_anti")
      untouched.unionByName(postFilter(resolve(upRows)))
    } else postFilter(resolve(rows))
  }

  // ------------------------------------------------ artifact discipline

  /** Build-or-reuse a persisted store as a FINGERPRINTED ingest
    * artifact: rebuild iff the marker at `markerPath` doesn't carry
    * `fingerprint` (source fingerprint + params + epoch — the caller
    * composes it) or the tree at `treeDir` is incomplete. Wipe-then-
    * build-then-mark, the one crash discipline (`AnnArtifacts`' — the
    * stale tree AND its marker go before the rebuild, the marker lands
    * LAST and atomically). This is the freshness rule every persisted
    * artifact must carry: a bare `fs.exists` probe would silently serve
    * stale results after an in-place source rewrite (the r17 verdict's
    * text-postings hazard). Returns whether a rebuild ran. */
  def ensureArtifact(s: SparkSession, markerPath: Path, fingerprint: String,
      treeDir: String)(build: => Unit): Boolean = {
    val conf = s.sparkContext.hadoopConfiguration
    val fresh = MetaIO.read(conf, markerPath).contains(fingerprint) &&
      isComplete(s, treeDir)
    if (fresh) false
    else {
      val fs = markerPath.getFileSystem(conf)
      if (fs.exists(markerPath)) fs.delete(markerPath, false)
      val d = new Path(treeDir)
      if (fs.exists(d)) fs.delete(d, true)
      build
      MetaIO.write(conf, markerPath, fingerprint)
      true
    }
  }
}
