package graft

import graft.build.GenStore
import graft.similarity.AnnIndex
import graft.text.PostingsStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r19 HORIZON compact (`compactThrough`): squash generations ≤ h
  * into one resolved base generation at clock h, keep every later
  * generation byte-identical — the retention-window compact. Pins:
  * the live view and every `asOf(n ≥ h)` read are unchanged by the
  * squash (fuzz histories included), `asOf(n < h)` throws instead of
  * silently serving the squashed state, the prefix's generation
  * directories are physically gone, tombstoned keys stay deleted
  * (prefix AND tail deletes), staleness counters stay exact for
  * appends AFTER the squash (the deadCounts base-generation split),
  * and a head squash restores an untrusted store to plain reads with
  * the clock preserved. */
class HorizonCompactSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("HorizonCompactSpec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val work =
    java.nio.file.Files.createTempDirectory("horizon").toString

  private def emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")

  private def docsDF(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def liveSet(dir: String): Set[(String, String, Long, Long, Seq[Int])] =
    PostingsStore.live(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getSeq[Int](4))).toSet

  private def asOfSet(dir: String, n: Long): Set[(String, String, Long, Long, Seq[Int])] =
    PostingsStore.live(spark, dir, asOfGen = Some(n)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getSeq[Int](4))).toSet

  private def genDirs(dir: String, sub: String): Set[Long] = {
    val d = new java.io.File(s"$dir/$sub")
    if (!d.exists()) Set.empty
    else d.listFiles().filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("gen=")).map(_.stripPrefix("gen=").toLong).toSet
  }

  test("text horizon compact: live and every asOf(n ≥ h) unchanged; below-horizon throws; prefix dirs gone") {
    import spark.implicits._
    val d = s"$work/t1"
    // gen 0 build / gen 1 declared / gen 2 undeclared upsert /
    // gen 3 delete / gen 4 declared — a full mixed history
    val snaps = scala.collection.mutable.ArrayBuffer.empty[Set[(String, String, Long, Long, Seq[Int])]]
    PostingsStore.build(docsDF(Seq(1L -> "alpha beta", 2L -> "gamma")), d)
    snaps += liveSet(d)
    PostingsStore.append(docsDF(Seq(3L -> "delta")), d, newIds = true)
    snaps += liveSet(d)
    PostingsStore.append(docsDF(Seq(1L -> "alpha omega")), d)
    snaps += liveSet(d)
    PostingsStore.delete(Seq(2L).toDF("doc_id"), d)
    snaps += liveSet(d)
    PostingsStore.append(docsDF(Seq(4L -> "epsilon")), d, newIds = true)
    snaps += liveSet(d)
    val normsBefore = PostingsStore.normsLive(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    PostingsStore.compactThrough(spark, d, 2L)

    assert(liveSet(d) == snaps.last, "live view changed by the horizon squash")
    assert(PostingsStore.normsLive(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == normsBefore,
      "norms changed by the horizon squash")
    (2 to 4).foreach { n =>
      assert(asOfSet(d, n.toLong) == snaps(n),
        s"asOf($n) diverged after the squash at 2")
    }
    (0 to 1).foreach { n =>
      val e = intercept[IllegalArgumentException](asOfSet(d, n.toLong))
      assert(e.getMessage.contains("horizon"),
        s"asOf($n) below the horizon must throw, got: ${e.getMessage}")
    }
    assert(genDirs(d, "data") == Set(2L, 3L, 4L),
      "squashed prefix directories must be physically gone")
    assert(genDirs(d, "norms") == Set(2L, 3L, 4L))
    // gen 3's takedown sits in the TAIL of this squash: its sentinel
    // generation must survive byte-identical and keep doc 2 out
    assert(!liveSet(d).exists(_._3 == 2L), "tail takedown leaked back")
  }

  test("text: prefix-takedown squash retires the doc for good and relicenses the flat fast path") {
    import spark.implicits._
    val d = s"$work/t2"
    PostingsStore.build(docsDF(Seq(1L -> "alpha beta", 2L -> "gamma")), d)
    PostingsStore.append(docsDF(Seq(1L -> "alpha omega")), d) // upsert
    PostingsStore.delete(Seq(2L).toDF("doc_id"), d)           // takedown
    val before = liveSet(d)
    // head squash: the whole history collapses to one generation at
    // clock 2 — the deleted doc and every sentinel are gone for good
    PostingsStore.compactThrough(spark, d, 2L)
    assert(liveSet(d) == before)
    assert(!before.exists(_._3 == 2L))
    val m = GenStore.readMeta(spark, d).get
    assert(m.appendOnly && m.trusted, "head squash must restore plain reads")
    assert(m.params.get("sent").contains("0"),
      "no sentinel survives a head squash — the flat fast path relicenses")
    assert(GenStore.horizonOf(m) == 2L && m.gen == 3L,
      "the generation clock must be preserved, not reset")
    // the relicensed flat path is a plain no-shuffle read
    assert(!PostingsStore.live(spark, d).queryExecution.executedPlan
      .toString.contains("Exchange"),
      "post-head-squash store must serve the flat plan")
    assert(PostingsStore.staleness(spark, d) == 0.0)
  }

  test("text: staleness stays exact for appends AFTER the squash (deadCounts splits at the horizon base)") {
    val d = s"$work/t3"
    PostingsStore.build(docsDF(Seq(
      1L -> "alpha beta", 2L -> "gamma delta", 3L -> "epsilon")), d)
    PostingsStore.append(docsDF(Seq(4L -> "zeta eta")), d, newIds = true)
    PostingsStore.compactThrough(spark, d, 1L) // base is now gen 1, not 0
    // undeclared re-ingest superseding doc 1 (2 old rows out, 1 new in)
    PostingsStore.append(docsDF(Seq(1L -> "theta")), d)
    val live = liveSet(d)
    val appendRows = live.count(_._2 == "theta").toDouble
    assert(PostingsStore.staleness(spark, d) == appendRows / live.size,
      "post-horizon staleness must stay the exact live append fraction " +
        "(superseded squashed-base rows leave baseRows, not appendRows)")
  }

  test("ivf horizon compact: assignments, as-of clock, del-marker drop, post-squash append exactness") {
    val d = s"$work/ivf1"
    def assignSet(asOfGen: Option[Long] = None): Set[(Long, Long)] =
      AnnIndex.ivfAssignments(spark, d, asOfGen = asOfGen)
        .select("vec_id", "cell").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = emb.filter(col("vec_id") % 7 =!= 6)
    val delta = emb.filter(col("vec_id") % 7 === 6)
    AnnIndex.buildIvf(base, d, nlist = 8)
    AnnIndex.appendIvf(delta, d, newIds = true)        // gen 1
    AnnIndex.appendIvf(delta.limit(3), d)              // gen 2 upsert
    AnnIndex.delete(delta.limit(2).select("vec_id"), d) // gen 3 takedown
    val snap2 = assignSet(asOfGen = Some(2L))
    val snap3 = assignSet()
    AnnIndex.compactThrough(spark, d, 3L) // head squash incl. the takedown
    assert(assignSet() == snap3, "live assignments changed by the squash")
    assert(assignSet(asOfGen = Some(3L)) == snap3)
    intercept[IllegalArgumentException](assignSet(asOfGen = Some(2L)): Unit)
    assert(snap2 != snap3) // the discarded prefix state really differed
    val m = GenStore.readMeta(spark, d).get
    assert(m.appendOnly && m.trusted)
    assert(!m.params.contains("del"),
      "no tombstone survives a head squash — the del filter drops")
    assert(genDirs(d, "assignments") == Set(3L))
    // append after the squash: counters split at the horizon base
    AnnIndex.appendIvf(delta.limit(2), d) // undeclared re-add of takedowns
    val n = assignSet().size.toDouble
    assert(AnnIndex.staleness(spark, d) == 2.0 / n,
      "post-horizon ivf staleness must be the exact live append fraction")
  }

  test("ivf interior squash keeps tail takedowns deleted and the del marker") {
    val d = s"$work/ivf2"
    val base = emb.filter(col("vec_id") % 7 =!= 6)
    val delta = emb.filter(col("vec_id") % 7 === 6)
    AnnIndex.buildIvf(base, d, nlist = 8)
    AnnIndex.appendIvf(delta, d, newIds = true)          // gen 1
    AnnIndex.delete(delta.limit(2).select("vec_id"), d)  // gen 2 (tail)
    val before = AnnIndex.ivfAssignments(spark, d)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    AnnIndex.compactThrough(spark, d, 1L) // squash below the takedown
    val after = AnnIndex.ivfAssignments(spark, d)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before, "interior squash changed the live view")
    val m = GenStore.readMeta(spark, d).get
    assert(m.params.contains("del"),
      "a tombstone generation in the tail must keep the del filter on")
    assert(genDirs(d, "assignments") == Set(1L, 2L))
  }

  test("banded and vecs horizon compacts: live rows and pruned point reads unchanged") {
    val base = emb.filter(col("vec_id") % 7 =!= 6)
    val delta = emb.filter(col("vec_id") % 7 === 6)
    // banded (multi-row structure)
    val b = s"$work/lsh1"
    AnnIndex.buildBanded(base, b, nPlanes = 8, bands = 4)
    AnnIndex.appendBanded(delta, b, nPlanes = 8, bands = 4, newIds = true)
    AnnIndex.appendBanded(delta.limit(3), b, nPlanes = 8, bands = 4) // upsert
    def bandedSet(dir: String) = AnnIndex.bandedRowsLive(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val bBefore = bandedSet(b)
    AnnIndex.compactThrough(spark, b, 2L)
    assert(bandedSet(b) == bBefore, "banded squash changed the live rows")
    assert(GenStore.readMeta(spark, b).get.appendOnly)
    // point-fetch vector store, interior squash
    val v = s"$work/vecs1"
    AnnIndex.buildVecs(base, v)
    AnnIndex.appendVecs(delta, v, newIds = true) // gen 1
    AnnIndex.appendVecs(delta.limit(2), v)       // gen 2 upsert
    def vecsMap(ids: Option[Seq[Long]] = None) =
      AnnIndex.vecsLive(spark, v, ids).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val vBefore = vecsMap()
    val probeId = delta.limit(1).collect().head.getLong(0)
    AnnIndex.compactThrough(spark, v, 1L)
    assert(vecsMap() == vBefore, "vecs squash changed the live rows")
    assert(vecsMap(Some(Seq(probeId))) ==
      vBefore.filter(_._1 == probeId), "pruned point read diverged")
  }

  test("text horizon FUZZ: random mixed history, random squash point — every surviving prefix reproduces") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    (0 until 3).foreach { trial =>
      val d = s"$work/fuzz$trial"
      def docsOf(ids: Seq[Long], salt: String): DataFrame =
        docsDF(ids.map(i => i -> s"w$i $salt common"))
      PostingsStore.build(docsOf(1L to 4L, "base"), d)
      var seen = (1L to 4L).toVector
      var nextId = 5L
      val snaps = scala.collection.mutable.ArrayBuffer(liveSet(d))
      (1 to 5).foreach { step =>
        rnd.nextInt(3) match {
          case 0 =>
            PostingsStore.append(docsOf(Seq(nextId), s"s$step"), d, newIds = true)
            seen :+= nextId; nextId += 1
          case 1 =>
            PostingsStore.append(
              docsOf(Seq(seen(rnd.nextInt(seen.size))), s"re$step"), d)
          case _ =>
            PostingsStore.delete(Seq(seen(rnd.nextInt(seen.size))).toDF("doc_id"), d)
        }
        snaps += liveSet(d)
      }
      val h = 1 + rnd.nextInt(4) // squash point in [1, 4]
      PostingsStore.compactThrough(spark, d, h.toLong)
      assert(liveSet(d) == snaps.last, s"trial $trial: live changed (h=$h)")
      (h to 5).foreach { n =>
        assert(asOfSet(d, n.toLong) == snaps(n),
          s"trial $trial: asOf($n) diverged after squash at $h")
      }
      intercept[IllegalArgumentException](asOfSet(d, (h - 1).toLong): Unit)
    }
  }

  test("del filter survives a squash below a delete/re-add window — as-of reads inside it stay clean") {
    val d = s"$work/ivf3"
    val base = emb.filter(col("vec_id") % 7 =!= 6)
    val delta = emb.filter(col("vec_id") % 7 === 6)
    AnnIndex.buildIvf(base, d, nlist = 8)
    AnnIndex.appendIvf(delta, d, newIds = true)          // gen 1
    AnnIndex.delete(delta.limit(3).select("vec_id"), d)  // gen 2 takedown
    AnnIndex.appendIvf(delta.limit(3), d)                // gen 3 re-add
    def assigns(asOf: Option[Long]) =
      AnnIndex.ivfAssignments(spark, d, asOfGen = asOf)
        .select("vec_id", "cell").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val asOf2 = assigns(Some(2L))
    val liveBefore = assigns(None)
    AnnIndex.compactThrough(spark, d, 1L) // squash BELOW the window
    // the gen-2 tombstones are live-invisible (superseded by the gen-3
    // re-add) but physically present in the copied tail — the del
    // filter must stay on, or asOf(2) would serve cell = -1 phantoms
    assert(GenStore.readMeta(spark, d).get.params.contains("del"),
      "del must survive while any tombstone row physically remains")
    assert(assigns(Some(2L)) == asOf2, "asOf inside the delete window diverged")
    assert(!assigns(Some(2L)).exists(_._2 < 0L), "tombstone rows leaked into the as-of read")
    assert(assigns(None) == liveBefore)
  }

  test("a squash past a takedown records it: retiredIds survives, so full compacts cannot resurrect") {
    import spark.implicits._
    // text: the sentinel is the takedown's only durable record — the
    // head squash absorbs it into the retired sidecar
    val t = s"$work/t4"
    PostingsStore.build(docsDF(Seq(
      1L -> "alpha beta", 2L -> "gamma", 3L -> "delta")), t)
    PostingsStore.delete(Seq(2L, 3L).toDF("doc_id"), t)
    PostingsStore.compactThrough(spark, t, 1L) // head squash
    assert(PostingsStore.retiredIds(spark, t).as[Long].collect().toSet ==
      Set(2L, 3L),
      "the takedown record must survive the squash that dropped its sentinels")
    // a re-ingested doc leaves the retired set (it is live again)
    PostingsStore.append(docsDF(Seq(3L -> "delta back")), t)
    assert(PostingsStore.retiredIds(spark, t).as[Long].collect().toSet ==
      Set(2L))
    // vector twin: head squash drops del (no physical tombstone) but
    // the sidecar keeps feeding retiredIds
    val v = s"$work/ivf4"
    AnnIndex.buildIvf(emb, v, nlist = 8)
    val delIds = emb.filter(col("vec_id") % 7 === 6)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    AnnIndex.delete(emb.filter(col("vec_id") % 7 === 6).select("vec_id"), v)
    AnnIndex.compactThrough(spark, v, 1L)
    val m = GenStore.readMeta(spark, v).get
    assert(!m.params.contains("del"))
    assert(AnnIndex.retiredIds(spark, v).as[Long].collect().toSet == delIds,
      "retiredIds must keep protecting full compacts after the squash")
    // and a second squash carries the sidecar forward
    AnnIndex.appendIvf(emb.filter(col("vec_id") % 11 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L), v, newIds = true)
    AnnIndex.compactThrough(spark, v, 2L)
    assert(AnnIndex.retiredIds(spark, v).as[Long].collect().toSet == delIds,
      "the sidecar must survive subsequent squashes")
  }

  test("streaming retainGens (text): a triggered compaction becomes a horizon squash keeping the window") {
    val docsDir = s"$work/sq_docs"
    val store = s"$work/sq_store"
    val ckpt = s"$work/sq_ckpt"
    val IM = graft.streaming.IndexMaintenance
    docsDF(Seq(1L -> "alpha beta", 2L -> "gamma")).write.parquet(docsDir)
    IM.runTextAvailableNow(spark, docsDir, store, ckpt, assumeNewIds = true)
      .awaitTermination()
    docsDF(Seq(3L -> "delta")).write.mode("append").parquet(docsDir)
    IM.runTextAvailableNow(spark, docsDir, store, ckpt, assumeNewIds = true)
      .awaitTermination()
    docsDF(Seq(4L -> "epsilon zeta")).write.mode("append").parquet(docsDir)
    // the third batch's append pushes staleness past the tiny budget —
    // with retainGens the triggered compaction is a SQUASH through
    // head - 1, not a source rebuild
    IM.runTextAvailableNow(spark, docsDir, store, ckpt, assumeNewIds = true,
      compactAt = 1e-6, retainGens = 1).awaitTermination()
    val m = GenStore.readMeta(spark, store).get
    assert(GenStore.horizonOf(m) == 1L, "squash point must be head - retainGens")
    assert(m.gen == 3L, "the generation clock must be preserved")
    assert(genDirs(store, "data") == Set(1L, 2L))
    // live ≡ the batch twin over the same history
    val twin = s"$work/sq_twin"
    PostingsStore.build(docsDF(Seq(1L -> "alpha beta", 2L -> "gamma")), twin)
    PostingsStore.append(docsDF(Seq(3L -> "delta")), twin, newIds = true)
    PostingsStore.append(docsDF(Seq(4L -> "epsilon zeta")), twin, newIds = true)
    assert(liveSet(store) == liveSet(twin), "squashing stream diverged from batch")
    // the retained window still reads as-of; below it throws
    assert(asOfSet(store, 2L) == liveSet(twin))
    assert(asOfSet(store, 1L) ==
      PostingsStore.live(spark, twin, asOfGen = Some(1L)).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getSeq[Int](4))).toSet)
    intercept[IllegalArgumentException](asOfSet(store, 0L): Unit)
    // staleness floors at the window's fraction, not zero (documented)
    assert(PostingsStore.staleness(spark, store) > 0.0)
    // a drained re-run is still a no-op (replay bookkeeping survived)
    IM.runTextAvailableNow(spark, docsDir, store, ckpt, assumeNewIds = true,
      compactAt = 1e-6, retainGens = 1).awaitTermination()
    assert(liveSet(store) == liveSet(twin))
  }

  test("streaming retainGens (ivf): squash keeps the model and the window; shallow histories skip") {
    import graft.streaming.IndexMaintenance
    val base = emb.filter(col("vec_id") % 7 =!= 6)
    val delta = emb.filter(col("vec_id") % 7 === 6)
    val vecDir = s"$work/sqv_vecs"
    val idx = s"$work/sqv_idx"
    val ckpt = s"$work/sqv_ckpt"
    base.coalesce(1).write.parquet(vecDir)
    IndexMaintenance.runIvfAvailableNow(spark, vecDir, idx, ckpt,
      assumeNewIds = true, compactAt = 0.01, retainGens = 2)
      .awaitTermination()
    // shallow history: the build alone can't satisfy a 2-gen window —
    // the squash must have SKIPPED, never thrown
    assert(GenStore.horizonOf(GenStore.readMeta(spark, idx).get) == 0L)
    delta.coalesce(1).write.mode("append").parquet(vecDir)
    IndexMaintenance.runIvfAvailableNow(spark, vecDir, idx, ckpt,
      assumeNewIds = true, compactAt = 0.01, retainGens = 1)
      .awaitTermination()
    // gens {0, 1}, head 1: h = 0 — still no squash (nothing below it)
    assert(GenStore.horizonOf(GenStore.readMeta(spark, idx).get) == 0L)
    delta.limit(5).coalesce(1).write.mode("append").parquet(vecDir)
    IndexMaintenance.runIvfAvailableNow(spark, vecDir, idx, ckpt,
      assumeNewIds = false, compactAt = 0.0001, retainGens = 1)
      .awaitTermination()
    // gens {0, 1, 2}, head 2: squash through 1
    val m = GenStore.readMeta(spark, idx).get
    assert(GenStore.horizonOf(m) == 1L && m.gen == 3L)
    // live ≡ the batch twin under the SAME centroid model (the squash
    // never retrains): replay the history batch-side on a copy... the
    // model is seed-fixed per build, so compare against the stream's
    // own pre-squash audit instead: resolveAll over what remains
    val viaLive = AnnIndex.ivfAssignments(spark, idx)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaAudit = AnnIndex.ivfAssignments(spark, idx, resolveAll = true)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaLive == viaAudit)
    assert(viaLive.map(_._1) ==
      emb.select("vec_id").collect().map(_.getLong(0)).toSet,
      "every ingested id must be live exactly once after the squash")
  }

  test("horizon guards: out-of-range points throw; structure dispatch refuses the wrong store kind") {
    import spark.implicits._
    val d = s"$work/g1"
    PostingsStore.build(docsDF(Seq(1L -> "alpha")), d)
    intercept[IllegalArgumentException](
      PostingsStore.compactThrough(spark, d, 1L)) // == gen: not committed
    intercept[IllegalArgumentException](
      AnnIndex.compactThrough(spark, d, 0L)) // text store via the ann verb
    PostingsStore.append(docsDF(Seq(2L -> "beta")), d, newIds = true)
    PostingsStore.compactThrough(spark, d, 1L)
    intercept[IllegalArgumentException](
      PostingsStore.compactThrough(spark, d, 0L)) // below the horizon
    // and a second, higher squash on the same store still works
    PostingsStore.append(docsDF(Seq(3L -> "gamma")), d, newIds = true)
    PostingsStore.compactThrough(spark, d, 2L)
    assert(liveSet(d).map(_._3) == Set(1L, 2L, 3L))
    assert(GenStore.horizonOf(GenStore.readMeta(spark, d).get) == 2L)
  }
}
