package graft

import graft.intervals.{Block, IntervalOps}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the interval algebra — the trickiest code in the
  * reference, whose edge cases live in prose at
  * `BlockIndexedFileInputFormat.java:448-498, 577-599` and
  * `MapFileIndexingReducer.java:55-69`.
  *
  * (Uses raw ScalaCheck Gens with a deterministic sampler; the
  * scalatestplus bridge is not available offline.)
  */
class IntervalsSpec extends AnyFunSuite {

  /** Deterministically sample `n` values from a Gen and run the check. */
  private def forSamples[A](gen: Gen[A], n: Int = 300)(check: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default.withSize(50), seed).foreach(check)
      seed = seed.next
      i += 1
    }
  }

  private val genBlock: Gen[Block] = for {
    s <- Gen.chooseNum(0L, 10000L)
    len <- Gen.chooseNum(1L, 500L)
  } yield Block(s, s + len)

  private val genBlocks: Gen[List[Block]] = Gen.listOf(genBlock)

  private val genValidList: Gen[Seq[Block]] =
    genBlocks.map(bs => IntervalOps.normalize(bs))

  private val genPoint: Gen[Long] = Gen.chooseNum(0L, 11000L)

  private def covers(bs: Seq[Block], p: Long): Boolean =
    bs.exists(b => b.start <= p && p < b.end)

  test("normalize produces a valid posting list") {
    forSamples(genBlocks) { bs =>
      assert(IntervalOps.isValid(IntervalOps.normalize(bs)))
    }
  }

  test("normalize covers exactly the union of inputs (point membership)") {
    forSamples(Gen.zip(genBlocks, genPoint)) { case (bs, p) =>
      assert(covers(bs, p) == covers(IntervalOps.normalize(bs), p))
    }
  }

  test("intersect = AND point semantics and stays valid") {
    forSamples(Gen.zip(genValidList, genValidList, genPoint)) { case (a, b, p) =>
      val got = IntervalOps.intersect(a, b)
      assert(covers(got, p) == (covers(a, p) && covers(b, p)))
      assert(IntervalOps.isValid(got))
    }
  }

  test("unionCapped = OR point semantics; cap respected when inputs respect it") {
    forSamples(Gen.zip(genValidList, genValidList, Gen.chooseNum(100L, 2000L), genPoint)) {
      case (a, b, cap, p) =>
        val maxIn = (a ++ b).map(_.length).foldLeft(0L)(_ max _)
        val u = IntervalOps.unionCapped(a, b, cap)
        assert(covers(u, p) == (covers(a, p) || covers(b, p)))
        assert(u.sliding(2).forall { case Seq(x, y) => x.end <= y.start; case _ => true })
        if (maxIn <= cap) assert(u.forall(_.length <= cap))
    }
  }

  test("coalesceCapped: cap respected, sorted non-overlapping, point semantics preserved") {
    forSamples(Gen.zip(genBlocks, Gen.chooseNum(100L, 2000L), genPoint)) { case (bs, cap, p) =>
      val c = IntervalOps.coalesceCapped(bs, cap)
      assert(c.forall(_.length <= cap))
      assert(c.sliding(2).forall { case Seq(x, y) => x.end <= y.start; case _ => true })
      assert(covers(bs, p) == covers(c, p))
    }
  }

  test("intersect with self is identity on valid lists") {
    forSamples(genValidList) { a =>
      assert(IntervalOps.intersect(a, a) == a)
    }
  }

  test("binPack keeps order, loses nothing, respects maxSplit for multi-block groups") {
    forSamples(Gen.zip(genValidList, Gen.chooseNum(100L, 3000L))) { case (a, maxSplit) =>
      val packed = IntervalOps.binPack(a, maxSplit)
      assert(packed.flatten == a)
      packed.foreach { g =>
        if (g.length > 1) assert(g.map(_.length).sum <= maxSplit)
      }
    }
  }

  test("reference worked example: AND intersection") {
    // [0,100) [200,300) AND [50,250) -> [50,100) [200,250)
    val got = IntervalOps.intersect(
      Seq(Block(0, 100), Block(200, 300)),
      Seq(Block(50, 250)))
    assert(got == Seq(Block(50, 100), Block(200, 250)))
  }

  test("reference worked example: OR midpoint split over cap") {
    // [0,60) OR [40,100) with cap 80 -> union [0,100) len 100 > 80 ->
    // split at midpoint 50: [0,50) [50,100)
    val got = IntervalOps.unionCapped(Seq(Block(0, 60)), Seq(Block(40, 100)), 80)
    assert(got == Seq(Block(0, 50), Block(50, 100)))
  }

  test("empty inputs") {
    assert(IntervalOps.intersect(Nil, Seq(Block(0, 1))) == Nil)
    assert(IntervalOps.unionCapped(Nil, Nil, 10) == Nil)
    assert(IntervalOps.normalize(Nil) == Nil)
    assert(IntervalOps.coalesceCapped(Nil, 10) == Nil)
    assert(IntervalOps.binPack(Nil, 10) == Nil)
  }
}
