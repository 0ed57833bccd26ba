package graft

/** Host-contention detector for the measurement mains (Bench, Verify).
  *
  * This box is a VM; transient co-tenant CPU-steal waves inflate
  * wall-clock 10-80x for seconds-to-minutes at a time (measured across
  * rounds: a 0.25 s query recorded at 19 s, a 0.75 s query pushed past
  * a 60 s watchdog). Numbers taken during a wave are pure noise, so the
  * mains PAUSE measurement until the box looks calm rather than record
  * them: a fixed single-threaded CPU loop is timed against its own
  * calibrated floor — steal shows up as the same work taking multiples
  * of the floor. Purely wall-clock-vs-work based; reads no /proc, works
  * in any sandbox.
  *
  * The wait budget is GLOBAL and bounded: a wave outlasting the budget
  * stops gating (measurement proceeds, the per-query watchdogs and
  * min-of-N re-measures remain the last line of defense) — the gate
  * must never turn a slow host into a hung round (the round-5/6
  * lesson).
  */
object Contention {

  /** Sink for the probe loop's result so the JIT cannot elide it. */
  @volatile var blackhole: Long = 0L

  @volatile private var floorNs: Long = Long.MaxValue
  private val waitedMs = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Total pause budget across the whole JVM (all waitCalm calls). */
  private val GlobalBudgetMs = 240000L

  /** One probe: ~10-20 ms of pure single-threaded CPU work (JIT-warm). */
  private def probeNs(): Long = {
    val t0 = System.nanoTime()
    var s = 0L
    var i = 0
    while (i < 20000000) { s += i * 31 + (s >> 7); i += 1 }
    blackhole = s
    System.nanoTime() - t0
  }

  /** Establish the floor as the min of several probes. Call once the JVM
    * is warm (after the first query); min-of-N absorbs the probe's own
    * JIT ramp. Re-callable — the floor only ever ratchets down. */
  def calibrate(): Unit = {
    var k = 0
    while (k < 5) { floorNs = math.min(floorNs, probeNs()); k += 1 }
  }

  /** One probe says the box is currently contended: the fixed loop took
    * 3x its floor (+2 ms absolute so a sub-ms floor can't false-flag).
    * Every probe also RATCHETS the floor down: if a steal wave overlaps
    * [[calibrate]], the floor starts inflated and the gate would
    * otherwise silently report calm for the whole run — any later calm
    * probe repairs the poisoned calibration. */
  def contended(): Boolean = {
    if (floorNs == Long.MaxValue) calibrate()
    val t = probeNs()
    floorNs = math.min(floorNs, t)
    t > floorNs * 3 + 2000000L
  }

  /** Block (1 s polls) until two consecutive probes look calm, up to
    * `maxWaitMs` for this call and [[GlobalBudgetMs]] overall. Returns
    * the ms actually waited. Two probes, not one: waves ramp, and a
    * single calm probe on the downslope of one wave regularly sits in
    * the front of the next. */
  def waitCalm(maxWaitMs: Long = 90000L): Long = {
    val start = System.nanoTime()
    var calmStreak = if (contended()) 0 else 2
    while (calmStreak < 2 &&
        (System.nanoTime() - start) / 1000000L < maxWaitMs &&
        waitedMs.get() < GlobalBudgetMs) {
      Thread.sleep(1000)
      waitedMs.addAndGet(1000)
      calmStreak = if (contended()) 0 else calmStreak + 1
    }
    val waited = (System.nanoTime() - start) / 1000000L
    if (waited > 2000)
      System.err.println(s"[contention] waited ${waited / 1000} s for the host to go calm" +
        (if (calmStreak < 2) " (budget exhausted, proceeding anyway)" else ""))
    waited
  }
}
