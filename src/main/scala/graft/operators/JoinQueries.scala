package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-family extensions beyond the reference surface (which has no
  * relational joins, SURVEY.md §2.3): the as-of join, verified against
  * DuckDB's native ASOF JOIN.
  */
object JoinQueries extends QueryModule {

  /** As-of join: each error event picks up the most recent click by the
    * same user at or before it (inner as-of). The right side is
    * pre-aggregated to one row per (user, ts) so both engines are
    * deterministic. */
  private def q43AsOfJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
    val errors = e.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    AsOfJoin.join(errors, clicks, Seq("user_id"), "ts", "ts",
        Seq("click_id"), inner = true)
      .select("event_id", "user_id", "click_id")
  }

  private val q43Sql =
    """WITH clicks AS (
      |  SELECT user_id, ts, MAX(event_id) AS click_id FROM events
      |  WHERE event_type = 'click' GROUP BY user_id, ts),
      |errors AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')
      |SELECT e.event_id, e.user_id, c.click_id
      |FROM errors e ASOF JOIN clicks c
      |  ON e.user_id = c.user_id AND e.ts >= c.ts""".stripMargin

  /** Range join (point-in-interval): per order, how many high-quantity
    * lineitems (corpus-wide, not the order's own) shipped inside the
    * order's 7-day fulfillment window [o_orderdate, o_orderdate + 7d].
    * Exercises [[RangeJoin.pointInInterval]]'s bin decomposition — the
    * scale-safe alternative to the BroadcastNestedLoopJoin Spark would
    * pick for a bare BETWEEN predicate. Bin width = the interval length
    * (7 days), so each interval lands in at most 2 bins.
    *
    * Points are PRE-AGGREGATED to (day, count) before the join: the
    * point side only matters at day granularity here, so collapsing it
    * first (~24K filtered lineitems → ~2.4K distinct ship days at
    * sf0.1) shrinks the bin-join's output by the per-day multiplicity
    * — count(*) then becomes sum(n_pts). The generic aggregate-below-
    * join rewrite, applied by hand because Catalyst only pushes
    * aggregates through joins when the optimizer rule set says the
    * join preserves keys (not provable for a range join). */
  private def q64RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val day = 86400L
    val points = Tables.lineitem(s, dir)
      .filter(col("l_quantity") >= 49)
      .groupBy("l_shipdate").agg(count(lit(1)).as("n_pts"))
    val intervals = Tables.orders(s, dir).select("o_orderkey", "o_orderdate")
    RangeJoin.pointInInterval(
        points, unix_timestamp(col("l_shipdate")),
        intervals, unix_timestamp(col("o_orderdate")),
        unix_timestamp(col("o_orderdate")) + 7L * day,
        binWidth = 7L * day)
      .groupBy("o_orderkey").agg(sum(col("n_pts")).as("n_shipped"))
  }

  private val q64Sql =
    """SELECT o.o_orderkey, COUNT(*) AS n_shipped
      |FROM orders o JOIN lineitem l
      |  ON l.l_shipdate >= o.o_orderdate
      | AND l.l_shipdate <= o.o_orderdate + INTERVAL 7 DAY
      |WHERE l.l_quantity >= 49
      |GROUP BY o.o_orderkey""".stripMargin

  /** REFERENTIAL-INTEGRITY AUDIT — orphan counts for the star schema's
    * FK chains (lineitem→orders, orders→customer, customer→nation): the
    * cross-table data-quality check run after every ingest/replication,
    * completing the audit family (q110 content checksum, q112 column
    * profile). Orphans come from a LEFT ANTI join against the parent's
    * DISTINCT keys — a duplicate parent key can never inflate counts the
    * way a raw LEFT JOIN would, and a NULL child key counts as an
    * orphan in both engines (anti-join null-never-matches ≡ NOT EXISTS).
    *
    * Scale shape: each check is one keyed anti-join; small parents
    * (nation, customer here) broadcast, the fact-to-fact check
    * (lineitem→orders) shuffles both sides on the key — exactly the
    * join Spark would need anyway, with AQE free to pick the strategy
    * at real scale. Totals are separate 1-row aggregates, so the output
    * is 3 rows regardless of corpus size. */
  private def q113RefIntegrity(s: SparkSession, dir: String): DataFrame = {
    // ONE pass over each child: a LEFT join against the distinct parent
    // keys (flag column marks a match) yields n_rows and n_orphans from
    // the same scan — a separate totals aggregate would read the fact
    // table twice. NULL child keys never match, so they classify as
    // orphans, ≡ NOT EXISTS; distinct parent keys mean a duplicate
    // parent key can never inflate the row count.
    def rel(name: String, child: DataFrame, ckey: String,
        parent: DataFrame, pkey: String, hint: Boolean): DataFrame = {
      val keys = parent.select(col(pkey).as("k")).distinct()
        .withColumn("hit", lit(true))
      child.select(col(ckey).as("k"))
        .join(if (hint) broadcast(keys) else keys, Seq("k"), "left")
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("hit").isNull, 1)).as("n_orphans"))
        .select(lit(name).as("fk"), col("n_rows"), col("n_orphans"))
    }
    rel("lineitem.l_orderkey->orders", Tables.lineitem(s, dir), "l_orderkey",
        Tables.orders(s, dir), "o_orderkey", hint = false)
      .unionByName(rel("orders.o_custkey->customer", Tables.orders(s, dir),
        "o_custkey", Tables.customer(s, dir), "c_custkey", hint = true))
      .unionByName(rel("customer.c_nationkey->nation", Tables.customer(s, dir),
        "c_nationkey", Tables.nation(s, dir), "n_nationkey", hint = true))
  }

  private val q113Sql =
    """SELECT 'lineitem.l_orderkey->orders' AS fk,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_rows,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
      |   WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS n_orphans
      |UNION ALL
      |SELECT 'orders.o_custkey->customer',
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
      |   WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
      |UNION ALL
      |SELECT 'customer.c_nationkey->nation',
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
      |   WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey))""".stripMargin

  /** SALTED SKEW JOIN under the oracle gate (q98 put the salted
    * AGGREGATION under it; this closes the skew toolkit): enrich every
    * event with its user's lifetime spend and aggregate heavy-user
    * activity by event type. [[Skew.saltedJoin]] routes the big
    * (event) side by (user_id, salt) — a hot user's rows spread over
    * `salts` reducers instead of pinning one — while the small per-user
    * dim is exploded `salts` ways so every salted key still meets its
    * match exactly once; the oracle is the PLAIN join, proving salting
    * is pure routing. Money sums ride decimal(18,2) (q98's convention)
    * so recombination order can never move a double bit.
    *
    * Scale shape: at 100 TB this is the "join a skewed fact to a
    * user dim" template where AQE's block-granular skew split is too
    * coarse for a single hot key; the dim explode costs |dim|·salts
    * tiny rows against the fact's relief of its hottest reducer. */
  private def q125SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"),
      col("value").cast("decimal(18,2)").as("v"))
    // shuffle_hash hint: the scenario is a dim too big to broadcast (a
    // broadcast join has no shuffle to salt); at test SF Spark would
    // otherwise broadcast the tiny dim and hide the salted exchange
    // this query exists to demonstrate (PlanShapeSpec pins it)
    val dim = ev.groupBy("user_id").agg(sum("v").as("user_total"))
      .hint("shuffle_hash")
    Skew.saltedJoin(ev, dim, "user_id", salts = 8)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("user_total") >= 500, 1L).otherwise(0L)).as("n_heavy"),
        sum(when(col("user_total") >= 500, col("v"))).cast("double").as("heavy_value"))
  }

  private val q125Sql =
    """WITH e AS (
      |  SELECT user_id, event_type, CAST(value AS DECIMAL(18,2)) AS v FROM events),
      |dim AS (SELECT user_id, SUM(v) AS user_total FROM e GROUP BY 1)
      |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CASE WHEN d.user_total >= 500 THEN 1 ELSE 0 END) AS BIGINT) AS n_heavy,
      |  CAST(SUM(CASE WHEN d.user_total >= 500 THEN v END) AS DOUBLE) AS heavy_value
      |FROM e JOIN dim d USING (user_id) GROUP BY 1""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q113_ref_integrity", q113RefIntegrity, Some(q113Sql)),
    Q("q43_asof_join", q43AsOfJoin, Some(q43Sql)),
    Q("q64_range_join", q64RangeJoin, Some(q64Sql)),
    Q("q125_salted_join", q125SaltedJoin, Some(q125Sql)))
}
