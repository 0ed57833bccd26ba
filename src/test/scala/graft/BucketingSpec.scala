package graft

import graft.build.Layout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing removes the shuffle from co-located joins — the plan-level
  * proof of the 100 TB join strategy (pre-partition once, join many
  * times shuffle-free). */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("BucketingSpec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the join strategy question
    .config("spark.sql.warehouse.dir", s"/root/repo/target/test_warehouse_${System.nanoTime()}")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("join of two bucketed tables runs without an Exchange") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "event_type", "value")
    val users = events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    Layout.writeBucketed(events, "b_events", "user_id", 4)
    Layout.writeBucketed(users, "b_users", "user_id", 4)

    val joined = Layout.read(spark, "b_events")
      .join(Layout.read(spark, "b_users"), "user_id")
    joined.count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")

    // same data, unbucketed: the join shuffles both sides
    val plainPlan = events.join(users, "user_id")
      .queryExecution.executedPlan.toString
    assert(plainPlan.contains("Exchange"), plainPlan)

    // aggregation on the bucket key is also exchange-free
    val aggPlan = Layout.read(spark, "b_events")
      .groupBy("user_id").agg(sum("value"))
      .queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange"), aggPlan)
  }
}
