package graft.operators

import graft.Tables
import graft.functions.DateFormats
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's date/time surface (F2/F3): named formats, dateid
  * round-trip, day-partition keys, MySQL parse round-trip, and full-span
  * day iteration with zero-count days preserved.
  */
object DateQueries extends QueryModule {

  private def q36DateFormats(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      DateFormats.toDateId(col("o_orderdate")).as("dateid"),
      DateFormats.dayKey(col("o_orderdate")).as("day_key"),
      DateFormats.format(col("o_orderdate"), DateFormats.Condensed).as("condensed"),
      DateFormats.format(col("o_orderdate"), DateFormats.Underscored).as("underscored"),
      unix_timestamp(DateFormats.parseMySql(
        DateFormats.format(col("o_orderdate"), DateFormats.MySql))).as("mysql_epoch"))

  private val q36Sql =
    """SELECT o_orderkey,
      |  CAST(STRFTIME(o_orderdate, '%Y%m%d') AS INT) AS dateid,
      |  STRFTIME(o_orderdate, '%Y/%m/%d') AS day_key,
      |  STRFTIME(o_orderdate, '%Y%m%d%H%M%S') AS condensed,
      |  STRFTIME(o_orderdate, '%Y_%m_%d') AS underscored,
      |  CAST(FLOOR(EPOCH(DATE_TRUNC('second', o_orderdate))) AS BIGINT) AS mysql_epoch
      |FROM orders""".stripMargin

  /** Day iteration over the whole order-date span, keeping zero-order
    * days (sequence + explode + left join). */
  private def q37DaySpan(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val cal = o.agg(DateFormats.daySpan(min(col("o_orderdate")), max(col("o_orderdate")))
        .as("days"))
      .select(explode(col("days")).as("day"))
    val counts = o.groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"))
    cal.join(counts, Seq("day"), "left")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  private val q37Sql =
    """WITH b AS (SELECT MIN(o_orderdate) AS mn, MAX(o_orderdate) AS mx FROM orders),
      |cal AS (
      |  SELECT CAST(UNNEST(GENERATE_SERIES(CAST(mn AS DATE), CAST(mx AS DATE),
      |    INTERVAL 1 DAY)) AS DATE) AS day FROM b),
      |cnt AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
      |  FROM orders GROUP BY 1)
      |SELECT STRFTIME(cal.day, '%Y-%m-%d') AS day, COALESCE(cnt.n, 0) AS n
      |FROM cal LEFT JOIN cnt USING (day)""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q36_date_formats", q36DateFormats, Some(q36Sql)),
    Q("q37_day_span", q37DaySpan, Some(q37Sql)))
}
