package graft.queries

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch twins of the streaming operators (SURVEY.md §2, "Streaming").
  * The streaming forms run in StreamingSpec via MemoryStream; these batch
  * twins share the same aggregation logic and gate it against DuckDB.
  */
object Streaming {

  private def eventsRate(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy(
        col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        (sum(Num.cents(col("value"))) / 100.0).as("sum_value"))
      .orderBy("event_type", "day")

  private val eventsRateSql =
    s"""SELECT event_type,
       |  strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       |  count(*) AS n_events,
       |  count(DISTINCT user_id) AS n_users,
       |  sum(${Num.centsSql("value")})/100.0 AS sum_value
       |FROM events
       |GROUP BY event_type, day
       |ORDER BY event_type, day""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("st_events_rate", eventsRate, Some(eventsRateSql)))
}
