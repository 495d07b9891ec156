package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Balancing-authority transforms: the cleaned `bal_auth` table and the
  * `time` dimension (ref: nrg_sql_queries.py bal_auth_query/time_query,
  * executed by nrg_etl.py:29-37).
  *
  * Pure DataFrame => DataFrame functions — no I/O, no temp views — so each
  * transform unit-tests against an in-memory frame and composes under
  * Catalyst (the projection prunes the ~30-column EIA scan down to the 16
  * consumed columns before the distinct's exchange).
  */
object BalAuth {
  import Schemas._

  /** P1 projection/rename + typed measures + F1/F4 date parts + A4 distinct.
    * Scale: distinct over the full width shuffles every surviving column
    * once; partial aggregation dedups map-side first, so the exchange
    * carries only unique rows per partition.
    */
  def balAuthTable(raw: DataFrame): DataFrame = {
    val projected = eiaRenames.map { case (src, dst) =>
      val c = raw(src)
      (if (eiaMeasures(dst)) c.cast("double") else c).as(dst)
    } ++ Seq(
      month(to_date(raw("Data Date"), eiaDatePattern)).as("month"),
      year(to_date(raw("Data Date"), eiaDatePattern)).as("year"))
    raw.select(projected: _*).distinct()
  }

  /** Time dimension: distinct local-time strings with six extracted parts
    * (ref time_query; timestamp pattern intent-corrected per SURVEY §4.3.4).
    * Spark semantics: weekofyear is ISO-8601, dayofweek is 1=Sunday.
    */
  def timeDim(raw: DataFrame): DataFrame = {
    val ts = to_timestamp(raw("Local Time at End of Hour"), eiaLocalTimePattern)
    raw.select(
      raw("Local Time at End of Hour").as("local_time"),
      hour(ts).as("hour"),
      dayofmonth(ts).as("day"),
      weekofyear(ts).as("week"),
      month(ts).as("month"),
      year(ts).as("year"),
      dayofweek(ts).as("weekday"))
      .distinct()
  }
}
