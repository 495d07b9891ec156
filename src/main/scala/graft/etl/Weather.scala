package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weather path: GHCN element rows → station filter → parameter pivot →
  * balancing-authority attach (ref: nrg_etl.py process_weather_data +
  * weather_query).
  *
  * The reference collects the station list to the driver and filters with
  * isin (nrg_etl.py:47,62) — a driver round-trip that caps out at driver
  * memory. Same semantics here as a broadcast left-semi join, which scales
  * to any station-list size and keeps the filter on executors.
  */
object Weather {
  import Schemas._

  /** Station filter (J2 as left-semi) + A3 pivot with explicit values.
    * The explicit parameter list keeps the pivot a single HashAggregate
    * pass — no distinct-values pre-job — and the groupBy key
    * (station_id, date) is high-cardinality, so the exchange spreads
    * evenly; max() gets a map-side partial.
    */
  def pivotedWeather(ghcn: DataFrame, locations: DataFrame): DataFrame = {
    val stations = locations.select(locations("Stations"))
    ghcn
      .join(broadcast(stations), ghcn("station_id") === stations("Stations"), "left_semi")
      .groupBy(ghcn("station_id"), ghcn("date"))
      .pivot("parameter_id", ghcnParameters)
      .max("value")
  }

  /** J1 left-outer join to attach `Acronym AS bal_auth` + F2/F4 date parts
    * (weather_query). The locations dim is tiny → broadcast hash join, no
    * shuffle of the fact side.
    */
  def weatherTable(pivoted: DataFrame, locations: DataFrame): DataFrame = {
    // Rename the dim columns before joining: `locations` also feeds the
    // semi-join inside pivotedWeather, so reusing its Dataset-resolved
    // columns here would be an ambiguous self-join.
    val loc = locations.select(
      locations("Stations").as("loc_station"),
      locations("Acronym").as("loc_acronym"))
    val d = to_date(pivoted("date"), "yyyyMMdd")
    pivoted
      .join(broadcast(loc), pivoted("station_id") === col("loc_station"), "left_outer")
      .select(
        Seq(col("loc_acronym").as("bal_auth")) ++
          pivoted.columns.map(pivoted(_)) ++
          Seq(month(d).as("month"), year(d).as("year")): _*)
  }

  /** Full weather transform as used by the pipeline. */
  def apply(ghcn: DataFrame, locations: DataFrame): DataFrame =
    weatherTable(pivotedWeather(ghcn, locations), locations)
}
