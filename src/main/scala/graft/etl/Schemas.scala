package graft.etl

import org.apache.spark.sql.types._

/** Input schemas for the reference's three CSV families.
  *
  * EIA-930 hourly balancing-authority CSVs are read header-first and
  * schemaless (all strings) exactly like the reference (nrg_etl.py:24) —
  * the export's column ORDER is not contractual, only the header names
  * are, so typing happens by name in the transform (BalAuth), not at scan.
  *
  * GHCN-Daily element CSVs are headerless with a fixed 8-field layout, so
  * the schema is declared at scan time (nrg_etl.py:49-57).
  */
object Schemas {

  /** GHCN-Daily element file: station_id,date,parameter_id,value,flags,time. */
  val ghcnDaily: StructType = StructType(Seq(
    StructField("station_id", StringType, nullable = true),
    StructField("date", StringType, nullable = true),
    StructField("parameter_id", StringType, nullable = true),
    StructField("value", IntegerType, nullable = true),
    StructField("m_flag", StringType, nullable = true),
    StructField("q_flag", StringType, nullable = true),
    StructField("s_flag", StringType, nullable = true),
    StructField("time", StringType, nullable = true)))

  /** EIA-930 header names consumed by the pipeline (nrg_sql_queries.py:3-20),
    * in output order, with their snake_case targets.
    */
  val eiaRenames: Seq[(String, String)] = Seq(
    "Balancing Authority" -> "bal_auth",
    "Region" -> "region",
    "Local Time at End of Hour" -> "local_time",
    "UTC Time at End of Hour" -> "utc_time",
    "Demand Forecast (MW)" -> "demand_forecast",
    "Demand (MW) (Adjusted)" -> "demand",
    "Net Generation (MW) (Adjusted)" -> "net_generation",
    "Net Generation (MW) from Coal" -> "net_generation_coal",
    "Net Generation (MW) from Natural Gas" -> "net_generation_nat_gas",
    "Net Generation (MW) from Nuclear" -> "net_generation_nuclear",
    "Net Generation (MW) from All Petroleum Products" -> "net_generation_petro",
    "Net Generation (MW) from Hydropower and Pumped Storage" -> "net_generation_hydro",
    "Net Generation (MW) from Solar" -> "net_generation_solar",
    "Net Generation (MW) from Wind" -> "net_generation_wind",
    "Net Generation (MW) from Other Fuel Sources" -> "net_generation_other",
    "Net Generation (MW) from Unknown Fuel Sources" -> "net_generation_unknown")

  /** MW measure columns, typed double at transform time (the reference
    * leaves them strings — SURVEY §4.3.5 — which silently breaks its own
    * sum-of-parts QC on formatting differences).
    */
  val eiaMeasures: Set[String] = Set(
    "demand_forecast", "demand", "net_generation",
    "net_generation_coal", "net_generation_nat_gas", "net_generation_nuclear",
    "net_generation_petro", "net_generation_hydro", "net_generation_solar",
    "net_generation_wind", "net_generation_other", "net_generation_unknown")

  /** The nine fuel-type parts whose sum must equal net_generation. */
  val fuelParts: Seq[String] = Seq(
    "net_generation_coal", "net_generation_nat_gas", "net_generation_nuclear",
    "net_generation_petro", "net_generation_hydro", "net_generation_solar",
    "net_generation_wind", "net_generation_other", "net_generation_unknown")

  /** GHCN parameters kept by the pivot, in pivot-column order (nrg_etl.py:61). */
  val ghcnParameters: Seq[String] = Seq("TMIN", "TMAX", "TAVG", "SNOW", "SNWD", "PRCP")

  /** EIA date / local-time patterns — Spark (Java) forms of the intent.
    * The reference's literal 'MM/dd/yyyy HH12:MI:SS AM' is a Postgres
    * pattern that Spark cannot parse (SURVEY §4.3.4); EIA strings look
    * like "01/15/2021 1:00:00 AM", hence single-h.
    */
  val eiaDatePattern = "MM/dd/yyyy"
  val eiaLocalTimePattern = "MM/dd/yyyy h:mm:ss a"
}
