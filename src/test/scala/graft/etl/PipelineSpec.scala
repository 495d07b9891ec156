package graft.etl

import graft.SparkSuite

/** Full-pipeline test: fixtures → partitioned parquet → QC report. */
class PipelineSpec extends SparkSuite {

  test("ETL writes partitioned parquet and QC flags the seeded violations") {
    val inputDir = fixture("")
    val out = java.nio.file.Files.createTempDirectory("pipeline_out").toString

    Pipeline.runEtl(spark, inputDir, out)

    // Hive-style partition layout
    val balDirs = new java.io.File(s"$out/bal_auth").listFiles().map(_.getName)
    assert(balDirs.exists(_.startsWith("bal_auth=PJM")))
    val timeDirs = new java.io.File(s"$out/time").listFiles().map(_.getName)
    assert(timeDirs.exists(_.startsWith("year=2021")) && timeDirs.exists(_.startsWith("year=2020")))

    // partition columns are readable back (partition pruning path)
    val bal = spark.read.parquet(s"$out/bal_auth")
    assert(bal.filter("bal_auth = 'PJM' AND year = 2021 AND month = 1").count() === 2)
    val weather = spark.read.parquet(s"$out/weather")
    assert(weather.filter("bal_auth = 'CISO'").count() === 2)

    val results = Pipeline.runQc(spark, out)
    assert(results.length === 8)
    // seeded violations: null bal_auth partition value, net-gen mismatch,
    // TMIN/TMAX nulls from missing parameters
    assert(results.count(!_.passed) === 4)
    val report = spark.read.json(s"$out/data_quality")
    assert(report.count() === 4)
  }
}
