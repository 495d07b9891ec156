package graft.ops

import graft.SparkSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Kill-at-every-interleave coverage for the recoverable store publish:
  * the publish is crashed immediately after each protocol step, the
  * on-disk state is classified and settled by [[Publish.recover]], and
  * the settled store must be a CONSISTENT snapshot — the old frame when
  * the crash preceded the rename-aside, the new frame after it. A store
  * may never vanish.
  */
class PublishSpec extends SparkSuite {

  private def fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def freshStore(): (String, DataFrame, DataFrame) = {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("pub")
      .resolve("store").toString
    val oldF = (1L to 10L).map(i => (i, s"old $i")).toDF("id", "v")
    val newF = (1L to 12L).map(i => (i, s"new $i")).toDF("id", "v")
    oldF.write.parquet(path)
    (path, oldF, newF)
  }

  private def rows(path: String): Set[String] =
    spark.read.parquet(path).collect().map(_.toString).toSet

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("publish: happy path swaps the store and leaves no scratch state") {
    val (path, _, newF) = freshStore()
    Publish.publish(spark, path, newF)
    assert(rows(path) === rowsOf(newF))
    assert(!fs.exists(new Path(Publish.stagedOf(path))))
    assert(!fs.exists(new Path(Publish.prevOf(path))))
    assert(Publish.recover(spark, path) === "none")
  }

  test("publish killed after EVERY step: recovery settles to a consistent snapshot, never a vanished store") {
    for (step <- Seq(Publish.AfterSpark, Publish.AfterStage,
        Publish.AfterAside, Publish.AfterPromote)) {
      val (path, oldF, newF) = freshStore()
      intercept[RuntimeException] {
        Publish.publishImpl(spark, path, newF, Nil, crashAfter = step)
      }
      // the invariant the delete-then-rename form violated: SOME
      // consistent store copy exists at every interleave point —
      // live, or prev (aside), or a complete staged (StagedMarker,
      // written after _SUCCESS and any sidecar)
      val anyCopy = fs.exists(new Path(path)) ||
        fs.exists(new Path(Publish.prevOf(path))) ||
        fs.exists(new Path(Publish.stagedOf(path), Publish.StagedMarker))
      assert(anyCopy, s"step $step left no recoverable copy")
      val action = Publish.recover(spark, path)
      val expected = step match {
        // publish never landed: Spark committed but staging never
        // completed (no marker), or staging completed but the aside
        // never ran — either way live was untouched
        case Publish.AfterSpark | Publish.AfterStage => rowsOf(oldF)
        case _ => rowsOf(newF) // staged was complete: roll forward
      }
      assert(rows(path) === expected, s"step $step settled wrong")
      assert(!fs.exists(new Path(Publish.stagedOf(path))), s"step $step staged")
      assert(!fs.exists(new Path(Publish.prevOf(path))), s"step $step prev")
      assert(action !== "missing", s"step $step lost the store")
      // recovery is idempotent and the settled store publishes cleanly
      assert(Publish.recover(spark, path) === "none")
      Publish.publish(spark, path, newF)
      assert(rows(path) === rowsOf(newF))
    }
  }

  test("publish after an UNRECOVERED crash settles the leftovers itself") {
    val (path, _, newF) = freshStore()
    intercept[RuntimeException] {
      Publish.publishImpl(spark, path, newF, Nil, crashAfter = Publish.AfterAside)
    }
    // no manual recover: the next publish must settle and then succeed
    Publish.publish(spark, path, newF)
    assert(rows(path) === rowsOf(newF))
    assert(!fs.exists(new Path(Publish.stagedOf(path))))
    assert(!fs.exists(new Path(Publish.prevOf(path))))
  }

  test("torn staging without _SUCCESS: live intact is cleared; live missing rolls back to prev") {
    val (path, oldF, _) = freshStore()
    // fabricate a torn staging write (no _SUCCESS)
    val staged = new Path(Publish.stagedOf(path))
    fs.mkdirs(staged)
    fs.createNewFile(new Path(staged, "part-torn.parquet"))
    assert(Publish.recover(spark, path) === "cleared")
    assert(rows(path) === rowsOf(oldF))
    assert(!fs.exists(staged))
    // manual-damage shape: live renamed aside, staging torn
    fs.mkdirs(staged)
    fs.createNewFile(new Path(staged, "part-torn.parquet"))
    fs.rename(new Path(path), new Path(Publish.prevOf(path)))
    assert(Publish.recover(spark, path) === "rolled_back")
    assert(rows(path) === rowsOf(oldF))
    assert(!fs.exists(staged))
    assert(!fs.exists(new Path(Publish.prevOf(path))))
  }

  test("recover on a genuinely missing store reports missing and touches nothing") {
    val path = java.nio.file.Files.createTempDirectory("pub_missing")
      .resolve("store").toString
    assert(Publish.recover(spark, path) === "missing")
    assert(!fs.exists(new Path(path)))
  }

  test("hive-partitioned publish: crash and recovery preserve the partition layout") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("pub_part")
      .resolve("store").toString
    val oldF = (1L to 9L).map(i => (i, i % 3)).toDF("id", "batch")
    val newF = (1L to 9L).map(i => (i, i % 2)).toDF("id", "batch")
    oldF.write.partitionBy("batch").parquet(path)
    intercept[RuntimeException] {
      Publish.publishImpl(spark, path, newF, Seq("batch"),
        crashAfter = Publish.AfterAside)
    }
    assert(Publish.recover(spark, path) === "rolled_forward")
    assert(spark.read.parquet(path).select(col("id"), col("batch").cast("long"))
        .collect().map(_.toString).toSet ===
      newF.select(col("id"), col("batch").cast("long"))
        .collect().map(_.toString).toSet)
    // the partition dirs survived the swap
    assert(fs.listStatus(new Path(path))
      .exists(_.getPath.getName.startsWith("batch=")))
  }
}
