package graft.ops

import graft.SparkSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Kill-at-every-interleave coverage for the object-store (pointer
  * commit) publish, mirroring PublishSpec's discipline for the rename
  * protocol: crash after each step, classify + settle, and at EVERY
  * interleave a reader resolving through [[PointerStore.current]] must
  * see a consistent committed store — the old version before the
  * commit PUT, the new one after. Plus the pointer-mode StoreIO drill:
  * the whole append/fold/replay discipline must behave identically to
  * rename mode when `graft.publish.mode = pointer`.
  */
class PointerStoreSpec extends SparkSuite {

  private def fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def freshRoot(): (String, DataFrame, DataFrame) = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ptr")
      .resolve("store").toString
    val oldF = (1L to 10L).map(i => (i, s"old $i")).toDF("id", "v")
    val newF = (1L to 12L).map(i => (i, s"new $i")).toDF("id", "v")
    PointerStore.publish(spark, root, oldF)
    (root, oldF, newF)
  }

  private def rows(path: String): Set[String] =
    spark.read.parquet(path).collect().map(_.toString).toSet

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def resolved(root: String): String =
    PointerStore.resolve(spark, root).getOrElse(fail(s"no committed version at $root"))

  test("pointer publish: happy path commits a new version and GCs the superseded one") {
    val (root, _, newF) = freshRoot()
    val v0 = resolved(root)
    PointerStore.publish(spark, root, newF)
    val v1 = resolved(root)
    assert(v1 !== v0)
    assert(rows(v1) === rowsOf(newF))
    assert(!fs.exists(new Path(v0)), "superseded version not GC'd")
    assert(PointerStore.recover(spark, root) === "none")
  }

  test("pointer publish killed after EVERY step: a resolver always sees a committed consistent store") {
    for (step <- Seq(PointerStore.AfterSpark, PointerStore.AfterStage,
        PointerStore.AfterCommit)) {
      val (root, oldF, newF) = freshRoot()
      intercept[RuntimeException] {
        PointerStore.publishImpl(spark, root, newF, Nil, crashAfter = step)
      }
      // BEFORE any recovery, the resolver must already be consistent:
      // the commit PUT is the one atom that flips old → new
      val expected =
        if (step == PointerStore.AfterCommit) rowsOf(newF) else rowsOf(oldF)
      assert(rows(resolved(root)) === expected, s"step $step resolver torn")
      val action = PointerStore.recover(spark, root)
      assert(action === "cleared", s"step $step left nothing to settle?")
      assert(rows(resolved(root)) === expected, s"step $step settled wrong")
      // exactly one version + one pointer remain
      val entries = fs.listStatus(new Path(root)).map(_.getPath.getName)
      assert(entries.count(_.startsWith("v-")) === 1, entries.mkString(","))
      assert(entries.count(_.startsWith("_ptr-")) === 1, entries.mkString(","))
      // recovery is idempotent and the settled store publishes cleanly
      assert(PointerStore.recover(spark, root) === "none")
      PointerStore.publish(spark, root, newF)
      assert(rows(resolved(root)) === rowsOf(newF))
    }
  }

  test("a torn pointer file names no complete version: skipped by the resolver, collected by recovery") {
    val (root, oldF, _) = freshRoot()
    val n = PointerStore.current(spark, root).get.n
    // fabricate the crash-inside-the-PUT state a filesystem can leave:
    // a higher-numbered pointer naming a version that does not exist
    Publish.writeSmallFile(fs, new Path(root, f"_ptr-${n + 1}%08d"),
      PointerStore.versionName(n + 1))
    assert(rows(resolved(root)) === rowsOf(oldF), "torn pointer won")
    assert(PointerStore.recover(spark, root) === "cleared")
    assert(rows(resolved(root)) === rowsOf(oldF))
    // and an EMPTY pointer file (zero bytes flushed) is equally inert
    Publish.writeSmallFile(fs, new Path(root, f"_ptr-${n + 2}%08d"), "")
    assert(rows(resolved(root)) === rowsOf(oldF))
    assert(PointerStore.recover(spark, root) === "cleared")
  }

  test("keepVersions retains a read history; hive partitioning survives the version swap") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("ptr_hist")
      .resolve("store").toString
    val f1 = (1L to 9L).map(i => (i, i % 3)).toDF("id", "batch")
    val f2 = (1L to 9L).map(i => (i, i % 2)).toDF("id", "batch")
    PointerStore.publish(spark, root, f1, Seq("batch"), keepVersions = 2)
    val v1 = resolved(root)
    PointerStore.publish(spark, root, f2, Seq("batch"), keepVersions = 2)
    assert(fs.exists(new Path(v1)), "kept version was GC'd")
    assert(rows(v1).map(_.takeWhile(_ != ',')) ===
      rowsOf(f1).map(_.takeWhile(_ != ',')))
    val v2 = resolved(root)
    assert(fs.listStatus(new Path(v2))
      .exists(_.getPath.getName.startsWith("batch=")))
    // dropping back to keepVersions = 1 collects the history
    PointerStore.recover(spark, root, keepVersions = 1)
    assert(!fs.exists(new Path(v1)))
  }

  test("pointer-mode StoreIO: append/fold/replay discipline matches rename mode row for row") {
    import spark.implicits._
    val Ddl = "id BIGINT, v STRING"
    def drill(): Seq[String] = {
      val root = java.nio.file.Files.createTempDirectory("ptr_storeio")
        .resolve("store").toString
      val live = (1L to 6L).map(i => (i, s"live $i")).toDF("id", "v")
      val b1 = (100L to 104L).map(i => (i, s"b1 $i")).toDF("id", "v")
      val b2 = (200L to 201L).map(i => (i, s"b2 $i")).toDF("id", "v")
      // bootstrap through the mode-dispatched fold (snapshot of nothing)
      val s0 = StoreIO.snapshot(spark, root, Some(Ddl))
      StoreIO.publishMerged(spark, root, live, s0)
      StoreIO.append(b1, root, token = "t1")
      // fold b1 into live, then REPLAY t1 — must stay exactly-once
      StoreIO.rewrite(spark, root, identity, Some(Ddl))
      StoreIO.append(b1, root, token = "t1")
      StoreIO.append(b2, root, token = "t2")
      StoreIO.read(spark, root, Some(Ddl))
        .collect().map(_.toString).sorted.toSeq
    }
    val renameRows = drill()
    spark.conf.set("graft.publish.mode", "pointer")
    try {
      val pointerRows = drill()
      assert(pointerRows === renameRows)
    } finally spark.conf.unset("graft.publish.mode")
  }
}
