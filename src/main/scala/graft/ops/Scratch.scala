package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Per-invocation scratch copies of pristine store fixtures — the
  * bench discipline for EXECUTE operators (delete apply, retrain
  * apply): the pristine state is ingest cost, staged once per
  * (JVM, corpus) by an `ensure*` fixture; each invocation copies it
  * (file I/O, not a recompute — the operator rewrites its stores in
  * place, so a shared fixture would drift) and the copy is dropped in
  * finally, so a failed or repeated run never accretes corpus-sized
  * store copies in /tmp. Callers must return only frames rooted in
  * checkpoints — the scratch is gone when the result is consumed.
  */
object Scratch {

  def withFixtureCopy[T](spark: SparkSession, fixture: String,
      prefix: String)(body: String => T): T = {
    val root = java.nio.file.Files.createTempDirectory(prefix)
      .resolve("state").toString
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      Timing.step("fixtureCopy")(org.apache.hadoop.fs.FileUtil.copy(
        fs, new Path(fixture), fs, new Path(root),
        false, spark.sparkContext.hadoopConfiguration))
      body(root)
    } finally {
      fs.delete(new Path(root).getParent, true)
    }
  }
}
