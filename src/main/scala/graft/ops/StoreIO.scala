package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** DELTA-DIRECTORY append discipline — how concurrent INGEST APPENDS
  * are serialized against MAINTENANCE REWRITES without a lock.
  *
  * The hazard: the streaming paths append to the same stores (verified
  * pairs, MinHash sketch index, content-hash registry) that the
  * maintenance operators ([[graft.ext.Dedup.storeRepair]] /
  * `deleteApply` / `runMaintenance`) rewrite through the
  * [[Publish]] swap. An append landing INSIDE the live directory while
  * a swap is in flight is either deleted with the superseded store or
  * orphaned in the renamed-away staging — silent data loss either way.
  *
  * The discipline: writers never touch the live directory.
  *
  *   - [[append]] writes a self-contained parquet child under
  *     `path__delta/d-<token>`. Distinct tokens never collide, so any
  *     number of appenders run concurrently with each other and with a
  *     swap; a REPLAYED append reusing its token overwrites its own
  *     child (at-least-once delivery folds to exactly-once state).
  *   - [[read]] serves live ∪ delta children — appends are visible
  *     immediately, no fold required.
  *   - [[snapshot]] pins the delta children present NOW; a rewrite
  *     derives its output from exactly that snapshot and
  *     [[publishMerged]] folds it: publish through [[Publish]] (which
  *     only swaps the live directory) and delete exactly the
  *     snapshotted children. Appends that arrive after the snapshot
  *     survive untouched in the delta directory and remain visible
  *     through [[read]] — the post-state is the serial order
  *     "rewrite, then the late appends".
  *
  * Contract, stated precisely: APPENDS are safe against any concurrent
  * rewrite (that is the whole point); REWRITES (repairs, delete
  * applies, folds — including the compaction an appender's file-count
  * trigger fires) are lost-update-prone against EACH OTHER and must run
  * in one maintenance actor — a stream deployed alongside an external
  * maintenance loop passes `compactTrigger = Int.MaxValue` and lets
  * that loop own all folds. Between the publish promote and the
  * snapshot-child deletion inside [[publishMerged]], a reader in
  * another thread sees the folded rows twice. Plain parquet has no
  * multi-directory atomicity; the production-scale form of this whole
  * file is a transaction log (Delta/Iceberg-style manifest + pointer
  * commit) — the delta directory is its filesystem approximation.
  */
object StoreIO {

  def deltaDirOf(path: String): String = path.stripSuffix("/") + "__delta"

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Appends `frame` as a self-contained delta child. `token` is the
    * idempotence key: replays of the same logical append MUST reuse it
    * (the child is overwritten, not duplicated); independent appends
    * must differ (a UUID is generated when omitted).
    */
  def append(frame: DataFrame, path: String, token: String = ""): Unit = {
    val t = if (token.nonEmpty) token
      else java.util.UUID.randomUUID().toString
    frame.write.mode(SaveMode.Overwrite)
      .parquet(s"${deltaDirOf(path)}/d-$t")
  }

  /** The delta children present now (each one complete parquet dir). */
  def deltaChildren(spark: SparkSession, path: String): Seq[String] = {
    val d = new Path(deltaDirOf(path))
    val fs = fsOf(spark, path)
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).toSeq.filter(_.isDirectory)
      .map(_.getPath.toString).sorted
  }

  /** live ∪ delta. `ddl` pins the schema (required when the live store
    * may be missing or empty, and for hive-partitioned stores whose
    * delta children carry the partition key as a data column).
    */
  def read(spark: SparkSession, path: String,
      ddl: Option[String] = None): DataFrame =
    readParts(spark, path, deltaChildren(spark, path), ddl)

  /** A pinned view: live ∪ exactly `children` (the [[snapshot]] form —
    * appends landing after the listing are excluded by construction).
    */
  private def readParts(spark: SparkSession, path: String,
      children: Seq[String], ddl: Option[String]): DataFrame = {
    val fs = fsOf(spark, path)
    def rd(p: String): DataFrame =
      ddl.fold(spark.read.parquet(p))(d =>
        spark.read.schema(StructType.fromDDL(d)).parquet(p))
    val parts = (if (fs.exists(new Path(path))) Seq(path) else Nil) ++ children
    if (parts.isEmpty) {
      require(ddl.isDefined, s"StoreIO.read: missing store $path needs a schema")
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType.fromDDL(ddl.get))
    } else parts.map(rd).reduce(_.unionByName(_))
  }

  /** A rewrite's input: the store as of NOW, plus the delta-child list
    * that view folded — pass both to [[publishMerged]].
    */
  final case class Snapshot(frame: DataFrame, children: Seq[String])

  def snapshot(spark: SparkSession, path: String,
      ddl: Option[String] = None): Snapshot = {
    val children = deltaChildren(spark, path)
    Snapshot(readParts(spark, path, children, ddl), children)
  }

  /** Publishes a frame derived from `snap` and retires exactly the
    * delta children that snapshot folded. Appends racing the publish
    * landed in children the snapshot never listed — they survive.
    */
  def publishMerged(spark: SparkSession, path: String, frame: DataFrame,
      snap: Snapshot, partitionBy: Seq[String] = Nil): Unit = {
    Publish.publish(spark, path, frame, partitionBy)
    val fs = fsOf(spark, path)
    snap.children.foreach(c => fs.delete(new Path(c), true))
  }

  /** Snapshot-rewrite in one call: `f` over live ∪ pinned delta,
    * published to live, snapshot children retired.
    */
  def rewrite(spark: SparkSession, path: String, f: DataFrame => DataFrame,
      ddl: Option[String] = None, partitionBy: Seq[String] = Nil): Unit = {
    val snap = snapshot(spark, path, ddl)
    publishMerged(spark, path, f(snap.frame), snap, partitionBy)
  }

  /** File-count hygiene across live AND delta: how many parquet LEAF
    * FILES a [[read]] must list (the compaction trigger's currency —
    * a delta child holds one part file per write task, so counting
    * children instead of leaves would let listing cost grow unbounded
    * under the trigger).
    */
  def fragmentCount(spark: SparkSession, path: String): Int = {
    val fs = fsOf(spark, path)
    def leaves(dir: String): Int = {
      val p = new Path(dir)
      if (fs.exists(p)) fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
      else 0
    }
    leaves(path) + deltaChildren(spark, path).map(leaves).sum
  }
}
