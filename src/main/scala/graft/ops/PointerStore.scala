package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** OBJECT-STORE publish — the pointer-file commit [[Publish]]'s header
  * names as the 100 TB form. [[Publish]]'s rename-aside protocol
  * assumes directory rename is ATOMIC, which holds on HDFS and local
  * filesystems but not on S3-style object stores (rename = copy +
  * delete there, so every "atomic" step tears into a window). This
  * store keeps the same two-phase shape with only operations an object
  * store makes atomic — single-object PUTs:
  *
  *   0. stage the prepared frame to an immutable VERSION directory
  *      `root/v-<N>` (never touched again after its staging marker
  *      lands — Spark's job commit, then any sidecar, then the
  *      [[Publish.StagedMarker]], the same completeness rule as the
  *      rename protocol);
  *   1. COMMIT with one pointer-file create: `root/_ptr-<N>` naming the
  *      version (a single PUT — atomic on S3 and on every filesystem);
  *   2. GC superseded versions and pointers.
  *
  * Readers resolve the highest pointer whose version is COMPLETE
  * ([[current]]) and read that immutable directory — a reader never
  * observes a torn store at any interleave: before the commit PUT it
  * resolves the old version, after it the new one. A torn pointer
  * file (a crash inside the PUT on a filesystem, where create+write is
  * not atomic) names no complete version and is skipped and collected —
  * the previous pointer still commits the store.
  *
  * Crash matrix, settled by [[recover]] (run at the start of every
  * publish): an unreferenced staged version (crash before the commit
  * PUT) is dropped — the publish never happened; superseded versions
  * and pointers (crash before GC) are dropped — the publish stands;
  * a torn pointer is dropped. There is no roll-back/roll-forward
  * asymmetry to reason about because the pointer IS the store: the
  * newest committed pointer wins, always.
  *
  * Caveats, stated: single writer assumed (two concurrent publishes
  * could both stage and the later commit PUT wins — the same
  * maintenance-actor contract as [[Publish]]); GC deletes the
  * superseded version immediately, so a reader holding the OLD
  * resolved path across a publish can lose files mid-read — a
  * deployment that needs snapshot isolation keeps K superseded
  * versions instead (the `keepVersions` knob), trading storage for
  * read-lease time. Mode selection: the engine's internal stores
  * default to the rename protocol (`graft.publish.mode` = "rename");
  * setting the Spark conf to "pointer" routes [[StoreIO]]'s
  * publishes/reads through this store instead.
  */
object PointerStore {

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val PtrPrefix = "_ptr-"
  // Version dirs are UNDERSCORE-prefixed so a plain parquet read of
  // the root ignores them (Spark's file listing skips `_`/`.` names):
  // during a legacy store's first pointer publish, a migration reader
  // resolving the plain root never sees the in-flight staging as a
  // conflicting subdirectory — the mixed layout is unobservable.
  private val VersionPrefix = "_v-"
  private[graft] def versionName(n: Long): String = f"$VersionPrefix$n%08d"
  private def ptrName(n: Long): String = f"$PtrPrefix$n%08d"

  /** Whether `root` holds data written OUTSIDE the pointer protocol —
    * a store that predates the mode switch (plain parquet, or the
    * rename protocol's live form): any top-level entry that is neither
    * a pointer file nor a version dir. Such a store must keep serving
    * (and must seed the first pointer-mode fold) — resolving it as
    * empty would silently drop its rows on the mode flip.
    */
  private def hasLegacyData(fs: org.apache.hadoop.fs.FileSystem,
      r: Path): Boolean =
    fs.exists(r) && fs.listStatus(r).exists { st =>
      val n = st.getPath.getName
      !n.startsWith(PtrPrefix) && !n.startsWith(VersionPrefix)
    }

  /** Whether `root` holds data OUTSIDE the pointer protocol — the
    * [[Publish.resolveLive]] seam for both migration directions. */
  private[ops] def legacyData(spark: SparkSession, root: String): Boolean =
    hasLegacyData(fsOf(spark, root), new Path(root))

  /** A committed state: pointer number + the version dir it names. */
  final case class Commit(n: Long, version: String)

  /** The version a pointer file names — its FIRST line. The second
    * line (when present) is the publishing span's lease claim id, the
    * same fence token [[Publish.StagedMarker]] carries in rename mode,
    * recorded for forensics (pointer commits are already
    * last-PUT-wins, so recovery never needs to re-judge one).
    */
  private def ptrVersion(fs: org.apache.hadoop.fs.FileSystem,
      r: Path, n: Long): String =
    Publish.readSmallFile(fs, new Path(r, ptrName(n)))
      .linesIterator.nextOption().getOrElse("").trim

  /** The newest pointer naming a COMPLETE version (staging marker
    * present) — torn pointers and torn stagings are skipped, so this
    * is total over every crash state. None = never published.
    */
  def current(spark: SparkSession, root: String): Option[Commit] = {
    val fs = fsOf(spark, root)
    val r = new Path(root)
    if (!fs.exists(r)) return None
    val ptrs = fs.listStatus(r).map(_.getPath.getName)
      .filter(_.startsWith(PtrPrefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(PtrPrefix).toLong).toOption)
      .sorted(Ordering[Long].reverse)
    ptrs.iterator
      .map(n => Commit(n, ptrVersion(fs, r, n)))
      .collectFirst {
        case c if c.version.nonEmpty && fs.exists(
          new Path(new Path(r, c.version), Publish.StagedMarker)) => c
      }
  }

  /** The committed version directory to read, or — MIGRATION READ —
    * the plain root itself when no pointer commit exists but the
    * directory holds pre-pointer data (a store written by the rename
    * protocol or a direct parquet write, before `graft.publish.mode`
    * was flipped). None only when the store has never been written by
    * any protocol. The migration read means a mode flip never makes an
    * existing store read as empty; the first pointer-mode publish then
    * commits a version (seeded from this read, for folds) and its GC
    * retires the superseded legacy files.
    */
  def resolve(spark: SparkSession, root: String): Option[String] =
    current(spark, root).map(c => s"${root.stripSuffix("/")}/${c.version}")
      .orElse {
        if (hasLegacyData(fsOf(spark, root), new Path(root))) Some(root)
        else None
      }

  /** Crash points for the kill-interleave spec: throw immediately AFTER
    * the numbered step. [[AfterSpark]] crashes between Spark's job
    * commit and the staging marker (the version must read as torn).
    */
  private[graft] val AfterSpark = 0
  private[graft] val AfterStage = 1
  private[graft] val AfterCommit = 2

  private final class InjectedCrash(step: Int)
    extends RuntimeException(s"injected crash after pointer step $step")

  def publish(spark: SparkSession, root: String, frame: DataFrame,
      partitionBy: Seq[String] = Nil,
      sidecar: Option[(String, String)] = None,
      keepVersions: Int = 1): Unit =
    publishImpl(spark, root, frame, partitionBy, crashAfter = Int.MaxValue,
      sidecar = sidecar, keepVersions = keepVersions)

  private[graft] def publishImpl(spark: SparkSession, root: String,
      frame: DataFrame, partitionBy: Seq[String], crashAfter: Int,
      sidecar: Option[(String, String)] = None,
      keepVersions: Int = 1): Unit = {
    val fs = fsOf(spark, root)
    val r = new Path(root)
    def crash(step: Int): Unit =
      if (crashAfter == step) throw new InjectedCrash(step)
    fs.mkdirs(r)
    recover(spark, root, keepVersions)
    // a leased span renews before its longest step (no-op unleased)
    Lease.renew(spark, root)
    val n = current(spark, root).map(_.n + 1).getOrElse(0L)
    val vdir = new Path(r, versionName(n))
    // step 0: stage the immutable version (Overwrite: a GC'd leftover
    // of the same number is replaced wholesale)
    val w = frame.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(vdir.toString)
    crash(AfterSpark)
    sidecar.foreach { case (name, contents) =>
      Publish.writeSmallFile(fs, new Path(vdir, name), contents)
    }
    val claim = Lease.heldClaim(root).getOrElse("")
    Publish.writeSmallFile(fs, new Path(vdir, Publish.StagedMarker), claim)
    crash(AfterStage)
    // FENCE immediately before the commit PUT: the staging write is
    // the span's long pole, so a TTL break overwhelmingly lands inside
    // it — a usurped span aborts HERE, leaving only an unreferenced
    // version the next recover GCs. (The residual window is this
    // exists() to the PUT below; the atomic form is a conditional PUT,
    // which plain filesystems and base S3 lack.)
    Lease.checkHeld(spark, root)
    // step 1: the commit — ONE pointer-object create (first line = the
    // version; second line = the span's claim id, for forensics)
    Publish.writeSmallFile(fs, new Path(r, ptrName(n)),
      versionName(n) + (if (claim.isEmpty) "" else "\n" + claim))
    crash(AfterCommit)
    // step 2: GC
    gc(spark, root, keepVersions)
    spark.catalog.refreshByPath(vdir.toString)
  }

  /** Settles whatever a crashed publish left at `root` (see the crash
    * matrix above): `none` (healthy or never published), or `cleared`
    * (dropped an unreferenced staging, superseded state, or a torn
    * pointer). Idempotent.
    */
  def recover(spark: SparkSession, root: String,
      keepVersions: Int = 1): String =
    if (gc(spark, root, keepVersions) > 0) "cleared" else "none"

  /** Deletes every version directory and pointer file not among the
    * newest `keep` committed states (torn stagings and torn pointers
    * are unreferenced by construction and collected too). Returns the
    * number of entries removed.
    */
  private def gc(spark: SparkSession, root: String, keep: Int): Int = {
    val fs = fsOf(spark, root)
    val r = new Path(root)
    if (!fs.exists(r)) return 0
    val cur = current(spark, root)
    // the `keep` newest committed pointers (the resolvable history)
    val kept: Set[Long] = cur match {
      case None => Set.empty
      case Some(c) =>
        fs.listStatus(r).map(_.getPath.getName)
          .filter(_.startsWith(PtrPrefix))
          .flatMap(n => scala.util.Try(n.stripPrefix(PtrPrefix).toLong).toOption)
          .filter { n =>
            // the same torn-pointer guard as current(): an EMPTY
            // pointer names no version (and an empty string is not
            // even a constructible Path) — it is collectable, never
            // kept
            val v = ptrVersion(fs, r, n)
            n <= c.n && v.nonEmpty &&
              fs.exists(new Path(new Path(r, v), Publish.StagedMarker))
          }
          .sorted(Ordering[Long].reverse).take(math.max(1, keep)).toSet
    }
    val keptVersions = kept.map(versionName)
    var removed = 0
    fs.listStatus(r).foreach { st =>
      val name = st.getPath.getName
      val drop =
        if (name.startsWith(PtrPrefix))
          !scala.util.Try(name.stripPrefix(PtrPrefix).toLong).toOption
            .exists(kept.contains)
        else if (name.startsWith(VersionPrefix)) !keptVersions.contains(name)
        // legacy pre-pointer data (the migration-read form) is
        // SUPERSEDED the moment a pointer commit exists — a publish
        // replaces the store wholesale in every mode, and the first
        // pointer-mode fold seeds from the migration read — so it is
        // collectable exactly then, and MUST be kept while no commit
        // exists (it is the only copy)
        else cur.isDefined
      if (drop) { fs.delete(st.getPath, true); removed += 1 }
    }
    removed
  }
}
