package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Single-writer MAINTENANCE LEASE — the rewrite-vs-rewrite
  * serialization [[StoreIO]]'s contract used to delegate to "one
  * maintenance actor" by assumption. Two concurrent rewriters of the
  * same store each snapshot, derive, and publish: the later publish
  * silently discards the earlier one's changes (lost update). The
  * lease makes the assumption mechanical: a rewrite span acquires an
  * exclusive per-store lock file BEFORE its snapshot and releases it
  * after its publish, so a second writer FAILS LOUDLY
  * ([[Lease.ConcurrentWriter]]) instead of silently losing work —
  * there is no blocking/queueing (nothing to deadlock), retry is the
  * caller's policy.
  *
  * Mechanics:
  *   - the lock is `store__lease`, taken with the filesystem's atomic
  *     create-if-absent (`createNewFile` — atomic on HDFS and local
  *     filesystems; the object-store analog is a conditional PUT);
  *   - REENTRANT PER THREAD: a composed operator (runMaintenance →
  *     storeRepair → fold) re-enters the leases it already holds, so
  *     spans nest without self-deadlock; a different thread — same JVM
  *     or not — is a different writer and fails;
  *   - multi-store spans acquire in SORTED path order; combined with
  *     fail-fast (never wait), two actors can never deadlock — the
  *     loser of any single acquisition aborts and releases;
  *   - a crashed holder leaves a stale lock: an acquirer BREAKS any
  *     lease older than `ttlMs`, claiming the break by an atomic
  *     RENAME-aside (exactly one of two concurrent breakers wins; the
  *     loser fails loudly). There is NO renewal — the TTL is a dead-
  *     holder heuristic, so it must sit well above the longest rewrite
  *     span; a LIVE holder that outlives it can be usurped (the
  *     inherent limit of unfenced leases — a fencing token checked at
  *     publish time is the full form). Release is ownership-checked
  *     (the lock records its holder), so a usurped span cannot cascade
  *     by deleting the usurper's lock and letting a third writer in.
  *
  * What is NOT leased: plain appends (the delta-directory discipline
  * makes them safe against any rewrite — that is its whole point) and
  * reads. Opportunistic folds (an appender's file-count compaction
  * trigger) use [[tryWithLeases]] — skipping hygiene while a
  * maintenance actor holds the store is always safe.
  */
object Lease {

  final class ConcurrentWriter(msg: String) extends IllegalStateException(msg)

  /** Default break-stale TTL: generous against the longest observed
    * store rewrite; crash recovery (not lease expiry) is what protects
    * the data itself.
    */
  val DefaultTtlMs: Long = 30L * 60L * 1000L

  private[graft] def leasePathOf(path: String): String =
    path.stripSuffix("/") + "__lease"

  // thread-reentrant hold counts (leases held by THIS thread)
  private val held = new ThreadLocal[scala.collection.mutable.Map[String, Int]] {
    override def initialValue() = scala.collection.mutable.Map.empty
  }

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Runs `body` holding exclusive leases on every path (sorted order,
    * released in reverse). Throws [[ConcurrentWriter]] — having
    * acquired nothing net — when any store is already leased by
    * another writer.
    */
  def withLeases[T](spark: SparkSession, paths: Seq[String],
      ttlMs: Long = DefaultTtlMs)(body: => T): T = {
    val sorted = paths.distinct.sorted
    val acquired = scala.collection.mutable.ListBuffer.empty[String]
    try {
      sorted.foreach { p => acquire(spark, p, ttlMs); acquired += p }
      body
    } finally acquired.reverse.foreach(release(spark, _))
  }

  /** [[withLeases]] that returns None instead of throwing when another
    * writer holds any of the stores — the opportunistic-fold form.
    */
  def tryWithLeases[T](spark: SparkSession, paths: Seq[String],
      ttlMs: Long = DefaultTtlMs)(body: => T): Option[T] =
    try Some(withLeases(spark, paths, ttlMs)(body))
    catch { case _: ConcurrentWriter => None }

  private def holderId: String =
    s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}/" +
      Thread.currentThread().getId

  // this thread's holder record per lease (for the ownership-checked
  // release below)
  private val heldRecord = new ThreadLocal[scala.collection.mutable.Map[String, String]] {
    override def initialValue() = scala.collection.mutable.Map.empty
  }

  private def acquire(spark: SparkSession, path: String, ttlMs: Long): Unit = {
    val lp = leasePathOf(path)
    val counts = held.get()
    if (counts.getOrElse(lp, 0) > 0) { counts(lp) += 1; return }
    val fs = fsOf(spark, path)
    val lock = new Path(lp)
    val parent = lock.getParent
    if (parent != null) fs.mkdirs(parent)
    def tryCreate(): Boolean =
      try fs.createNewFile(lock)
      catch { case _: java.io.IOException => false }
    var got = tryCreate()
    if (!got) {
      // stale-holder break: strictly older than the TTL only. The break
      // itself must be single-winner — a delete-then-create would let
      // two breakers both "succeed" (B deletes A's fresh lock right
      // after A's create) and silently co-hold. RENAME is the atomic
      // claim: exactly one breaker moves the stale file aside; the
      // loser's rename returns false and it fails loudly like any
      // other contender (it must NOT retry create — the winner owns
      // the break window).
      val age = try System.currentTimeMillis() -
        fs.getFileStatus(lock).getModificationTime
      catch { case _: java.io.FileNotFoundException => Long.MaxValue }
      if (age > ttlMs) {
        val aside = new Path(lp + ".stale-" + java.util.UUID.randomUUID())
        val wonBreak =
          try fs.rename(lock, aside)
          catch { case _: java.io.IOException => false }
        if (wonBreak) {
          fs.delete(aside, false)
          got = tryCreate()
        }
      } else if (age == Long.MaxValue) {
        // the lock vanished between create and stat (holder released):
        // contend normally once more
        got = tryCreate()
      }
    }
    if (!got)
      throw new ConcurrentWriter(
        s"Lease: $path is held by another maintenance writer ($lp); " +
          "two concurrent rewriters lose updates — retry after it releases")
    // holder record, best effort (the CREATE above is the lock). Also
    // the release-side ownership token: release only deletes a lock
    // whose record it wrote.
    val record = s"$holderId acquired_ms=${System.currentTimeMillis()}"
    try Publish.writeSmallFile(fs, lock, record)
    catch { case _: java.io.IOException => () }
    heldRecord.get()(lp) = record
    counts(lp) = 1
  }

  private def release(spark: SparkSession, path: String): Unit = {
    val lp = leasePathOf(path)
    val counts = held.get()
    counts.get(lp) match {
      case Some(n) if n > 1 => counts(lp) = n - 1
      case Some(_) =>
        counts.remove(lp)
        val record = heldRecord.get().remove(lp)
        val fs = fsOf(spark, path)
        val lock = new Path(lp)
        // ownership-checked delete: if a TTL break usurped this span
        // (the documented no-renewal limit — pick TTL well above the
        // longest rewrite), the lock now belongs to the usurper and
        // deleting it would invite a THIRD writer. Best-effort read;
        // an unreadable/missing lock is left alone.
        // empty content = the create landed but the record write did
        // not — still this thread's lock (nobody else could create it)
        val owned = try {
          val content = Publish.readSmallFile(fs, lock)
          content.isEmpty || record.contains(content)
        } catch { case _: java.io.IOException => false }
        if (owned) fs.delete(lock, false)
      case None => () // release without acquire: nothing to do
    }
  }
}
