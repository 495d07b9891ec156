package graft.ops

/** Dev-only step timing (optimization guide §1: measure first): wraps a
  * named step and prints its wall time when `SPARK_GRAFT_TIMING=1`.
  * Zero-cost in production runs (one env check, no timer). Used to
  * decompose composite operators (delete apply, maintenance plan) into
  * their publish/closure/copy phases during optimization rounds; the
  * labels are stable so before/after logs diff cleanly.
  */
object Timing {
  val enabled: Boolean = sys.env.get("SPARK_GRAFT_TIMING").contains("1")

  def step[T](label: String)(body: => T): T =
    if (!enabled) body
    else {
      val t0 = System.nanoTime()
      val r = body
      println(f"[timing] $label ${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
}
