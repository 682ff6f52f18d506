package graft.util

/** CPU-steal counter for the bench mains — this host is a VM whose
  * neighbors intermittently steal 5–10% of CPU in waves, which
  * masquerades as a 1.3–2× "regression" on any wall-clock number
  * (BENCH_SF1.md's standing caveat). Each bench reads the cumulative
  * steal ticks from /proc/stat around its MEASURED phase and emits the
  * delta next to the number, so a reader (or a retry harness) can
  * accept clean-window readings and reject stolen ones without
  * guessing — and a build-phase steal burst no longer invalidates a
  * clean stream-phase measurement. */
object Steal {

  /** Cumulative steal ticks across all CPUs (column 8 of the `cpu`
    * line), or -1 where /proc/stat does not exist (non-Linux dev
    * boxes) — deltas then read -0 and are ignored. */
  def ticks(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().find(_.startsWith("cpu "))
        .map(_.trim.split("\\s+")(8).toLong).getOrElse(-1L)
      finally src.close()
    } catch { case scala.util.control.NonFatal(_) => -1L }
}
