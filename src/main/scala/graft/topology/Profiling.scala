package graft.topology

/** Opt-in phase timing for topology runs: `-Dgraft.profilePhases=true`
  * prints one `[phase] name seconds` line per wrapped block to stderr.
  * Off (the default) it is a plain pass-through — no timing, no output —
  * so the hot path costs nothing in production runs.
  */
object Profiling {
  private val enabled = java.lang.Boolean.getBoolean("graft.profilePhases")

  def apply[A](name: String)(body: => A): A =
    if (!enabled) body
    else {
      val t0 = System.nanoTime()
      try body
      finally System.err.println(
        f"[phase] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
}
