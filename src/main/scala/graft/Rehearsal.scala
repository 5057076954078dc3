package graft

/** Shared emit for the rehearsal mains ([[ScaleRehearsal]],
  * [[DocScaleRehearsal]], [[StreamRehearsal]]): every JSON evidence line is
  * printed AND appended to a tracked artifact file, so round-over-round
  * scale regressions diff the way bench medians do instead of living only
  * in run logs and COVERAGE.md prose. Default target is
  * `bench/rehearsal_latest.json` (when run from the repo root — committed
  * per round like the bench archives); override with
  * SPARK_GRAFT_REHEARSAL_OUT. Append-mode: one rehearsal campaign spans
  * several JVM runs (per scale / per corpus), and each run's lines
  * accumulate — the first emit of each JVM run stamps a `run_header` line
  * (main class + wall-clock start) so interleaved campaigns stay separable
  * without anyone remembering to delete the file first. When the sink is
  * disabled (parent directory absent — run from outside the repo root),
  * that is LOGGED once instead of silently dropping the artifact.
  */
object Rehearsal {
  private lazy val out: Option[java.nio.file.Path] = {
    val p = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_REHEARSAL_OUT", "bench/rehearsal_latest.json"))
    val parentOk = Option(p.getParent).forall(java.nio.file.Files.isDirectory(_))
    if (!parentOk) println(
      s"[rehearsal] artifact sink DISABLED: parent of $p is not a directory " +
        "(run from the repo root or set SPARK_GRAFT_REHEARSAL_OUT) — " +
        "evidence lines go to stdout only")
    if (parentOk) Some(p) else None
  }

  private val headerStamped = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def append(p: java.nio.file.Path, line: String): Unit = {
    java.nio.file.Files.writeString(p, line + "\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    ()
  }

  def emit(line: String): Unit = {
    println(line)
    out.foreach { p =>
      if (headerStamped.compareAndSet(false, true)) {
        val mainClass = sys.props.get("sun.java.command")
          .map(_.split(" ").head).getOrElse("unknown")
        append(p,
          s"""{"run_header":"$mainClass","started":"${java.time.Instant.now()}"}""")
      }
      append(p, line)
    }
  }
}
