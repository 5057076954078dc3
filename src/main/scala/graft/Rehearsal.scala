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
  * accumulate; start a fresh file by deleting it first.
  */
object Rehearsal {
  private lazy val out: Option[java.nio.file.Path] = {
    val p = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_REHEARSAL_OUT", "bench/rehearsal_latest.json"))
    val parentOk = Option(p.getParent).forall(java.nio.file.Files.isDirectory(_))
    if (parentOk) Some(p) else None
  }

  def emit(line: String): Unit = {
    println(line)
    out.foreach { p =>
      java.nio.file.Files.writeString(p, line + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
  }
}
