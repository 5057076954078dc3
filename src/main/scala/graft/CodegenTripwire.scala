package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** In-process tripwire for SILENT codegen degradation.
  *
  * When janino rejects a whole-stage-codegen'd Java class, Spark logs
  * "Failed to compile the generated Java code" at ERROR and falls back to
  * interpreted evaluation of the same plan — results stay correct, so
  * nothing downstream (oracle compare, specs, bench medians) ever notices
  * that the hot path lost codegen. Round 18's judge caught exactly this:
  * `VecDotF.doGenCode` emitted a fixed-name local, so any stage with two
  * dot products (every cosine shape in the ANN scoring scans) compiled
  * nothing and ran interpreted — a ~10× constant factor, invisible in every
  * gate.
  *
  * This appender hangs off the log4j2 root logger and counts those ERROR
  * events. Consumers: SparkSpec fails the suite in afterAll when `hits > 0`
  * (any test anywhere that trips a codegen compile error now fails loud),
  * Bench folds the count into the result JSON + validity flag, Verify
  * prints a LOUD line the round log preserves. The match string is the
  * stable public error-class message Spark has used since 2.x
  * (QueryExecutionErrors.failedToCompileMsg / CodeGenerator.doCompile).
  */
object CodegenTripwire {
  private val count = new AtomicInteger(0)
  private val firstMsg = new java.util.concurrent.atomic.AtomicReference[String](null)
  @volatile private var installed = false

  private final class Trap extends AbstractAppender(
      "graft-codegen-tripwire", null, null, false, Property.EMPTY_ARRAY) {
    override def append(event: LogEvent): Unit = {
      val m = event.getMessage.getFormattedMessage
      if (m != null && m.contains("Failed to compile the generated Java code")) {
        count.incrementAndGet()
        firstMsg.compareAndSet(null, m.linesIterator.take(2).mkString(" | "))
      }
    }
  }

  /** Codegen compile errors observed since install (0 = every codegen'd
    * stage that attempted compilation succeeded).
    */
  def hits: Int = count.get()

  /** First matched message (truncated), for the failure report. */
  def firstHit: Option[String] = Option(firstMsg.get())

  /** Idempotent; safe to call before or after SparkSession creation. The
    * appender is registered on the ROOT logger config at ERROR level, so it
    * sees the CodeGenerator error regardless of which category logged it —
    * and `setLogLevel("ERROR")` in tests cannot filter it out.
    */
  def install(): Unit = synchronized {
    if (!installed) {
      LogManager.getContext(false) match {
        case ctx: LoggerContext =>
          val trap = new Trap
          trap.start()
          ctx.getConfiguration.getRootLogger.addAppender(trap, Level.ERROR, null)
          ctx.updateLoggers()
          installed = true
        case _ => // non-core logging backend: tripwire unavailable, not fatal
      }
    }
  }
}
