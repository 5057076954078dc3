package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** T6 — graceful shutdown (SURVEY.md §2.9): stop streaming queries at a
  * MICRO-BATCH BOUNDARY, never mid-batch. The reference traps SIGINT and
  * finishes the block it is writing before exiting
  * (BlockchainToGraph.java:1235–1241, 381–385, 438–442); the Spark-native
  * form is a [[StreamingQueryListener]]: a stop request only raises a flag,
  * and the listener issues `query.stop()` from the progress callback — which
  * fires exactly when a micro-batch has COMMITTED (or the query reports
  * idle, i.e. nothing is in flight). Combined with checkpointing +
  * idempotent sinks ([[ChainStream.incrementalGold]]), a stopped query
  * resumes from the next un-committed batch with no duplicates.
  *
  * One instance manages any number of queries on a session; `installHook`
  * wires it to JVM shutdown (SIGINT/SIGTERM), where the hook BLOCKS shutdown
  * until the managed queries have drained their in-flight batch.
  */
final class Graceful(spark: SparkSession, awaitMs: Long = 30000L) {

  private val stopRequested = new AtomicBoolean(false)
  private val managed = ConcurrentHashMap.newKeySet[java.util.UUID]()

  private val listener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      managed.remove(e.id)
    // Fires after a micro-batch commits — the only safe stop point.
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      stopAtBoundary(e.progress.id)
    // Fires when the trigger ran with nothing to do — also a boundary.
    override def onQueryIdle(e: StreamingQueryListener.QueryIdleEvent): Unit =
      stopAtBoundary(e.id)
  }
  spark.streams.addListener(listener)

  private def stopAtBoundary(id: java.util.UUID): Unit =
    if (stopRequested.get && managed.contains(id))
      Option(spark.streams.get(id)).foreach(_.stop())

  /** Register a started query for boundary-stop management. */
  def manage(q: StreamingQuery): StreamingQuery = { managed.add(q.id); q }

  /** Request a stop: every managed query halts at its NEXT batch boundary.
    * Returns immediately; use [[awaitStopped]] to block on the drain.
    */
  def requestStop(): Unit = stopRequested.set(true)

  /** Block until every managed query has terminated (or the deadline). */
  def awaitStopped(timeoutMs: Long = awaitMs): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!managed.isEmpty && System.nanoTime() < deadline) Thread.sleep(25)
    managed.isEmpty
  }

  /** Wire to JVM shutdown: SIGINT/SIGTERM raises the flag and BLOCKS exit
    * until in-flight batches drain (the reference's finish-current-block).
    */
  def installHook(): this.type = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      requestStop(); awaitStopped(); ()
    }, "graft-graceful-stop"))
    this
  }

  /** Detach the listener (test hygiene). */
  def close(): Unit = spark.streams.removeListener(listener)
}
