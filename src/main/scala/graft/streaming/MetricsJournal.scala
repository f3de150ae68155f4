package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Durable per-batch metrics for Structured Streaming queries — the SS-side
  * twin of the fast engine's `lineageMetrics` jsonl
  * (`FastGraphState.scala`): every completed micro-batch appends one JSON
  * line (query, batch id, input rows, per-operator state rows / memory /
  * rocksdb-committed bytes, watermark, durations) to a journal file that
  * OUTLIVES the driver. Spark's own `lastProgress` dies with the session;
  * a 10^12-turn deployment needs the trail on disk next to the checkpoint
  * so restarts, regressions and state growth are diagnosable after the
  * fact — the metrics half of the north rule's "checkpoints carry
  * per-partition lineage and metrics". Attach/detach around a query; the
  * journal is plain jsonl, queryable by this engine itself. */
final class MetricsJournal(path: String) extends StreamingQueryListener {
  import StreamingQueryListener._

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    import scala.jdk.CollectionConverters._
    val states = p.stateOperators.toIndexedSeq.map { so =>
      val rocksWritten = Option(so.customMetrics.get("rocksdbTotalBytesWritten"))
        .map(_.longValue).getOrElse(0L)
      s"""{"op":"${esc(so.operatorName)}","rows":${so.numRowsTotal},""" +
        s""""updated":${so.numRowsUpdated},"memBytes":${so.memoryUsedBytes},""" +
        s""""rocksdbBytesWritten":$rocksWritten}"""
    }
    val wm = Option(p.eventTime.get("watermark")).map(w => s""""${esc(w)}"""").getOrElse("null")
    val duration = Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(-1L)
    val name = Option(p.name).getOrElse("")
    val line =
      s"""{"query":"${esc(name)}","id":"${p.id}","batchId":${p.batchId},""" +
        s""""inputRows":${p.numInputRows},"watermark":$wm,""" +
        s""""triggerMs":$duration,"state":[${states.mkString(",")}]}\n"""
    // listener callbacks are serialized per listener bus, but be defensive
    synchronized {
      Files.writeString(Paths.get(path), line,
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }
}

object MetricsJournal {
  /** Attaches a journal for the duration of `body` (stop your queries
    * inside it so their final progress lands before detach). */
  def journaled[T](spark: SparkSession, path: String)(body: => T): T = {
    val j = new MetricsJournal(path)
    spark.streams.addListener(j)
    try body
    finally spark.streams.removeListener(j)
  }
}
