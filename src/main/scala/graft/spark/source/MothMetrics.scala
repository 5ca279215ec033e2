package graft.spark.source

import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}

/** DSv2 custom metrics — the engine's memory/IO observables surfaced into
  * the Spark UI (SQL tab, per write/scan node):
  *
  *  - `mothRetainedPeak`: high-water mark of encoder retained bytes per
  *    task (the reference's GetRetainedBytes; stripe/dictionary budget
  *    pressure). Aggregated as MAX — the number an executor-memory budget
  *    has to survive.
  *  - `mothBytesWritten`: encoded file bytes out (sum).
  *  - `mothBytesRead`: bytes actually fetched by the ranged reader (sum) —
  *    shows projection/pruning IO savings vs file size.
  */
case class MothTaskMetric(name: String, value: Long) extends CustomTaskMetric

class MothRetainedPeakMetric extends CustomMetric {
  override def name(): String = "mothRetainedPeak"
  override def description(): String = "peak encoder retained bytes (max over tasks)"
  override def aggregateTaskMetrics(taskMetrics: Array[Long]): String =
    if (taskMetrics.isEmpty) "0" else taskMetrics.max.toString
}

class MothBytesWrittenMetric extends CustomSumMetric {
  override def name(): String = "mothBytesWritten"
  override def description(): String = "moth bytes encoded (flushed + buffered)"
}

class MothBytesReadMetric extends CustomSumMetric {
  override def name(): String = "mothBytesRead"
  override def description(): String = "moth file bytes fetched (ranged reads)"
}
