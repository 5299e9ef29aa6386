package graft.operators

import org.apache.spark.sql.DataFrame

/** Sink nodes (reference `PrinterOfThings` node.py:1412, `BlackHole`
  * node.py:1705, recorder `metalpipe_recorder.py`).
  *
  * In Spark a "sink" is an action; everything upstream stays a lazy plan.
  */
object Sinks {

  /** Print up to `n` rows (reference PrinterOfThings). */
  def printer(df: DataFrame, n: Int = 20, truncate: Boolean = false): Unit =
    df.show(n, truncate)

  /** Consume fully without keeping anything (reference BlackHole) — forces
    * materialization of the whole plan; returns the row count it swallowed.
    */
  def blackHole(df: DataFrame): Long = df.count()

  /** Append-mode parquet event log (reference `metalpipe_recorder.py`):
    * every message that reaches the sink is durably recorded; re-runs append.
    */
  def recorder(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Streaming recorder: exactly-once append log for a stream (the
    * reference's recorder replays messages; checkpointed parquet append is
    * the durable cluster equivalent). Returns the started query.
    */
  def recorderStream(df: DataFrame, path: String, checkpoint: String) =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .start()

  /** Generic JDBC writer (reference civis/mysql writer nodes) — option
    * plumbing only; no database exists in the test environment.
    */
  def jdbcWrite(df: DataFrame, url: String, table: String,
                options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options).mode("append").save()
}
