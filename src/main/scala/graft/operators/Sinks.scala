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

  /** Graph export (reference `cypher_neo4j.py:8` Neo4j writer): node tables
    * per entity label + edge tables, as parquet — the bulk-import layout
    * every graph store ingests. Entity/edge DataFrames come from
    * `TreeWalk.entities` / `TreeWalk.relations` / `MtlParser`.
    */
  def graphExport(nodes: Map[String, DataFrame], edges: Map[String, DataFrame],
                  dir: String): Unit = {
    nodes.foreach { case (label, df) =>
      df.write.mode("overwrite").parquet(s"$dir/nodes_$label")
    }
    edges.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/edges_$name")
    }
  }

  /** Cypher MERGE statements for an edge table (src_id, dst_id, rel) — the
    * textual form the reference's Neo4j node emits, generated distributed as
    * a column (no driver loop); feed to any bolt client.
    */
  def cypherStatements(edges: DataFrame, srcLabel: String, dstLabel: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // A `props` column (array<struct<k,v>> from MtlParser relation
    // assertions) renders as SET clauses on the relationship — the
    // reference's RelationshipPropertyAssertion merge schema
    // (nft_nodes.py:834: MERGE ... SET r.{prop} = $value).
    if (edges.columns.contains("props"))
      edges.select(concat(
        lit(s"MERGE (a:$srcLabel {id: '"), col("src_id"),
        lit(s"'}) MERGE (b:$dstLabel {id: '"), col("dst_id"),
        lit("'}) MERGE (a)-[r:"), col("rel"), lit("]->(b)"),
        array_join(transform(col("props"),
          p => concat(lit(" SET r."), p.getField("k"),
            lit(" = '"), p.getField("v"), lit("'"))), ""),
        lit(";")).as("cypher"))
    else
      edges.select(concat(
        lit(s"MERGE (a:$srcLabel {id: '"), col("src_id"),
        lit(s"'}) MERGE (b:$dstLabel {id: '"), col("dst_id"),
        lit("'}) MERGE (a)-[:"), col("rel"), lit("]->(b);")).as("cypher"))
  }

  /** Partition-layout parquet write: one directory per value of the
    * partition columns. THE storage practice for big corpora — a reader
    * filtering on the partition key scans only matching directories
    * (partition pruning, asserted in PlanSpec), so `WHERE lang = 'en'`
    * over 100 TB touches only the English shard. Partition by LOW
    * cardinality columns only (each value is a directory).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: String = "overwrite"): Unit =
    df.write.partitionBy(partitionCols: _*).mode(mode).parquet(path)

  /** Generic JDBC writer (reference civis/mysql writer nodes:
    * `civis_nodes.py` ensure-table/SQL-execute, `node.py` MySQL inserts).
    * `mode="overwrite"` drops and recreates the table (the reference's
    * ensure-table-exists + replace flow). Round-trip correctness against an
    * embedded Derby is oracled by q_jdbc_roundtrip.
    */
  def jdbcWrite(df: DataFrame, url: String, table: String,
                options: Map[String, String] = Map.empty,
                mode: String = "append"): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options).mode(mode).save()
}
