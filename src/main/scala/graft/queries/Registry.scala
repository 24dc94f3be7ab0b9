package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central registry of (query, oracle-SQL) pairs. A `null` oracle means the
  * driver records a weaker rows-only check (used for ops whose semantics
  * DuckDB cannot express). */
object Registry {
  type Entry = ((SparkSession, String) => DataFrame, String)

  def all: Map[String, Entry] =
    Relational.entries ++ Relational2.entries ++ Relational3.entries ++
      TextOps.entries ++ Sampling.entries ++ Pipeline.entries ++
      Dedup.entries ++ Similarity.entries ++ IndexAccel.entries ++
      TpcdsShapes.entries ++
      Multimodal.entries ++ graft.streaming.StreamingQueries.entries
}
