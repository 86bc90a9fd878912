package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of SparkEntry queries plus their DuckDB oracles. */
trait QueryPack {
  def defs: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
