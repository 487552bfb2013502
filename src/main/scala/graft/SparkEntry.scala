package graft

import graft.queries.{CorpusOps, Dedup, Events, Extended, Graph, HnswAnn, Lakehouse, Linkage, Multimodal, Relational, Retrieval, Scd, Similarity, Spectral, Text, Tpch, TpchMore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The full operator inventory lives in the per-family query modules under
  * [[graft.queries]]; each GQuery carries the SURVEY.md §2 operator ids it
  * covers and (where SQL-expressible) its DuckDB oracle.
  */
object SparkEntry {

  /** Ordered registry of every verifiable query surface. */
  lazy val registry: Seq[GQuery] =
    Relational.queries ++ Extended.queries ++ Tpch.queries ++
      TpchMore.queries ++ Dedup.queries ++
      Similarity.queries ++ Text.queries ++ CorpusOps.queries ++
      Retrieval.queries ++ Events.queries ++ Multimodal.queries ++
      Graph.queries ++ HnswAnn.queries ++ Lakehouse.queries ++
      Linkage.queries ++ Spectral.queries ++ Scd.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * SURVEY.md §7.1's minimum slice: the reference's "conversions per hour"
    * dashboard series (grafana msconvert.json:77) over `events`.
    */
  def entry(spark: SparkSession): DataFrame = {
    // events.ts has shipped as TIMESTAMP(NANOS) and TIMESTAMP(MICROS, NTZ);
    // these runtime-settable confs make both readable as plain TimestampType
    // regardless of how the caller built the session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    Tables(spark, "/root/testdata/sf0.001", "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("converted"))
      .orderBy("hour")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (hash-seeded/approximate algorithms), which have scalatest coverage.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
