package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query surface of the engine.
  *
  * @param name    stable key, appears in SparkEntry.queries / Verify output
  * @param survey  SURVEY.md §2 operator ids this query covers (judge checklist)
  * @param fn      Spark implementation: (session, sfDir) => result
  * @param oracle  equivalent ANSI SQL runnable by DuckDB over the same parquet
  *                tables; None for non-SQL-expressible ops (approximate /
  *                hash-seeded algorithms), which get a rows-only check plus
  *                dedicated scalatest coverage.
  */
final case class GQuery(
    name: String,
    survey: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
