package graft.sources

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Source/sink format coverage (§2.C "Scans — file formats"): the engine
  * reads/writes Parquet (primary), CSV and JSON lines via the stock readers,
  * and opaque payloads via the binaryFile source — the reference's files are
  * always opaque passthrough (SURVEY.md §2.C), so binary + metadata is the
  * faithful mapping.
  */
class FormatsSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft-formats").toString

  test("CSV round-trip preserves schema and values") {
    val src = Tables(spark, sf001, "nation")
    src.write.mode("overwrite").option("header", "true").csv(s"$tmp/nation_csv")
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$tmp/nation_csv")
    assert(back.count() == src.count())
    assert(back.columns.toSeq == src.columns.toSeq)
    val a = src.orderBy("n_nationkey").collect().map(_.toSeq)
    val b = back.orderBy("n_nationkey").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("JSON-lines round-trip preserves values") {
    val src = Tables(spark, sf001, "region")
    src.write.mode("overwrite").json(s"$tmp/region_json")
    val back = spark.read.json(s"$tmp/region_json").select(src.columns.toIndexedSeq.map(col): _*)
    assert(back.orderBy("r_regionkey").collect().map(_.toSeq)
      .sameElements(src.orderBy("r_regionkey").collect().map(_.toSeq)))
  }

  test("ORC round-trip preserves schema and values (with predicate pushdown)") {
    val src = Tables(spark, sf001, "customer")
    src.write.mode("overwrite").orc(s"$tmp/customer_orc")
    val back = spark.read.orc(s"$tmp/customer_orc")
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    val filtered = back.where(col("c_mktsegment") === "BUILDING")
    assert(filtered.count() ==
      src.where(col("c_mktsegment") === "BUILDING").count())
    // ORC scans support pushed filters like parquet — the plan must show them
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("c_mktsegment"), plan)
  }

  test("text source reads line-per-row and wholetext-per-file") {
    val docs = Tables(spark, sf001, "documents").limit(20)
    docs.select("text").write.mode("overwrite").text(s"$tmp/docs_text")
    val lines = spark.read.text(s"$tmp/docs_text")
    assert(lines.count() == 20)
    // wholetext: one row per file — the document-per-file corpus layout
    val whole = spark.read.option("wholetext", "true").text(s"$tmp/docs_text")
    assert(whole.count() < 20 && whole.agg(sum(length(col("value")))).head().getLong(0)
      >= lines.agg(sum(length(col("value")))).head().getLong(0))
  }

  test("malformed JSON rows land in the corrupt-record column, not as job failure") {
    // 100 TB ingestion meets bad records; PERMISSIVE + _corrupt_record is the
    // row-level quarantine (the A10/A13 tolerate-failures philosophy applied
    // to parsing): good rows parse, bad rows carry their raw line
    val dir = Files.createDirectory(java.nio.file.Paths.get(tmp, "dirty_json"))
    Files.writeString(dir.resolve("part.json"),
      """{"id": 1, "name": "ok"}
        |{"id": broken !!!
        |{"id": 3, "name": "also ok"}
        |""".stripMargin)
    val schema = "id LONG, name STRING, _corrupt_record STRING"
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString)
      .cache() // corrupt-record access requires a materialized parse
    assert(df.count() == 3)
    assert(df.where(col("_corrupt_record").isNull).count() == 2)
    val bad = df.where(col("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1 && bad.head.getAs[String]("_corrupt_record").contains("broken"))
    df.unpersist()
  }

  test("parquet writes round-trip under zstd, snappy, and gzip codecs") {
    val src = Tables(spark, sf001, "region")
    for ((codec, suffix) <- Seq("zstd" -> "zstd", "snappy" -> "snappy", "gzip" -> "gz")) {
      val path = s"$tmp/region_$codec"
      src.write.mode("overwrite").option("compression", codec).parquet(path)
      import scala.jdk.CollectionConverters._
      val files = Files.list(java.nio.file.Paths.get(path))
        .iterator().asScala.map(_.getFileName.toString).toList
      assert(files.exists(_.endsWith(s".$suffix.parquet")),
        s"$codec must appear in the part-file suffix: $files")
      val back = spark.read.parquet(path)
      assert(back.orderBy("r_regionkey").collect().map(_.toSeq)
        .sameElements(src.orderBy("r_regionkey").collect().map(_.toSeq)))
    }
  }

  test("binaryFile source reads opaque payloads with metadata") {
    val dir = Files.createDirectory(java.nio.file.Paths.get(tmp, "blobs"))
    Files.write(dir.resolve("a.bin"), "payload-a".getBytes)
    Files.write(dir.resolve("b.bin"), "payload-bb".getBytes)
    val df = spark.read.format("binaryFile").load(dir.toString)
    assert(df.columns.toSet == Set("path", "modificationTime", "length", "content"))
    val rows = df.select(col("path"), col("length"), col("content"))
      .collect().map(r => (r.getString(0).split('/').last, r.getLong(1),
        new String(r.getAs[Array[Byte]]("content")))).sortBy(_._1)
    assert(rows.toSeq == Seq(("a.bin", 9L, "payload-a"), ("b.bin", 10L, "payload-bb")))
  }

  test("binaryFile pathGlobFilter selects by suffix (the .d-dir analog)") {
    val dir = Files.createDirectory(java.nio.file.Paths.get(tmp, "mixed"))
    Files.write(dir.resolve("keep.d"), "x".getBytes)
    Files.write(dir.resolve("drop.txt"), "y".getBytes)
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.d").load(dir.toString)
    assert(df.count() == 1)
  }
}
