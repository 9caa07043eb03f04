package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import graft.sources.Ingest

class IngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("title", StringType),
    StructField("score", DoubleType)))

  test("json ingest quarantines malformed lines and keeps conforming rows") {
    val dir = Files.createTempDirectory("graft_json").toString
    Files.write(java.nio.file.Paths.get(dir, "feed.jsonl"), java.util.Arrays.asList(
      """{"id": 1, "title": "ok one", "score": 0.5}""",
      """{"id": 2, "title": "ok two", "score": 1.5}""",
      """{"id": 3, "title": "broken""",             // truncated JSON
      """not json at all"""))
    val r = Ingest.jsonWithQuarantine(spark, dir, schema)
    val good = r.good.collect().map(_.getAs[Long]("id")).toSet
    assert(good === Set(1L, 2L))
    val bad = r.quarantined.collect().map(_.getAs[String]("raw")).toSet
    assert(bad.size === 2)
    assert(bad.exists(_.contains("broken")))
    assert(bad.contains("not json at all"))
    // the caller owns the shared parse cache: releasing it must leave
    // no pinned storage behind. Assert THIS result's entry, not the
    // session-global cache manager — suites run concurrently in one
    // session, so a global isEmpty races other suites' caches
    assert(r.parseCached, "ingest should pin the shared parse until released")
    r.unpersist()
    assert(!r.parseCached, "ingest left a pinned cache after unpersist()")
  }

  test("schema-drifted table reads merged, normalize fills the old files' gap") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_drift").toString
    // v1 files: (id, value); v2 files add a quality column
    Seq((1L, 10.0)).toDF("id", "value")
      .write.parquet(s"$dir/batch=1")
    Seq((2L, 20.0, 0.9)).toDF("id", "value", "quality")
      .write.parquet(s"$dir/batch=2")
    val merged = graft.sources.Sinks.readMerged(spark, dir)
    assert(merged.columns.contains("quality"))
    val normalized = graft.operators.Rollups.normalize(merged, Seq("value", "quality"))
    val byId = normalized.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("quality")).toMap
    assert(byId(1L) === 0.0) // old file: filled
    assert(byId(2L) === 0.9) // new file: preserved
  }

  test("xml file ingest parses nested facts and quarantines malformed elements") {
    val dir = Files.createTempDirectory("graft_xml").toString
    // XBRL-ish instance files: one <report> per filing, nested facts
    Files.write(java.nio.file.Paths.get(dir, "filing1.xml"), java.util.Arrays.asList(
      "<filings>",
      "<report><entity>AAAA</entity><period>2024-Q1</period>",
      "<facts><revenue>1000</revenue><assets>5000</assets></facts></report>",
      "<report><entity>BBBB</entity><period>2024-Q1</period>",
      "<facts><revenue>2000</revenue><assets>7500</assets></facts></report>",
      "</filings>"))
    Files.write(java.nio.file.Paths.get(dir, "filing2.xml"), java.util.Arrays.asList(
      "<filings>",
      "<report><entity>CCCC</entity><period>2024-Q2</period>",
      "<facts><revenue>not-a-number</revenue><assets>100</assets></facts></report>",
      "</filings>"))
    val schema = StructType(Seq(
      StructField("entity", StringType),
      StructField("period", StringType),
      StructField("facts", StructType(Seq(
        StructField("revenue", LongType),
        StructField("assets", LongType))))))
    val r = Ingest.xmlWithQuarantine(spark, dir, schema, rowTag = "report")
    val good = r.good.collect()
      .map(x => x.getAs[String]("entity") ->
        x.getAs[org.apache.spark.sql.Row]("facts").getAs[Long]("revenue")).toMap
    assert(good === Map("AAAA" -> 1000L, "BBBB" -> 2000L))
    // the malformed element is quarantined with its raw text, the
    // batch survives, and nothing is silently nulled into `good`
    val bad = r.quarantined.collect().map(_.getAs[String]("raw"))
    assert(bad.length === 1 && bad.head.contains("not-a-number"))
    r.unpersist()
  }

  test("zip ingest extracts matching entries, quarantines corrupt archives") {
    val dir = Files.createTempDirectory("graft_zip").toString
    // a well-formed archive: one matching instance XML + one other entry
    def writeZip(name: String, entries: (String, String)*): Unit = {
      val zos = new java.util.zip.ZipOutputStream(
        new java.io.FileOutputStream(new java.io.File(dir, name)))
      entries.foreach { case (en, content) =>
        zos.putNextEntry(new java.util.zip.ZipEntry(en))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      zos.close()
    }
    writeZip("acme_instance.zip",
      "acme_instance.xbrl" -> "<facts><id>7</id><title>acme</title></facts>",
      "manifest.txt" -> "not an instance")
    writeZip("bogus_instance.zip",
      "bogus_instance.xbrl" -> "<facts><id>9</id><title>broken") // malformed XML, valid zip
    // a corrupt archive: not a zip at all
    Files.write(java.nio.file.Paths.get(dir, "corrupt_instance.zip"),
      Array.fill[Byte](64)(0x5A))
    val r = Ingest.zipEntriesWithQuarantine(spark, dir)
    val good = r.good.collect()
    assert(good.map(_.getAs[String]("entry")).toSet ===
      Set("acme_instance.xbrl", "bogus_instance.xbrl")) // manifest filtered out
    val bad = r.quarantined.collect().map(_.getAs[String]("raw"))
    assert(bad.length === 1 && bad.head.contains("corrupt_instance.zip"))
    // entry parse: permissive from_xml keeps the good doc, captures the bad
    val parsed = Ingest.parseXmlEntries(r.good, StructType(Seq(
      StructField("id", LongType), StructField("title", StringType))))
      .collect().map(row => row.getAs[String]("entry") ->
        row.getStruct(row.fieldIndex("doc"))).toMap
    val ok = parsed("acme_instance.xbrl")
    assert(ok.getAs[Long]("id") === 7L && ok.getAs[String]("title") === "acme")
    assert(ok.getAs[String]("_corrupt_record") == null)
    assert(parsed("bogus_instance.xbrl").getAs[String]("_corrupt_record") != null)
    r.unpersist()
    assert(!r.parseCached)
  }

  test("csv ingest quarantines type-mismatched rows") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.write(java.nio.file.Paths.get(dir, "feed.csv"), java.util.Arrays.asList(
      "id,title,score",
      "1,ok one,0.5",
      "oops,bad id,0.7",   // non-numeric id → quarantine
      "2,ok two,1.5"))
    val r = Ingest.csvWithQuarantine(spark, dir, schema)
    assert(r.good.collect().map(_.getAs[Long]("id")).toSet === Set(1L, 2L))
    val bad = r.quarantined.collect().map(_.getAs[String]("raw"))
    assert(bad.length === 1 && bad.head.startsWith("oops"))
  }

  test("ORC sink roundtrip: schema and values identical to parquet") {
    // format breadth: the same tables the parquet sinks handle write
    // and read back through Spark's built-in ORC source losslessly —
    // timestamps, decimals-from-doubles, strings, and partitioning all
    // survive, so a deployment standardized on ORC gets the identical
    // library behavior.
    import org.apache.spark.sql.functions._
    val src = graft.sources.Tables.orders(spark, sfDir)
      .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
    val dir = Files.createTempDirectory("graft_orc").toString
    src.write.mode("overwrite").partitionBy("month").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === src.count())
    // values identical (month re-derived as a partition string column)
    val a = src.select("o_orderkey", "o_totalprice", "o_orderdate", "month")
      .collect().map(_.toSeq.toList).sortBy(_.toString)
    val b = back.select("o_orderkey", "o_totalprice", "o_orderdate", "month")
      .collect().map(_.toSeq.toList).sortBy(_.toString)
    assert(a.toSeq === b.toSeq)
    // partition pruning works on the ORC layout too
    val probe = back.filter(col("month") === "1996-03")
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), s"no partition filter:\n$plan")
  }
}
