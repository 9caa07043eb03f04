package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Robust semi-structured ingest — the EXTRACT side of the reference
  * pipelines (scraped news JSON, downloaded report CSV), minus the
  * network I/O itself. Real feeds contain malformed rows; the load
  * must quarantine them, not fail the pipeline or silently drop them
  * (reference: the try/except-per-record loops in
  * airflow/dags/iqplus/Ekstrak_Berita_Emiten.py and the IDX download
  * DAG, re-expressed as one declarative permissive read).
  */
object Ingest {

  /** good = schema-conforming rows; quarantined = the raw text of
    * every malformed row, for replay/inspection.
    *
    * Cache ownership: both frames read one shared cached parse (see
    * [[Ingest.split]]). The CALLER owns that cache — call
    * [[IngestResult.unpersist]] once both frames are consumed (written
    * / counted), or the parse stays pinned for the session's lifetime.
    */
  final case class IngestResult(good: DataFrame, quarantined: DataFrame,
                                private val cachedParse: DataFrame) {
    /** Release the shared cached parse backing `good`/`quarantined`.
      * Lazy re-use of either frame afterwards recomputes the parse.
      */
    def unpersist(): Unit = { cachedParse.unpersist(); () }

    /** True while the shared parse is pinned — THIS result's cache
      * lifecycle, observable without asserting on the session-global
      * cache manager (which other concurrently-running work shares).
      */
    def parseCached: Boolean =
      cachedParse.storageLevel != org.apache.spark.storage.StorageLevel.NONE
  }

  private def split(raw: DataFrame): IngestResult = {
    // Spark computes the corrupt-record column only when the SAME
    // materialization carries both it and the data columns — filtering
    // an uncached frame on _corrupt_record alone is unsupported
    // (AnalysisException) precisely because it would need a second
    // parse. Cache once, split twice; the caller releases via
    // IngestResult.unpersist.
    val cached = raw.cache()
    IngestResult(
      good = cached.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      quarantined = cached.filter(col("_corrupt_record").isNotNull)
        .select(col("_corrupt_record").as("raw")),
      cachedParse = cached)
  }

  /** Publication-date enrichment for the documents/news surface,
    * applied at INGEST so every downstream consumer (e.g. the
    * news-search date ordering, [[graft.operators.ApiSurface.search]])
    * reads a real `published` column rather than deriving a date
    * inline. A real feed supplies this from its payload (the reference
    * sorts news by `metadata.original_date`, api/app.py:151-153); the
    * driver-generated documents testdata carries no date column and is
    * read-only, so this stand-in derives a deterministic date from
    * doc_id (fixed affine map into one calendar year). Swapping in a
    * real feed timestamp is a one-line change HERE — downstream code
    * is already column-based.
    */
  def withPublishedDate(docs: DataFrame): DataFrame =
    docs.withColumn("published",
      date_format(
        date_add(to_date(lit("2024-01-01")),
          pmod(col("doc_id") * 37, lit(365)).cast("int")),
        "yyyy-MM-dd"))

  /** Permissive JSONL read against an EXPLICIT schema (schema
    * inference is a full extra pass over the data — never at 100 TB),
    * malformed lines captured instead of nulled-and-lost.
    */
  def jsonWithQuarantine(spark: SparkSession, path: String, schema: StructType): IngestResult =
    split(spark.read
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path))

  /** Permissive XML read with the same quarantine contract — the
    * extract side of the reference's IDX pipeline, which unzips
    * downloaded archives and parses one XBRL instance FILE per report
    * (reference: airflow/dags/idx/idx_extraction_script.py). Spark's
    * native XML source (4.x) splits files into one row per `rowTag`
    * element against the EXPLICIT schema (nested structs/arrays
    * allowed — the parsed rows feed the same downstream shaping as
    * the `kv_extract_nested` column path), and a malformed element
    * lands in the quarantine frame instead of failing the batch or
    * silently nulling — the same contract as the JSON/CSV readers.
    * Distributed like any file scan: one row-group of files per task,
    * no driver-side parsing.
    */
  def xmlWithQuarantine(spark: SparkSession, path: String, schema: StructType,
                        rowTag: String): IngestResult =
    split(spark.read
      .schema(schema.add("_corrupt_record", StringType))
      .option("rowTag", rowTag)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .xml(path))

  /** Distributed zip-archive entry extraction with the quarantine
    * contract — the reference's unpack step (it downloads
    * `<company>_instance.zip` and picks the instance XBRL out of the
    * archive before parsing, idx_extraction_script.py:234-272),
    * re-expressed Spark-first: archives arrive through the binaryFile
    * source (one archive per task row — the scan parallelizes across
    * archives, never the driver), each task inflates its archives
    * in-memory and keeps only entries matching `entryPattern`, and an
    * archive whose bytes yield no zip entries (corrupt, truncated,
    * not a zip) lands in the quarantine frame as `archive: reason`
    * instead of failing the batch. Per-archive memory is the inflated
    * entry size — the per-company report scale the reference handles;
    * a multi-GB archive belongs on a dedicated unpack path, not here.
    *
    * good = (archive, entry, content: binary); quarantined = raw
    * reason strings. Caller owns the shared cache (IngestResult
    * contract).
    */
  def zipEntriesWithQuarantine(spark: SparkSession, path: String,
                               entryPattern: String = "(?i).*instance.*\\.(xbrl|xml)$"): IngestResult = {
    import spark.implicits._
    val pattern = entryPattern
    val parsed = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val re = java.util.regex.Pattern.compile(pattern)
        it.flatMap { case (archive, bytes) =>
          try {
            val zin = new java.util.zip.ZipInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(String, String, Array[Byte], String)]
            var sawEntry = false
            var e = zin.getNextEntry
            while (e != null) {
              sawEntry = true
              if (!e.isDirectory && re.matcher(e.getName).matches())
                out += ((archive, e.getName, zin.readAllBytes(), null))
              e = zin.getNextEntry
            }
            if (!sawEntry)
              Seq((archive, null, null, "no zip entries (corrupt or not a zip)"))
            else out.toSeq
          } catch { case ex: Exception =>
            Seq((archive, null, null,
              s"${ex.getClass.getSimpleName}: ${Option(ex.getMessage).getOrElse("")}"))
          }
        }
      }.toDF("archive", "entry", "content", "_zip_error")
    val cached = parsed.cache()
    IngestResult(
      good = cached.filter(col("_zip_error").isNull).drop("_zip_error"),
      quarantined = cached.filter(col("_zip_error").isNotNull)
        .select(concat_ws(": ", col("archive"), col("_zip_error")).as("raw")),
      cachedParse = cached)
  }

  /** Parse extracted single-document XML entries (one XBRL instance
    * per entry — [[zipEntriesWithQuarantine]]'s output) against an
    * explicit schema: `from_xml` in PERMISSIVE mode, so a malformed
    * entry yields a row whose `_corrupt_record` field inside `doc`
    * carries the raw text — the same quarantine-not-fail contract as
    * the file readers, without materializing entries to disk first.
    */
  def parseXmlEntries(entries: DataFrame, schema: StructType): DataFrame = {
    val opts = new java.util.HashMap[String, String]
    opts.put("mode", "PERMISSIVE")
    opts.put("columnNameOfCorruptRecord", "_corrupt_record")
    entries.select(col("archive"), col("entry"),
      from_xml(col("content").cast("string"),
        schema.add("_corrupt_record", StringType), opts).as("doc"))
  }

  /** Permissive CSV read with the same quarantine contract. */
  def csvWithQuarantine(spark: SparkSession, path: String, schema: StructType,
                        header: Boolean = true, sep: String = ","): IngestResult =
    split(spark.read
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("header", header.toString)
      .option("sep", sep)
      .csv(path))
}
