package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Source/sink layer (SURVEY.md §2.1 S1-S7).
  *
  * Scan-level concerns live here so pipelines stay declarative:
  *  - S1 `csv`: comma CSV, header + schema inference;
  *  - S2 `tsvWithFooter`: tab-separated SQL-Server `.rpt`-style export
  *    whose trailing "(N rows affected)" footer the reference deletes
  *    by hand (`/root/reference/clean_encounterids.py:17-19`) — here
  *    DROPMALFORMED absorbs it: footer lines have the wrong token
  *    count and are dropped at parse time, no manual editing;
  *  - S3 `dimensionCsv` / `dimensionXlsx`: small lookup workbooks,
  *    either pre-converted to CSV or read directly from `.xlsx` (JDK
  *    zip + StAX, no library dependency — see [[Xlsx]]), always
  *    broadcast-sized;
  *  - S4 `xml`: Spark 4's built-in XML source (`rowTag`), replacing the
  *    reference's ElementTree parser (`parse_ICNARC_xml.py:22-64`);
  *  - S5/S6 sinks: parquet is the engine default (splittable, columnar,
  *    statistics for pushdown); CSV kept for reference parity.
  * JDBC (S7) is `spark.read.jdbc` — nothing to wrap.
  */
object Readers {

  /** S1: comma CSV with header + inferred schema. */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S2: tab-separated export with possible non-tabular footer garbage.
    * Read with an all-string schema derived from the header line (a
    * driver-side metadata peek, not a data scan) + DROPMALFORMED so
    * short footer rows vanish; then cast the declared timestamp
    * columns with a pinned format (SURVEY §7.4#3 — never inference). */
  def tsvWithFooter(spark: SparkSession, path: String, dateCols: Seq[String],
                    fmt: String = "yyyy-MM-dd HH:mm:ss"): DataFrame = {
    val header = spark.read.text(path).first().getString(0)
    val schema = StructType(header.split("\t").map(c =>
      StructField(c, StringType, nullable = true)))
    val raw = spark.read
      .option("header", "true").option("sep", "\t").option("mode", "DROPMALFORMED")
      .schema(schema)
      .csv(path)
    dateCols.foldLeft(raw)((df, c) => df.withColumn(c, to_timestamp(col(c), fmt)))
  }

  /** S3: dimension-table CSV (converted from xlsx at ingest). Small by
    * contract — callers broadcast it into joins. */
  def dimensionCsv(spark: SparkSession, path: String): DataFrame =
    csv(spark, path)

  /** S3: direct sheet-addressed `.xlsx` ingest (the reference's
    * `pd.read_excel(…, sheet_name=…)` — `clean_encounterids.py:40,67`,
    * `parse_ICNARC_xml.py:53`). Same broadcast-sized dimension contract
    * and the same schema a pre-converted CSV would get; see [[Xlsx]]. */
  def dimensionXlsx(spark: SparkSession, path: String, sheet: String): DataFrame =
    Xlsx.readSheet(spark, path, sheet)

  /** S4: XML scan via the built-in Spark 4 source. One row per
    * `rowTag` element; absent child elements → null columns (the
    * reference's NaN-for-missing contract, `parse_ICNARC_xml.py:15-16`).
    * Schema inference is off — CMP values are "all stored as strings"
    * (`parse_ICNARC_xml.py:8-9`) and inference would mangle time-only
    * fields into timestamps anchored at the read date. */
  def xml(spark: SparkSession, path: String, rowTag: String): DataFrame =
    spark.read.format("xml")
      .option("rowTag", rowTag).option("inferSchema", "false")
      .load(path)

  /** §1.3 metadata-driven rename: map opaque source codes to readable
    * names using a (code, description) dictionary. The dictionary is
    * dimension-scale by definition, so collecting it to the driver to
    * drive the projection is correct — the *data* never moves. */
  def renameByDictionary(df: DataFrame, dictionary: DataFrame,
                         codeCol: String = "CODE",
                         descCol: String = "Description"): DataFrame = {
    val mapping = dictionary.select(col(codeCol), col(descCol))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    df.columns.foldLeft(df)((d, c) =>
      mapping.get(c).map(d.withColumnRenamed(c, _)).getOrElse(d))
  }

  /** S4/§7.3: EAV long→wide pivot with an EXPLICIT code list (the
    * reference's 205-column CMP table): supplying the pivot values from
    * the data dictionary keeps this a single pass — Spark never runs
    * the extra distinct-values discovery job, and the output schema is
    * stable regardless of which codes happen to appear in a batch.
    * `min(value)` (not `first`) so the wide cell is deterministic if a
    * (entity, code) pair ever duplicates. */
  def pivotEav(df: DataFrame, entityCol: String, codeCol: String,
               valueCol: String, codes: Seq[String]): DataFrame =
    df.groupBy(col(entityCol))
      .pivot(codeCol, codes)
      .agg(min(col(valueCol)))

  /** S5/S6: engine-default sink (splittable columnar checkpoint). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** S5: CSV sink for reference-parity exports. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** JSONL (line-delimited JSON) sink — the interchange format of
    * training-data pipelines. Splittable: one JSON document per line. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JSONL source with a CALLER-SUPPLIED schema — same no-inference
    * policy as [[xml]]: schema inference samples the data, so two runs
    * over different partitions could disagree on types. */
  def jsonl(spark: SparkSession, path: String,
            schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC round-trip (columnar alternative to parquet; same pushdown and
    * pruning behavior through the DSv2 scan). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S7: partitioned JDBC read — the shape that matters at scale: the
    * table splits into `numPartitions` range queries on `partitionCol`
    * (each executor pulls its own slice concurrently), never one giant
    * single-connection result set. Bounds come from the caller (or a
    * cheap min/max probe); rows outside them are still read — bounds
    * control the split, not a filter. */
  def jdbc(spark: SparkSession, url: String, table: String,
           partitionCol: String, lower: Long, upper: Long, numPartitions: Int,
           props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props)

  /** S7 sink: full-table JDBC write (overwrite = drop-and-recreate). */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: java.util.Properties = new java.util.Properties): Unit =
    df.write.mode("overwrite").jdbc(url, table, props)
}
