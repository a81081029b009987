package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Format-sniffing ingest router — the reference's ETL takes arbitrary
  * tabular data drops (catalog workbooks, exports, archives;
  * `/root/reference/README.md:122-127`), and a real drop directory
  * mixes formats. `AutoSource` sniffs each file's MAGIC BYTES (never
  * the extension — drops lie) and routes it to the matching zero-egress
  * reader: ZIP (`PK\x03\x04`) → [[XlsxSource]], Avro object container
  * (`Obj\x01`) → [[AvroSource]], `%PDF` / `<!`|`<h` (HTML page) →
  * flagged for [[DocExtract]]'s extractors, else delimited text →
  * Spark's CSV reader.
  *
  * Scale shape: sniffing reads 4 bytes per file from the `binaryFile`
  * listing (the m13 economics — inventory at header cost); each
  * format's files then load through that source's own distributed path.
  * The union surfaces everything as nullable strings tagged with
  * `_format` + `_path` lineage columns (typing is the caller's schema
  * contract, as with the CSV sources).
  */
object AutoSource {

  /** Magic-byte format tag for a file head. The HTML sniff matches the
    * full case-insensitive page openers (`<!doctype`, `<html`,
    * `<head`) — a 2-byte `<h`/`<!` test would silently route any
    * text/CSV file whose first cell is an XML fragment or templated
    * markup off the tabular path. */
  private[sources] def sniff(head: Array[Byte]): String = {
    def at(i: Int): Int = if (i < head.length) head(i) & 0xFF else -1
    val prefix = new String(head.take(9),
      java.nio.charset.StandardCharsets.ISO_8859_1).toLowerCase
    if (at(0) == 'P' && at(1) == 'K' && at(2) == 0x03 && at(3) == 0x04) "xlsx"
    else if (at(0) == 'O' && at(1) == 'b' && at(2) == 'j' && at(3) == 0x01) "avro"
    else if (at(0) == '%' && at(1) == 'P' && at(2) == 'D' && at(3) == 'F') "pdf"
    else if (prefix.startsWith("<!doctype") || prefix.startsWith("<html") ||
      prefix.startsWith("<head")) "html"
    else "csv"
  }

  /** (path, format) for every file under `path` — 4 sniffed bytes per
    * file, the magic comparison itself a codegen'd hex-prefix
    * expression (no UDF), computed distributed over the binaryFile
    * listing. */
  def inventory(spark: SparkSession, path: String): DataFrame = {
    val h = hex(expr("substring(content, 1, 4)"))
    // same 9-byte case-insensitive page-opener test as sniff(): the
    // binary magics are checked first, so a non-UTF-8 head never
    // reaches the string comparison with meaningful bytes
    val p9 = lower(expr("cast(substring(content, 1, 9) as string)"))
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("length"),
        when(h === "504B0304", "xlsx")
          .when(h === "4F626A01", "avro")
          .when(h === "25504446", "pdf")
          .when(p9.startsWith("<!doctype") || p9.startsWith("<html") ||
            p9.startsWith("<head"), "html")
          .otherwise("csv").as("format"))
  }

  /** Read every TABULAR file under `path` (xlsx/avro/csv by magic) as
    * one all-string frame tagged with `_format`; headered CSV and XLSX
    * drop their header rows per file, Avro keeps its own schema's
    * column names. Files must share column names for the union
    * (unionByName, missing columns null-filled). PDFs and other
    * non-tabular formats are SKIPPED — extraction is [[DocExtract]]'s
    * job, not a silent cast. */
  def readTabular(spark: SparkSession, path: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val inv = inventory(spark, path)
      .select("path", "format").collect() // file list: driver-sized metadata
      .groupBy(_.getString(1)).map { case (f, rows) => f -> rows.map(_.getString(0)).toSeq }
    val parts = Seq.newBuilder[DataFrame]
    inv.getOrElse("xlsx", Nil) match {
      case Nil =>
      case files => parts += files.map(f => XlsxSource.read(spark, f))
        .reduce(_.unionByName(_, allowMissingColumns = true))
        .withColumn("_format", lit("xlsx"))
    }
    inv.getOrElse("avro", Nil) match {
      case Nil =>
      case files =>
        parts += files.map { f =>
          val df = AvroSource.read(spark, f)
          df.select(df.columns.map(c => col(c).cast("string").as(c)): _*)
        }.reduce(_.unionByName(_, allowMissingColumns = true))
          .withColumn("_format", lit("avro"))
    }
    inv.getOrElse("csv", Nil) match {
      case Nil =>
      case files => parts += spark.read.option("header", "true")
        .csv(files: _*).withColumn("_format", lit("csv"))
    }
    val frames = parts.result()
    require(frames.nonEmpty, s"no tabular files under $path")
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
