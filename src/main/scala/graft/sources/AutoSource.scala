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
  * Scale shape: sniffing reads a 256-byte head per file from the `binaryFile`
  * listing (the m13 economics — inventory at header cost); each
  * format's files then load through that source's own distributed path.
  * The union surfaces everything as nullable strings tagged with
  * `_format` + `_path` lineage columns (typing is the caller's schema
  * contract, as with the CSV sources).
  */
object AutoSource {

  /** The case-insensitive page openers the HTML sniff recognizes:
    * doctype, the structural tags, and an XHTML XML prolog. Full
    * multi-byte openers — a 2-byte `<h`/`<!` test would silently
    * route any text/CSV file whose first cell is an XML fragment or
    * templated markup off the tabular path. Leading comments are
    * STRIPPED before the test (a real page may open with a banner
    * comment; a CSV cell's `<!-- -->` fragment closes inside its cell
    * and leaves tabular bytes behind), so both route correctly. */
  private val PageOpeners =
    Seq("<!doctype", "<html", "<head", "<body", "<?xml")

  /** Leading `<!-- ... -->` comments + surrounding whitespace within
    * the sniff window (a comment still open at the window's end is
    * NOT stripped — the opener test then fails and the file stays on
    * the text/CSV path). */
  private val LeadingComments = "(?s)^(\\s*<!--.*?-->)*\\s*"

  /** Magic-byte format tag for a file head ([[SniffBytes]] bytes). */
  private[sources] def sniff(head: Array[Byte]): String = {
    def at(i: Int): Int = if (i < head.length) head(i) & 0xFF else -1
    val prefix = new String(head.take(SniffBytes),
      java.nio.charset.StandardCharsets.ISO_8859_1)
      .toLowerCase.replaceAll(LeadingComments, "")
    if (at(0) == 'P' && at(1) == 'K' && at(2) == 0x03 && at(3) == 0x04) "xlsx"
    else if (at(0) == 'O' && at(1) == 'b' && at(2) == 'j' && at(3) == 0x01) "avro"
    else if (at(0) == '%' && at(1) == 'P' && at(2) == 'D' && at(3) == 'F') "pdf"
    else if (PageOpeners.exists(prefix.startsWith)) "html"
    else "csv"
  }

  /** Sniff window: enough for the binary magics, any page opener, and
    * a short leading comment. */
  private val SniffBytes = 256

  /** (path, format) for every file under `path` — [[SniffBytes]]
    * sniffed bytes per file, the magic comparison itself a codegen'd
    * hex-prefix expression (no UDF), computed distributed over the
    * binaryFile listing. */
  def inventory(spark: SparkSession, path: String): DataFrame = {
    val h = hex(expr("substring(content, 1, 4)"))
    // same windowed case-insensitive page-opener test as sniff()
    // (leading comments stripped first): the binary magics are
    // checked first, so a non-UTF-8 head never reaches the string
    // comparison with meaningful bytes
    val p = regexp_replace(
      lower(expr(s"cast(substring(content, 1, $SniffBytes) as string)")),
      LeadingComments, "")
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("length"),
        when(h === "504B0304", "xlsx")
          .when(h === "4F626A01", "avro")
          .when(h === "25504446", "pdf")
          .when(PageOpeners.map(o => p.startsWith(o)).reduce(_ || _), "html")
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
