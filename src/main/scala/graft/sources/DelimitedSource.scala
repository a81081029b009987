package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Unified delimited-file source (SURVEY.md §2.1 S2 + the
  * planned-but-unimplemented Excel sources, `README.md:122-127`):
  * the reference's parity targets `Abfall_ABC.xlsx` / `AVV_Katalog.xlsx`
  * arrive as CSV exports in a zero-egress deployment (no Excel reader in
  * the jar set), which in practice means semicolon-delimited,
  * possibly-gzipped files with quoted multiline cells — all one reader
  * shape with different options.
  *
  * Everything stays on the built-in csv source: predicate pushdown and
  * column pruning apply, and compressed inputs split per-file (gzip is
  * not splittable — at 100 TB prefer many medium files over few huge
  * ones, or re-encode to parquet at the edge).
  */
object DelimitedSource {

  /** RFC-4180-ish CSV with embedded-newline cells (the Abfall-ABC
    * shape, `waste_items.py:251-281`). */
  def csv(spark: SparkSession, path: String): DataFrame =
    read(spark, path, ",")

  /** Semicolon-delimited — the default German-locale Excel CSV export. */
  def excelExport(spark: SparkSession, path: String): DataFrame =
    read(spark, path, ";")

  /** Tab-separated. */
  def tsv(spark: SparkSession, path: String): DataFrame =
    read(spark, path, "\t")

  /** One reader, delimiter-parameterized. Compressed files (.gz etc.)
    * are handled transparently by the source. */
  def read(spark: SparkSession, path: String, delimiter: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .option("sep", delimiter)
      .option("encoding", "UTF-8")
      .csv(path)
}
