package graft.devtools

import java.nio.file.{Files, Paths}

/** Dev-only: write SparkEntry.oracleSql as oracle_sql.json (no Spark
  * session needed) so tools/check.py can verify a DumpOne subset
  * without paying for a full graft.Verify pass.
  * Usage: tools/run.sh graft.devtools.DumpOracles <outDir>
  */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(".")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
