package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-schema DDL registry (SURVEY.md §1.3, §2.1 S3).
  *
  * The reference applies `schema.cql` by line-parsing `CREATE …`
  * statements and executing each idempotently with already-exists
  * tolerance (`init_db.py:23-66`). Spark has no enforced constraints, so
  * here the same DDL parses into a typed registry whose uniqueness rules
  * run as load-time validation aggregates and whose indexes become
  * physical-layout hints (partition/bucket columns at scale).
  */
object SchemaRegistry {

  sealed trait Rule { def name: String; def label: String; def property: String }
  final case class UniqueConstraint(name: String, label: String, property: String) extends Rule
  final case class Index(name: String, label: String, property: String) extends Rule

  // `IF NOT EXISTS` is optional (Neo4j's grammar; the reference's
  // schema.cql always writes it, init_db tolerates already-exists)
  private val constraintRe =
    """(?i)CREATE\s+CONSTRAINT\s+(\w+)\s+(?:IF\s+NOT\s+EXISTS\s+)?FOR\s+\(\s*\w+\s*:\s*(\w+)\s*\)\s+REQUIRE\s+\w+\.(\w+)\s+IS\s+UNIQUE""".r
  private val indexRe =
    """(?i)CREATE\s+INDEX\s+(\w+)\s+(?:IF\s+NOT\s+EXISTS\s+)?FOR\s+\(\s*\w+\s*:\s*(\w+)\s*\)\s+ON\s+\(\s*\w+\.(\w+)\s*\)""".r

  /** Parse CQL-style DDL text: strip `//` comments and blank lines, keep
    * CREATE statements, classify constraint vs index. Unparseable CREATE
    * statements are returned in `_2` (the reference logs-and-continues).
    */
  def parse(ddl: String): (Seq[Rule], Seq[String]) = {
    val statements = ddl.linesIterator
      .map(l => l.indexOf("//") match { case -1 => l; case i => l.substring(0, i) })
      .mkString("\n")
      .split(";")
      .map(_.trim.replaceAll("\\s+", " "))
      .filter(s => s.toUpperCase.startsWith("CREATE "))
      .toSeq
    val parsed = statements.map { s =>
      constraintRe.findFirstMatchIn(s).map(m => Right(UniqueConstraint(m.group(1), m.group(2), m.group(3))))
        .orElse(indexRe.findFirstMatchIn(s).map(m => Right(Index(m.group(1), m.group(2), m.group(3)))))
        .getOrElse(Left(s))
    }
    (parsed.collect { case Right(r) => r }, parsed.collect { case Left(s) => s })
  }

  /** Apply is idempotent by construction: the registry is a set. */
  def apply(ddl: String): Seq[Rule] = parse(ddl)._1.distinct

  /** The engine's built-in ontology schema (v4.0 shape —
    * `src/main/resources/graft-schema.cql`; 13 uniqueness constraints +
    * 5 indexes, the BASELINE.md inventory). */
  lazy val builtin: Seq[Rule] = {
    val in = getClass.getResourceAsStream("/graft-schema.cql")
    val text = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    apply(text)
  }

  /** Run every uniqueness constraint against a node table → one row per
    * constraint: (constraint, label, property, total, distinct_vals, ok).
    * Nodes missing the property (null) are ignored, matching Neo4j
    * semantics (constraints only bind non-null values).
    */
  def validate(rules: Seq[Rule], nodes: DataFrame): DataFrame = {
    val checks = rules.collect { case UniqueConstraint(name, label, prop) =>
      nodes.filter(col("label") === label && col(prop).isNotNull)
        .agg(count(lit(1)).as("total"), countDistinct(col(prop)).as("distinct_vals"))
        .select(lit(name).as("constraint"), lit(label).as("label"), lit(prop).as("property"),
          col("total"), col("distinct_vals"), (col("total") === col("distinct_vals")).as("ok"))
    }
    checks.reduceOption(_ unionByName _).getOrElse {
      // no uniqueness constraints in the rule set → empty result with
      // the same schema (reduce on empty would throw)
      nodes.sparkSession.emptyDataFrame
        .withColumn("constraint", lit("")).withColumn("label", lit(""))
        .withColumn("property", lit("")).withColumn("total", lit(0L))
        .withColumn("distinct_vals", lit(0L)).withColumn("ok", lit(true))
    }
  }
}
