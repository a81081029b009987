package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the Deequ/dbt-tests shape a
  * 100 TB ingest runs BEFORE publishing a partition: each rule declares
  * what must hold, the checker plans the minimal passes, and the result
  * is one small (rule, target, n_bad, ok) report frame a gate or a
  * publish step can assert on.
  *
  * Pass budget (the scale contract): every ROW-level rule (not-null,
  * accepted-values, non-negative, custom predicate) folds into ONE
  * conditional-count aggregate over ONE scan regardless of rule count —
  * adding the 50th rule costs one more counter in the same map-side
  * fold, not another scan. Key-level rules add exactly the work their
  * semantics force: `unique` one groupBy on its key, `fk` one left-anti
  * join against the dimension (broadcast when dim-sized). Nothing
  * collects to the driver beyond the report rows themselves.
  */
object Expectations {

  private sealed trait Rule { def name: String; def target: String }
  private final case class RowRule(name: String, target: String,
                                   bad: Column) extends Rule
  private final case class UniqueRule(cols: Seq[String]) extends Rule {
    val name = "unique"; val target: String = cols.mkString(",")
  }
  private final case class FkRule(col: String, dim: DataFrame,
                                  dimKey: String, broadcastDim: Boolean) extends Rule {
    val name = "fk"; val target: String = col
  }

  final class Check private[Expectations] (df: DataFrame, rules: Seq[Rule]) {
    private def add(r: Rule) = new Check(df, rules :+ r)

    /** Column must never be null. */
    def notNull(c: String): Check =
      add(RowRule("not_null", c, col(c).isNull))

    /** Column values must come from `vals` (nulls are not violations —
      * pair with [[notNull]] if they should be). */
    def acceptedValues(c: String, vals: Seq[String]): Check =
      add(RowRule("accepted_values", c,
        col(c).isNotNull && !col(c).isin(vals: _*)))

    /** Numeric column must be ≥ 0 (nulls are not violations). */
    def nonNegative(c: String): Check =
      add(RowRule("non_negative", c, col(c).isNotNull && col(c) < 0))

    /** Arbitrary row predicate that must HOLD; rows where it is false
      * or null count as violations. */
    def satisfies(name: String, pred: Column): Check =
      add(RowRule(name, pred.toString.take(64), !coalesce(pred, lit(false))))

    /** The column tuple must be unique. `n_bad` = number of key groups
      * with more than one row (duplicated keys, not extra rows). */
    def unique(cols: String*): Check = add(UniqueRule(cols.toSeq))

    /** Every non-null value of `c` must exist in `dim[dimKey]`
      * (referential integrity). `n_bad` = count of orphan rows. */
    def referentialIntegrity(c: String, dim: DataFrame, dimKey: String,
                             broadcastDim: Boolean = true): Check =
      add(FkRule(c, dim, dimKey, broadcastDim))

    /** The report: one row per rule, ordered by (rule, target). */
    def run(): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val rowRules = rules.collect { case r: RowRule => r }
      val parts = Seq.newBuilder[DataFrame]
      if (rowRules.nonEmpty) {
        // one scan, one map-side-folded aggregate for ALL row rules
        val aggs = rowRules.zipWithIndex.map { case (r, i) =>
          sum(when(r.bad, 1L).otherwise(0L)).as(s"_r$i")
        }
        val row = df.agg(aggs.head, aggs.tail: _*)
        parts += row.select(explode(array(rowRules.zipWithIndex.map { case (r, i) =>
          struct(lit(r.name).as("rule"), lit(r.target).as("target"),
            coalesce(col(s"_r$i"), lit(0L)).as("n_bad"))
        }: _*)).as("v")).select("v.*")
      }
      rules.foreach {
        case u: UniqueRule =>
          parts += df.groupBy(u.cols.map(col): _*).agg(count(lit(1)).as("_c"))
            .filter(col("_c") > 1)
            .agg(count(lit(1)).as("n_bad"))
            .select(lit(u.name).as("rule"), lit(u.target).as("target"),
              coalesce(col("n_bad"), lit(0L)).as("n_bad"))
        case f: FkRule =>
          val dimKeys = f.dim.select(col(f.dimKey).as("_k")).distinct()
          val rhs = if (f.broadcastDim) broadcast(dimKeys) else dimKeys
          parts += df.filter(col(f.col).isNotNull)
            .join(rhs, col(f.col) === col("_k"), "left_anti")
            .agg(count(lit(1)).as("n_bad"))
            .select(lit(f.name).as("rule"), lit(f.target).as("target"),
              coalesce(col("n_bad"), lit(0L)).as("n_bad"))
        case _: RowRule => // folded above
      }
      parts.result().reduce(_ unionByName _)
        .withColumn("ok", col("n_bad") === 0L)
        .orderBy("rule", "target")
    }
  }

  def check(df: DataFrame): Check = new Check(df, Seq.empty)
}
