package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM, `Test / fork`). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = graft.core.GraftSession.local(cores = 4, appName = "graft-test")
    s
  }
}
