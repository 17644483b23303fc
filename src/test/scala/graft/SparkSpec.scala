package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** One SparkSession shared by every suite in the forked test JVM —
  * session startup dominates test wall time otherwise.
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = GraftSession.tuned(
        SparkSession.builder()
          .master("local[4]")
          .appName("graft-tests")
          .config("spark.ui.enabled", "false"),
        parallelism = 4)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = SparkSpec.spark
}
