package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session keeps the
  * test run fast; suites must not mutate global state destructively). */
object EngineSuite {
  lazy val spark: SparkSession = graft.engine.GraftSession.local(cores = 8, shufflePartitions = 8)
  val sfDir = "/root/testdata/sf0.001"
}

abstract class EngineSuite extends AnyFunSuite {
  def spark: SparkSession = EngineSuite.spark
  def sfDir: String = EngineSuite.sfDir
}
