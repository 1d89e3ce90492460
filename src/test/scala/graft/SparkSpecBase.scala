package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one backend JVM-wide via getOrCreate). */
trait SparkSpecBase extends AnyFunSuite {
  // Same engine defaults as production sessions (UTC, AQE, parquet conf,
  // NTZ inference off) so specs see the exact logical schemas the driver's
  // Verify/Bench runs see — only master/shuffle sizing is test-sized.
  lazy val spark: SparkSession = graft.core.SparkSessionFactory.applyEngineDefaults(
    SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
  ).getOrCreate()

  val Sf0001 = "/root/testdata/sf0.001"
}
