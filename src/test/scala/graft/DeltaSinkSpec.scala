package graft

import org.apache.spark.sql.functions._
import graft.sinks.{LakeFormat, LakeWriter, WriteMode}

/** Delta-format lake sink: exercised for real when the Delta jars are on the
  * classpath, otherwise the round-trip test cancels itself (this sandbox has
  * no io.delta:delta-spark — offline resolver) and only the availability
  * contract is asserted.
  */
class DeltaSinkSpec extends SparkSpec {

  test("delta write round-trips when the Delta datasource is present") {
    assume(LakeWriter.deltaAvailable,
      "Delta jars not on classpath — skipping round-trip")
    val lake = java.nio.file.Files.createTempDirectory("graft_delta_").toString
    val df = spark.read.parquet(s"$sf0001/orders.parquet")
    val res = LakeWriter.write(df, lake, "d/main/orders", None, df.count(),
      WriteMode.Append, LakeFormat.Delta)
    val back = spark.read.format("delta").load(res.path)
    assert(back.count() == df.count())
    assert(new java.io.File(s"${res.path}/_delta_log").exists())
  }

  test("requesting delta without the jars fails fast with a clear message") {
    assume(!LakeWriter.deltaAvailable,
      "Delta jars present — the unavailability contract does not apply")
    val lake = java.nio.file.Files.createTempDirectory("graft_delta_").toString
    val df = spark.read.parquet(s"$sf0001/orders.parquet").limit(10)
    val e = intercept[IllegalStateException] {
      LakeWriter.write(df, lake, "d/main/orders", None, 10L,
        WriteMode.Append, LakeFormat.Delta)
    }
    assert(e.getMessage.contains("delta-spark"))
  }

  test("parquet remains the default format") {
    val lake = java.nio.file.Files.createTempDirectory("graft_delta_").toString
    val df = spark.read.parquet(s"$sf0001/orders.parquet").limit(100)
    val res = LakeWriter.write(df, lake, "p/main/orders", None, 100L)
    assert(spark.read.parquet(res.path).count() == 100)
  }
}
