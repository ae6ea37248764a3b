package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.TableCatalog

/** File-source robustness: permissive (quarantine-column) reads of dirty
  * CSV / JSON-lines input. One malformed line must never abort an ingest —
  * it lands in `_corrupt_record` with the data columns null, and clean rows
  * parse unaffected.
  */
class SourcesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("price", DoubleType)))

  test("permissive CSV: clean rows parse, dirty rows quarantined") {
    val dir = Files.createTempDirectory("graft_csv_dirty_").toString
    Files.writeString(java.nio.file.Paths.get(dir, "part.csv"),
      """id,name,price
        |1,widget,9.99
        |2,gadget,not_a_number
        |3,gizmo,1.50
        |""".stripMargin)
    // cache first: Spark disallows filtering that references ONLY the
    // internal corrupt-record column of a lazy file scan
    val df = TableCatalog.loadCsvPermissive(spark, dir, schema).cache()
    try {
      val good = df.where(col(TableCatalog.CorruptRecordCol).isNull)
      val bad = df.where(col(TableCatalog.CorruptRecordCol).isNotNull)
      assert(good.count() == 2)
      assert(good.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
      assert(bad.count() == 1)
      val q = bad.head()
      assert(q.getAs[String](TableCatalog.CorruptRecordCol)
        .contains("not_a_number"))
      assert(q.isNullAt(q.fieldIndex("price")))
    } finally df.unpersist()
  }

  test("permissive JSON-lines: malformed lines quarantined verbatim") {
    val dir = Files.createTempDirectory("graft_json_dirty_").toString
    Files.writeString(java.nio.file.Paths.get(dir, "part.json"),
      """{"id": 1, "name": "widget", "price": 9.99}
        |{"id": 2, "name": "gadget", "price": }
        |not json at all
        |{"id": 3, "name": "gizmo", "price": 1.5}
        |""".stripMargin)
    val df = TableCatalog.loadJsonLinesPermissive(spark, dir, schema).cache()
    try {
      assert(df.where(col(TableCatalog.CorruptRecordCol).isNull).count() == 2)
      val bad = df.where(col(TableCatalog.CorruptRecordCol).isNotNull)
        .select(TableCatalog.CorruptRecordCol)
        .collect().map(_.getString(0))
      assert(bad.length == 2)
      assert(bad.exists(_.contains("not json at all")))
    } finally df.unpersist()
  }

  test("registerAll memoization re-registers when the sf dir changes") {
    val dirA = Files.createTempDirectory("graft_cat_a_").toString
    val dirB = Files.createTempDirectory("graft_cat_b_").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dirA/region.parquet")
    Seq((2L, "b")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dirB/region.parquet")
    val fromA = TableCatalog.sql(spark, dirA,
      "SELECT r_name FROM region").as[String].head()
    // second call with the SAME dir takes the memoized path
    TableCatalog.sql(spark, dirA, "SELECT r_name FROM region")
    // switching dirs must re-point the views, not reuse the memo
    val fromB = TableCatalog.sql(spark, dirB,
      "SELECT r_name FROM region").as[String].head()
    assert(fromA == "a" && fromB == "b")
  }

  test("strict schema-on-read still round-trips clean data (ORC)") {
    val dir = Files.createTempDirectory("graft_orc_rt_").toString
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    src.write.mode("overwrite").orc(dir)
    val back = TableCatalog.loadOrc(spark, dir, src.schema)
    assert(back.count() == src.count())
    assert(back.except(src).isEmpty && src.except(back).isEmpty)
  }

  test("events loader is schema-adaptive: NANOS and MICROS fixtures both load") {
    // Testdata drift zeroed the whole SQL path in round 5: the driver's
    // events.parquet switched physical type TIMESTAMP(NANOS) → MICROS and
    // the loader had the old type hardcoded. This pins BOTH generations in
    // one suite so either drift direction fails here, not at the gate.
    import spark.implicits._
    val base = java.time.LocalDateTime.of(2024, 3, 1, 12, 0, 0)
    val rows = (1L to 5L).map(i =>
      (i, base.plusSeconds(i), 100L + i, s"type_$i", i * 1.5, s"{}"))

    // MICROS fixture (what the current driver testdata stores): Spark's own
    // writer emits TIMESTAMP(MICROS) for timestamp_ntz
    val microsDir = Files.createTempDirectory("graft_ev_micros_").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$microsDir/events.parquet")

    // NANOS fixture (the previous generation): Spark cannot write
    // TIMESTAMP(NANOS), so build it with parquet-mr directly
    val nanosDir = Files.createTempDirectory("graft_ev_nanos_").toString
    val schemaStr =
      """message events {
        |  required int64 event_id;
        |  required int64 ts (TIMESTAMP(NANOS,false));
        |  required int64 user_id;
        |  required binary event_type (STRING);
        |  required double value;
        |  required binary props (STRING);
        |}""".stripMargin
    val msgType = org.apache.parquet.schema.MessageTypeParser
      .parseMessageType(schemaStr)
    val conf = new org.apache.hadoop.conf.Configuration()
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(msgType, conf)
    val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$nanosDir/events.parquet"))
      .withConf(conf).withType(msgType).build()
    val gf = new org.apache.parquet.example.data.simple.SimpleGroupFactory(msgType)
    rows.foreach { case (id, ts, uid, et, v, p) =>
      val nanos = ts.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L +
        ts.getNano
      writer.write(gf.newGroup()
        .append("event_id", id).append("ts", nanos).append("user_id", uid)
        .append("event_type", et).append("value", v).append("props", p))
    }
    writer.close()

    for (dir <- Seq(microsDir, nanosDir)) {
      val ev = TableCatalog.load(spark, dir, "events")
      assert(ev.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType,
        s"$dir: ts must normalize to timestamp_ntz, got ${ev.schema("ts")}")
      // registerAll (the round-5 crash site) + the SQL path end-to-end
      val got = TableCatalog.sql(spark, dir,
        "SELECT event_id, ts FROM events ORDER BY event_id")
        .as[(Long, java.time.LocalDateTime)].collect().toSeq
      assert(got == rows.map(r => (r._1, r._2)),
        s"$dir: values drifted through the loader")
    }
  }

  test("XML round-trips records through the Spark 4 native source") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xml_t_").toString
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .limit(200)
    src.write.mode("overwrite").option("rowTag", "order").xml(dir)
    val back = TableCatalog.loadXml(spark, dir, src.schema, rowTag = "order")
    assert(back.count() == 200)
    assert(back.except(src).isEmpty && src.except(back).isEmpty)
  }
}
