package graft

import graft.sources.Publish
import java.nio.file.Files
import org.apache.spark.sql.functions._

class PublishSpec extends SparkSpec {

  test("writeDatePartitioned lays out per-date partitions and returns the payload") {
    val out = Files.createTempDirectory("graft_pub").toString
    val events = Tables(spark, sf).events
    val payload = Publish.writeDatePartitioned(events, out, "events_ns", "ts")
    assert(payload == Publish.IngestPayload("events_ns", s"$out/events_ns", "parquet"))
    val back = spark.read.parquet(s"$out/events_ns")
    assert(back.count() == events.count())
    // layout is date-partitioned (directory per date_key)
    val dates = back.select("date_key").distinct().count()
    assert(dates > 1)

    // re-publishing ONE date with changed data replaces only that partition
    val oneDay = events.limit(1)
      .select(date_format(col("ts"), "yyyy-MM-dd")).collect()(0).getString(0)
    val replacement = events
      .filter(date_format(col("ts"), "yyyy-MM-dd") === oneDay)
      .withColumn("value", lit(-1.0))
    Publish.writeDatePartitioned(replacement, out, "events_ns", "ts")
    val after = spark.read.parquet(s"$out/events_ns")
    assert(after.count() == events.count())
    val replacedVals = after.filter(col("date_key") === oneDay)
      .select("value").distinct().collect().map(_.getDouble(0))
    assert(replacedVals.sameElements(Array(-1.0)))
    val untouched = after.filter(col("date_key") =!= oneDay)
      .filter(col("value") === -1.0).count()
    assert(untouched == 0)
  }

  test("GraftConf builder carries the graft function extensions") {
    // the shared test session predates GraftConf, so just validate the
    // builder constructs (extensions apply at session-create time)
    val b = GraftConf.builder("local[1]", 1)
    assert(b != null)
  }

  test("permissive csv read surfaces corrupt records instead of failing") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_csv")
    val f = dir.resolve("data.csv")
    Files.writeString(f, "id,value\n1,10.5\n2,not_a_number\n3,30.0\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("value", DoubleType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir.toString).cache()
    assert(df.count() == 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("value").isNotNull).count() == 2)
  }
}
