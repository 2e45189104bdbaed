package graft

import graft.streaming.Streaming
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  test("st01 streaming window agg equals the batch plan") {
    val streamed = Streaming.st01.fn(spark, sf)
    val batch = graft.operators.Ingest.i17.fn(spark, sf)
    assert(streamed.count() == batch.count())
    val diff = streamed.exceptAll(batch).count() + batch.exceptAll(streamed).count()
    assert(diff == 0, s"streaming/batch window agg diverge by $diff rows")
  }

  test("st02 dedup keeps one row per event_id") {
    val total = Streaming.st02.fn(spark, sf).agg(sum("n")).collect()(0).getLong(0)
    val distinctIds = Tables(spark, sf).events.select("event_id").distinct().count()
    assert(total == distinctIds)
  }

  test("st03 upsert sink is idempotent across re-runs") {
    val first = Streaming.st03.fn(spark, sf).collect()
    val second = Streaming.st03.fn(spark, sf).collect()
    assert(first.sameElements(second))
  }
}
