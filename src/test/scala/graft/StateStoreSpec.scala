package graft

import graft.sources.StateStore
import java.nio.file.Files
import org.apache.spark.sql.functions._

class StateStoreSpec extends SparkSpec {

  private def tmpPath(): String =
    Files.createTempDirectory("graft_state").resolve("state").toString

  test("empty store yields empty state and no watermark") {
    val st = new StateStore(spark, tmpPath())
    assert(st.state("ds") == Map.empty)
    assert(st.watermark("ds").isEmpty)
  }

  test("updates merge and the latest seq wins per key") {
    val st = new StateStore(spark, tmpPath())
    st.update("ds", Map("last_update" -> "2024-01-01", "monthly" -> "2023-12-01"), seq = 1)
    st.update("ds", Map("last_update" -> "2024-02-01"), seq = 2)
    assert(st.state("ds") == Map("last_update" -> "2024-02-01", "monthly" -> "2023-12-01"))
    // other datasets are isolated
    st.update("other", Map("last_update" -> "1999-01-01"), seq = 3)
    assert(st.watermark("ds").contains("2024-02-01"))
    assert(st.watermark("other").contains("1999-01-01"))
  }

  test("runIncremental ingests only new rows and advances the watermark") {
    val st = new StateStore(spark, tmpPath())
    val events = Tables(spark, sf).events

    // cycle 1: everything is new
    val first = st.runIncremental("ev", events, "ts", seq = 1)
    assert(first.count() == events.count())
    val wm1 = st.watermark("ev")
    assert(wm1.isDefined)

    // cycle 2 on the same data: nothing new, watermark unchanged
    val second = st.runIncremental("ev", events, "ts", seq = 2)
    assert(second.count() == 0)
    assert(st.watermark("ev") == wm1)

    // cycle 3: a later row arrives → only it is ingested
    val later = events.limit(1)
      .withColumn("ts", col("ts") + expr("INTERVAL 365 DAYS"))
      .withColumn("event_id", lit(999999L))
    val third = st.runIncremental("ev", events.unionByName(later), "ts", seq = 3)
    assert(third.count() == 1)
    assert(st.watermark("ev") != wm1)
  }
}
