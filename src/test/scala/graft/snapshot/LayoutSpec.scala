package graft.snapshot

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Storage-layout capabilities: hive partitioning prunes at planning
  * time; bucketing removes the shuffle from co-located joins. Both
  * asserted on the PHYSICAL PLAN, not just results.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned snapshot: filters prune partition directories") {
    val snapDir = Files.createTempDirectory("graft-lay").toString
    val store = new SnapshotStore(spark, snapDir)
    val events = Seq(
      (1L, "2024-01-01", 1.0), (2L, "2024-01-01", 2.0),
      (3L, "2024-01-02", 3.0), (4L, "2024-01-03", 4.0))
      .toDF("event_id", "day", "value")
    val m = new SnapshotWriter(store).publish(
      Map("events_p" -> events), sortCol = None,
      partitionBy = Map("events_p" -> Seq("day")))
    assert(m.tables("events_p") == 4L)

    val dir = store.tableDir(m.version, "events_p")
    assert(store.fs.exists(new org.apache.hadoop.fs.Path(dir, "day=2024-01-01")))

    val q = spark.read.parquet(dir.toString).filter(col("day") === "2024-01-02")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("2024-01-02"), plan.take(600))
    assert(q.count() == 1)
  }

  test("bucketed tables join without exchange") {
    val facts = (1L to 1000L).map(i => (i, i * 2)).toDF("id", "a")
    val dims = (1L to 1000L).map(i => (i, s"n$i")).toDF("id", "b")
    BucketedTables.write(facts, "graft_bt_facts", "id", 4)
    BucketedTables.write(dims, "graft_bt_dims", "id", 4)
    try {
      // disable broadcast so the join strategy decision is about
      // bucketing, not size
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedTables.table(spark, "graft_bt_facts")
        .join(BucketedTables.table(spark, "graft_bt_dims"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(800))
      assert(joined.count() == 1000)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      BucketedTables.drop(spark, "graft_bt_facts")
      BucketedTables.drop(spark, "graft_bt_dims")
    }
  }
}
