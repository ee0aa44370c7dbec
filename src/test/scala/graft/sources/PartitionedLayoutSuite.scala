package graft.sources

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

class PartitionedLayoutSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    val plan = df.queryExecution.executedPlan
    val stripped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    stripped.collectLeaves().collectFirst { case s: FileSourceScanExec => s }.get
  }

  test("partition filter prunes directories in the plan, not just rows") {
    val dir = Files.createTempDirectory("part_events").toString
    val events = Tables(spark, sf, "events")
    PartitionedLayout.writePartitioned(events, dir, "event_type")
    val nTypes = events.select("event_type").distinct().count()

    val pruned = PartitionedLayout.read(spark, dir)
      .filter(col("event_type") === "purchase")
    val scan = scanOf(pruned)
    assert(scan.partitionFilters.nonEmpty,
      s"expected a partition filter in:\n${scan.treeString}")
    // the prune touches 1 of nTypes directories
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil).size === 1)
    assert(nTypes > 1)
    // and results match filtering the unpartitioned table
    val expected = events.filter(col("event_type") === "purchase").count()
    assert(pruned.count() === expected)
  }

  test("data filters still push down to parquet under a partitioned layout") {
    val dir = Files.createTempDirectory("part_push").toString
    PartitionedLayout.writePartitioned(Tables(spark, sf, "events"), dir, "event_type")
    val q = PartitionedLayout.read(spark, dir)
      .filter(col("event_type") === "view" && col("value") > 50.0)
      .select("event_id", "value")
    val scan = scanOf(q)
    assert(scan.dataFilters.exists(_.toString.contains("value")),
      s"value predicate must reach the scan:\n${scan.treeString}")
    assert(scan.requiredSchema.fieldNames.toSet === Set("event_id", "value"),
      "column pruning must reach the scan")
  }

  test("dynamic overwrite replaces only the incoming partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("part_dyn").toString
    val day1 = Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-01"),
      (3L, "c", "2024-01-02")).toDF("id", "v", "day")
    PartitionedLayout.writePartitioned(day1, dir, "day")
    // re-load day 2 with corrected data; day 1 must be untouched
    val day2fix = Seq((30L, "c2", "2024-01-02")).toDF("id", "v", "day")
    PartitionedLayout.overwritePartitions(day2fix, dir, "day")
    val got = PartitionedLayout.read(spark, dir)
      .select("id", "day").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "2024-01-01"), (2L, "2024-01-01"), (30L, "2024-01-02")))
  }
}
