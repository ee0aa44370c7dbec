package graft.tools
import org.apache.spark.sql.SparkSession

/** Prints physical-plan evidence for scale-critical queries.
  * Run: sbt "Test/runMain graft.tools.PlanAudit" */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val targets = Seq("q_scan_pruned", "q_filter_compound", "q_join_broadcast",
      "q_join_multiway", "q_join_shuffle", "q_agg_q1", "q_topk_global",
      "q_sim_topk", "q_join_asof")
    targets.foreach { name =>
      val plan = graft.SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      val markers = Seq(
        "PushedFilters: [I" -> "pushdown",
        "PushedFilters: [G" -> "pushdown",
        "BroadcastHashJoin" -> "BHJ",
        "SortMergeJoin" -> "SMJ",
        "TakeOrderedAndProject" -> "topk",
        "HashAggregate" -> "hashagg",
        "AdaptiveSparkPlan" -> "AQE")
      val found = markers.collect { case (m, tag) if plan.contains(m) => tag }.distinct
      val readSchema = plan.linesIterator.find(_.contains("ReadSchema"))
        .map(_.split("ReadSchema: ").last.take(120)).getOrElse("?")
      println(s"== $name: ${found.mkString(",")} | $readSchema")
    }
    spark.stop()
  }
}
