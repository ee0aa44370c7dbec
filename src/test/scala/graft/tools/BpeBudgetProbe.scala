package graft.tools
import org.apache.spark.sql.SparkSession

/** Times bpeTrain recount vs incremental at a tokenizer-scale merge
  * budget (64 merges, sf0.1 documents). Evidence for BASELINE.md.
  * Run: sbt 'Test/runMain graft.tools.BpeBudgetProbe' */
object BpeBudgetProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(graft.Tables.NanosKey, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(s, "/root/testdata/sf0.1", "documents")
    graft.SparkEntry.entry(s).count()
    for ((inc, label) <- Seq(false -> "recount", true -> "incremental");
         trial <- 1 to 2) {
      val t0 = System.nanoTime()
      val m = graft.queries.LlmOps.bpeTrain(docs, merges = 64,
        incremental = inc)._1.collect()
      println(f"$label%-12s trial=$trial merges=${m.length} ${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    s.stop()
  }
}
