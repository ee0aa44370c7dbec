package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: max hot-key group sizes feeding the HotCap stop-key
  * guard, at a given SF — documents the headroom between the harness
  * corpus's largest bucket and the cap.
  * Run: sbt 'Test/runMain graft.tools.FreqProbe /root/testdata/sf0.1' */
object FreqProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config(graft.Tables.NanosKey, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, sf, "documents")
    val fps = graft.queries.LlmOps.winnowFingerprintsXxh(docs)
    println("winnow fingerprint max doc-freq: " +
      fps.groupBy("m").count().agg(max("count")).collect()(0).getLong(0))
    val ds = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 5)
      .select(col("doc_id"), explode(array_distinct(
        expr("transform(sequence(1, size(t) - 4), i -> array_join(slice(t, i, 5), ' '))"))).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("sid"))
    val mh = ds.groupBy("doc_id")
      .agg(expr("graft_minhash(pmod(sid, 1000003), 64)").as("mh"))
    val bandExpr = "transform(sequence(0, 15), b -> " +
      (0 until 4).map(r => s"cast(element_at(mh, 4*b+${r + 1}) as string)")
        .mkString(" || '-' || ") + ")"
    val bands = mh.select(col("doc_id"),
      posexplode(expr(bandExpr)).as(Seq("band", "bkey")))
    println("sketch band bucket max size: " +
      bands.groupBy("band", "bkey").count().agg(max("count")).collect()(0).getLong(0))
    spark.stop()
  }
}
