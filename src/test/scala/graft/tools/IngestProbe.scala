package graft.tools
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.sources.MultiLabelText
import graft.ml.AdaBoostMH

/** Manual probe: text ingest -> boosting through the public API.
  * Run: sbt "Test/runMain graft.tools.IngestProbe" */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val f = Files.createTempFile("probe", ".txt")
    Files.writeString(f,
      "# fixture\n0 0:1.0 1:5.0\n0 0:2.0 1:8.0\n1 0:3.0 1:6.0\n- 0:4.0 1:7.0\n")
    val ds = MultiLabelText.read(spark, f.toString, dim = 2, numLabels = 2)
    println("PARSED " + ds.count() + " points")
    val stumps = AdaBoostMH.trainCore(spark,
      MultiLabelText.toTrainPoints(ds, 2),
      Array(Array(1.5, 2.5, 3.5), Array(5.5, 6.5, 7.5)), 4, 2, 2)
    stumps.foreach(s => println(s"STUMP j=${s.featureIndex} theta=${s.threshold} " +
      s"alpha=${s.alpha} votes=${s.votes.mkString(",")}"))
    // error probes through the same read path
    val bad = Files.createTempFile("probe-bad", ".txt")
    Files.writeString(bad, "0 0:1.0\n5 0:2.0\n")
    try MultiLabelText.read(spark, bad.toString, dim = 2, numLabels = 2).count()
    catch { case e: Exception =>
      println("BADLABEL: " + Option(e.getCause).getOrElse(e).getMessage.take(100)) }
    val bad2 = Files.createTempFile("probe-bad2", ".txt")
    Files.writeString(bad2, "0 9:1.0\n")
    try MultiLabelText.read(spark, bad2.toString, dim = 2, numLabels = 2).count()
    catch { case e: Exception =>
      println("BADIDX: " + Option(e.getCause).getOrElse(e).getMessage.take(100)) }
    spark.stop()
  }
}
