package graft.tools
import org.apache.spark.sql.SparkSession
import graft.multimodal.Multimodal

/** Manual probe: multimodal pipeline through the public API.
  * Run: sbt "Test/runMain graft.tools.MediaProbe" */
object MediaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val media = Multimodal.synthetic(spark, 30)
    media.printSchema()
    Multimodal.extractFeatures(media).show(3, truncate = 60)
    Multimodal.resizePlan(media, 128).show(3)
    Multimodal.frameSample(media, 500).show(3)
    spark.stop()
  }
}
