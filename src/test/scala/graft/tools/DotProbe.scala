package graft.tools
import org.apache.spark.sql.SparkSession

/** Manual probe: graft_dot through the SQL surface (codegen + type errors).
  * Run: sbt "Test/runMain graft.tools.DotProbe" */
object DotProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1L, Array(1.0, 2.0, 3.0)), (2L, Array(0.5, 0.5, 0.5))).toDF("id", "v")
    df.createOrReplaceTempView("t")
    spark.sql("SELECT a.id, b.id, graft_dot(a.v, b.v) d FROM t a JOIN t b ON a.id < b.id").show()
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS v"); e.createOrReplaceTempView("pq"); val plan = spark.sql("SELECT graft_dot(v, v) FROM pq").queryExecution.executedPlan.toString
    println("PLAN dotproduct=" + plan.contains("dotproduct") + " codegen_star=" + plan.contains("*(1)")); println(plan.linesIterator.take(4).mkString("\n"))
    Seq((1L, Array(1.0f))).toDF("id", "v").createOrReplaceTempView("bad")
    try spark.sql("SELECT graft_dot(v, v) FROM bad").collect()
    catch { case e: Exception => println("ERRMSG: " + e.getMessage.linesIterator.take(3).mkString(" | ")) }
    spark.stop()
  }
}
