package graft.sources

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** CSV / JSON-lines round-trips on real harness data (events: the hardest
  * table — timestamps, JSON-in-string props, doubles). */
class DelimitedSuite extends SparkSpec {

  private def events = Tables(spark, "/root/testdata/sf0.001", "events")
    .orderBy("event_id").limit(100)

  test("CSV round-trip preserves rows, schema and timestamp micros") {
    val dir = Files.createTempDirectory("csv_rt").toString
    val src = events
    Delimited.writeCsv(src, dir)
    val back = Delimited.readCsv(spark, dir, src.schema).orderBy("event_id")
    assert(back.schema === src.schema)
    val a = src.collect().map(_.toSeq)
    val b = back.collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("JSON-lines round-trip preserves rows incl. embedded-JSON strings") {
    val dir = Files.createTempDirectory("json_rt").toString
    val src = events
    Delimited.writeJsonLines(src, dir)
    val back = Delimited.readJsonLines(spark, dir, src.schema).orderBy("event_id")
    val a = src.collect().map(_.toSeq)
    val b = back.collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    // props must survive as the raw string, not get parsed into a struct
    assert(back.select("props").head().getString(0).startsWith("{"))
  }

  test("ORC round-trip preserves rows and schema (columnar alt to parquet)") {
    val dir = Files.createTempDirectory("orc_rt").toString
    val src = events
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).orderBy("event_id")
    assert(back.schema === src.schema)
    assert(back.collect().map(_.toSeq).toSeq === src.collect().map(_.toSeq).toSeq)
    // predicate pushdown reaches the ORC scan too
    val plan = spark.read.orc(dir).filter(col("user_id") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)"), plan)
  }

  test("FAILFAST: malformed CSV row fails loudly instead of nulling") {
    val dir = Files.createTempDirectory("csv_bad")
    Files.writeString(dir.resolve("part.csv"),
      "event_id,ts,user_id,event_type,value,props\nnot_a_long,x,y,z,w,v\n")
    val e = intercept[Exception] {
      Delimited.readCsv(spark, dir.toString, events.schema).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed") ||
      Option(e.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }
}
