package graft.sinks

import graft.SparkSpec
import java.nio.file.Files

/** S4–S7 sink tests. JDBC runs against embedded Derby (ships with Spark
  * for the Hive metastore) — same `df.write.jdbc` path as the reference's
  * PostgreSQL load, minus the server.
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("underscored renames dotted columns only") {
    val df = Seq((1, "x")).toDF("resource.id", "plain")
    assert(Sinks.underscored(df).columns.toSeq == Seq("resource_id", "plain"))
  }

  test("S5/S6 JDBC write + read back (Derby embedded)") {
    val dir = Files.createTempDirectory("derby_db")
    val url = s"jdbc:derby:$dir/testdb;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val df = Seq(("a-1", "p-1", 1.5), ("a-2", "p-2", 2.5))
      .toDF("resource.id", "patient_id", "value")
    // typed DDL (S5): Derby's default string mapping is CLOB, which is
    // non-comparable — exactly what createTableColumnTypes exists for
    Sinks.writeJdbc(df, url, "observation", props,
      columnTypes = Some("resource_id VARCHAR(64), patient_id VARCHAR(64)"))
    val back = spark.read.jdbc(url, "observation", props)
    assert(back.columns.toSeq == Seq("resource_id", "patient_id", "value"))
    assert(back.count() == 2)
    assert(back.filter($"resource_id" === "a-1").select("value").as[Double].head() == 1.5)
  }

  test("S7 FK-ordered multi-table load") {
    val dir = Files.createTempDirectory("derby_db2")
    val url = s"jdbc:derby:$dir/testdb;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val tables = Sinks.LoadOrder.map(n => n -> Seq((s"$n-1", 1)).toDF("id", "v")).toMap
    Sinks.writeAllJdbc(tables, url, props)
    Sinks.LoadOrder.foreach { n =>
      assert(spark.read.jdbc(url, n, props).count() == 1, s"table $n")
    }
  }

  test("parquet sink with partitioning") {
    val dir = Files.createTempDirectory("pq_out")
    val df = Seq(("en", 1L), ("fr", 2L), ("en", 3L)).toDF("lang", "doc_id")
    Sinks.writeParquet(df, s"$dir/docs", partitionBy = Seq("lang"))
    assert(Files.exists(dir.resolve("docs/lang=en")), "hive-style partition dirs")
    val back = spark.read.parquet(s"$dir/docs")
    assert(back.count() == 3)
    // partition pruning: only the en partition is scanned
    val pruned = back.filter($"lang" === "en")
    assert(pruned.count() == 2)
  }
}
