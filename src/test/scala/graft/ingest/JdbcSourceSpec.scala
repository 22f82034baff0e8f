package graft.ingest

import java.sql.DriverManager

import graft.SparkSpec

/** JdbcSource against embedded Derby (ships with Spark): the S1
  * partitioned-read path with real MIN/MAX bounds probing, plus S4
  * introspection and the S2/S3 watermark contract over JDBC.
  */
class JdbcSourceSpec extends SparkSpec {

  private lazy val url = {
    val u = "jdbc:derby:memory:graftjdbc;create=true"
    val c = DriverManager.getConnection(u)
    val st = c.createStatement()
    st.executeUpdate(
      "CREATE TABLE items(id INT NOT NULL, qty INT, updated_at TIMESTAMP)")
    (1 to 100).foreach { i =>
      st.executeUpdate(s"INSERT INTO items VALUES($i, ${i * 10}, " +
        s"TIMESTAMP('2024-01-${(i % 28) + 1}', '00:00:00'))")
    }
    st.executeUpdate("CREATE TABLE empty_t(id INT, updated_at TIMESTAMP)")
    // declared default — added after the inserts so their arity keeps —
    // for the COLUMN_DEFAULT half of the introspection contract
    st.executeUpdate(
      "ALTER TABLE items ADD COLUMN status VARCHAR(10) DEFAULT 'active'")
    st.close(); c.close()
    u
  }

  private def source(parts: Int = 4) = new JdbcSource(url, Seq("items"),
    new java.util.Properties(), partitionCol = Some("id"),
    numPartitions = parts)

  test("partitioned read probes bounds and splits into N partitions") {
    val df = source(4).read(spark, "items")
    assert(df.count() == 100L)
    assert(df.rdd.getNumPartitions == 4,
      "bounds probe must enable the partitioned read")
    // every row exactly once across partition ranges
    assert(df.select("id").distinct().count() == 100L)
  }

  test("empty table degrades to a single-partition read, no error") {
    val df = new JdbcSource(url, Seq("empty_t"), new java.util.Properties(),
      partitionCol = Some("id")).read(spark, "empty_t")
    assert(df.count() == 0L)
    assert(df.rdd.getNumPartitions == 1)
  }

  test("describe returns (name, type, nullable, default) per column") {
    val cols = source().describe(spark, "items")
    assert(cols.map(_.name) == Seq("ID", "QTY", "UPDATED_AT", "STATUS"))
    assert(cols.head.dataType == "INT")
    assert(cols(2).dataType == "TIMESTAMP")
    // the INFORMATION_SCHEMA quadruple: declared DEFAULT surfaces as
    // the catalog renders it; columns without one carry None
    assert(cols(3).default.exists(_.contains("active")), cols(3))
    assert(cols.take(3).forall(_.default.isEmpty))
  }

  test("watermark probe and strict > incremental read work over JDBC") {
    val s = source()
    val wm = s.maxWatermark(spark, "items")
    assert(wm.nonEmpty)
    val delta = s.readChangedSince(spark, "items", Some("2024-01-20 00:00:00"))
    val all = s.read(spark, "items")
    import org.apache.spark.sql.functions._
    val expected = all.filter(col("updated_at") > lit("2024-01-20 00:00:00")
      .cast("timestamp")).count()
    assert(delta.count() == expected && expected > 0)
  }
}
