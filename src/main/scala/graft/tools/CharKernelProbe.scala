package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import graft.functions._

/** A/B probe for the per-char kernel family (the largest linear costs
  * at sf10): the composed built-in / String-path formulations vs the
  * byte-level kernels in ByteTextKernels + GopherStatsExpr.evalAscii.
  *
  *   runMain graft.tools.CharKernelProbe localdata/sf1 [reps]
  *
  * Each variant runs `reps` times after one warmup; reports min wall
  * seconds (min is the right statistic for co-tenant noise: the
  * cheapest observed run is the closest to the true cost). Also
  * asserts old == new on the full corpus before timing, so the probe
  * doubles as an exactness check at data scale.
  */
object CharKernelProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").cache()
    println(s"[probe] ${docs.count()} documents")

    val gopherOld = ColumnBridge.column(
      GopherStatsExpr(ColumnBridge.expression(col("text")), asciiFast = false))
    val gopherNew = ColumnBridge.column(
      GopherStatsExpr(ColumnBridge.expression(col("text")), asciiFast = true))

    // a cheap order-insensitive checksum over all output fields
    def fingerprint(c: Column, fields: Seq[String]): Long = {
      val f = c.as("f")
      docs.select(f).select(
        fields.map(n => sum(hash(col(s"f.$n")).cast("long")).as(n)): _*)
        .collect()(0).toSeq.map(_.asInstanceOf[Long]).sum
    }

    val gFields = GopherStatsExpr.schema.fields.map(_.name).toSeq
    require(fingerprint(gopherOld, gFields) == fingerprint(gopherNew, gFields),
      "gopher ascii path diverges from the String path")

    val d02Old = docs.select(
      sum(TextFunctions.wsTokenCount(col("text")).cast("long")),
      sum(TextFunctions.bpeTokenCount(col("text")).cast("long")))
    val d02New = docs.select(
      sum(ByteTextKernels.wsTokenCount(col("text")).cast("long")),
      sum(ByteTextKernels.bpeTokenCount(col("text")).cast("long")))
    require(d02Old.collect()(0) == d02New.collect()(0),
      "byte token counts diverge from the built-in formulation")

    val nw = ByteTextKernels.wsTokenCount(col("text"))
    val d03Old = docs.select(
      sum(length(col("text")).cast("long")),
      sum(size(split(col("text"), " ")).cast("long")),
      sum((length(regexp_replace(col("text"), " ", "")).cast("double") /
        size(split(col("text"), " ")))))
    val d03New = docs.select(
      sum(length(col("text")).cast("long")),
      sum(nw.cast("long")),
      sum((length(col("text")) - (nw - lit(1))).cast("double") / nw))
    require(d03Old.collect()(0) == d03New.collect()(0),
      "d03 recomposition diverges")

    def time(label: String)(body: => Unit): Double = {
      body // warmup
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[probe] $label%-28s $best%8.3f s")
      best
    }

    def run(df: org.apache.spark.sql.DataFrame): Unit = { df.collect(); () }

    val r = Map(
      "d02_old" -> time("d02 split+regex")(run(d02Old)),
      "d02_new" -> time("d02 byte kernels")(run(d02New)),
      "d03_old" -> time("d03 split+replace")(run(d03Old)),
      "d03_new" -> time("d03 byte recompose")(run(d03New)),
      "d19_old" -> time("d19 gopher String path")(run(
        docs.select(gopherOld.as("f")).select(
          gFields.map(n => sum(col(s"f.$n")).as(n)): _*))),
      "d19_new" -> time("d19 gopher byte path")(run(
        docs.select(gopherNew.as("f")).select(
          gFields.map(n => sum(col(s"f.$n")).as(n)): _*))))

    println(f"[probe] speedups: d02 ${r("d02_old") / r("d02_new")}%.2fx  " +
      f"d03 ${r("d03_old") / r("d03_new")}%.2fx  d19 ${r("d19_old") / r("d19_new")}%.2fx")
    spark.stop()
  }
}
