package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class MinKeysAggSpec extends SparkSpec {
  import spark.implicits._

  test("min_keys matches the window-rank selection over random data") {
    val rows = for (s <- Seq("a", "b", "c"); i <- 0 until 300)
      yield (s, s"$s-$i")
    val df = rows.toDF("stratum", "id")
      .withColumn("k", md5($"id")).repartition(11)

    val agg = df.groupBy("stratum")
      .agg(MinKeysAgg.minKeys($"k", 7).as("keep"))
      .select($"stratum", explode($"keep").as("k"))

    val w = Window.partitionBy("stratum").orderBy("k")
    val ref = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 7).select("stratum", "k")

    val a = agg.orderBy("stratum", "k").collect().toSeq
    val r = ref.orderBy("stratum", "k").collect().toSeq
    assert(a == r)
  }

  test("array_position over min_keys reproduces the rank") {
    val df = (0 until 100).map(i => ("x", s"id$i")).toDF("s", "id")
      .withColumn("k", md5($"id")).repartition(5)
    val keep = df.groupBy("s").agg(MinKeysAgg.minKeys($"k", 10).as("keep"))
    val ranked = df.join(broadcast(keep), Seq("s"))
      .withColumn("rnk", array_position($"keep", $"k"))
      .filter($"rnk" > 0)
    val w = Window.partitionBy("s").orderBy("k")
    val ref = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 10)
      .select($"id", $"rn".cast("long").as("rnk"))
    assert(ranked.select("id", "rnk").orderBy("rnk").collect().toSeq ==
      ref.orderBy("rnk").collect().toSeq)
  }

  test("groups smaller than k keep everything") {
    val df = Seq(("x", "a"), ("x", "b")).toDF("s", "k")
    val out = df.groupBy("s").agg(MinKeysAgg.minKeys($"k", 10).as("keep"))
      .select(explode($"keep")).as[String].collect().toSeq
    assert(out == Seq("a", "b"))
  }
}
