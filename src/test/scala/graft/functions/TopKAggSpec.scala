package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("top-k agg matches the window-rank formulation over random data") {
    // deterministic pseudo-random scores, spread over many partitions
    // so partial heaps + merge + serialize all run
    val rnd = new scala.util.Random(7)
    val rows = for {
      q <- 0 until 5
      i <- 0 until 200
    } yield (q.toLong, i.toLong, rnd.nextDouble())
    val df = rows.toDF("query_id", "neighbor_id", "cosine").repartition(13)

    val agg = df.groupBy("query_id")
      .agg(TopKAgg.topKByScore($"cosine", $"neighbor_id", 7).as("top"))
      .select($"query_id", posexplode($"top").as(Seq("pos", "c")))
      .select($"query_id", $"c.id".as("neighbor_id"),
        $"c.score".as("cosine"), ($"pos" + 1).as("rank"))

    val w = Window.partitionBy("query_id")
      .orderBy($"cosine".desc, $"neighbor_id")
    val ref = df.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 7)
      .select("query_id", "neighbor_id", "cosine", "rank")

    val a = agg.orderBy("query_id", "rank").collect().toSeq
    val r = ref.orderBy("query_id", "rank").collect().toSeq
    assert(a == r)
  }

  test("score ties break toward the smaller id, like the rank order") {
    val df = Seq(
      (1L, 10L, 0.5), (1L, 3L, 0.5), (1L, 7L, 0.5), (1L, 1L, 0.4))
      .toDF("query_id", "neighbor_id", "cosine").repartition(3)
    val out = df.groupBy("query_id")
      .agg(TopKAgg.topKByScore($"cosine", $"neighbor_id", 2).as("top"))
      .select(explode($"top").as("c")).select($"c.id")
      .as[Long].collect().toSeq
    assert(out == Seq(3L, 7L))
  }

  test("duplicate ids collapse to one entry keeping the best score") {
    // the multiprobe case: same neighbor surfaces from several buckets
    val df = Seq(
      (1L, 5L, 0.9), (1L, 5L, 0.9), (1L, 5L, 0.7), (1L, 6L, 0.8))
      .toDF("query_id", "neighbor_id", "cosine").repartition(4)
    val out = df.groupBy("query_id")
      .agg(TopKAgg.topKByScore($"cosine", $"neighbor_id", 3).as("top"))
      .select(explode($"top").as("c"))
      .select($"c.id", $"c.score")
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((5L, 0.9), (6L, 0.8)))
  }

  test("groups smaller than k emit all their candidates") {
    val df = Seq((1L, 2L, 0.3)).toDF("query_id", "neighbor_id", "cosine")
    val n = df.groupBy("query_id")
      .agg(TopKAgg.topKByScore($"cosine", $"neighbor_id", 10).as("top"))
      .select(explode($"top")).count()
    assert(n == 1L)
  }
}
