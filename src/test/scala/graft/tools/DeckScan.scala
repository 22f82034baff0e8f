package graft.tools

/** Seed hunter for sync-fuzz deck SHAPES (round 15): scans a seed range
  * and prints, per shape, the seeds whose dealt deck matches —
  *
  *   deploy_last   deck ENDS on a deploy (the 1408002 shape: the
  *                 retired instance's fenced wake-up lands after the
  *                 final prune, where an orphan write escapes retention)
  *   deploy_first  deck STARTS with a deploy (claim-at-boot handover
  *                 against a store holding only the bootstrap)
  *
  * Pure preview via SyncFuzzScenario.deckFor — no scenarios run. Usage:
  *   java <add-opens> -cp "<test-classes>:<classes>:<spark jars>"
  *     graft.tools.DeckScan <fromSeed> <toSeed>
  * (spell the spark-jars glob out on the command line; written here it
  * would open a nested block comment and break the build)
  */
object DeckScan {
  def main(args: Array[String]): Unit = {
    val from = args(0).toInt
    val to = args(1).toInt
    val hits = (from to to).map { s =>
      val deck = graft.ingest.SyncFuzzScenario
        .deckFor(new scala.util.Random(s))
      (s, deck.head == "deploy", deck.last == "deploy")
    }
    println("deploy_first: " +
      hits.filter(_._2).map(_._1).mkString(","))
    println("deploy_last: " +
      hits.filter(_._3).map(_._1).mkString(","))
  }
}
