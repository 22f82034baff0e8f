package graft.tools

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved, SparkListenerTaskStart}
import org.apache.spark.sql.{functions => F, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Echoes which state-store backend a stateful streaming query ACTUALLY
  * ran on, fingerprinted from the state operator's custom metrics
  * (`rocksdb*`-prefixed on RocksDBStateStoreProvider, loaded-map cache
  * counters on the HDFS-backed default). Registered through
  * `spark.sql.streaming.streamingQueryListeners` so it attaches to
  * every session in the probe JVM — including the child session
  * `EventStream.replaySession` clones for the t-entries, whose SQLConf
  * (where `SPARK_GRAFT_STATE_PROVIDER` lands) is invisible to the
  * probe's parent session: reading the parent's conf would always
  * report the default, proving nothing about the query that ran.
  */
class StateBackendEchoListener extends StreamingQueryListener {
  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val ops = e.progress.stateOperators
    if (ops.nonEmpty) {
      val keys = ops.head.customMetrics.keySet().asScala
      val backend =
        if (keys.exists(_.startsWith("rocksdb"))) "rocksdb" else "hdfs"
      println(s"[xcluster] stateBackend=$backend")
    }
  }
  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}

/** Multi-JVM execution probe (see LocalClusterSpec), run in its OWN
  * forked JVM: executes catalog entries under `local-cluster[2,4,…]` —
  * Spark's standalone mini-cluster with two REAL executor JVMs, real
  * serialized task dispatch, and shuffle blocks fetched over the
  * network stack instead of read in-process — and prints the same
  * order-insensitive digests as MemoryPressureProbe.
  *
  * Why this exists: every other gate in this repo runs `local[n]`,
  * where tasks share the driver's heap and "shuffle" is a local file
  * read. A plan can pass every local[n] gate and still break on a real
  * cluster (closure not serializable, broadcast identity assumptions,
  * task-side state that silently lived on the driver). This probe is
  * the closest a single machine gets to the 1000-executor shape: if a
  * digest differs between local[8] and local-cluster[2,4], the entry
  * depends on single-JVM execution.
  *
  * `kill` mode additionally SIGKILLs one executor JVM mid-query and
  * requires the query to complete with the digest unchanged — the
  * executor-loss/stage-retry story (lost shuffle output → fetch
  * failure → stage resubmission; standalone master relaunches the
  * executor) that a 100 TB run hits daily and local[n] can never
  * exercise.
  *
  * Output contract (parsed by LocalClusterSpec):
  *   [xcluster] <entry> rows=N digest=H secs=S
  *   [xcluster] kill executors=K removedDuringQuery=B
  *   XCLUSTER_OK
  */
object LocalClusterProbe {

  private def digestOf(spark: SparkSession, name: String,
                       sfDir: String): (Long, String, Double) = {
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val row = df.select(
      F.count(F.lit(1)).as("n"),
      F.sum(F.xxhash64(F.struct(df.columns.map(F.col).toSeq: _*))
        .cast("decimal(38,0)")).as("h"))
      .collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    (row.getLong(0),
      if (row.isNullAt(1)) "0" else row.getDecimal(1).toBigInteger.toString,
      secs)
  }

  /** PIDs of executor JVMs forked by the in-process standalone worker.
    * /proc scan, not ProcessHandle.children(): the JDK caps how much
    * of a child's huge-classpath cmdline it surfaces, so matching on
    * the backend class name + THIS app's id against /proc/<pid>/cmdline
    * is the reliable route.
    */
  private def executorPids(appId: String): Seq[Long] =
    Option(new java.io.File("/proc").listFiles())
      .getOrElse(Array.empty[java.io.File]).toSeq
      .filter(_.getName.forall(_.isDigit))
      .filter { d =>
        val cl = try {
          new String(java.nio.file.Files.readAllBytes(
            d.toPath.resolve("cmdline"))).replace('\u0000', ' ')
        } catch { case _: Exception => "" }
        cl.contains("CoarseGrainedExecutorBackend") && cl.contains(appId)
      }
      .map(_.getName.toLong)

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: LocalClusterProbe <master> <digest|kill> <sfDir> <entry>...")
    val master = args(0)
    val mode = args(1)
    val sfDir = args(2)
    val entries = args.drop(3).toSeq

    val builder = SparkSession.builder()
      .master(master)
      .appName("graft-local-cluster-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.streamingQueryListeners",
        classOf[StateBackendEchoListener].getName)
    if (master.startsWith("local-cluster")) {
      // the worker forks executors through $SPARK_HOME/bin/spark-class,
      // which knows only the Spark assembly jars — the graft classes
      // (and this JVM's --add-opens flags, which spark-class supplies
      // for Spark's own needs but not for scalatest-side extras) ride
      // in via the executor extras
      builder
        .config("spark.executor.memory", "3g")
        .config("spark.executor.extraClassPath",
          System.getProperty("java.class.path"))
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    mode match {
      case "digest" =>
        entries.foreach { name =>
          val (n, h, secs) = digestOf(spark, name, sfDir)
          println(f"[xcluster] $name rows=$n digest=$h secs=$secs%.1f")
        }

      case "kill" =>
        require(master.startsWith("local-cluster"),
          "kill mode needs real executor JVMs")
        val entry = entries.head
        // reference digest first (also warms the page cache so both
        // runs see the same IO shape)
        val (refN, refH, _) = digestOf(spark, entry, sfDir)

        val sawRemoval = new AtomicBoolean(false)
        val tasksStarted = new AtomicLong(0)
        val queryDone = new AtomicBoolean(false)
        spark.sparkContext.addSparkListener(new SparkListener {
          override def onTaskStart(t: SparkListenerTaskStart): Unit =
            tasksStarted.incrementAndGet()
          override def onExecutorRemoved(
              e: SparkListenerExecutorRemoved): Unit =
            if (!queryDone.get()) sawRemoval.set(true)
        })

        @volatile var result: (Long, String, Double) = null
        @volatile var failure: Throwable = null
        val t = new Thread(() => {
          try result = digestOf(spark, entry, sfDir)
          catch { case e: Throwable => failure = e }
          finally queryDone.set(true)
        })
        val baseline = tasksStarted.get()
        t.start()
        // kill once the query is demonstrably mid-flight: tasks running
        // AND both executors registered
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (tasksStarted.get() < baseline + 4 &&
            System.nanoTime() < deadline) Thread.sleep(20)
        val pids = executorPids(spark.sparkContext.applicationId)
        println(s"[xcluster] kill candidates=${pids.size}")
        require(pids.nonEmpty, "no executor JVM children found to kill")
        ProcessHandle.of(pids.head).ifPresent(_.destroyForcibly())
        t.join(300000)
        require(!t.isAlive, "query did not finish within 5 min of the kill")
        require(failure == null,
          s"query failed instead of recovering from executor loss: $failure")
        require(result._1 == refN && result._2 == refH,
          s"digest changed across executor loss: ref=($refN,$refH) " +
            s"got=(${result._1},${result._2})")
        println(s"[xcluster] kill executors=${pids.size} " +
          s"removedDuringQuery=${sawRemoval.get()}")
        println(f"[xcluster] $entry rows=${result._1} digest=${result._2} " +
          f"secs=${result._3}%.1f")

      case other => sys.error(s"unknown mode $other")
    }

    spark.stop()
    println("XCLUSTER_OK")
  }
}
