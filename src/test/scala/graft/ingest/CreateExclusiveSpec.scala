package graft.ingest

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}

import org.scalatest.funsuite.AnyFunSuite

/** The epoch-claim marker's create-exclusive must be O_EXCL-atomic on
  * BOTH local filesystem flavors (round 14 ADVICE): Hadoop's
  * `RawLocalFileSystem.create` is exists-check-then-open, so the
  * generic `fs.create(path, overwrite = false)` arm is NOT exclusive
  * there — a deployment configuring `fs.file.impl` raw would silently
  * lose the atomicity the fence claims. Both flavors must route to
  * `java.io.File.createNewFile` (true O_CREAT|O_EXCL).
  *
  * No SparkSession needed — this is pure Hadoop-FS surface.
  */
class CreateExclusiveSpec extends AnyFunSuite {

  private def rawFs(): RawLocalFileSystem = {
    val fs = new RawLocalFileSystem()
    fs.initialize(java.net.URI.create("file:///"), new Configuration())
    fs
  }

  private def checksummedFs(): LocalFileSystem = {
    val fs = new LocalFileSystem(new RawLocalFileSystem())
    fs.initialize(java.net.URI.create("file:///"), new Configuration())
    fs
  }

  for ((label, mk) <- Seq(
      "RawLocalFileSystem" -> (() => rawFs()),
      "LocalFileSystem" -> (() => checksummedFs()))) {

    test(s"$label: exactly one of N racing creators wins the marker") {
      val fs = mk()
      val dir = Files.createTempDirectory("graft-excl").toString
      val marker = new Path(s"file://$dir/epochs/1")
      fs.mkdirs(marker.getParent)
      val n = 16
      val barrier = new java.util.concurrent.CyclicBarrier(n)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to n).map(_ => new Thread(() =>
        try {
          barrier.await(10, java.util.concurrent.TimeUnit.SECONDS)
          if (SyncManager.tryCreateExclusive(fs, marker))
            wins.incrementAndGet()
        } catch { case e: Throwable => errs.add(e) }))
      threads.foreach(_.start()); threads.foreach(_.join(15000))
      assert(errs.isEmpty, s"creators failed: ${errs.peek()}")
      assert(wins.get() == 1,
        s"$label: ${wins.get()} of $n racing creators claimed the same " +
          "marker — create-exclusive is not exclusive on this flavor")
    }

    test(s"$label: a pre-existing marker is never re-claimed") {
      val fs = mk()
      val dir = Files.createTempDirectory("graft-excl-pre").toString
      val marker = new Path(s"file://$dir/epochs/1")
      fs.mkdirs(marker.getParent)
      assert(SyncManager.tryCreateExclusive(fs, marker))
      assert(!SyncManager.tryCreateExclusive(fs, marker),
        s"$label: an existing marker was claimed a second time")
    }
  }
}
