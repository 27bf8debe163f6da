package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The content-keyed artifact cache (ADVICE r9: a path-only key
  * silently reused a stale join_dpp copy after a dataset refresh).
  * Pure file-op contract — no Spark session needed. */
class DatasetCacheSpec extends AnyFunSuite {

  private def freshDataset(): String = {
    val d = Files.createTempDirectory("graft-dsc").toString
    Files.write(Paths.get(d, "t.parquet"), "generation-1".getBytes("UTF-8"))
    d
  }

  test("content key tracks file content generation, not just the path") {
    val d = freshDataset()
    val k1 = DatasetCache.contentKey(d, Seq("t.parquet"))
    assert(k1 == DatasetCache.contentKey(d, Seq("t.parquet"))) // stable
    // regenerate at the SAME path: size changes -> key changes
    Files.write(Paths.get(d, "t.parquet"), "generation-2-longer".getBytes("UTF-8"))
    val k2 = DatasetCache.contentKey(d, Seq("t.parquet"))
    assert(k1 != k2, "regenerated dataset must get a fresh cache key")
  }

  test("getOrBuild builds once per content generation and rebuilds on refresh") {
    val d = freshDataset()
    var builds = 0
    def get(): String = DatasetCache.getOrBuild(d, Seq("t.parquet"), "artifact") {
      path =>
        builds += 1
        Files.createDirectories(Paths.get(path))
        Files.write(Paths.get(path, "payload"), "x".getBytes("UTF-8"))
    }
    val p1 = get()
    val p2 = get()
    assert(p1 == p2 && builds == 1, "same content must reuse the build")
    assert(Files.exists(Paths.get(p1, "payload")))
    // dataset regenerated at the same dir -> stale artifact abandoned
    Files.write(Paths.get(d, "t.parquet"), "generation-2-longer".getBytes("UTF-8"))
    val p3 = get()
    assert(p3 != p1 && builds == 2, "refreshed content must rebuild")
  }

  test("a concurrent loser waits for the winner's marker instead of racing") {
    val d = freshDataset()
    val key = DatasetCache.contentKey(d, Seq("t.parquet"))
    val root = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_ds_$key")
    Files.createDirectories(root)
    Files.write(root.resolve("slow.lock"), Array.emptyByteArray) // fake winner
    val t = new Thread(() => {
      Thread.sleep(400)
      val out = root.resolve("slow")
      Files.createDirectories(out)
      Files.write(out.resolve("payload"), "w".getBytes("UTF-8"))
      Files.write(out.resolve("_GRAFT_READY"), Array.emptyByteArray)
      Files.deleteIfExists(root.resolve("slow.lock"))
    })
    t.start()
    var built = false
    val p = DatasetCache.getOrBuild(d, Seq("t.parquet"), "slow",
      waitMs = 5000L) { _ => built = true }
    t.join()
    assert(!built, "loser must not run the build")
    assert(Files.exists(Paths.get(p, "payload")), "loser sees the winner's artifact")
  }
}
