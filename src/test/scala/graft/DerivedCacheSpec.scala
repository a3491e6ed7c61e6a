package graft

import org.scalatest.funsuite.AnyFunSuite

class DerivedCacheSpec extends AnyFunSuite {

  private def tmpDir(name: String): java.io.File = {
    val d = new java.io.File(s"/root/repo/target/tmp/dcache_spec/$name")
    org.apache.commons.io.FileUtils.deleteDirectory(d)
    d.getParentFile.mkdirs()
    d
  }

  test("builds once, reuses while fresh, rebuilds on source change") {
    val src = new java.io.File("/root/repo/target/tmp/dcache_spec/src.txt")
    src.getParentFile.mkdirs()
    java.nio.file.Files.write(src.toPath, "v1".getBytes)
    val dir = tmpDir("cache")
    var builds = 0
    def build(): Unit = DerivedCache.ensure(dir, Seq(src), "_SUCCESS") {
      builds += 1
      dir.mkdirs()
      new java.io.File(dir, "_SUCCESS").createNewFile()
    }
    build(); build()
    assert(builds === 1, "fresh cache must not rebuild")
    // content change (same length, bumped mtime) invalidates
    java.nio.file.Files.write(src.toPath, "v2".getBytes)
    src.setLastModified(src.lastModified + 5000)
    build()
    assert(builds === 2, "changed source must rebuild")
    build()
    assert(builds === 2)
  }

  test("a crashed build leaves no stamp and is retried") {
    val src = new java.io.File("/root/repo/target/tmp/dcache_spec/src2.txt")
    java.nio.file.Files.write(src.toPath, "x".getBytes)
    val dir = tmpDir("cache2")
    intercept[RuntimeException] {
      DerivedCache.ensure(dir, Seq(src), "_SUCCESS") {
        dir.mkdirs()
        // marker lands but the build dies before returning
        new java.io.File(dir, "_SUCCESS").createNewFile()
        throw new RuntimeException("boom")
      }
    }
    assert(!DerivedCache.fresh(dir, Seq(src), "_SUCCESS"),
      "no stamp after a crashed build")
    var built = false
    DerivedCache.ensure(dir, Seq(src), "_SUCCESS") {
      built = true
      dir.mkdirs()
      new java.io.File(dir, "_SUCCESS").createNewFile()
    }
    assert(built)
    assert(DerivedCache.fresh(dir, Seq(src), "_SUCCESS"))
  }
}
