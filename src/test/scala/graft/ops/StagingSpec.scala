package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The staged-artifact contract (advice r8): collision-proof corpus
  * keys, part-file-level fingerprints, and atomic publish with
  * lost-race discard.
  */
class StagingSpec extends AnyFunSuite {

  test("corpusKey: dirs differing only in punctuation get distinct keys") {
    val a = Staging.corpusKey("/data/corpus.v1")
    val b = Staging.corpusKey("/data/corpus-v1")
    val c = Staging.corpusKey("/data/corpus_v1")
    assert(Set(a, b, c).size == 3, s"keys must differ: $a $b $c")
    // still readable: sanitized path survives as the prefix
    assert(a.startsWith("_data_corpus.v1_"))
  }

  test("fingerprint: a directory is fingerprinted by its files, and " +
    "changing one part file changes the fingerprint") {
    val dir = Files.createTempDirectory("graft_staging_fp")
    Files.writeString(dir.resolve("part-0"), "alpha")
    Files.writeString(dir.resolve("part-1"), "beta")
    val fp1 = Staging.fingerprint(dir)
    assert(fp1 == Staging.fingerprint(dir), "deterministic")
    Files.writeString(dir.resolve("part-1"), "betas") // size changes
    val fp2 = Staging.fingerprint(dir)
    assert(fp1 != fp2, "content change must invalidate")
    // single regular file works too
    assert(Staging.fingerprint(dir.resolve("part-0")).nonEmpty)
  }

  test("publishAtomic: winner publishes, loser discards its temp copy") {
    val stage = Files.createTempDirectory("graft_staging_pub")
    val dst = stage.resolve("edges-abc")
    def tmpCopy(tag: String) = {
      val t = stage.resolve(s"edges-abc.tmp-$tag")
      Files.createDirectories(t)
      Files.writeString(t.resolve("data"), "payload")
      t
    }
    val t1 = tmpCopy("1")
    Staging.publishAtomic(t1, dst)
    assert(Files.exists(dst.resolve("data")) && !Files.exists(t1))
    // second (lost-race) publish of an equivalent copy must not throw
    // and must clean up after itself
    val t2 = tmpCopy("2")
    Staging.publishAtomic(t2, dst)
    assert(Files.exists(dst.resolve("data")), "winner's copy survives")
    assert(!Files.exists(t2), "loser's temp copy is discarded")
  }

  test("deleteRecursively tolerates missing paths") {
    Staging.deleteRecursively(Paths.get("/tmp/graft_nonexistent_xyz"))
  }
}
