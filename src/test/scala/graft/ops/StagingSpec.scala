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

  // ------------------------------------------------- sweepStale rules

  private def mkArtifact(stage: java.nio.file.Path, name: String) = {
    val d = stage.resolve(name)
    Files.createDirectories(d)
    Files.writeString(d.resolve("data"), "payload")
    d
  }

  test("sweepStale: a stale-fingerprint artifact is kept inside the " +
    "grace window and reclaimed after it (advice r9 age gate)") {
    val stage = Files.createTempDirectory("graft_sweep_age")
    val corpus = Files.createTempDirectory("graft_sweep_corpus")
    Files.writeString(corpus.resolve("part-0"), "v2")
    val current = mkArtifact(stage,
      s"edges-${Staging.fingerprint(corpus)}")
    val stale = mkArtifact(stage, "edges-deadbeef")
    Staging.sweepStale(stage, "edges", corpus) // default 1 h grace
    assert(Files.exists(stale), "young stale artifact survives the window")
    Staging.sweepStale(stage, "edges", corpus, graceMillis = -1)
    assert(!Files.exists(stale), "aged stale artifact is reclaimed")
    assert(Files.exists(current.resolve("data")),
      "current-fingerprint artifact is never touched")
  }

  test("sweepStale: the current fingerprint is recomputed at sweep " +
    "time, so a late publisher can't sweep the newer artifact") {
    val stage = Files.createTempDirectory("graft_sweep_fp")
    val corpus = Files.createTempDirectory("graft_sweep_corpus2")
    Files.writeString(corpus.resolve("part-0"), "old")
    val oldFp = Staging.fingerprint(corpus)
    Files.writeString(corpus.resolve("part-0"), "newer") // regenerated
    val newArt = mkArtifact(stage, s"edges-${Staging.fingerprint(corpus)}")
    val oldArt = mkArtifact(stage, s"edges-$oldFp")
    // the late publisher knows only oldFp — but the sweep re-reads the
    // corpus, so the NEW artifact survives and the old one goes
    Staging.sweepStale(stage, "edges", corpus, graceMillis = -1)
    assert(Files.exists(newArt.resolve("data")), "newer artifact survives")
    assert(!Files.exists(oldArt), "late publisher's own artifact swept")
  }

  test("sweepStale: orphaned .tmp- copies of dead writers are " +
    "reclaimed; a live writer's in-flight copy survives") {
    val stage = Files.createTempDirectory("graft_sweep_tmp")
    val corpus = Files.createTempDirectory("graft_sweep_corpus3")
    Files.writeString(corpus.resolve("part-0"), "x")
    val fp = Staging.fingerprint(corpus)
    // own (live) pid: must survive even past the grace window's
    // completed-artifact rule — publishAtomic owns its lifecycle
    val live = mkArtifact(stage,
      s"edges-$fp.tmp-${ProcessHandle.current().pid()}")
    // a pid that can't be alive (max pid is bounded far below this)
    val dead = mkArtifact(stage, "edges-aaaa.tmp-999999999")
    Staging.sweepStale(stage, "edges", corpus)
    assert(Files.exists(live.resolve("data")), "live writer untouched")
    assert(!Files.exists(dead), "dead writer's orphan reclaimed")
  }
}
