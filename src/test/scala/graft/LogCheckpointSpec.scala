package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.sources.{TxTable, ConcurrentWriteException}

/** TxTable self-contained log checkpoints (tt13): a `checkpoint`
  * manifest carries dirs + DVs + zones + Bloom refs, and the
  * `_last_checkpoint` pointer lets replay fold checkpoint + tail.
  * The O(tail) property is proven the only honest way: pre-checkpoint
  * manifests are physically moved aside and every read path keeps
  * working — if replay touched any of them it would throw.
  */
class LogCheckpointSpec extends SparkSpec {

  private def mkTable(prefix: String): (String, TxTable) = {
    val root = tmpDir(prefix)
    (root, new TxTable(s"$root/t"))
  }

  private def rows(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, (i * 7 % 101).toLong)).toDF("k", "v")
  }

  test("tt13: checkpoint+tail replay equals full replay on every read path") {
    val (root, t) = mkTable("graft_ckpt_eq_")
    t.appendWithStats(rows(0, 100), "k")
    t.appendWithStats(rows(100, 200), "k")
    t.appendWithBloom(rows(200, 300), "k")
    t.deleteWhere(spark, col("v") > 90)
    val ck = t.checkpoint()
    t.appendWithStats(rows(300, 400), "k")

    def state() = (
      t.snapshot(spark).orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq,
      t.resolveDirsRange("k", 120, 180).toSet,
      t.resolveDirsEquals("k", 250).toSet)

    val fast = state()
    // Deleting the pointer forces the full fold — same answers.
    Files.delete(Paths.get(s"$root/t/_txlog/_last_checkpoint"))
    val full = state()
    assert(fast === full)
    // Ground truth from the construction: the delete ran while only
    // k<300 was present; the post-checkpoint append is untouched.
    val want = (0 until 400).map(i => (i.toLong, (i * 7 % 101).toLong))
      .filterNot { case (k, v) => k < 300 && v > 90 }
    assert(fast._1 === want)
    assert(ck === 5L)
    TmpIO.deleteRecursively(new java.io.File(root))
  }

  test("tt13: reads are O(tail) — pre-checkpoint manifests physically removed") {
    val (root, t) = mkTable("graft_ckpt_tail_")
    t.appendWithStats(rows(0, 100), "k")
    t.appendWithBloom(rows(100, 200), "k")
    t.deleteWhere(spark, col("k") % 10 === 0)
    val ck = t.checkpoint()
    t.appendWithStats(rows(200, 300), "k")

    val before = t.snapshot(spark).orderBy("k").collect().map(_.getLong(0)).toSeq
    val prunedBefore = t.resolveDirsRange("k", 0, 50).toSet
    // 500 is absent from the bloom'd commit (100..200): its dir must
    // be skipped, and the skip must survive the checkpoint.
    val bloomBefore = t.resolveDirsEquals("k", 500).toSet
    val allDirs = t.resolveDirs().toSet

    // Move every pre-checkpoint manifest out of the log.
    val aside = Files.createDirectories(Paths.get(root, "aside"))
    (1L until ck).foreach { v =>
      val p = Paths.get(f"$root/t/_txlog/v$v%010d.json")
      Files.move(p, aside.resolve(p.getFileName), StandardCopyOption.ATOMIC_MOVE)
    }

    assert(t.snapshot(spark).orderBy("k").collect().map(_.getLong(0)).toSeq === before)
    assert(t.resolveDirsRange("k", 0, 50).toSet === prunedBefore)
    assert(prunedBefore.subsetOf(allDirs) && prunedBefore.size < allDirs.size,
      "zone pruning must keep working through the checkpoint")
    assert(t.resolveDirsEquals("k", 500).toSet === bloomBefore)
    assert(bloomBefore.size < allDirs.size,
      "Bloom skipping must keep working through the checkpoint")

    // Time travel BELOW the checkpoint needs the removed history — the
    // documented contract is a clean no-data failure, not a wrong answer.
    intercept[IllegalStateException] { t.snapshot(spark, Some(1L)) }
    TmpIO.deleteRecursively(new java.io.File(root))
  }

  test("tt13: a checkpoint never conflicts with a pinned transaction; real writes still do") {
    val (root, t) = mkTable("graft_ckpt_tx_")
    t.appendWithStats(rows(0, 100), "k")

    // Reader pinned, checkpoint lands, commit passes.
    val tx1 = t.transaction()
    tx1.snapshot(spark).count()
    t.checkpoint()
    tx1.commit(rows(100, 110), "append") // must not throw

    // Reader pinned, DELETE lands, commit refuses.
    val tx2 = t.transaction()
    tx2.snapshot(spark).count()
    t.deleteWhere(spark, col("k") < 5)
    intercept[ConcurrentWriteException] { tx2.commit(rows(110, 120), "append") }
    TmpIO.deleteRecursively(new java.io.File(root))
  }

  test("tt13: changes feed skips checkpoint manifests") {
    val (root, t) = mkTable("graft_ckpt_cdc_")
    val v1 = t.append(rows(0, 100))
    t.checkpoint()
    t.append(rows(100, 150))
    val changed = t.readChanges(spark, afterVersion = v1)
    assert(changed.count() === 50,
      "a checkpoint re-lists every dir; the feed must not replay the table")
    assert(changed.select("_commit_version").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(3L))
    TmpIO.deleteRecursively(new java.io.File(root))
  }

  test("tt14: string zones prune, survive a checkpoint, and hex round-trips") {
    import graft.sources.TxTable._
    // hex round-trip incl. non-ASCII; hex order == byte order
    for (s <- Seq("", "abc", "ZÜRICH", "日本語", "a\"b\\c\nd"))
      assert(fromHex(toHex(s)) === s)
    assert(toHex("a") < toHex("aa") && toHex("2-HIGH") < toHex("2~"))

    val (root, t) = mkTable("graft_szone_")
    import spark.implicits._
    def batch(p: String) =
      (0 until 50).map(i => (p, i.toLong)).toDF("cat", "v")
    Seq("alpha", "beta").foreach(p => t.appendWithStatsString(batch(p), "cat"))
    val ck = t.checkpoint()
    t.appendWithStatsString(batch("gamma"), "cat")

    val all = t.resolveDirs().toSet
    val alphaOnly = t.resolveDirsRangeString("cat", "a", "azzz").toSet
    assert(alphaOnly.size === 1 && alphaOnly.subsetOf(all))
    assert(t.snapshotRangeString(spark, "cat", "a", "azzz").count() === 50)
    // pruning metadata flowed through the checkpoint: drop history
    val aside = Files.createDirectories(Paths.get(root, "aside"))
    (1L until ck).foreach { v =>
      val p = Paths.get(f"$root/t/_txlog/v$v%010d.json")
      Files.move(p, aside.resolve(p.getFileName), StandardCopyOption.ATOMIC_MOVE)
    }
    assert(t.resolveDirsRangeString("cat", "a", "azzz").toSet === alphaOnly)
    assert(t.resolveDirsRangeString("cat", "g", "h").toSet.size === 1)
    assert(t.snapshotRangeString(spark, "cat", "b", "c").count() === 50)
    TmpIO.deleteRecursively(new java.io.File(root))
  }

  test("tt15: partial optimize rewrites only intersecting dirs; cold dirs untouched") {
    val (root, t) = mkTable("graft_popt_")
    t.appendWithStats(rows(0, 100), "k")    // band A
    t.appendWithStats(rows(100, 200), "k")  // band B
    t.appendWithStats(rows(200, 300), "k")  // band C
    t.deleteWhere(spark, col("k") % 10 === 0)
    val beforeDirs = t.resolveDirs().toVector
    val coldBefore = t.resolveDirsRange("k", 200, 299).toSet

    val v = t.optimizeCompactWhere(spark, "k", 0, 150) // hits A and B
    val afterDirs = t.resolveDirs().toVector
    assert(afterDirs.size === 2, "A+B fused into one dir, C kept")
    assert(afterDirs.contains(beforeDirs(2)), "cold dir C must keep its files")
    assert(!afterDirs.contains(beforeDirs(0)) && !afterDirs.contains(beforeDirs(1)))
    // cold band still zone-pruned to the SAME physical dir
    assert(t.resolveDirsRange("k", 200, 299).toSet === coldBefore)
    // rewritten band pruned to ONLY the new dir; fresh zone works
    val hot = t.resolveDirsRange("k", 0, 150).toSet
    assert(hot.size === 1 && !beforeDirs.take(2).exists(hot.contains))
    // logical content unchanged: MoR deletes materialized for hot,
    // still merge-on-read for cold
    val want = (0 until 300).filterNot(_ % 10 == 0).map(_.toLong).toSeq
    assert(t.snapshot(spark).orderBy("k").collect().map(_.getLong(0)).toSeq === want)
    // disjoint predicate: a no-op that does not bump the version
    assert(t.optimizeCompactWhere(spark, "k", 5000, 6000) === v)
    TmpIO.deleteRecursively(new java.io.File(root))
  }

  test("vacuumLog completes the reclamation chain: checkpoint -> vacuumLog -> vacuum") {
    val (root, t) = mkTable("graft_vlog_")
    t.appendWithStats(rows(0, 100), "k")
    t.appendWithStats(rows(100, 200), "k")
    t.optimizeCompact(spark) // retires the two original dirs
    val retired = 2
    val ck = t.checkpoint()
    t.appendWithStats(rows(200, 250), "k")

    // before vacuumLog: nothing is reclaimable (old manifests still
    // reference the retired dirs), and vacuumLog without a valid
    // pointer would be a no-op (covered by the stale-pointer test).
    assert(t.vacuum(retentionMillis = 0).isEmpty)
    val dropped = t.vacuumLog()
    assert(dropped === (1L until ck))
    // reads at and above the checkpoint still exact
    assert(t.snapshot(spark).count() === 250)
    assert(t.snapshotRange(spark, "k", 0, 50).count() === 51)
    // the retired dirs lost their last manifest reference: reclaimable
    val reclaimed = t.vacuum(retentionMillis = 0)
    assert(reclaimed.size === retired, s"got $reclaimed")
    assert(t.snapshot(spark).count() === 250, "reads survive reclamation")
    // time travel below the checkpoint is gone by contract
    intercept[IllegalStateException] { t.snapshot(spark, Some(1L)) }
    TmpIO.deleteRecursively(new java.io.File(root))
  }

  test("readChanges refuses a range with vacuumed (missing) log versions") {
    val (root, t) = mkTable("graft_vgap_")
    t.appendWithStats(rows(0, 100), "k")    // v1
    t.appendWithStats(rows(100, 200), "k")  // v2
    val ck = t.checkpoint()                 // v3
    t.appendWithStats(rows(200, 250), "k")  // v4
    t.vacuumLog()                           // drops v1, v2
    // afterVersion below the checkpoint: the vacuumed appends cannot be
    // replayed — partial feed must throw, never silently omit.
    val e = intercept[IllegalStateException] { t.readChanges(spark, 0L) }
    assert(e.getMessage.contains("re-read a full snapshot"))
    intercept[IllegalStateException] { t.readChanges(spark, 1L) }
    // from the checkpoint onward the feed is still exact
    assert(t.readChanges(spark, ck).count() === 50)
    TmpIO.deleteRecursively(new java.io.File(root))
  }

  test("tt13: stale pointer (corrupt or missing target) falls back to full replay") {
    val (root, t) = mkTable("graft_ckpt_ptr_")
    t.append(rows(0, 100))
    t.checkpoint()
    val ptr = Paths.get(s"$root/t/_txlog/_last_checkpoint")
    Files.write(ptr, "garbage".getBytes("UTF-8"))
    assert(t.snapshot(spark).count() === 100)
    Files.write(ptr, "99".getBytes("UTF-8")) // no such manifest
    assert(t.snapshot(spark).count() === 100)
    TmpIO.deleteRecursively(new java.io.File(root))
  }
}
