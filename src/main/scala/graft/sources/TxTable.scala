package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** TxTable — a minimal TRANSACTIONAL table over parquet: an ordered
  * commit log of immutable manifest files on top of immutable data
  * files, giving snapshot isolation, optimistic concurrency, and time
  * travel. The one storage capability a 100 TB pipeline needs that a
  * bare parquet directory cannot provide: a reader must never observe
  * a half-written batch, a re-run must never double-append, and
  * yesterday's training snapshot must stay reproducible after today's
  * ingest. (Same design family as open-source log-structured table
  * formats — commit log + immutable files — reduced to the minimal
  * protocol this engine needs; no external dependency.)
  *
  * Layout:
  * {{{
  *   <root>/data/<uuid>/part-*.parquet   -- immutable data files, one dir per commit
  *   <root>/_txlog/v%010d.json           -- manifest: action + data dir
  * }}}
  *
  * Protocol:
  *  - WRITE: stage the batch's parquet files into a fresh uuid dir
  *    (invisible to readers — only manifests make data visible), then
  *    publish manifest version N+1 via an atomic CREATE-EXCLUSIVE
  *    hard link. Two writers racing to the same version: exactly one
  *    link succeeds (EEXIST for the loser), the loser re-reads the
  *    log and retries against the new head — optimistic concurrency
  *    with no lock server, the standard object-store commit trick.
  *  - READ: resolve the manifest list ONCE into a concrete file set
  *    (the snapshot); subsequent commits add new manifests + new dirs
  *    and never touch resolved files, so an in-flight reader is
  *    isolated by construction.
  *  - TIME TRAVEL: `snapshot(spark, asOf = Some(v))` replays the log
  *    only up to v — an `overwrite` manifest resets the visible set,
  *    an `append` extends it.
  *
  * Scale notes: manifests carry directory names, not per-row state —
  * commit cost is O(1) in table size; reads plan a normal multi-dir
  * vectorized parquet scan (pushdown/pruning intact). Log compaction
  * (manifest checkpointing) is the known growth path once versions
  * reach many thousands; out of scope here.
  */
class TxTable(val root: String) {

  private val logDir: Path = Paths.get(root, "_txlog")
  private val dataDir: Path = Paths.get(root, "data")

  private def manifestPath(v: Long): Path = logDir.resolve(f"v$v%010d.json")

  /** Versions present in the log, ascending (empty table → empty). */
  def versions(): Seq[Long] =
    if (!Files.isDirectory(logDir)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.list(logDir).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
          s.stripPrefix("v").stripSuffix(".json").toLong }
        .toSeq.sorted
    }

  def latestVersion(): Option[Long] = versions().lastOption

  /** Append `df` as a new committed version; returns the version. */
  def append(df: DataFrame): Long = commit(df, "append")

  /** Replace the visible table with `df` as a new committed version. */
  def overwrite(df: DataFrame): Long = commit(df, "overwrite")

  /** Snapshot read: replay manifests up to `asOf` (default: head) into
    * a concrete parquet-directory set, resolved EAGERLY — the returned
    * DataFrame is pinned to this snapshot no matter how many commits
    * land while it is being consumed.
    */
  def snapshot(spark: SparkSession, asOf: Option[Long] = None): DataFrame = {
    val dirs = resolveDirs(asOf)
    if (dirs.isEmpty)
      throw new IllegalStateException(s"TxTable $root: no committed data" +
        asOf.map(v => s" at or before version $v").getOrElse(""))
    spark.read.parquet(dirs: _*)
  }

  /** The data directories visible at `asOf` (testing/inspection). */
  def resolveDirs(asOf: Option[Long] = None): Seq[String] = {
    val kept = versions().filter(v => asOf.forall(v <= _))
    kept.foldLeft(Vector.empty[String]) { (acc, v) =>
      val (action, dir) = readManifest(v)
      action match {
        case "overwrite" => Vector(dir)
        case _           => acc :+ dir
      }
    }
  }

  private def readManifest(v: Long): (String, String) = {
    val s = new String(Files.readAllBytes(manifestPath(v)), "UTF-8")
    def field(k: String): String = {
      val m = ("\"" + k + "\"\\s*:\\s*\"([^\"]*)\"").r
      m.findFirstMatchIn(s).map(_.group(1))
        .getOrElse(throw new IllegalStateException(
          s"TxTable $root: manifest v$v missing field $k"))
    }
    (field("action"), field("dir"))
  }

  /** Stage the batch invisibly, then publish with create-exclusive
    * retry. Data files are written BEFORE any manifest exists for
    * them, so a crash between the two steps leaks an orphan dir
    * (vacuumable) but never a torn table.
    */
  private def commit(df: DataFrame, action: String): Long = {
    Files.createDirectories(logDir)
    Files.createDirectories(dataDir)
    val uuid = java.util.UUID.randomUUID().toString
    val stage = dataDir.resolve(uuid)
    df.write.parquet(stage.toString)
    var attempt = latestVersion().getOrElse(0L) + 1
    while (!tryPublish(attempt, action, stage.toString)) {
      attempt = latestVersion().getOrElse(0L) + 1
    }
    attempt
  }

  /** Publish manifest `v` exclusively: full bytes to a temp file, then
    * an atomic hard link into place — link(2) fails with EEXIST if the
    * version was taken, and a reader can never observe partial JSON
    * because the content exists in full before the name does. Returns
    * false on losing the race (caller re-reads the head and retries).
    */
  private[graft] def tryPublish(v: Long, action: String, dir: String): Boolean = {
    val json =
      s"""{"version":$v,"action":"$action","dir":"${dir.replace("\\", "/")}"}"""
    val tmp = Files.createTempFile(logDir, s".v$v-", ".tmp")
    Files.write(tmp, json.getBytes("UTF-8"))
    try {
      try { Files.createLink(manifestPath(v), tmp); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException =>
          // Filesystem without hard links: CREATE_NEW single write —
          // still create-exclusive, with an (accepted) tiny window of
          // partial content instead of none.
          try {
            Files.write(manifestPath(v), json.getBytes("UTF-8"),
              java.nio.file.StandardOpenOption.CREATE_NEW)
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
          }
      }
    } finally Files.deleteIfExists(tmp)
  }
}
