package graft.io

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned parquet tables: time travel, rollback, and
  * snapshot diff on plain parquet — the copy-on-write manifest design
  * of the open table formats, reduced to its load-bearing core.
  *
  * The reference's serve-time story is "crawler re-registers whatever
  * parquet is under the prefix" (`doc/architecture.md:249-264`), which
  * means a reader racing a rewrite sees a torn table and yesterday's
  * data is gone the moment it's overwritten. Versioned manifests fix
  * both: a commit writes its data files into a fresh immutable subdir
  * and then publishes ONE small JSON manifest by atomic rename, so
  * readers always see a complete snapshot, and every historical
  * version stays readable until explicitly expired.
  *
  * Scale notes (100 TB discipline):
  *  - a commit never rewrites existing data — cost is the new files
  *    plus one tiny driver-side manifest (metadata, not data);
  *  - `read` plans a parquet scan over exactly the manifest's files —
  *    normal pushdown/pruning applies, no listing of the whole prefix;
  *  - `rollback` is metadata-only: a new manifest pointing at the old
  *    version's files;
  *  - `diff` is a full-row multiset compare (two hash-aggregate
  *    anti-joins); at petabyte grain you'd first narrow to changed
  *    files via the manifests — both versions' file lists are right
  *    there — and diff only the non-shared ones.
  *
  * Layout:
  * {{{
  *   tableDir/data/<commit-uuid>/part-*.parquet   immutable per commit
  *   tableDir/_manifests/v00001.json              {"version":1,"files":[...]}
  * }}}
  */
object Snapshots {

  private def manifestDir(tableDir: String) = new File(tableDir, "_manifests")

  private def manifestFile(tableDir: String, v: Int) =
    new File(manifestDir(tableDir), f"v$v%05d.json")

  /** Committed versions, ascending. Accepts 5+ digits and parses
    * numerically: the `%05d` zero-pad keeps names sortable only up to
    * v99999, and a fixed `\d{5}` match would make every manifest from
    * v100000 on INVISIBLE — publishes would "succeed" while read()
    * serves v99999 forever.
    */
  def versions(tableDir: String): Seq[Int] = {
    val d = manifestDir(tableDir)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq.map(_.getName)
      .collect { case n if n.matches("v\\d{5,}\\.json") =>
        n.stripPrefix("v").stripSuffix(".json").toInt }
      .sorted
  }

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

  private def listParquet(dir: File): Seq[File] =
    Maintenance.dataFiles(dir.getPath)

  private def claimFile(tableDir: String, v: Int) =
    new File(manifestDir(tableDir), f"v$v%05d.claim")

  private def publish(tableDir: String, files: Seq[String]): Int = {
    manifestDir(tableDir).mkdirs()
    // Version allocation must be race-free: POSIX rename() silently
    // REPLACES an existing target, so two concurrent committers that
    // both compute "next = 7" would clobber each other's manifest.
    // Claiming the number first via createFile (atomic-exclusive on
    // POSIX) makes the loser advance to the next number instead.
    // A crashed claimer leaves a gap in the version sequence, never a
    // torn table — readers only ever see published manifests.
    var v = versions(tableDir).lastOption.getOrElse(0) + 1
    var claimed = false
    while (!claimed) {
      try { Files.createFile(claimFile(tableDir, v).toPath); claimed = true }
      catch { case _: java.nio.file.FileAlreadyExistsException => v += 1 }
    }
    val json = files.map(f => "\"" + esc(f) + "\"")
      .mkString(s"""{"version":$v,"files":[""", ",", "]}")
    // temp-write + atomic rename: readers never observe a half manifest
    val tmp = Paths.get(manifestDir(tableDir).getPath, s".v$v.${UUID.randomUUID()}.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestFile(tableDir, v).toPath, StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** True iff `version` is still the table head — the post-commit
    * check for pipelines that must DETECT shadowing (see [[commit]]).
    */
  def isHead(tableDir: String, version: Int): Boolean =
    versions(tableDir).lastOption.contains(version)

  /** Commit `df` as the table's next version. Returns the version id.
    *
    * Concurrency contract: version numbers are CLAIM-ordered, not
    * publish-ordered. A committer that stalls between claiming v and
    * publishing its manifest can be overtaken by a later claim v+1
    * that publishes first — when v finally lands it is a correct,
    * fully-readable HISTORICAL version, but not the head, and the
    * later head was built without v's changes (optimistic concurrency
    * WITHOUT conflict detection — the same lost-update exposure as
    * blind last-writer-wins). Pipelines that need to detect this call
    * [[isHead]] after commit and retry/merge when shadowed.
    */
  def commit(df: DataFrame, tableDir: String): Int = {
    val commitDir = new File(new File(tableDir, "data"), UUID.randomUUID().toString)
    df.write.mode("overwrite").parquet(commitDir.getPath)
    publish(tableDir, listParquet(commitDir).map(_.getPath))
  }

  private def files(tableDir: String, v: Int): Seq[String] = {
    val f = manifestFile(tableDir, v)
    require(f.isFile, s"no version $v under $tableDir (have ${versions(tableDir)})")
    val json = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
    // controlled manifest shape (we wrote it): extract the quoted paths
    "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(json).map(_.group(1))
      .map(_.replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
      .filter(_.endsWith(".parquet"))
  }

  /** Read a snapshot (latest when `version` is None). */
  def read(spark: SparkSession, tableDir: String, version: Option[Int] = None): DataFrame = {
    val vs = versions(tableDir)
    require(vs.nonEmpty, s"empty snapshot table $tableDir")
    val v = version.getOrElse(vs.last)
    spark.read.parquet(files(tableDir, v): _*)
  }

  /** Make `version`'s content the newest version again. Metadata-only:
    * the new manifest points at the old version's (immutable) files.
    */
  def rollback(tableDir: String, version: Int): Int =
    publish(tableDir, files(tableDir, version))

  /** Multiset row diff between two snapshots: one row per changed
    * occurrence, tagged `change` = 'inserted' (in v2 not v1) or
    * 'deleted' (in v1 not v2).
    */
  def diff(spark: SparkSession, tableDir: String, v1: Int, v2: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val a = read(spark, tableDir, Some(v1))
    val b = read(spark, tableDir, Some(v2))
    b.exceptAll(a).withColumn("change", lit("inserted"))
      .unionByName(a.exceptAll(b).withColumn("change", lit("deleted")))
  }

  /** Drop manifests (and data files no surviving manifest references)
    * for all versions older than `keepLast` — the vacuum/expire step.
    */
  def expire(tableDir: String, keepLast: Int): Unit = {
    val vs = versions(tableDir)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepLast))
    val live = keep.flatMap(files(tableDir, _)).toSet
    val dead = drop.flatMap(files(tableDir, _)).filterNot(live)
    drop.foreach { v =>
      manifestFile(tableDir, v).delete()
      claimFile(tableDir, v).delete()
    }
    dead.foreach { p =>
      new File(p).delete()
      // the local ChecksumFileSystem leaves a .crc sibling per file
      val f = new File(p)
      new File(f.getParentFile, s".${f.getName}.crc").delete()
    }
    // reap commit dirs with no DATA files left: parquet writes leave
    // _SUCCESS + .crc markers, so "empty" must mean "no .parquet files"
    // or those dirs (and their marker cruft) accumulate forever
    val dataDir = new File(tableDir, "data")
    if (dataDir.isDirectory)
      dataDir.listFiles()
        .filter(d => d.isDirectory &&
          !d.listFiles().exists(_.getName.endsWith(".parquet")))
        .foreach { d => d.listFiles().foreach(_.delete()); d.delete(); () }
  }
}
