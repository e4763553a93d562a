package graft.io

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("graft_snap").toString

  test("commit/read: latest wins, every historical version stays readable") {
    val dir = tbl()
    val v1 = Snapshots.commit(Seq((1, "a"), (2, "b")).toDF("id", "s"), dir)
    val v2 = Snapshots.commit(Seq((1, "a"), (2, "B"), (3, "c")).toDF("id", "s"), dir)
    assert(v1 == 1 && v2 == 2)
    assert(Snapshots.versions(dir) == Seq(1, 2))
    assert(Snapshots.read(spark, dir).count() == 3) // latest
    val old = Snapshots.read(spark, dir, Some(1)).as[(Int, String)].collect().sorted
    assert(old.toSeq == Seq((1, "a"), (2, "b"))) // time travel unaffected by v2
  }

  test("rollback is metadata-only and restores old content as newest") {
    val dir = tbl()
    Snapshots.commit(Seq((1, 10)).toDF("id", "v"), dir)
    Snapshots.commit(Seq((1, 99)).toDF("id", "v"), dir)
    val dataFilesBefore = Maintenance.dataFiles(dir).map(_.getPath).toSet
    val v3 = Snapshots.rollback(dir, 1)
    assert(v3 == 3)
    // no data movement — identical file set, one more manifest
    assert(Maintenance.dataFiles(dir).map(_.getPath).toSet == dataFilesBefore)
    assert(Snapshots.read(spark, dir).as[(Int, Int)].head() == ((1, 10)))
  }

  test("diff tags multiset inserts and deletes between snapshots") {
    val dir = tbl()
    // duplicate row on purpose: diff must be multiset-correct
    Snapshots.commit(Seq((1, "x"), (1, "x"), (2, "y")).toDF("id", "s"), dir)
    Snapshots.commit(Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "s"), dir)
    val d = Snapshots.diff(spark, dir, 1, 2)
      .select("id", "s", "change").as[(Int, String, String)].collect().sorted
    assert(d.toSeq == Seq((1, "x", "deleted"), (3, "z", "inserted")))
  }

  test("expire keeps the newest K versions and reaps unreferenced files") {
    val dir = tbl()
    Snapshots.commit(Seq(1).toDF("id"), dir)
    Snapshots.commit(Seq(2).toDF("id"), dir)
    val keepRollback = Snapshots.rollback(dir, 1) // v3 shares v1's files
    Snapshots.commit(Seq(4).toDF("id"), dir)      // v4
    Snapshots.expire(dir, keepLast = 2)           // keep v3, v4
    assert(Snapshots.versions(dir) == Seq(keepRollback, 4))
    // v3 still reads v1's (shared, therefore kept) files
    assert(Snapshots.read(spark, dir, Some(3)).as[Int].head() == 1)
    // v2's files are gone from disk
    intercept[IllegalArgumentException](Snapshots.read(spark, dir, Some(2)))
  }

  test("a competing claim on the next version is skipped, never clobbered") {
    val dir = tbl()
    Snapshots.commit(Seq((1, "a")).toDF("id", "s"), dir)
    // another committer has claimed v2 but not yet published
    val stolen = new File(dir, "_manifests/v00002.claim")
    java.nio.file.Files.createFile(stolen.toPath)
    val v = Snapshots.commit(Seq((2, "b")).toDF("id", "s"), dir)
    assert(v == 3, "loser of the claim race must advance past the taken number")
    assert(Snapshots.versions(dir) == Seq(1, 3)) // gap where the claim sits
    assert(Snapshots.read(spark, dir).as[(Int, String)].head() == ((2, "b")))
  }

  test("read@version plans pushdown like any parquet scan") {
    val dir = tbl()
    Snapshots.commit((1 to 100).map(i => (i, i % 7)).toDF("id", "grp"), dir)
    val plan = Snapshots.read(spark, dir, Some(1))
      .filter($"id" === 42).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("42"))
  }
}
