package graft.io

import java.io.File
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Table-maintenance operators.
  *
  * The reference ships 50–200 KB parquet files against its own stated
  * 128–256 MB target (`doc/GLUE_JOBS_GUIDE.md:310,404-407`; SURVEY
  * §7.4-7) — the classic small-files problem of per-hour incremental
  * writes. `compact` rewrites a (possibly hive-partitioned) parquet
  * table into near-target-size files, preserving partition layout and
  * content.
  */
object Maintenance {

  /** Recursively list leaf parquet files. */
  def dataFiles(root: String): Seq[File] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new File(root))
  }

  /** Rewrite `path` with files sized toward `targetBytes`.
    *
    * Implementation: read with partition discovery, then let a
    * per-partition repartition bring file count to
    * ceil(partitionBytes / targetBytes). Uses a temp dir + atomic-ish
    * swap (write new, move old away, move new in) so a crash leaves
    * either the old or the new table, never a mix.
    */
  def compact(spark: SparkSession, path: String, partitionCols: Seq[String],
              targetBytes: Long = 128L * 1024 * 1024): Unit = {
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    val totalBytes = dataFiles(path).map(_.length).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(path)
    val tmp = path + "__compact_tmp"
    val writer =
      (if (partitionCols.isEmpty) df.repartition(nFiles)
       else df.repartition(nFiles, partitionCols.map(col): _*))
        .write.mode("overwrite")
    (if (partitionCols.isEmpty) writer else writer.partitionBy(partitionCols: _*))
      .parquet(tmp)
    val old = new File(path + "__compact_old")
    require(new File(path).renameTo(old), s"cannot move $path aside")
    require(new File(tmp).renameTo(new File(path)), s"cannot move $tmp into place")
    def rm(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(old)
  }
}
