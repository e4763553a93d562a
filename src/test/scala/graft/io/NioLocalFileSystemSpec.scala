package graft.io

import java.nio.file.Files
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.hadoop.fs.permission.FsPermission

import scala.jdk.CollectionConverters._

/** The no-fork local filesystem shims (r14): both registration points
  * must actually resolve through the session's Hadoop conf, and the
  * java.nio chmod must reproduce FsPermission semantics bit-for-bit —
  * a silent fallback to the stock shell-forking FS would erase the
  * measured streaming/sink win with no functional signal.
  */
class NioLocalFileSystemSpec extends graft.SparkSpec {

  private def hconf = spark.sessionState.newHadoopConf()

  test("fs.file.impl resolves to NioLocalFileSystem") {
    val fs = FileSystem.get(new java.net.URI("file:///"), hconf)
    assert(fs.isInstanceOf[NioLocalFileSystem],
      s"got ${fs.getClass.getName} — the no-fork FS is not registered")
  }

  test("setPermission translates every mode bit without forking") {
    val fs = FileSystem.get(new java.net.URI("file:///"), hconf)
    val dir = Files.createTempDirectory("niofs_perm")
    val f = new Path(dir.toString, "x.txt")
    val out = fs.create(f); out.write(42); out.close()
    for (mode <- Seq(Integer.parseInt("644", 8), Integer.parseInt("755", 8),
        Integer.parseInt("600", 8), Integer.parseInt("421", 8))) {
      fs.setPermission(f, new FsPermission(mode.toShort))
      val got = Files.getPosixFilePermissions(
        java.nio.file.Paths.get(dir.toString, "x.txt")).asScala
      def bit(b: Int) = (mode & b) != 0
      assert(got.contains(OWNER_READ) == bit(0x100), s"mode $mode owner r")
      assert(got.contains(OWNER_WRITE) == bit(0x80), s"mode $mode owner w")
      assert(got.contains(OWNER_EXECUTE) == bit(0x40), s"mode $mode owner x")
      assert(got.contains(GROUP_READ) == bit(0x20), s"mode $mode group r")
      assert(got.contains(GROUP_WRITE) == bit(0x10), s"mode $mode group w")
      assert(got.contains(GROUP_EXECUTE) == bit(0x8), s"mode $mode group x")
      assert(got.contains(OTHERS_READ) == bit(0x4), s"mode $mode other r")
      assert(got.contains(OTHERS_WRITE) == bit(0x2), s"mode $mode other w")
      assert(got.contains(OTHERS_EXECUTE) == bit(0x1), s"mode $mode other x")
    }
  }

  test("FileContext path (AbstractFileSystem impl) creates and renames") {
    // the streaming metadata logs go through FileContext when the
    // FileContext-based manager is selected — the NioLocalFs chain
    // must behave like Hadoop's stock local.LocalFs
    val fc = FileContext.getFileContext(new java.net.URI("file:///"), hconf)
    val dir = Files.createTempDirectory("niofs_fc")
    val tmp = new Path(dir.toString, "t.tmp")
    val dst = new Path(dir.toString, "final.txt")
    val out = fc.create(tmp, java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE))
    out.write("payload".getBytes("UTF-8")); out.close()
    fc.rename(tmp, dst, Options.Rename.OVERWRITE)
    val in = fc.open(dst)
    val buf = new Array[Byte](7); in.readFully(buf); in.close()
    assert(new String(buf, "UTF-8") == "payload")
    assert(!fc.util.exists(tmp))
  }

  test("parquet roundtrip through the shim is byte-faithful") {
    import spark.implicits._
    val dir = Files.createTempDirectory("niofs_pq").toString + "/t"
    val df = (1 to 1000).map(i => (i.toLong, s"row$i", i * 1.5)).toDF("id", "s", "v")
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).collect()(0).getLong(0)
      == (1 to 1000).map(_.toLong).sum)
  }
}
