package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-STAGE task-metric attribution for one named query — the level
  * below [[JobProfile]] (guide §1/§7.1: decide whether a slow stage is
  * executor compute, GC, (de)serialization, scheduler delay, or
  * something off-CPU before touching anything). For every stage of the
  * instrumented run: wall span, summed executor run time, summed
  * executor CPU time, GC time, task (de)serialization time, and task
  * count. runTime >> cpuTime means tasks were OFF-CPU (I/O, lock,
  * fsync); wall >> runTime/tasks means scheduling overhead or barrier
  * waits dominate.
  *
  * Usage: sbt "runMain graft.tools.StageProfile <query> [sfDir]"
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // no-fork local FS (graft.io.NioLocalFileSystem scaladoc): Hadoop's
      // shell-backed chmod/readlink forks a process per created file /
      // checkpoint rename when libhadoop is absent — java.nio instead
      .config("spark.hadoop.fs.file.impl", "graft.io.NioLocalFileSystem")
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl", "graft.io.NioLocalFs")
      .getOrCreate()
    graft.GraftExtensions.assertWired(spark)
    spark.sparkContext.setLogLevel("WARN")

    def run(): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    run() // codegen warm — profile steady state, not Janino

    final case class St(id: Int, var nameStr: String = "",
                        var start: Long = 0L, var end: Long = 0L,
                        var tasks: Int = 0, var runMs: Long = 0L,
                        var cpuMs: Long = 0L, var gcMs: Long = 0L,
                        var serMs: Long = 0L, var schedMs: Long = 0L)
    val stages = mutable.LinkedHashMap[Int, St]()
    val listener = new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        synchronized {
          val s = stages.getOrElseUpdate(e.stageInfo.stageId, St(e.stageInfo.stageId))
          s.nameStr = e.stageInfo.name.take(60)
          s.start = System.currentTimeMillis()
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        synchronized {
          stages.get(e.stageInfo.stageId).foreach(_.end = System.currentTimeMillis())
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
        val s = stages.getOrElseUpdate(e.stageId, St(e.stageId))
        s.tasks += 1
        val m = e.taskMetrics
        if (m != null) {
          s.runMs += m.executorRunTime
          s.cpuMs += m.executorCpuTime / 1000000L
          s.gcMs += m.jvmGCTime
          s.serMs += m.executorDeserializeTime + m.resultSerializationTime
        }
        if (e.taskInfo != null)
          s.schedMs += math.max(0L, e.taskInfo.launchTime - s.start)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    run()
    val wall = (System.nanoTime() - t0) / 1e9
    val deadline = System.nanoTime() + 10e9.toLong
    while (listener.synchronized(stages.values.exists(_.end == 0)) &&
           System.nanoTime() < deadline) Thread.sleep(50)
    spark.sparkContext.removeSparkListener(listener)

    println(f"STAGEPROFILE $name: wall=$wall%.3f s, ${stages.size} stages")
    stages.values.toSeq.sortBy(-_.runMs).take(30).foreach { s =>
      val span = (s.end - s.start) / 1e3
      println(f"  stage ${s.id}%4d  span=$span%7.3f s  run=${s.runMs / 1e3}%7.3f s  " +
        f"cpu=${s.cpuMs / 1e3}%7.3f s  gc=${s.gcMs / 1e3}%6.3f s  " +
        f"ser=${s.serMs / 1e3}%6.3f s  tasks=${s.tasks}%3d  [${s.nameStr}]")
    }
    spark.stop()
  }
}
