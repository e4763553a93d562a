package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-JOB wall-time attribution for one named query (guide §1: decide
  * WHERE the time goes before touching anything). Runs the query once
  * warm, then once instrumented with a listener that records every
  * job's wall time, stage count, task count, and description — the
  * local-mode stand-in for the Spark UI's Jobs page (the UI is off in
  * the bench harness). Output: one line per job, slowest first, plus
  * the gaps (time between jobs = driver-side work: planning, collect
  * processing, checkpoint bookkeeping).
  *
  * Usage: sbt "runMain graft.tools.JobProfile <query> [sfDir]"
  */
object JobProfile {
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

    case class Job(id: Int, start: Long, var end: Long = 0L,
                   var stages: Int = 0, var tasks: Int = 0,
                   desc: String)
    val jobs = mutable.ArrayBuffer[Job]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs += Job(e.jobId, e.time, stages = e.stageInfos.size,
          tasks = e.stageInfos.map(_.numTasks).sum, desc = d)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
        jobs.find(_.id == e.jobId).foreach(_.end = e.time)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    run()
    val wall = (System.nanoTime() - t0) / 1e9
    // drain queued listener events before reading (the bus is async
    // and private[spark]; poll until every started job has ended)
    val deadline = System.nanoTime() + 10e9.toLong
    while (listener.synchronized(jobs.exists(_.end == 0)) &&
           System.nanoTime() < deadline) Thread.sleep(50)
    spark.sparkContext.removeSparkListener(listener)

    val done = jobs.filter(_.end > 0).sortBy(_.start)
    val jobSum = done.map(j => (j.end - j.start) / 1e3).sum
    println(f"PROFILE $name: wall=$wall%.3f s, ${done.size} jobs, " +
      f"job-sum=$jobSum%.3f s, driver-gap=${wall - jobSum}%.3f s")
    // chronological, with the gap BEFORE each job (driver time)
    var prevEnd = done.headOption.map(_.start).getOrElse(0L)
    done.foreach { j =>
      val gap = (j.start - prevEnd) / 1e3
      prevEnd = math.max(prevEnd, j.end)
      val dur = (j.end - j.start) / 1e3
      val tag = if (j.desc.nonEmpty) " [" + j.desc.take(60) + "]" else ""
      println(f"  job ${j.id}%4d  ${dur}%7.3f s  (gap before: ${gap}%6.3f s)  " +
        f"stages=${j.stages}%2d tasks=${j.tasks}%4d$tag")
    }
    spark.stop()
  }
}
