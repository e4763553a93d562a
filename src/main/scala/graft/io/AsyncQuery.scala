package graft.io

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Asynchronous SQL execution protocol — the engine-native analogue of
  * the reference's Athena client (`utils/athena_utils.py:38-145`:
  * `start_query_execution` → poll `get_query_execution` →
  * `get_query_results` with string-typed rows and a header row).
  *
  * Semantics mirrored:
  *  - `submit` returns immediately with a query-execution id; the
  *    query runs on a daemon thread under its own Spark job group.
  *  - `status` reports QUEUED/RUNNING/SUCCEEDED/FAILED/CANCELLED plus
  *    the failure reason (the reference's StateChangeReason).
  *  - results land as header-first CSV at the query's output location
  *    (Athena's result object layout), and `fetchResults` returns them
  *    the way Athena's API does: EVERY value string-typed, header
  *    included as the first row.
  *  - `cancel` maps to `stop_query_execution` — it cancels the job
  *    group, so running stages are interrupted.
  *
  * Scale notes: the submit thread only ORCHESTRATES — execution stays
  * fully distributed, and results stream to the output location
  * through the normal writer path (no driver materialization beyond
  * what `fetchResults(maxResults)` pages in, mirroring Athena's
  * paged `get_query_results`).
  */
object AsyncQuery {

  sealed trait State
  case object Queued extends State
  case object Running extends State
  case object Succeeded extends State
  case class Failed(reason: String) extends State
  case object Cancelled extends State

  private final case class Handle(id: String, outputLocation: String,
      state: java.util.concurrent.atomic.AtomicReference[State])

  private val handles = new ConcurrentHashMap[String, Handle]()

  /** Start `sql` asynchronously; results are written header-first CSV
    * under `outputLocation/<id>/`. Returns the query-execution id.
    *
    * State transitions are CAS-guarded: a cancel() landing between
    * submit() and the runner thread's first instruction wins — the
    * runner's Queued→Running CAS fails and it never executes (the
    * un-guarded version would clobber CANCELLED back to RUNNING and
    * burn the full query's compute).
    */
  def submit(spark: SparkSession, sql: String, outputLocation: String): String = {
    val id = UUID.randomUUID().toString
    val dest = s"$outputLocation/$id"
    val handle = Handle(id, dest,
      new java.util.concurrent.atomic.AtomicReference[State](Queued))
    handles.put(id, handle)
    val runner = new Thread(() => {
      if (handle.state.compareAndSet(Queued, Running)) {
        try {
          spark.sparkContext.setJobGroup(s"async-$id", s"async query $id",
            interruptOnCancel = true)
          // analysis/planning can take seconds and submits NO jobs — a
          // cancel in that window has nothing to kill, so re-check the
          // state before submitting work (cancel() also uses
          // cancelJobGroupAndFutureJobs, so any job this thread
          // submits after a cancel is killed at submission)
          val planned = spark.sql(sql)
          if (handle.state.get() == Running) {
            planned.write.mode("overwrite").option("header", "true").csv(dest)
            handle.state.compareAndSet(Running, Succeeded)
          }
        } catch {
          case e: Throwable => handle.state.compareAndSet(Running,
            Failed(Option(e.getMessage).getOrElse(e.getClass.getName)))
        } finally spark.sparkContext.clearJobGroup()
      }
    }, s"graft-async-$id")
    runner.setDaemon(true)
    runner.start()
    id
  }

  /** Current execution state (the reference's get_query_execution). */
  def status(id: String): State = {
    val h = handles.get(id)
    require(h != null, s"unknown query execution id $id")
    h.state.get()
  }

  /** Block until the query reaches a terminal state (the reference's
    * poll loop, `athena_utils.py:74-96`), with a poll interval and
    * overall timeout. Returns the state observed when polling stopped:
    * a TERMINAL state normally, but still Queued/Running when the
    * deadline passed first — callers distinguishing "timed out" from
    * "finished" must check for the non-terminal states (or cancel()).
    */
  def waitFor(id: String, timeoutMs: Long = 120000L, pollMs: Long = 50L): State = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var s = status(id)
    while ((s == Queued || s == Running) && System.currentTimeMillis() < deadline) {
      Thread.sleep(pollMs)
      s = status(id)
    }
    s
  }

  /** Cancel a running query (stop_query_execution): cancels the job
    * group so running stages interrupt; state becomes CANCELLED unless
    * already terminal.
    */
  def cancel(spark: SparkSession, id: String): Unit = {
    val h = handles.get(id)
    require(h != null, s"unknown query execution id $id")
    // CAS loop: only a non-terminal state may move to Cancelled (a
    // concurrent Succeeded/Failed wins and sticks)
    var done = false
    while (!done) {
      h.state.get() match {
        case s @ (Queued | Running) =>
          done = h.state.compareAndSet(s, Cancelled)
          // ...AndFutureJobs: plain cancelJobGroup only kills ACTIVE
          // jobs, so a cancel landing between two of the query's jobs
          // (or during planning) would let the remaining jobs run
          if (done) spark.sparkContext.cancelJobGroupAndFutureJobs(s"async-$id")
        case _ => done = true
      }
    }
  }

  /** Fetch results the way Athena's get_query_results returns them:
    * the header row first, then data rows, EVERY value as a string
    * (nulls as empty strings — CSV has no null marker by default).
    * `maxResults` pages the fetch like the API's page size.
    */
  def fetchResults(spark: SparkSession, id: String,
                   maxResults: Int = 1000): Seq[Seq[String]] = {
    val h = handles.get(id)
    require(h != null, s"unknown query execution id $id")
    require(h.state.get() == Succeeded,
      s"query $id not in SUCCEEDED state: ${h.state.get()}")
    val df = resultsDf(spark, id)
    val header = df.columns.toSeq
    header +: df.limit(maxResults).collect().toSeq
      .map(_.toSeq.map(v => if (v == null) "" else v.toString))
  }

  /** The result set as a DataFrame of STRINGS (every column
    * string-typed — the Athena result contract), for callers that
    * want to keep processing distributed instead of paging rows.
    */
  def resultsDf(spark: SparkSession, id: String): DataFrame = {
    val h = handles.get(id)
    require(h != null, s"unknown query execution id $id")
    spark.read.option("header", "true").csv(h.outputLocation)
  }

  /** Drop bookkeeping for a finished query (result files remain at the
    * output location, as with Athena).
    */
  def forget(id: String): Unit = { handles.remove(id); () }
}
