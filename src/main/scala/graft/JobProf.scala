package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Structural profiler for the optimization rounds: runs each named
  * query once (after a warm-up pass) and reports, per Spark JOB, the
  * stage/task counts and shuffle read/write bytes from a listener.
  * Job and stage counts are structural facts — unlike wall-clock they
  * do not move with ambient host load — so they attribute WHERE a
  * query's actions and exchanges come from before any timing work.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… tools/run_main.sh graft.JobProf q_a q_b
  */
object JobProf {

  final case class StageAgg(
      var tasks: Int = 0, var shufRead: Long = 0, var shufWrite: Long = 0,
      var input: Long = 0, var ms: Long = 0,
      var execMs: Long = 0, var cpuMs: Long = 0)

  final class Collector extends SparkListener {
    val jobStages = mutable.LinkedHashMap.empty[Int, Seq[Int]]
    val jobDesc = mutable.Map.empty[Int, String]
    val jobMs = mutable.Map.empty[Int, Long]
    private val jobStart = mutable.Map.empty[Int, Long]
    val stages = mutable.Map.empty[Int, StageAgg]
    var enabled = false

    override def onJobStart(js: SparkListenerJobStart): Unit = if (enabled) {
      jobStages(js.jobId) = js.stageIds
      jobDesc(js.jobId) = {
        val p = Option(js.properties)
        val d = p.map(_.getProperty("spark.job.description"))
          .filter(_ != null).getOrElse("")
        val cs = p.map(_.getProperty("callSite.short"))
          .filter(_ != null).getOrElse("")
        s"$d | $cs"
      }
      jobStart(js.jobId) = js.time
    }
    override def onJobEnd(je: SparkListenerJobEnd): Unit = if (enabled) {
      jobStart.get(je.jobId).foreach(t0 => jobMs(je.jobId) = je.time - t0)
    }
    val stageSite = mutable.Map.empty[Int, String]
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      if (enabled) {
        val info = sc.stageInfo
        stageSite(info.stageId) = info.details.linesIterator
          .filter(l => l.contains("graft.") && !l.contains("JobProf"))
          .take(2).mkString(" <- ")
        val agg = stages.getOrElseUpdate(info.stageId, StageAgg())
        agg.tasks += info.numTasks
        val m = info.taskMetrics
        agg.shufRead += m.shuffleReadMetrics.totalBytesRead
        agg.shufWrite += m.shuffleWriteMetrics.bytesWritten
        agg.input += m.inputMetrics.bytesRead
        agg.ms += (for { a <- info.completionTime; b <- info.submissionTime }
          yield a - b).getOrElse(0L)
        // total WORK, not wall: sums across tasks, so branch-parallel
        // duplicated subtrees show their true cost even when an idle
        // host hides it from wall-clock (the r16 serialization lesson)
        agg.execMs += m.executorRunTime
        agg.cpuMs += m.executorCpuTime / 1000000L
      }
    def reset(): Unit = {
      jobStages.clear(); jobDesc.clear(); jobMs.clear(); stages.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        classOf[graft.functions.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val collector = new Collector
    spark.sparkContext.addSparkListener(collector)

    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm-up: classload/codegen + any first-run scratch conversion
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => System.err.println(s"[warm] $name: ${e.getMessage}") }
      collector.reset()
      collector.enabled = true
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[prof] $name FAILED: ${e.getMessage}"); -1L }
      val wallS = (System.nanoTime() - t0) / 1e9
      // let the listener bus drain before reading
      Thread.sleep(300)
      collector.enabled = false
      val jobs = collector.jobStages.toSeq
      val totTasks = collector.stages.values.map(_.tasks).sum
      val totShufW = collector.stages.values.map(_.shufWrite).sum
      val totExec = collector.stages.values.map(_.execMs).sum
      val totCpu = collector.stages.values.map(_.cpuMs).sum
      println(f"\n===== $name: wall=$wallS%.3f s rows=$n " +
        f"jobs=${jobs.size} stages=${collector.stages.size} " +
        f"tasks=$totTasks shufWriteMB=${totShufW / 1e6}%.1f " +
        f"taskMs=$totExec cpuMs=$totCpu =====")
      jobs.foreach { case (jid, sids) =>
        val realized = sids.filter(collector.stages.contains)
        val tasks = realized.map(collector.stages(_).tasks).sum
        val sw = realized.map(collector.stages(_).shufWrite).sum
        val sr = realized.map(collector.stages(_).shufRead).sum
        val in = realized.map(collector.stages(_).input).sum
        val ms = collector.jobMs.getOrElse(jid, -1L)
        val site = realized.sorted.lastOption
          .flatMap(collector.stageSite.get).getOrElse("")
        println(f"  job $jid%3d ${ms}%6d ms stages=${realized.size}%2d/${sids.size}%2d " +
          f"tasks=$tasks%4d inMB=${in / 1e6}%7.1f srMB=${sr / 1e6}%6.1f swMB=${sw / 1e6}%6.1f  $site")
      }
    }
    spark.stop()
  }
}
