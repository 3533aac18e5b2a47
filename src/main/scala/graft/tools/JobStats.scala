package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler._
import graft.{Sessions, SparkEntry}

/** Dev tool (r16): NOISE-FREE cost counters for a query — jobs, stages,
  * tasks, shuffle bytes written/read, input bytes, cache-memory bytes
  * added — via a SparkListener. Wall clock on this virtualized box is
  * bimodal (NOTES_r16); these counters are deterministic for a fixed
  * plan, so before/after optimization evidence can rest on them.
  * `runMain graft.tools.JobStats <n1,n2,...> [reps]` against
  * `SPARK_GRAFT_SF_DIR`; counts reported for the LAST rep (warm). */
object JobStats {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shW = new AtomicLong; val shR = new AtomicLong
    val in = new AtomicLong; val spill = new AtomicLong
    val verbose = sys.env.get("JOBSTATS_VERBOSE").contains("1")
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          in.addAndGet(m.inputMetrics.bytesRead)
          spill.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
          val durMs = (for {t0 <- s.stageInfo.submissionTime
                            t1 <- s.stageInfo.completionTime} yield t1 - t0)
            .getOrElse(-1L)
          if (verbose && (durMs > 100 ||
                          m.inputMetrics.bytesRead > 0 ||
                          m.shuffleWriteMetrics.bytesWritten > 0 ||
                          m.shuffleReadMetrics.totalBytesRead > 0))
            System.err.println(s"[jobstats-stage] stage=${s.stageInfo.stageId}" +
              s" dur=${durMs}ms" +
              s" input=${m.inputMetrics.bytesRead / 1024}KB" +
              s" shufW=${m.shuffleWriteMetrics.bytesWritten / 1024}KB" +
              s" shufR=${m.shuffleReadMetrics.totalBytesRead / 1024}KB" +
              s" tasks=${s.stageInfo.numTasks}" +
              s" recsOut=${m.shuffleWriteMetrics.recordsWritten}" +
              s" name=${s.stageInfo.name.takeWhile(_ != ' ')}")
        }: Unit
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet(): Unit
    }
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      var last = ""
      (0 until reps).foreach { i =>
        jobs.set(0); stages.set(0); tasks.set(0)
        shW.set(0); shR.set(0); in.set(0); spill.set(0)
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        // drain the listener bus: poll until every counter is stable for
        // two consecutive 100 ms windows (a fixed sleep undercounted on a
        // loaded box — ADVICE r16), bounded at 5 s
        def snap() = (jobs.get, stages.get, tasks.get, shW.get, shR.get,
                      in.get, spill.get)
        var prev = snap(); var stable = 0; var waited = 0
        while (stable < 2 && waited < 50) {
          Thread.sleep(100); waited += 1
          val cur = snap()
          if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        }
        spark.sparkContext.removeSparkListener(listener)
        spark.catalog.clearCache()
        last = f"[jobstats] $name rep$i ${sec}%.2fs n=$n jobs=${jobs.get} " +
          f"stages=${stages.get} tasks=${tasks.get} " +
          f"shufW=${shW.get / 1024}KB shufR=${shR.get / 1024}KB " +
          f"input=${in.get / 1024}KB spill=${spill.get / 1024}KB"
        System.err.println(last)
      }
    }
    spark.stop()
  }
}
