package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import graft.{GraftSession, SparkEntry}

/** r11 profiling probe: run named queries (after a warm-up) and print each
  * Spark JOB's wall time and each STAGE's task count + executor time — the
  * "is this overhead-bound or compute-bound" readout wall timing can't give.
  *
  * Usage: runMain graft.tools.R11StageProbe <sfDir> <query>...
  */
object R11StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = GraftSession.quiet(GraftSession.local("r11-probe"))

    final case class JobRow(id: Int, t0: Long, var t1: Long = 0L)
    val jobs = new ConcurrentLinkedQueue[JobRow]()
    val stages = new ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      private val open = new java.util.concurrent.ConcurrentHashMap[Int, JobRow]()
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val r = JobRow(e.jobId, System.nanoTime()); open.put(e.jobId, r); jobs.add(r); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = open.remove(e.jobId); if (r != null) r.t1 = System.nanoTime(); ()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        stages.add(f"    stage ${i.stageId}%4d tasks=${i.numTasks}%4d " +
          f"wall=${(i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3}%7.2fs".replace("s", "") +
          f" name=${i.name.takeWhile(_ != '\n').take(90)}")
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { n =>
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").format("noop").save() // warm-up
    }
    names.foreach { n =>
      jobs.clear(); stages.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      println(f"== $n wall=$wall%.2fs jobs=${jobs.size}")
      import scala.jdk.CollectionConverters._
      jobs.asScala.toVector.sortBy(_.t0).foreach { j =>
        val d = if (j.t1 > 0) (j.t1 - j.t0) / 1e9 else -1.0
        println(f"  job ${j.id}%4d wall=$d%6.2fs")
      }
      stages.asScala.toVector.foreach(println)
    }
    spark.stop()
  }
}
