package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Measurement probe (optimization rounds): counts Spark jobs, stages,
  * tasks and summed task time across gate builds or queries (comma list),
  * with a per-action histogram — so wall time decomposes into scheduled
  * work vs per-job overhead. Warm pass at the small SF first, like Bench.
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val whats = (if (args.nonEmpty) args(0) else "mv").split(",").toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    def run(what: String, dir: String): Unit = what match {
      case "mv" => graft.operators.LakeQueries.mvOrders(spark, dir)
        .write.format("noop").mode("overwrite").save()
      case "mj" => graft.operators.LakeQueries.mjOrders(spark, dir)
        .write.format("noop").mode("overwrite").save()
      case "lake" => graft.operators.LakeQueries.lakeState(spark, dir)
        .write.format("noop").mode("overwrite").save()
      // the shared-cache preps, probe-addressable so k-means/codegen cost
      // decomposes (caches released between the warm and measured pass)
      case p if p.startsWith("prep_") =>
        graft.operators.SharedCaches.entries.toMap.apply(p)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      case q => graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    // warm pass (JIT/codegen/classloading), like the bench's
    whats.foreach(run(_, warmDir))
    graft.operators.SharedCaches.releaseAll(spark)
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val sites = new java.util.concurrent.ConcurrentHashMap[String, (AtomicInteger, AtomicLong)]()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val site = j.stageInfos.lastOption.map(_.name.takeWhile(_ != '+')).getOrElse("?")
        jobStart.put(j.jobId, (site, System.nanoTime()))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobStart.remove(j.jobId)).foreach { case (site, t0) =>
          val e = sites.computeIfAbsent(site, _ => (new AtomicInteger, new AtomicLong))
          e._1.incrementAndGet()
          e._2.addAndGet(System.nanoTime() - t0)
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      }
    })
    val acts = new java.util.concurrent.ConcurrentHashMap[String, (AtomicInteger, AtomicLong)]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      private def record(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        val site = Thread.currentThread.getStackTrace
          .find(e => e.getClassName.startsWith("graft.") &&
            !e.getClassName.contains("ProfileProbe"))
          .map(e => s"${e.getFileName}:${e.getLineNumber}").getOrElse("?")
        val e = acts.computeIfAbsent(s"$funcName@$site",
          _ => (new AtomicInteger, new AtomicLong))
        e._1.incrementAndGet()
        e._2.addAndGet(durationNs)
      }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        record(funcName, qe, durationNs)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    })
    import scala.jdk.CollectionConverters._
    whats.foreach { what =>
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      sites.clear(); acts.clear()
      System.gc(); Thread.sleep(150)
      val t0 = System.nanoTime()
      run(what, sfDir)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let listener drain
      println(f"PROBE $what wall=$wall%.2f s jobs=${jobs.get} stages=${stages.get} " +
        f"tasks=${tasks.get} taskTime=${taskMs.get / 1000.0}%.2f s " +
        f"(task-parallel floor over ${cpus} cpus: ${taskMs.get / 1000.0 / cpus.toInt}%.2f s)")
      sites.asScala.toSeq.sortBy(-_._2._2.get).take(8).foreach { case (site, (n, ns)) =>
        println(f"SITE ${ns.get / 1e9}%8.2f s  n=${n.get}%4d  $site")
      }
      acts.asScala.toSeq.sortBy(-_._2._2.get).take(8).foreach { case (site, (n, ns)) =>
        println(f"ACT ${ns.get / 1e9}%8.2f s  n=${n.get}%4d  $site")
      }
    }
    spark.stop()
  }
}
