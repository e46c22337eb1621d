package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc timing harness used during development (not part of the
  * driver contract). Args: <sfDir> <queryName>... */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SCRATCH_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SCRATCH_PARTS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SCRATCH_AQE", "true"))
      // match Bench/Verify: AQE applies inside barrier-cached subtrees
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SCRATCH_PARFIRST", "true"))
      .config("spark.sql.streaming.stateStore.providerClass",
        if (sys.env.get("SCRATCH_ROCKSDB").contains("1"))
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        else
          "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      .config("spark.hadoop.fs.file.impl",
        if (sys.env.get("SCRATCH_RAWFS").contains("1"))
          "org.apache.hadoop.fs.RawLocalFileSystem"
        else "org.apache.hadoop.fs.LocalFileSystem")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SCRATCH_CONF="k=v;k2=v2": ad-hoc session conf overrides for A/Bs
    sys.env.get("SCRATCH_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      })
    val dir = args(0)
    val explain = sys.env.get("SCRATCH_EXPLAIN").contains("1")
    // SCRATCH_JOBS=1: print every Spark job's wall time + description,
    // to see where a multi-job query (parquet-barriered pipelines,
    // iterative loops) actually spends its seconds (guide §1.1).
    if (sys.env.get("SCRATCH_JOBS").contains("1")) {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
          starts.put(js.jobId, (System.nanoTime(), desc))
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
            val dt = (System.nanoTime() - t0) / 1e9
            if (dt >= 0.05)
              System.err.println(f"[job] id=${je.jobId}%-4d ${dt}%6.2f s  $desc")
          }
        }
      })
      spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val p = e.progress
          System.err.println(s"[stream] batch=${p.batchId} rows=${p.numInputRows} " +
            s"durations=${p.durationMs}")
          p.stateOperators.foreach { so =>
            System.err.println(s"[stream]   state op=${so.operatorName} " +
              s"rowsTotal=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
              s"removed=${so.numRowsRemoved} updMs=${so.allUpdatesTimeMs} " +
              s"rmMs=${so.allRemovalsTimeMs} commitMs=${so.commitTimeMs}")
          }
        }
      })
    }
    args.drop(1).foreach { name =>
      if (explain) {
        println(s"========== $name ==========")
        graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
      } else {
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"scratch:$name")
        val n = graft.SparkEntry.queries(name)(spark, dir).count()
        spark.sparkContext.setJobDescription(null)
        println(f"[scratch] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
