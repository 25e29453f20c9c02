package graft.tools

import org.apache.spark.sql.SparkSession

/** Full-registry sweep under REAL multi-executor deployment
  * (`local-cluster[4,8,8192]` — four separate executor JVMs): flushes
  * any JVM-singleton / broadcast / serialization assumption the
  * single-JVM `local[32]` bench cannot see (executor-local caches,
  * lazily-initialized statics, closure capture). Run via the
  * FileCacheClusterSpec subprocess recipe:
  *
  * {{{
  * SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   java <add-opens...> -cp <classes> graft.tools.ClusterSweepMain \
  *   /root/testdata/sf0.01 /root/repo/BENCH_CLUSTER.json [qNN...]
  * }}}
  *
  * Per query: row count + wall seconds + OK/FAIL, one JSON result file.
  * Row counts are NOT compared here (the DuckDB oracle does that at
  * sf0.01 in Verify); the sweep's job is "does every operator run and
  * return rows under multi-JVM execution".
  */
object ClusterSweepMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outJson = args(1)
    val only = args.drop(2).toSet
    val addOpens = sys.props.getOrElse("graft.probe.addOpens", "")
    // NOTE: -Dspark.* keys are rejected inside extraJavaOptions
    val execJavaOpts = (addOpens + " --add-modules=jdk.incubator.vector").trim
    val spark = SparkSession.builder()
      .master("local-cluster[4,8,8192]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // executors are forked JVMs: hand them this JVM's classpath + the
      // JDK17 add-opens / vector-module flags. Entries MUST be
      // absolutized: the standalone worker starts executors in their own
      // work dir, so a relative `target/scala-2.13/classes` silently
      // resolves to nothing there. The resulting failure is NOT a clear
      // ClassNotFoundException but `ClassCastException: cannot assign
      // instance of SerializedLambda to field ...` on every shipped
      // lambda — ObjectInputStream swallows the lookup failure inside
      // SerializedLambda.readResolve and the raw proxy object surfaces at
      // field assignment (round-12 finding; cost half a day, hence this
      // comment).
      .config("spark.executor.extraClassPath",
        System.getProperty("java.class.path").split(java.io.File.pathSeparator)
          .map(p => new java.io.File(p).getAbsolutePath)
          .mkString(java.io.File.pathSeparator))
      .config("spark.executor.extraJavaOptions", execJavaOpts)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Double)]
    graft.SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          val n = fn(spark, sfDir).count()
          val secs = (System.nanoTime() - t0) / 1e9
          val status = if (n > 0) "ok" else "empty"
          results += ((name, status, n, secs))
          println(f"SWEEP $name $status rows=$n%d ${secs}%.2fs")
        } catch {
          case e: Throwable =>
            val secs = (System.nanoTime() - t0) / 1e9
            results += ((name, "fail", -1L, secs))
            println(s"SWEEP $name FAIL ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").take(300)}")
        }
      }
    val nFail = results.count(_._2 == "fail")
    val nEmpty = results.count(_._2 == "empty")
    val json = results.map { case (n, st, rows, s) =>
      s"""{"query":"$n","status":"$st","rows":$rows,"sec":${f"$s%.3f"}}"""
    }.mkString(
      s"""{"master":"local-cluster[4,8,8192]","sf_dir":"$sfDir",""" +
        s""""n":${results.length},"fail":$nFail,"empty":$nEmpty,"queries":[""",
      ",", "]}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json)
    println(s"SWEEP_DONE n=${results.length} fail=$nFail empty=$nEmpty")
    spark.stop()
    if (nFail > 0) sys.exit(1)
  }
}
