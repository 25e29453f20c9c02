package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** `FileCache.clusterStats` under REAL multi-executor deployment: launches
  * ClusterStatsProbeMain in a subprocess (one SparkContext per JVM) with a
  * `local-cluster[2,2,…]` master — two separate executor JVMs — and
  * asserts the barrier-stage sweep reports exactly one row per executor.
  * This is the guarantee the plain task fan-out could not give under
  * dynamic allocation / locality skew.
  */
class FileCacheClusterSpec extends AnyFunSuite {

  test("clusterStats reports one row per executor on a 2-executor local-cluster") {
    val cacheDir =
      java.nio.file.Files.createTempDirectory("graft-fc-cluster").toString
    val javaBin = java.nio.file.Paths
      .get(System.getProperty("java.home"), "bin", "java").toString
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g",
      "-cp", System.getProperty("java.class.path"),
      s"-Dgraft.probe.addOpens=${addOpens.mkString(" ")}",
      "graft.tools.ClusterStatsProbeMain", cacheDir)
    val pb = new ProcessBuilder(cmd: _*)
    // the standalone worker's executor-command builder needs a Spark
    // layout and scala version to assemble the child classpath
    pb.environment().put("SPARK_HOME", "/opt/spark")
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val done = proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) proc.destroyForcibly()
    assert(done, "probe subprocess timed out")
    assert(proc.exitValue() == 0, s"probe failed:\n${out.takeRight(4000)}")
    assert(out.contains("PROBE_OK"), out.takeRight(4000))
    val stats = out.linesIterator.filter(_.startsWith("STATS ")).toSeq
    assert(stats.size == 2, s"expected 2 executor rows, got:\n$stats")
  }
}
