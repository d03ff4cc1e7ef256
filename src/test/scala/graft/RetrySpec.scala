package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Forks [[RetryCheck]] into its own JVM: the retry budget lives in the
 * master URL (`local[8, 2]`) and a JVM holds one SparkContext, which the
 * shared test session already claims with a no-retry master. The child
 * inherits this JVM's classpath; the JDK-17 add-opens list is the same
 * one build.sbt passes (Spark's JavaModuleOptions.defaultModuleOptions).
 */
class RetrySpec extends AnyFunSuite {

  test("pipeline output and lineage digests are identical under task retry") {
    val java = s"${sys.props("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx4g", "-cp", sys.props("java.class.path"),
      "graft.RetryCheck", "/tmp/graft-retry-check")
    val out = new StringBuilder
    val logger = scala.sys.process.ProcessLogger(
      l => out.synchronized { out.append(l).append('\n') },
      l => out.synchronized { out.append(l).append('\n') })
    val exit = scala.sys.process.Process(cmd).!(logger)
    val text = out.synchronized(out.toString)
    assert(exit == 0 && text.contains("RETRY_CHECK_OK"),
      s"RetryCheck failed (exit $exit): ${text.linesIterator.toSeq.takeRight(25).mkString("\n")}")
  }
}
