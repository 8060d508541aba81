package graft

import java.nio.file.Paths

/** Serving entry point: `runMain graft.Serve [port] [dataDir]` stands up
  * the full 24-route HTTP surface ([[graft.serve.GraftServer]]) over a
  * local session — the drop-in replacement for running the reference's
  * `python main.py`. Environment overrides: SPARK_GRAFT_CPUS (default
  * 8), SPARK_GRAFT_SERVE_HOST (default 0.0.0.0). */
object Serve {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8000)
    val dataDir = Paths.get(args.lift(1).getOrElse("data_files"))
    val host = sys.env.getOrElse("SPARK_GRAFT_SERVE_HOST", "0.0.0.0")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.local(cpus, appName = "graft-serve")
    val server = new serve.GraftServer(spark, dataDir, host, port).start()
    println(s"[serve] listening on ${server.baseUrl}, files in $dataDir")
    // block until killed; the JVM shutdown hook closes cleanly
    sys.addShutdownHook { server.stop(); spark.stop() }
    Thread.currentThread.join()
  }
}
