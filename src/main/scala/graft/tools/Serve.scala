package graft.tools

import org.apache.spark.sql.SparkSession

import graft.api.HttpApi
import graft.exec.PromQLEngine
import graft.model.Samples
import graft.storage.Ingest

/** Runnable server: the Prometheus v1 API over a samples table.
  *
  * {{{
  *   runMain graft.tools.Serve /root/testdata/sf0.01 9090           # events fixture
  *   runMain graft.tools.Serve /path/to/ingested-table 9090 table   # Ingest layout
  *   runMain graft.tools.Serve /path/to/chunk-store 9090 chunks     # ChunkStore layout
  * }}}
  *
  * With the `table` mode the write endpoint appends back into the same
  * table, giving the full write → query round trip of the reference's
  * single-node acceptance setup (`acceptance_test.go:124-161`).
  */
object Serve {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val port = if (args.length > 1) args(1).toInt else 9090
    val mode = if (args.length > 2) args(2) else "events"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val api = mode match {
      // writes append into the served table; the sink swaps in a
      // fresh-listing engine so queries see them (HttpApi.forTable)
      case "table" => HttpApi.forTable(spark, sfDir, port)
      // read-only API over a Gorilla/XOR chunk store (ChunkStore
      // layout): decode is lazy + pruned per query
      case "chunks" => new HttpApi(spark,
        new PromQLEngine(spark, graft.storage.ChunkStore.read(spark, sfDir)),
        None, port)
      case _ => new HttpApi(spark,
        new PromQLEngine(spark, Samples.fromEventsDir(spark, sfDir)),
        None, port)
    }
    api.start()
    println(s"listening on :${api.boundPort} (mode=$mode, data=$sfDir)")
    Thread.currentThread().join() // serve until killed
  }
}
