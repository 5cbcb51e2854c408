package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-decomposition harness (not part of the driver
  * contract); edit freely while profiling. Currently (r16): chunk
  * decode cost in isolation (s11/s12's shared term).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val out = java.nio.file.Files.createTempDirectory("graft-chunks").toString
    val samples = graft.model.Samples.fromEventsDir(spark, dir)
    println(f"write chunks: ${time(graft.storage.ChunkStore.write(samples, out))}%.3f s")
    val chunks = graft.storage.ChunkStore.readChunks(spark, out)
    println(f"chunk rows: ${chunks.count()}")
    val dec = graft.storage.ChunkStore.read(spark, out)
    (1 to 3).foreach { i =>
      println(f"decode all cols (noop, run $i): ${time(
        dec.write.format("noop").mode("overwrite").save())}%.3f s")
    }
    val slim = dec.select(col("sig"), col("t"), col("v"))
    (1 to 3).foreach { i =>
      println(f"decode slim (noop, run $i): ${time(
        slim.write.format("noop").mode("overwrite").save())}%.3f s")
    }
    (1 to 3).foreach { i =>
      println(f"raw slim (noop, run $i): ${time(
        samples.select(col("sig"), col("t"), col("v"))
          .write.format("noop").mode("overwrite").save())}%.3f s")
    }
    spark.stop()
  }
}
