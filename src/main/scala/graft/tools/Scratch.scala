package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-decomposition harness (not part of the driver
  * contract); edit freely while profiling. Currently (r17): chunk
  * store file layout A/B — scan + decode cost vs file count.
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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val out = java.nio.file.Files.createTempDirectory("graft-chunks-r17").toString
    val samples = graft.model.Samples.fromEventsDir(spark, dir)
    println(f"write chunks: ${time(graft.storage.ChunkStore.write(samples, out))}%.3f s")
    val files = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator().asScala
        .count(p => p.toString.endsWith(".parquet"))
    }
    println(s"parquet files: $files")
    val chunks = graft.storage.ChunkStore.readChunks(spark, out)
    println(f"chunk rows: ${chunks.count()}")
    (1 to 3).foreach { i =>
      println(f"chunk-table scan (noop, run $i): ${time(noop(chunks))}%.3f s")
    }
    val dec = graft.storage.ChunkStore.read(spark, out)
    (1 to 3).foreach { i =>
      println(f"decode all cols (noop, run $i): ${time(noop(dec))}%.3f s")
    }
    val slim = dec.select(col("sig"), col("t"), col("v"))
    (1 to 3).foreach { i =>
      println(f"decode slim (noop, run $i): ${time(noop(slim))}%.3f s")
    }
    spark.stop()
  }
}
