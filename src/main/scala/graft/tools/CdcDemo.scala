package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Run the pgcdc Structured Streaming source over a WAL frame file and print
  * the resulting change-event DataFrame — the runnable face of SURVEY §7
  * step 4 ("minimum end-to-end slice").
  *
  * Usage: CdcDemo <wal-file> [showRows]
  */
object CdcDemo {
  def main(args: Array[String]): Unit = {
    val walFile = args(0)
    val showRows = if (args.length > 1) args(1).toInt else 20
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("pgcdc-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val q = spark.readStream.format("pgcdc")
      .option("path", walFile)
      .load()
      .writeStream.format("memory").queryName("cdc").outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()

    val df = spark.table("cdc")
    df.orderBy("lsn").show(showRows, truncate = false)
    val byOp = df.groupBy("op").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
    println(s"-- ${df.count()} change events | $byOp")
    spark.stop()
  }
}
