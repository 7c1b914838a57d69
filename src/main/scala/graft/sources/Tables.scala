package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table catalog over a testdata scale-factor directory. */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view for spark.sql-driven queries. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    All.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
