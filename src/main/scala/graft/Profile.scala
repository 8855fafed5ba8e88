package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Tables
import graft.functions.TextFns

/** Ad-hoc profiling: time primitive sub-operations of the heavy dedup
  * queries to locate the actual hot spot. Not part of the driver
  * contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s  n=$n")
    }

    val docs = Tables.read(spark, sfDir, "documents").select("doc_id", "text")
    val spread = docs.repartition(32).persist()
    spread.count()

    for (_ <- 1 to 2) {
      t("read+count")(docs.count())
      t("tokens")(spread.select(TextFns.tokens(col("text")).as("t")).select(sum(size(col("t")))).first().getLong(0))
      t("shingles3")(spread.select(array_distinct(TextFns.wordNgrams(col("text"), 3)).as("s")).select(sum(size(col("s")))).first().getLong(0))
      t("explode8grams")(spread.select(explode(TextFns.wordNgrams(col("text"), 8)).as("g")).count())
      t("explode8grams+md5+distinct")(spread.select(explode(TextFns.wordNgrams(col("text"), 8)).as("g")).select(md5(col("g")).as("h")).distinct().count())
      val sig = transform(sequence(lit(0), lit(11)),
        i => array_min(transform(col("s"), s => md5(concat(i.cast("string"), lit(":"), s)))))
      t("minhash12_md5")(spread.select(array_distinct(TextFns.wordNgrams(col("text"), 3)).as("s"))
        .filter(size(col("s")) > 0).select(sig.as("sig")).select(sum(size(col("sig")))).first().getLong(0))
      graft.plans.NativeFns.register(spark)
      t("minhash12_xx")(spread.select(array_distinct(TextFns.wordNgrams(col("text"), 3)).as("s"))
        .filter(size(col("s")) > 0)
        .select(graft.plans.XxMinHash.minhash(col("s"), 12).as("sig")).select(sum(size(col("sig")))).first().getLong(0))
    }
    spark.stop()
  }
}
