package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Tables
import graft.functions.TextFns
import graft.pipeline.Dedup

/** Ad-hoc profiling: time sub-stages of the heavy dedup queries to
  * locate the actual hot spot. Not part of the driver contract. */
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

    // reproduce the bench harness: one untimed warm-up pass of every
    // query at sf0.01, then time the heavy dedup queries at the target
    // scale in the same order/conditions the bench uses
    val warmDir = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.01").getPath
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case scala.util.control.NonFatal(_) => () }
      spark.catalog.clearCache()
    }
    locally {
      val corpus0 = SparkEntry.queries("q_dedup_simhash")
      val base0 = Tables.read(spark, sfDir, "documents").select("doc_id", "text")
      val c0 = base0.unionByName(base0.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(col("text"), lit(" extra near dup tail")).as("text")))
        .repartition(32)
      val fp = Dedup.simhashDf(c0, "text", "doc_id").persist()
      t("sh: fingerprints")(fp.count())
      t("sh: full pairs")(Dedup.simhashNearDupPairs(c0, maxHamming = 6).count())
      fp.unpersist()
      spark.catalog.clearCache()
      t("sh: query incl orderBy")(corpus0(spark, sfDir).count())
      spark.catalog.clearCache()
    }
    Seq("q_dedup_minhash", "q_dedup_minhash_fast", "q_ngram_jaccard",
        "q_dedup_clusters", "q_dedup_simhash", "q_embed_neardup").foreach { name =>
      t(s"bench-replica: $name")(SparkEntry.queries(name)(spark, sfDir).count())
      spark.catalog.clearCache()
      t(s"bench-replica2: $name")(SparkEntry.queries(name)(spark, sfDir).count())
      spark.catalog.clearCache()
    }
    // bisect: corpus persisted vs not, orderBy vs not
    locally {
      val b0 = Tables.read(spark, sfDir, "documents").select("doc_id", "text")
      val rawCorpus = b0.unionByName(b0.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(col("text"), lit(" extra near dup tail")).as("text")))
        .repartition(32)
      t("bisect: raw corpus count")(rawCorpus.count())
      t("bisect: sig pass on raw 1")(Dedup.minhashSignatures(rawCorpus,
        "text", "doc_id", 3, 12).count())
      t("bisect: sig pass on raw 2")(Dedup.minhashSignatures(rawCorpus,
        "text", "doc_id", 3, 12).count())
      t("bisect: shingles only on raw")(rawCorpus.select(
        array_distinct(TextFns.wordNgrams(col("text"), 3)).as("sh"))
        .filter(size(col("sh")) > 0).count())
      val pc0 = rawCorpus.persist(); pc0.count()
      t("bisect: sig pass on cached")(Dedup.minhashSignatures(pc0,
        "text", "doc_id", 3, 12).count())
      t("bisect: shingles only on cached")(pc0.select(
        array_distinct(TextFns.wordNgrams(col("text"), 3)).as("sh"))
        .filter(size(col("sh")) > 0).count())
      pc0.unpersist()
      t("bisect: noPersist noOrder")(Dedup.minhashNearDupPairs(rawCorpus,
        shingleN = 3, k = 12, bands = 4, threshold = 0.5).count())
      spark.catalog.clearCache()
      t("bisect: noPersist withOrder")(Dedup.minhashNearDupPairs(rawCorpus,
        shingleN = 3, k = 12, bands = 4, threshold = 0.5)
        .orderBy("id_a", "id_b").count())
      spark.catalog.clearCache()
      val pc = rawCorpus.persist(); pc.count()
      t("bisect: persist withOrder")(Dedup.minhashNearDupPairs(pc,
        shingleN = 3, k = 12, bands = 4, threshold = 0.5)
        .orderBy("id_a", "id_b").count())
      pc.unpersist()
      spark.catalog.clearCache()
    }

    val base = Tables.read(spark, sfDir, "documents").select("doc_id", "text")
    val corpus = base.unionByName(base.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 20000).as("doc_id"),
        concat(col("text"), lit(" extra near dup tail")).as("text")))
      .repartition(32).persist()
    corpus.count()

    for (_ <- 1 to 2) {
      // --- minhash pipeline stages
      val signed = Dedup.minhashSignatures(corpus, "text", "doc_id", 3, 12)
      t("mh: signatures")(signed.select(sum(size(col("sig")))).first().getLong(0))
      val s2 = signed.persist()
      s2.count()
      val rows = 3
      val banded = s2.select(col("doc_id"), col("shingles"),
        posexplode(transform(sequence(lit(0), lit(3)),
          b => md5(array_join(slice(col("sig"), b * rows + 1, lit(rows)), "|")))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
      val a = banded.select(col("doc_id").as("id_a"), col("band"), col("band_key"))
      val b = banded.select(col("doc_id").as("id_b"), col("band"), col("band_key"))
      val candidates = a.join(b, Seq("band", "band_key"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct().persist()
      t("mh: band join -> candidates")(candidates.count())
      val shingleSets = s2.select(col("doc_id"), col("shingles"))
      val jac = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))).cast("double")
      t("mh: verify joins")(candidates
        .join(shingleSets.select(col("doc_id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
        .join(shingleSets.select(col("doc_id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
        .withColumn("jaccard", jac).filter(col("jaccard") >= 0.5).count())
      candidates.unpersist(); s2.unpersist()
      t("mh: full pipeline")(Dedup.minhashNearDupPairs(corpus, shingleN = 3,
        k = 12, bands = 4, threshold = 0.5).count())

      // --- ngram jaccard stages
      val withShingles = corpus.select(col("doc_id"),
        array_distinct(TextFns.wordNgrams(col("text"), 4)).as("shingles"))
        .filter(size(col("shingles")) > 0).persist()
      t("nj: shingles")(withShingles.count())
      val posting = withShingles.select(col("doc_id"), explode(col("shingles")).as("shingle"))
      t("nj: posting explode")(posting.count())
      val rare = posting.groupBy("shingle").agg(count("*").as("df"))
        .filter(col("df") <= 50 && col("df") > 1)
      t("nj: rare df")(rare.count())
      val blocked = posting.join(rare.select("shingle"), Seq("shingle")).persist()
      t("nj: blocked")(blocked.count())
      val pairs = blocked.as("x").join(blocked.as("y"), Seq("shingle"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .agg(count(lit(1)).as("__shared"))
        .filter(col("__shared") >= 2).drop("__shared").persist()
      t("nj: pair self-join")(pairs.count())
      t("nj: verify joins")(pairs
        .join(withShingles.select(col("doc_id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
        .join(withShingles.select(col("doc_id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
        .withColumn("jaccard", jac).filter(col("jaccard") >= 0.4).count())
      pairs.unpersist(); blocked.unpersist(); withShingles.unpersist()
      t("nj: full pipeline")(Dedup.ngramJaccardPairs(corpus, shingleN = 4,
        threshold = 0.4, maxDf = 50).count())

      // --- cluster pipeline
      t("cc: clusters full")(Dedup.nearDupClusters(
        Dedup.minhashNearDupPairs(corpus, shingleN = 3, k = 12, bands = 4,
          threshold = 0.5)).count())

      // --- corpus prep stages (bench-slowest query)
      val docsAll = Tables.read(spark, sfDir, "documents")
      t("cp: read+count")(docsAll.count())
      val spreadDocs = docsAll.repartition(32)
      val filtered = spreadDocs
        .filter(col("lang").isin("en", "fr"))
        .filter(TextFns.qualityScore(col("text")) >= 0.5)
      t("cp: lang+quality filter")(filtered.count())
      val dd = Dedup.exactDedup(filtered, "text", "doc_id")
      t("cp: exact dedup")(dd.count())
      t("cp: full prepare")(graft.pipeline.Corpus.prepare(
        spreadDocs, Seq("en", "fr"), 0.5).count())
      t("cp: via SparkEntry")(SparkEntry.queries("q_corpus_prep")(spark, sfDir).count())
      spark.catalog.clearCache()
      t("cp: via SparkEntry post-clear")(SparkEntry.queries("q_corpus_prep")(spark, sfDir).count())
    }
    spark.stop()
  }
}
