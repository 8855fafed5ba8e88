package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Unigram-LM subword tokenizer TRAINING and application — the other
 * tokenizer family next to [[Bpe]] (Kudo 2018, "Subword
 * Regularization"; the SentencePiece unigram model): seed a large
 * candidate piece inventory from substring statistics, alternate
 * segmentation (E) and piece re-weighting + pruning (M) rounds, and
 * keep the best `vocabSize` pieces.
 *
 * Integer-exact deviation from the paper, documented like
 * [[graft.pipeline.Corpus.dsirScore]]'s: the reference algorithm is
 * soft-EM over float log-probabilities, which is not bit-stable
 * across engines or reduce orders. This implementation is HARD-EM
 * with an integer objective: the E-step Viterbi-segments each word
 * to (1) the fewest pieces, tie-broken by (2) the largest sum of
 * piece weights, then (3) the longest final piece — a total order,
 * so every word has exactly one segmentation and training replays
 * bit-identically (the DuckDB oracle hand-unrolls the same DP). The
 * M-step re-weights pieces by Viterbi usage (weighted by word
 * frequency) and prunes low-usage multi-char pieces on the
 * SentencePiece shrink schedule (keep `shrinkPermille` of the
 * inventory per round, floored at the final target); single
 * characters are never pruned, so every word stays segmentable —
 * the paper's character-coverage guarantee.
 *
 * Distributed shape (the 100 TB story, same as [[Bpe]]): training
 * never touches the corpus after ONE tokenize+count pass — the
 * word-vocabulary table is vocabulary-bounded, the seed inventory is
 * bounded by vocab × word-length × `maxPieceLen`, and every E-step
 * is a sequence of `maxWordLen` equi-joins between the per-prefix DP
 * state table and the piece table (both vocabulary-bounded; the
 * piece lookup is an equi-join on the substring, NEVER a broadcast
 * of the unpruned seed inventory, which at corpus scale exceeds
 * broadcast limits). The DP advances one prefix length per step, so
 * its depth is `maxWordLen`, independent of corpus size; each step's
 * best-state frame is localCheckpoint-ed (vocabulary-bounded) so no
 * step re-executes its predecessors. Words longer than `maxWordLen`
 * are excluded from TRAINING (rare giants contribute little to the
 * inventory) and fall back to character segmentation in
 * [[encode]] — a coverage policy, not a crash.
 *
 * Ranking windows (usage rank, final vocab rank) run on the
 * vocabulary-bounded piece table, never the corpus.
 */
object UnigramLm {

  val Sep = "\u001f"

  /**
   * Deterministic Viterbi segmentation of every word in `words`
   * (word, cnt) under piece inventory `pieces` (piece, w).
   * DP over prefix lengths: state j holds the unique best
   * segmentation of word[1..j]; step j joins states j-maxPieceLen..
   * j-1 with the piece table on the connecting substring. Single
   * characters are always admissible (weight 0 when absent from the
   * inventory) so the DP never strands.
   *
   * @return (word, cnt, np, ws, seg) — piece count, weight sum, and
   *         the segmentation as pieces joined by [[Sep]]
   */
  private[pipeline] def viterbi(words: DataFrame, pieces: DataFrame,
      maxWordLen: Int, maxPieceLen: Int): DataFrame = {
    val pc = pieces.select(col("piece"), col("w").cast("long").as("__w"))
    val dp0 = words
      .filter(length(col("word")).between(1, maxWordLen))
      .select(col("word"), col("cnt"), lit(0L).as("np"),
        lit(0L).as("ws"), lit("").as("seg"))
      .withColumn("j", lit(0))
      // eager checkpoints: an A/B against lazy (eager = false) showed
      // no win from collapsing the per-step barriers — the DP frames
      // are small and the joins dominate — and eager keeps each
      // step's cost attributable in profiles
      .localCheckpoint()
    val perJ = scala.collection.mutable.ArrayBuffer[DataFrame](dp0)
    for (j <- 1 to maxWordLen) {
      val from = (math.max(0, j - maxPieceLen) until j).map(perJ(_))
        .reduce(_ unionByName _)
      val cand = from
        .filter(length(col("word")) >= j)
        .withColumn("k", lit(j) - col("j"))
        .withColumn("piece", expr("substring(word, j + 1, k)"))
        .join(pc, Seq("piece"), "left")
        .filter(col("k") === 1 || col("__w").isNotNull)
        .select(col("word"), col("cnt"),
          (col("np") + 1L).as("np"),
          (col("ws") + coalesce(col("__w"), lit(0L))).as("ws"),
          concat(col("seg"), lit(Sep), col("piece")).as("seg"),
          col("k"))
      // unique best state per word: lexicographic struct-min =
      // (np asc, ws desc, k desc); k differs across candidates of the
      // same word (one candidate per predecessor state), so the order
      // is total and seg is payload, never a comparator
      val best = cand
        .groupBy("word", "cnt")
        .agg(min(struct(col("np"), (-col("ws")).as("nws"),
          (-col("k")).as("nk"), col("seg"), col("ws"))).as("b"))
        .select(col("word"), col("cnt"), col("b.np").as("np"),
          col("b.ws").as("ws"), col("b.seg").as("seg"))
        .withColumn("j", lit(j))
        .localCheckpoint()
      perJ += best
    }
    perJ.toSeq.reduce(_ unionByName _)
      .filter(col("j") === length(col("word")))
      .select(col("word"), col("cnt"), col("np"), col("ws"),
        expr("substring(seg, 2)").as("seg"))
  }

  /**
   * Train a unigram-LM vocabulary of `vocabSize` pieces over `rounds`
   * hard-EM rounds.
   *
   * @return (piece, piece_len, usage, rank) ordered by rank — usage
   *         is the final round's Viterbi usage count
   */
  def train(docs: DataFrame, vocabSize: Int, rounds: Int,
      maxPieceLen: Int = 4, maxWordLen: Int = 12, minFreq: Long = 2L,
      shrinkPermille: Long = 800L, textCol: String = "text"): DataFrame = {
    require(vocabSize >= 1 && rounds >= 1, "positive vocab size and rounds")
    require(maxPieceLen >= 1 && maxWordLen >= maxPieceLen,
      "piece length within word length")
    graft.plans.NativeFns.register(docs.sparkSession)
    val words = docs.select(explode(
        graft.plans.WordShingles.shingles(col(textCol), 1)).as("word"))
      .filter(!col("word").contains(Sep))
      .filter(length(col("word")) <= maxWordLen)
      .groupBy("word").agg(count(lit(1)).cast("long").as("cnt"))
      .localCheckpoint()
    // seed inventory: every substring occurrence up to maxPieceLen,
    // weighted by word frequency; chars exempt from the freq floor
    val seeds = words
      .select(col("cnt"), explode(expr(
        s"flatten(transform(sequence(1, length(word)), s -> " +
          s"transform(sequence(1, least($maxPieceLen, length(word) - s + 1)), " +
          "k -> substring(word, s, k))))")).as("piece"))
      .groupBy("piece").agg(sum("cnt").cast("long").as("w"))
      .filter(length(col("piece")) === 1 || col("w") >= minFreq)
      .localCheckpoint()
    val chars = seeds.filter(length(col("piece")) === 1)
      .select("piece").localCheckpoint()
    val nChars = chars.count()
    val multiTarget = math.max(0L, vocabSize.toLong - nChars)
    val byUsage = Window.orderBy(col("w").desc, col("piece"))
    var pieces = seeds
    for (_ <- 1 to rounds) {
      val segs = viterbi(words, pieces, maxWordLen, maxPieceLen)
      val usage = segs
        .select(col("cnt"), explode(split(col("seg"), Sep)).as("piece"))
        .groupBy("piece").agg(sum("cnt").cast("long").as("w"))
        .localCheckpoint()
      // shrink schedule on the vocabulary-bounded usage table: the
      // count and the rank window never touch the corpus
      val multiCount = usage.filter(length(col("piece")) > 1).count()
      val keep = math.max(multiTarget, multiCount * shrinkPermille / 1000L)
      val keptMulti = usage.filter(length(col("piece")) > 1)
        .withColumn("rk", row_number().over(byUsage))
        .filter(col("rk") <= keep).select("piece", "w")
      val next = chars.join(usage, Seq("piece"), "left")
        .select(col("piece"), coalesce(col("w"), lit(0L)).as("w"))
        .unionByName(keptMulti)
        .localCheckpoint()
      Lineage.release(pieces)
      pieces = next
    }
    val multiFinal = pieces.filter(length(col("piece")) > 1)
      .withColumn("rk", row_number().over(byUsage))
      .filter(col("rk") <= multiTarget).select("piece", "w")
    pieces.filter(length(col("piece")) === 1).unionByName(multiFinal)
      .withColumn("rank", row_number().over(byUsage).cast("long"))
      .select(col("piece"), length(col("piece")).cast("long").as("piece_len"),
        col("w").as("usage"), col("rank"))
  }

  /**
   * Encode a corpus with a trained vocabulary: per-doc word and piece
   * counts (the fertility shape [[Bpe.encode]] reports, so the two
   * tokenizer families compare directly). Segmentation runs the same
   * deterministic Viterbi on the DISTINCT words (vocabulary-bounded),
   * under the final piece weights; words longer than `dpMaxLen` fall
   * back to character segmentation (documented coverage policy).
   *
   * @param vocab [[train]] output (piece, piece_len, usage, rank)
   * @return (idCol, n_words, n_pieces) — zero-word docs report 0/0
   */
  def encode(docs: DataFrame, vocab: DataFrame, maxPieceLen: Int = 4,
      dpMaxLen: Int = 12, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    graft.plans.NativeFns.register(docs.sparkSession)
    val docWords = docs.select(col(idCol),
      explode(graft.plans.WordShingles.shingles(col(textCol), 1)).as("word"))
    val distinctW = docWords.groupBy("word")
      .agg(count(lit(1)).cast("long").as("cnt"))
    val pieces = vocab.select(col("piece"), col("usage").as("w"))
    val short = viterbi(distinctW.filter(length(col("word")) <= dpMaxLen),
        pieces, dpMaxLen, maxPieceLen)
      .select(col("word"), col("np"))
    val long = distinctW.filter(length(col("word")) > dpMaxLen)
      .select(col("word"), length(col("word")).cast("long").as("np"))
    val perDoc = docWords
      .join(short.unionByName(long), Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum("np").cast("long").as("n_pieces"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
  }
}
