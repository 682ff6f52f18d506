package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.queries.TextQueries
import graft.util.Tables

/** Train-once / encode-many persistence for the learned BPE tokenizer
  * — the [[TextIndexLayout]] discipline applied to the merge walk.
  *
  * The registered queries (`txt_bpe_merges`/`txt_bpe_encode`) run a
  * FIXED 4-round walk so the DuckDB oracle can unroll it; a real
  * tokenizer trains to a VOCABULARY-SIZE target and ships the merge
  * table as the artifact every encode consumes. Both live here:
  *
  *  - [[train]] converts the vocab target into a merge budget (every
  *    merge adds exactly one symbol, so budget = target − |alphabet|),
  *    runs the data-dependent loop — it converges early when no
  *    adjacent pair remains — and persists TWO tables:
  *    `<prefix>_merges` (merge_round, pair, merged, n_pair), the
  *    tokenizer itself, and `<prefix>_wordsubs` (word, n_sub), the
  *    corpus word-type lengths under the final symbolization (the
  *    fast path for encoding text whose words the training corpus
  *    already contains).
  *  - [[encode]] re-runs the online query's encode tail against the
  *    persisted lengths — no walk, no corpus aggregation.
  *  - [[encodeDocs]] encodes an ARBITRARY (doc_id, text) frame by
  *    REPLAYING the persisted merge list over the frame's own word
  *    types — the true artifact-consumption path: new words made of
  *    known symbols tokenize exactly as the trained walk would have
  *    tokenized them (BpeArtifactSpec proves replay == stored on the
  *    training corpus itself).
  */
object BpeArtifact {

  /** Train to `targetVocab` (alphabet + merges) and persist the
    * artifact. Returns the number of merges actually learned —
    * `min(targetVocab - alphabet, maxRounds)` unless the walk
    * exhausts first (every word already a single symbol). */
  def train(spark: SparkSession, dir: String, prefix: String,
      targetVocab: Long, maxRounds: Int = 4096): Long = {
    val base = TextQueries.bpeBaseSymbols(spark, dir)
    val budget = math.min(math.max(0L, targetVocab - base), maxRounds.toLong)
    val (merges, wFinal) = TextQueries.bpeLoopRounds(spark, dir, budget.toInt)
    spark.createDataFrame(merges)
      .toDF("merge_round", "pair", "merged", "n_pair")
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${prefix}_merges")
    TextQueries.bpeLens(wFinal)
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${prefix}_wordsubs")
    merges.size.toLong
  }

  /** The learned merge table in round order. */
  def merges(spark: SparkSession, prefix: String): DataFrame =
    spark.table(s"${prefix}_merges").orderBy(col("merge_round"))

  /** Encode the training corpus from the persisted word lengths —
    * the online `txt_bpe_encode` tail with the walk replaced by a
    * table read. */
  def encode(spark: SparkSession, dir: String, prefix: String): DataFrame =
    TextQueries.bpeEncodeWith(Tables.load(spark, dir, "documents"),
      spark.table(s"${prefix}_wordsubs"))

  /** Encode an ARBITRARY (doc_id, text) frame by replaying the
    * persisted merges over ITS word types. Words containing symbols
    * the training corpus never saw simply stay at their character
    * segmentation (no merge matches them) — the standard
    * open-vocabulary behavior of a BPE tokenizer. */
  def encodeDocs(spark: SparkSession, prefix: String,
      docs: DataFrame): DataFrame = {
    val ms = merges(spark, prefix)
      .select(col("pair"), col("merged")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    TextQueries.bpeEncodeWith(docs,
      TextQueries.bpeLens(
        TextQueries.bpeApplyMerges(TextQueries.bpeWordTypes(docs), ms)))
  }
}
