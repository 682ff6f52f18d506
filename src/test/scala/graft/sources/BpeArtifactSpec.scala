package graft.sources

import graft.SparkSpec
import graft.queries.TextQueries

/** Train-once / encode-many contract of the persisted BPE artifact:
  * a vocab-size target translates into the right merge budget, the
  * walk converges early when the data runs out of pairs, and both
  * encode paths (persisted word lengths; merge-list replay) agree
  * with the online query. */
class BpeArtifactSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def drop(prefix: String): Unit =
    Seq("merges", "wordsubs").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$t"))

  test("vocab target = alphabet + 4 learns exactly the online 4 merges") {
    drop("bpe_art")
    val base = TextQueries.bpeBaseSymbols(spark, dir)
    val learned = BpeArtifact.train(spark, dir, "bpe_art", base + 4)
    try {
      assert(learned == 4L)
      // the persisted merge table IS the online txt_bpe_merges result
      val online = TextQueries.bpeMerges(spark, dir).collect().toSeq
      assert(BpeArtifact.merges(spark, "bpe_art").collect().toSeq == online)

      // encode from the persisted lengths == the online encode
      val onlineEnc = TextQueries.bpeEncode(spark, dir).collect().toSeq
      assert(BpeArtifact.encode(spark, dir, "bpe_art").collect().toSeq
        == onlineEnc)

      // replaying the merge table over the corpus' own word types
      // reproduces the stored encode — the artifact alone carries the
      // tokenizer
      val replay = BpeArtifact.encodeDocs(spark, "bpe_art",
        graft.util.Tables.load(spark, dir, "documents")).collect().toSeq
      assert(replay == onlineEnc)
    } finally drop("bpe_art")
  }

  test("the walk converges early when no pair is left (tiny fixture)") {
    drop("bpe_tiny")
    val d = tmpDir("graft-bpe-tiny")
    writeFixture(d, "documents",
      Seq((0L, "ab ab"), (1L, "ab")).toDF("doc_id", "text"))
    // alphabet {a, b}; merge 1 fuses "a b" -> "ab"; then every word is
    // one symbol and the walk MUST stop, however large the target
    val learned = BpeArtifact.train(spark, d.toString, "bpe_tiny",
      targetVocab = 1000)
    try {
      assert(learned == 1L, s"learned $learned merges")
      // every word is now a single symbol: one BPE token per word
      val enc = BpeArtifact.encode(spark, d.toString, "bpe_tiny").collect()
      assert(enc.nonEmpty && enc.forall(r =>
        r.getAs[Long]("n_bpe_tokens") == r.getAs[Long]("n_words")),
        enc.mkString(", "))
    } finally drop("bpe_tiny")
  }

  test("replay encodes unseen text made of known symbols") {
    drop("bpe_new")
    val d = tmpDir("graft-bpe-new")
    writeFixture(d, "documents",
      Seq((0L, "abab abab"), (1L, "abab cd")).toDF("doc_id", "text"))
    BpeArtifact.train(spark, d.toString, "bpe_new", targetVocab = 1000)
    try {
      // "ababab" never occurs in training but is covered by the learned
      // merges (a b -> ab, ab ab -> abab): greedy replay yields
      // [abab, ab] = 2 tokens; "ce" shares only 'c' with training and
      // stays at characters = 2 tokens
      val out = BpeArtifact.encodeDocs(spark, "bpe_new",
        Seq((9L, "ababab ce")).toDF("doc_id", "text")).collect()
      assert(out.length == 1)
      assert(out.head.getAs[Long]("n_words") == 2L)
      assert(out.head.getAs[Long]("n_bpe_tokens") == 4L, out.head.toString)
    } finally drop("bpe_new")
  }
}
