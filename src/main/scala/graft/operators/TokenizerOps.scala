package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer training as relational dataflow.
  *
  * BPE (byte-pair encoding) merge learning — the step that produces a
  * tokenizer's merge table — expressed entirely in DataFrame ops:
  * no UDFs, no driver-side token loops.
  *
  * Scale shape: ONE pass over the corpus builds the word-frequency
  * table (the standard word-level pre-tokenization); every iteration
  * after that runs on the VOCAB — orders of magnitude smaller than
  * the corpus — so 100 TB of text costs one scan + k tiny iterations.
  * Pair counting is a map-side-combinable sum over word frequencies;
  * the winning merge is an UNGROUPED min(struct(-cnt, pa, pb))
  * aggregate (count desc, pair asc tie-break) broadcast back as a
  * 1-row scalar — no LIMIT-1 single-partition sort, no collect.
  *
  * Merge application uses a left-to-right literal replace over
  * double-space-joined symbol strings: symbols never contain spaces,
  * so the pattern ' A  B ' anchors exact symbol boundaries, and
  * sequential non-overlapping replacement is precisely BPE's
  * greedy-left rule ("a a a" + merge(a,a) → "aa a").
  */
object TokenizerOps {

  /** Learn `iters` BPE merges from whitespace-pre-tokenized text.
    * Returns one row per iteration: (iter, pa, pb, cnt) — the merged
    * symbol pair and its pair count at selection time.
    */
  def bpeTrain(docs: DataFrame, textCol: String, iters: Int): DataFrame = {
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    // vocab state: freq + padded double-space-joined symbol string.
    // ONE checkpoint — every round's pair count replays the (cheap,
    // map-only) replace chain from here instead of re-tokenizing docs.
    val corpus0 = words.select(col("freq"),
      concat(lit(" "), array_join(split(col("word"), ""), "  "), lit(" ")).as("s"))
      .localCheckpoint()
    // The selected merge is a ONE-ROW aggregate — model state, not
    // data — so it lives on the DRIVER (the trainIvf convention) and
    // folds into the next round's corpus update as literals: each
    // round costs exactly one job (the pair-count aggregate + 1-row
    // collect), and the corpus state stays a lazily-chained map-only
    // replace over corpus0. The pre-r13 shape kept the merge row
    // distributed and localCheckpoint'd BOTH the 1-row top and the
    // whole updated corpus every round — measured as 34 driver
    // round-trip jobs for tx_bpe_apply's 5-round train at sf0.1.
    var corpus = corpus0
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var exhausted = false
    for (i <- 1 to iters if !exhausted) {
      val top = corpus
        .select(col("freq"), split(trim(col("s")), "  ").as("sym"))
        .filter(size(col("sym")) >= 2) // sequence(1,0) would DESCEND
        .select(col("freq"), col("sym"),
          explode(sequence(lit(1), size(col("sym")) - 1)).as("i"))
        .groupBy(element_at(col("sym"), col("i")).as("pa"),
          element_at(col("sym"), col("i") + 1).as("pb"))
        .agg(sum("freq").as("cnt"))
        .agg(min(struct((-col("cnt")).as("nc"), col("pa"), col("pb"))).as("m"))
        .select(col("m.pa").as("pa"), col("m.pb").as("pb"),
          (-col("m.nc")).as("cnt"))
        .head()
      // pa is null once every word is a single symbol (iters > learnable
      // merges) — no further merge can ever be found, stop learning
      if (top.isNullAt(0)) exhausted = true
      else {
        val (pa, pb, cnt) = (top.getString(0), top.getString(1), top.getLong(2))
        merges += ((i, pa, pb, cnt))
        corpus = corpus.select(col("freq"),
          call_function("replace", col("s"),
            lit(s" $pa  $pb "), lit(s" $pa$pb ")).as("s"))
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("iter", "pa", "pb", "cnt")
  }

  /** BPE ENCODE — apply a learned merge table to text (the tokenize
    * step a training pipeline runs over the whole corpus after
    * [[bpeTrain]] learns the merges). Returns the symbol array per
    * row: each whitespace word is exploded to characters, then the
    * merges replay IN TRAINING ORDER with the same greedy-left
    * double-space replace as training ("a a a" + merge(a,a) →
    * ["aa","a"]).
    *
    * The merge table is a MODEL ARTIFACT (like MlGate's coefficients):
    * O(vocab) rows held driver-side and folded into ONE codegen'd
    * projection — the corpus streams through a single narrow select
    * with no join, no shuffle, no per-row driver work. That is the
    * 100 TB shape: tokenization cost is exactly one scan.
    */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column = {
    val encodeWord = (w: Column) => {
      val padded = concat(lit(" "), array_join(split(w, ""), "  "), lit(" "))
      val mergedS = merges.foldLeft(padded) { case (c, (pa, pb)) =>
        call_function("replace", c, lit(s" $pa  $pb "), lit(s" $pa$pb "))
      }
      split(trim(mergedS), "  ")
    }
    // drop empty "words" from consecutive/leading/trailing spaces —
    // encodeWord("") would emit a phantom empty token, and bpeTrain's
    // pair counting already excludes them (train and encode must agree)
    flatten(transform(filter(split(text, " "), w => w =!= ""), encodeWord))
  }
}
