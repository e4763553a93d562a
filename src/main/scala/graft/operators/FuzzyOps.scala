package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) matching — entity resolution over dirty
  * strings (near-identical names/titles/URLs), the data-cleaning twin
  * of the content near-dup stack.
  *
  * The naive form is a cross join with a `levenshtein` predicate —
  * O(n²) comparisons of an O(len²) function, dead at scale. This uses
  * q-gram COUNT FILTERING (Gravano et al., VLDB'01): one edit
  * operation destroys at most `q` of a string's positional q-grams,
  * so `lev(a,b) ≤ k` implies the multiset of shared q-grams has size
  * `≥ max(G_a, G_b) − k·q` (`G_x = len_x − q + 1`). Candidates come
  * from an inverted q-gram index join (equi-shuffle on the gram), the
  * count bound prunes, and exact `levenshtein` verifies survivors —
  * complete (no false negatives), with only candidate pairs ever
  * compared.
  *
  * Multiset semantics matter (`"aaaa"` has three `"aaa"` grams): gram
  * rows carry an occurrence index, so the equi-join on
  * `(gram, occurrence)` counts true multiset intersection.
  *
  * Strings short enough that the bound collapses to zero
  * (`max(len) ≤ q−1+k·q`, e.g. ≤ 8 chars at q=3,k=2) can share no
  * gram yet still match; those pairs are resolved in a brute-force
  * SHORT bucket — bounded, because both sides are short strings from
  * a finite alphabet, and broadcast.
  */
object FuzzyOps {

  /** All pairs with `levenshtein ≤ maxDist` over `strCol`, as
    * `(id_a, id_b, dist)`, `id_a < id_b`. Exactly the naive cross-join
    * result, computed candidate-first.
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxDist: Int, q: Int = 3): DataFrame =
    gramFilteredPairs(df, idCol, strCol, maxDist, q, gramsPerEdit = q,
      verify = (a, b) => levenshtein(a, b).cast("long"))

  /** All pairs with unrestricted Damerau-Levenshtein ≤ `maxDist`.
    * Same count-filtering frame as [[editDistancePairs]], with the
    * per-edit gram-destruction bound widened to `q + 1`: an adjacent
    * transposition at position i rewrites the q-grams starting at
    * i−q+1 … i+1 (q+1 of them), while indel/substitute still destroy
    * ≤ q — so `dl ≤ k` ⇒ shared grams ≥ max(G_a, G_b) − k(q+1), and
    * the filter stays complete. Verification is the native
    * [[org.apache.spark.sql.graftx.DamerauLevenshtein]] expression.
    */
  def dlDistancePairs(df: DataFrame, idCol: String, strCol: String,
                      maxDist: Int, q: Int = 3): DataFrame =
    gramFilteredPairs(df, idCol, strCol, maxDist, q, gramsPerEdit = q + 1,
      verify = (a, b) =>
        org.apache.spark.sql.graftx.GraftFuzzy.damerauLevenshtein(a, b).cast("long"))

  private def gramFilteredPairs(df: DataFrame, idCol: String, strCol: String,
                                maxDist: Int, q: Int, gramsPerEdit: Int,
                                verify: (Column, Column) => Column): DataFrame = {
    // ANSI mode turns a non-integral id into a mid-job CAST error (and
    // with ANSI off, into silent empty output via null ids) — fail fast
    require({
      import org.apache.spark.sql.types._
      Seq(LongType, IntegerType, ShortType, ByteType).contains(df.schema(idCol).dataType)
    }, s"$idCol must be an integral id column (got ${df.schema(idCol).dataType.simpleString})")
    val base = df.select(col(idCol).cast("long").as("id"), col(strCol).as("s"))
      .withColumn("len", length(col("s")))
    val shortMax = q - 1 + maxDist * gramsPerEdit // both ≤ this ⇒ bound ≤ 0 ⇒ brute force

    // positional q-grams with per-string occurrence index (multiset
    // key). The occurrence number is computed INSIDE the row from the
    // gram array (count of equal grams at earlier positions + 1) — the
    // pre-r14 shape numbered duplicates with
    // row_number().over(Window.partitionBy(id, g).orderBy(pos)), a
    // corpus-wide Exchange+Sort of the whole positional-gram relation
    // paid before the candidate join (guide §2.3/§2.4: at 100 TB of
    // text that is a full sort of ~|text| rows to number the rare
    // within-string duplicate). Same numbering by construction: array
    // order IS pos order, so occ values are identical.
    val grams = base.filter(col("len") >= q)
      .select(col("id"), col("s"), col("len"),
        expr(s"transform(sequence(1, len - $q + 1), i -> substring(s, i, $q))").as("gs"))
      .select(col("id"), col("s"), col("len"),
        posexplode(expr(
          "transform(gs, (g, i) -> struct(g AS g, " +
            "size(filter(slice(gs, 1, i), x -> x = g)) + 1 AS occ))")))
      .select(col("id"), col("s"), col("len"),
        col("col.g").as("g"), col("col.occ").as("occ"))

    val candLong = grams.as("a")
      .join(grams.hint("SHUFFLE_HASH").as("b"),
        col("a.g") === col("b.g") && col("a.occ") === col("b.occ") &&
          col("a.id") < col("b.id") &&
          greatest(col("a.len"), col("b.len")) > shortMax &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.s").as("s_a"), col("b.s").as("s_b"),
        col("a.len").as("la"), col("b.len").as("lb"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >=
        greatest(col("la"), col("lb")) - lit(q - 1) - lit(maxDist * gramsPerEdit))
      .select("id_a", "id_b", "s_a", "s_b")

    // The short-string window join is inherently all-pairs within
    // ±maxDist (too few q-grams to pin candidates), so the short side
    // has no non-broadcast plan — the unhinted fallback would be a
    // cartesian. Gate it loudly: broadcast while it fits, fail fast
    // with the remedy once the short population outgrows the bound
    // (r12: unconditional broadcasts of corpus-growing sides are the
    // measured decade-kill class). MEASURED gate, not plan stats: the
    // side is a Filter over the corpus scan, and the size-only stats
    // visitor gives a Filter its child's sizeInBytes — the stats form
    // would reject by corpus size on any large parquet input even
    // when zero strings are short. One pruned count+bytes job is the
    // honest price (same trade as the QuantileOps cardinality
    // pre-scan); rows are (id long, s ≤shortMax chars, len int).
    val shortSide = RelationalOps.requireBroadcastableMeasured(
      base.filter(col("len") <= shortMax),
      octet_length(col("s")),
      s"edit-distance short side (len <= $shortMax)",
      "pre-block or pre-dedup the corpus before pairing, or raise " +
        "spark.graft.broadcastDimBound if the heap affords it")
    val candShort = shortSide.as("a")
      .join(shortSide.as("b"),
        col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.s").as("s_a"), col("b.s").as("s_b"))

    candLong.unionByName(candShort)
      .withColumn("dist", verify(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  /** Blocked Jaro-Winkler matching: candidate pairs share a blocking
    * key (first character + length band here — Winkler weight lives
    * in the prefix, so first-char blocking is the standard ER choice),
    * survivors scored with the native
    * [[org.apache.spark.sql.graftx.JaroWinklerSimilarity]] expression.
    * Unlike the edit-distance paths the blocking is part of the
    * DECLARED semantics (jw admits no complete gram bound) — the
    * oracle applies the identical predicates, so the check stays
    * exact. Blocking key join is an equi-shuffle; no candidate
    * explosion beyond per-block n².
    */
  def jaroWinklerPairs(df: DataFrame, idCol: String, strCol: String,
                       minSim: Double, maxLenDiff: Int = 4): DataFrame = {
    // ANSI mode turns a non-integral id into a mid-job CAST error (and
    // with ANSI off, into silent empty output via null ids) — fail fast
    require({
      import org.apache.spark.sql.types._
      Seq(LongType, IntegerType, ShortType, ByteType).contains(df.schema(idCol).dataType)
    }, s"$idCol must be an integral id column (got ${df.schema(idCol).dataType.simpleString})")
    val base = df.select(col(idCol).cast("long").as("id"), col(strCol).as("s"))
      .withColumn("len", length(col("s")))
      .withColumn("blk", substring(col("s"), 1, 1))
    base.as("a")
      .join(base.hint("SHUFFLE_HASH").as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= maxLenDiff)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        org.apache.spark.sql.graftx.GraftFuzzy
          .jaroWinklerSimilarity(col("a.s"), col("b.s")).as("jw"))
      .filter(col("jw") >= minSim)
  }
}
