package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
                        maxDist: Int, q: Int = 3): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"), col(strCol).as("s"))
      .withColumn("len", length(col("s")))
    val shortMax = q - 1 + maxDist * q // both ≤ this ⇒ bound ≤ 0 ⇒ brute force

    // positional q-grams with per-string occurrence index (multiset key)
    val grams = base.filter(col("len") >= q)
      .select(col("id"), col("s"), col("len"),
        posexplode(expr(s"transform(sequence(1, len - $q + 1), i -> substring(s, i, $q))")))
      .withColumnRenamed("col", "g")
      .withColumn("occ", row_number().over(
        Window.partitionBy("id", "g").orderBy("pos")))
      .select("id", "s", "len", "g", "occ")

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
        greatest(col("la"), col("lb")) - lit(q - 1) - lit(maxDist * q))
      .select("id_a", "id_b", "s_a", "s_b")

    val shortSide = base.filter(col("len") <= shortMax)
    val candShort = shortSide.as("a")
      .join(broadcast(shortSide.as("b")),
        col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.s").as("s_a"), col("b.s").as("s_b"))

    candLong.unionByName(candShort)
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }
}
