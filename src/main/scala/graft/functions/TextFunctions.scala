package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, n-gram shingling, quality scoring, language-ID
  * heuristics, rolling-hash fingerprints. All pure Column expressions
  * (higher-order array functions — distributed, no UDFs, no driver
  * loops); every function is deterministic so results are
  * oracle-checkable.
  *
  * Spark 4 runs with ANSI mode on: all arithmetic here is bounded to
  * avoid Long overflow (masked 32-bit multiplicands, modular folds).
  */
object TextFunctions {

  /** Whitespace tokens of a single-space-normalized text column. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish word-piece count: maximal runs of letters or digits. */
  def wordRegexCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+")).cast("long")

  /** Token n-gram shingles ("w1 w2 w3"), empty array when the doc is
    * shorter than n. Backed by the native
    * [[org.apache.spark.sql.graftx.TokenNgrams]] expression (the HOF
    * form — transform over sequence + element_at — is interpreted per
    * shingle and an order of magnitude slower on the dedup hot path).
    */
  def ngrams(text: Column, n: Int): Column =
    org.apache.spark.sql.graftx.GraftFunctions.tokenNgrams(tokens(text), n)

  /** Distinct shingle set (the MinHash/Jaccard input). */
  def shingleSet(text: Column, n: Int): Column = array_distinct(ngrams(text, n))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column = {
    val tok = tokens(text)
    size(filter(tok, t => t.isin(stopwords: _*))).cast("double") / size(tok)
  }

  /** Fraction of characters that are neither lowercase letters, digits
    * nor spaces (punctuation/noise share).
    */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[a-z0-9 ]", "")).cast("double") / length(text)

  /** Composite quality score in [0,1]: favors docs long enough to train
    * on, penalizes stopword-heavy and punctuation-heavy text. Pure
    * arithmetic — mirrored verbatim in the DuckDB oracle.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(lit(1.0), tokenCount(text).cast("double") / lit(100.0))
    lenScore * (lit(1.0) - stopwordRatio(text)) * (lit(1.0) - punctRatio(text))
  }

  /** Stopword-marker language-ID heuristic: English function words are
    * strong n-gram markers; text without them is "und" (undetermined).
    * Deterministic and SQL-expressible; a real char-trigram profile
    * model drops in behind the same Column signature.
    */
  def langIdHeuristic(text: Column): Column = {
    val tok = tokens(text)
    val hits = size(filter(tok, t => t.isin("the", "a", "of", "and", "is", "to")))
    when(hits >= 2, lit("en")).otherwise(lit("und"))
  }

  /** Polynomial rolling-hash fingerprint over characters:
    * acc = (acc*31 + codepoint) mod 1e9+7. Left fold in code-point
    * order ⇒ identical in any engine with a sequential reduce (DuckDB:
    * `list_reduce` over `unicode(c)`). Backed by the native
    * [[org.apache.spark.sql.graftx.RollingHash31]] expression — the
    * HOF form pays an interpreted lambda per CHARACTER, the worst
    * per-element ratio in the library.
    */
  def rollingHash(text: Column): Column =
    org.apache.spark.sql.graftx.GraftFunctions.rollingHash31(text)

  /** Content-defined chunk fingerprints: rolling hash over each token
    * n-gram — the document-fingerprinting primitive for fuzzy
    * containment checks.
    */
  def ngramFingerprints(text: Column, n: Int): Column =
    transform(shingleSet(text, n),
      g => org.apache.spark.sql.graftx.GraftFunctions.rollingHash31(g))

  /** URL canonicalization for web-corpus dedup — the normalization a
    * crawl pipeline applies before URL-level deduplication (the same
    * document fetched as `HTTPS://WWW.X.COM:443/a/?utm_source=y&b=2&a=1#s`
    * and `https://x.com/a?a=1&b=2` must collapse):
    *   - scheme and host lowercased; default port stripped
    *     (`:443` for https, `:80` for http); leading `www.` dropped;
    *   - fragment dropped; trailing path slashes stripped;
    *   - tracking params (`utm_*`) removed; remaining query params
    *     sorted bytewise so parameter order never splits a URL.
    * Pure Column expression chain (regexp + higher-order array ops, no
    * UDF) — whole-stage-codegen'd, so canonicalizing 100 TB of crawl
    * metadata rides inside the scan projection. Bytewise-deterministic,
    * hence oracle-checkable (`tx_url_canonicalize`).
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([^:/?#]+)://", 1))
    val rest = regexp_replace(noFrag, "^[^:/?#]+://", "")
    val hostPort = lower(regexp_extract(rest, "^([^/?#]*)", 1))
    val noDefaultPort = when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    val host = regexp_replace(noDefaultPort, "^www\\.", "")
    val pathQ = regexp_replace(rest, "^[^/?#]*", "")
    val path = regexp_replace(regexp_extract(pathQ, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(pathQ, "\\?(.*)$", 1)
    val params = array_join(
      sort_array(filter(split(query, "&"),
        p => p =!= "" && !p.startsWith("utm_"))), "&")
    concat(scheme, lit("://"), host, path,
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
  }

}
