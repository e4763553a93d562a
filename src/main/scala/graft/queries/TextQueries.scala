package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.DetRound.{r4, sqlR4}
import graft.operators.{DedupOps, QualityOps, RelationalOps}

/** Text-analysis + dedup query surface over the `documents` table
  * (driver mandate: training-data pipeline operators as first-class
  * components). Oracle-checked wherever the op is SQL-expressible;
  * probabilistic ops (MinHash/SimHash) are deterministic but
  * non-relational → rows-only entries.
  */
object TextQueries extends QueryPack {

  // Token counting: whitespace tokens + BPE-ish regex word-pieces.
  q("tx_token_count",
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_words,
      |  CAST(length(text) AS BIGINT) AS n_chars_m
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        wordRegexCount(col("text")).as("n_words"),
        length(col("text")).cast("long").as("n_chars_m"))
      .orderBy("doc_id")
  }

  // Quality scoring: length/stopword/punctuation components + composite.
  q("tx_quality",
    s"""WITH t AS (
      |  SELECT doc_id, text,
      |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE) AS stop_hits,
      |    CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
      |      / length(text) AS punct_ratio
      |  FROM documents)
      |SELECT doc_id,
      |  ${sqlR4("stop_hits / nt")} AS stopword_ratio,
      |  ${sqlR4("punct_ratio")} AS punct_ratio,
      |  ${sqlR4("least(1.0, nt / 100.0) * (1.0 - stop_hits / nt) * (1.0 - punct_ratio)")} AS quality
      |FROM t ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        r4(stopwordRatio(col("text"))).as("stopword_ratio"),
        r4(punctRatio(col("text"))).as("punct_ratio"),
        r4(qualityScore(col("text"))).as("quality"))
      .orderBy("doc_id")
  }

  // Language-ID heuristic vs. the labeled lang column.
  q("tx_lang_id",
    """SELECT doc_id, lang,
      |  CASE WHEN len(list_filter(string_split(text, ' '),
      |    x -> x IN ('the','a','of','and','is','to'))) >= 2
      |  THEN 'en' ELSE 'und' END AS pred_lang
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        langIdHeuristic(col("text")).as("pred_lang"))
      .orderBy("doc_id")
  }

  // Rolling-hash document fingerprint (same modular left-fold on both
  // engines: (acc*31 + codepoint) mod 1e9+7 over characters).
  q("tx_fingerprint",
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(list_filter(string_split(text, ''), c -> c != ''),
      |                     c -> CAST(unicode(c) AS BIGINT))),
      |    (acc, cp) -> (acc * 31 + cp) % 1000000007) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), rollingHash(col("text")).as("fp"))
      .orderBy("doc_id")
  }

  // URL canonicalization + URL-level dedup — the first step of a web
  // crawl pipeline (the same page fetched via uppercase scheme/host,
  // default port, www., tracking params, reordered query, trailing
  // slash or fragment must collapse to ONE canonical URL before
  // content is even fetched). Messy URLs are constructed
  // deterministically from (source, doc_id) — four mess classes; the
  // HTTPS-uppercase-www-utm class and the plain-https class share a
  // path id, so canonicalization MUST merge exactly those pairs. The
  // whole normalization is a codegen'd Column chain
  // (TextFunctions.canonicalizeUrl); the oracle replays it with
  // DuckDB's regex/list functions, and the window picks each group's
  // representative (min doc_id) — is_rep=false rows ARE the URL-dedup
  // drops.
  q("tx_url_canonicalize",
    """WITH u AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 4 AS INTEGER)
      |      WHEN 0 THEN concat('HTTPS://WWW.', source, '.com:443/docs/',
      |        CAST(doc_id // 4 AS VARCHAR), '/?utm_source=feed&b=2&a=1#sec')
      |      WHEN 1 THEN concat('http://', source, '.com:80/docs/',
      |        CAST(doc_id // 4 AS VARCHAR), '?b=2&a=1&utm_campaign=x')
      |      WHEN 2 THEN concat('https://www.', source, '.com/docs/',
      |        CAST(doc_id // 4 AS VARCHAR), '?a=1&b=2')
      |      ELSE concat('http://', source, '.com/docs/',
      |        CAST(doc_id // 4 AS VARCHAR), '#top') END AS url
      |  FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    lower(regexp_extract(nofrag, '^([^:/?#]+)://', 1)) AS scheme,
      |    regexp_replace(nofrag, '^[^:/?#]+://', '') AS rest
      |  FROM (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nofrag FROM u)),
      |p AS (
      |  SELECT doc_id, scheme,
      |    regexp_replace(
      |      CASE WHEN scheme = 'https'
      |             THEN regexp_replace(lower(regexp_extract(rest, '^([^/?#]*)', 1)), ':443$', '')
      |           WHEN scheme = 'http'
      |             THEN regexp_replace(lower(regexp_extract(rest, '^([^/?#]*)', 1)), ':80$', '')
      |           ELSE lower(regexp_extract(rest, '^([^/?#]*)', 1)) END,
      |      '^www\.', '') AS host,
      |    regexp_replace(regexp_extract(regexp_replace(rest, '^[^/?#]*', ''), '^([^?]*)', 1),
      |      '/+$', '') AS path,
      |    coalesce(array_to_string(list_sort(list_filter(
      |      string_split(regexp_extract(regexp_replace(rest, '^[^/?#]*', ''), '\?(.*)$', 1), '&'),
      |      q -> q <> '' AND NOT starts_with(q, 'utm_'))), '&'), '') AS params
      |  FROM c),
      |canon AS (
      |  SELECT doc_id, concat(scheme, '://', host, path,
      |    CASE WHEN params = '' THEN '' ELSE concat('?', params) END) AS url_canon
      |  FROM p)
      |SELECT doc_id, url_canon,
      |  (doc_id = min(doc_id) OVER (PARTITION BY url_canon)) AS is_rep
      |FROM canon ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val pid = expr("CAST(doc_id DIV 4 AS STRING)")
    val base = concat(col("source"), lit(".com"))
    val url = when(pmod(col("doc_id"), lit(4)) === 0,
        concat(lit("HTTPS://WWW."), base, lit(":443/docs/"), pid,
          lit("/?utm_source=feed&b=2&a=1#sec")))
      .when(pmod(col("doc_id"), lit(4)) === 1,
        concat(lit("http://"), base, lit(":80/docs/"), pid,
          lit("?b=2&a=1&utm_campaign=x")))
      .when(pmod(col("doc_id"), lit(4)) === 2,
        concat(lit("https://www."), base, lit("/docs/"), pid, lit("?a=1&b=2")))
      .otherwise(concat(lit("http://"), base, lit("/docs/"), pid, lit("#top")))
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.canonicalizeUrl(url).as("url_canon"))
      .withColumn("is_rep",
        col("doc_id") === min("doc_id").over(Window.partitionBy("url_canon")))
      .orderBy("doc_id")
  }

  // TF-IDF term scoring: term frequency within doc × inverse document
  // frequency across the corpus — the classic text-weighting composite
  // (explode → two aggregations → join). ln() is libm on both engines;
  // the deterministic-rounding epsilon absorbs any last-ulp variance.
  q("tx_tfidf",
    s"""WITH tf AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tfc AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
       |df AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents)
       |SELECT doc_id, term, tf,
       |  ${sqlR4("tf * ln(CAST(n_docs AS DOUBLE) / df)")} AS tfidf
       |FROM tfc JOIN df USING (term) CROSS JOIN n
       |WHERE term IN ('spark', 'vector', 'dup')
       |ORDER BY doc_id, term""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val terms = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.groupBy("term").agg(countDistinct("doc_id").as("df"))
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    tf.join(df, "term").join(broadcast(nDocs))
      .filter(col("term").isin("spark", "vector", "dup"))
      .select(col("doc_id"), col("term"), col("tf"),
        r4(col("tf") * log(col("n_docs").cast("double") / col("df"))).as("tfidf"))
      .orderBy("doc_id", "term")
  }

  // PIPE_CURATE — the curation FLAGSHIP composite (the LLM-pipeline
  // counterpart of pipe_mart): annotate (tokens, quality) → gates
  // (length, quality, repetition) → exact dedup (min doc_id per
  // content digest) → deterministic train/test split → per-(source,
  // split) corpus report. Every stage is the library operator the
  // standalone queries check one-by-one; here the oracle checks their
  // COMPOSITION end-to-end. The quality gate compares det-rounded
  // values on both engines (raw-double thresholding at a boundary is
  // the one place ulp drift could flip a row). Near-dup clustering
  // stays out of this (sketch-based — not SQL-expressible); its
  // composition is spec-checked in CurationPipelineSpec.
  q("pipe_curate",
    s"""WITH t AS (
      |  SELECT doc_id, text, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE) AS stop_hits,
      |    CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
      |      / length(text) AS punct_ratio,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd,
      |    md5(text) AS fingerprint
      |  FROM documents),
      |sc AS (
      |  SELECT *, least(1.0, nt / 100.0) * (1.0 - stop_hits / nt)
      |    * (1.0 - punct_ratio) AS quality FROM t),
      |bg AS (
      |  SELECT doc_id, unnest(CASE WHEN len(string_split(text, ' ')) >= 2
      |    THEN list_transform(generate_series(1, len(string_split(text, ' ')) - 1),
      |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])
      |    ELSE [] END) AS g
      |  FROM documents),
      |rep AS (
      |  SELECT doc_id, max(c) AS top_c, CAST(sum(c) AS BIGINT) AS n_bg FROM (
      |    SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2) GROUP BY 1),
      |gated AS (
      |  SELECT sc.* FROM sc LEFT JOIN rep USING (doc_id)
      |  WHERE n_tokens >= 10
      |    AND ${sqlR4("quality")} >= 0.05
      |    AND (1.0 - nd / nt) <= 0.8
      |    AND coalesce(CAST(top_c AS DOUBLE) / n_bg, 0.0) <= 0.1),
      |keep AS (SELECT fingerprint, min(doc_id) AS doc_id FROM gated GROUP BY 1),
      |dedup AS (SELECT g.* FROM gated g JOIN keep USING (fingerprint, doc_id)),
      |sp AS (
      |  SELECT *, CASE WHEN substr(fingerprint, 1, 1) IN
      |    ('0','1','2','3','4','5','6','7','8','9','a','b')
      |  THEN 'train' ELSE 'test' END AS split FROM dedup)
      |SELECT source, split, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      |  ${sqlR4("avg(quality)")} AS mean_quality
      |FROM sp GROUP BY 1, 2 ORDER BY source, split""".stripMargin) { (s, dir) =>
    val annotated = Tables.load(s, dir, "documents")
      .withColumn("n_tokens", tokenCount(col("text")))
      .withColumn("quality", qualityScore(col("text")))
      .withColumn("fingerprint", md5(col("text").cast("binary")))
    val gated0 = annotated.filter(
      col("n_tokens") >= 10 && r4(col("quality")) >= 0.05)
    val repKeep = QualityOps.repetitionMetrics(gated0, "doc_id", "text",
        maxDupTokenFrac = 0.8, maxTopBigramFrac = 0.1)
      .filter(col("keep")).select("doc_id")
    val gated = gated0.join(repKeep, "doc_id")
    val exactKeep = gated.groupBy("fingerprint").agg(min("doc_id").as("doc_id"))
    val dedup = gated.join(exactKeep, Seq("fingerprint", "doc_id"))
    dedup.withColumn("split",
        when(substring(col("fingerprint"), 1, 1).isin(
          "0", "1", "2", "3", "4", "5", "6", "7", "8", "9", "a", "b"),
          lit("train")).otherwise(lit("test")))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"),
        r4(avg("quality")).as("mean_quality"))
      .orderBy("source", "split")
  }

  // Corpus-trained unigram log-probability — the relational core of
  // an LM-based fluency/quality gate (KenLM-style scoring with the
  // n-gram order dialed to 1): train = one aggregation over the
  // corpus' own token counts, score = per-doc mean log P(token).
  // Low scores flag rare-token-dense (garbled/boilerplate) docs.
  // Train and score ride the SAME exploded token relation, so the
  // whole thing is two shuffles (term count, doc regroup); the
  // frequency table joins by term (NOT broadcast — at 100 TB a
  // vocabulary does not fit an executor), the 1-row total broadcasts.
  q("tx_unigram_logprob",
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |freq AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
      |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM freq)
      |SELECT doc_id, count(*) AS n_tokens,
      |  ${sqlR4("avg(ln(cnt / n))")} AS avg_logprob
      |FROM toks JOIN freq USING (term) CROSS JOIN tot
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val freq = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
    val tot = freq.agg(sum("cnt").cast("double").as("n"))
    toks.join(freq, "term").join(broadcast(tot))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        r4(avg(log(col("cnt") / col("n")))).as("avg_logprob"))
      .orderBy("doc_id")
  }

  // Second-order twin of [[tx_unigram_logprob]]: bigram conditional
  // log-likelihood, MLE P(w2|w1) = c(w1 w2) / c(w1 ·) with both count
  // tables trained on the corpus itself. The same two-shuffle shape —
  // bigram relation → counts → rejoin — just keyed on (w1, w2); docs
  // shorter than 2 tokens have no bigrams and drop out (mirrored in
  // the oracle).
  q("tx_bigram_logprob",
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t,
      |    len(string_split(text, ' ')) AS n FROM documents),
      |big AS (
      |  SELECT x.doc_id, t.t[x.i] AS w1, t.t[x.i + 1] AS w2
      |  FROM (SELECT doc_id, unnest(generate_series(1, n - 1)) AS i
      |        FROM toks WHERE n >= 2) x
      |  JOIN toks t USING (doc_id)),
      |c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  ${sqlR4("avg(ln(c2 / CAST(c1 AS DOUBLE)))")} AS avg_logprob
      |FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val toks = Tables.load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn("n", size(col("t")))
      .filter(col("n") >= 2)
    val big = toks
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), col("n") - 1)).as("i"))
      .select(col("doc_id"),
        element_at(col("t"), col("i")).as("w1"),
        element_at(col("t"), col("i") + 1).as("w2"))
    val c2 = big.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    // context counts roll up from the (tiny) bigram-count table, not
    // from a third derivation of the corpus-sized exploded relation
    val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
    big.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        r4(avg(log(col("c2") / col("c1").cast("double")))).as("avg_logprob"))
      .orderBy("doc_id")
  }

  // Collocation mining — pointwise mutual information over corpus
  // bigrams: PMI = ln(p(w1w2) / (p(w1)·p(w2))), the classic
  // multi-word-expression detector. Counts roll up once (bigram table
  // → unigram table); totals ride as 1-row broadcast scalars, never a
  // driver collect. Output ordered by the pair, not the score, so
  // ulp-level PMI differences can't reorder rows.
  q("tx_pmi_collocations",
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t,
      |    len(string_split(text, ' ')) AS n FROM documents),
      |big AS (
      |  SELECT x.doc_id, t.t[x.i] AS w1, t.t[x.i + 1] AS w2
      |  FROM (SELECT doc_id, unnest(generate_series(1, n - 1)) AS i
      |        FROM toks WHERE n >= 2) x
      |  JOIN toks t USING (doc_id)),
      |uni AS (
      |  SELECT x.doc_id, t.t[x.i] AS w
      |  FROM (SELECT doc_id, unnest(generate_series(1, n)) AS i FROM toks) x
      |  JOIN toks t USING (doc_id)),
      |c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2),
      |c1 AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
      |nb AS (SELECT count(*) AS nb FROM big),
      |nu AS (SELECT count(*) AS nu FROM uni)
      |SELECT w1, w2, CAST(c2 AS BIGINT) AS c_bigram,
      |  ${sqlR4("ln((c2 / CAST(nb AS DOUBLE)) / ((a.c / CAST(nu AS DOUBLE)) * (b.c / CAST(nu AS DOUBLE))))")} AS pmi
      |FROM c2 JOIN c1 a ON c2.w1 = a.w JOIN c1 b ON c2.w2 = b.w, nb, nu
      |WHERE c2 >= 20
      |ORDER BY w1, w2""".stripMargin) { (s, dir) =>
    val toks = Tables.load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn("n", size(col("t")))
    val big = toks.filter(col("n") >= 2)
      .select(explode(expr("transform(sequence(1, n - 1), i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val uni = toks.select(explode(col("t")).as("w"))
    val c2 = big.groupBy("w1", "w2").agg(count(lit(1)).as("c2")).localCheckpoint()
    val c1 = uni.groupBy("w").agg(count(lit(1)).as("c")).localCheckpoint()
    val nb = c2.agg(sum("c2").as("nb"))
    val nu = c1.agg(sum("c").as("nu"))
    c2.filter(col("c2") >= 20)
      .join(c1.withColumnRenamed("w", "w1").withColumnRenamed("c", "ca"), "w1")
      .join(c1.withColumnRenamed("w", "w2").withColumnRenamed("c", "cb"), "w2")
      .crossJoin(broadcast(nb)).crossJoin(broadcast(nu))
      .select(col("w1"), col("w2"), col("c2").as("c_bigram"),
        r4(log((col("c2") / col("nb").cast("double")) /
          ((col("ca") / col("nu").cast("double")) *
           (col("cb") / col("nu").cast("double"))))).as("pmi"))
      .orderBy("w1", "w2")
  }

  // Classifier threshold sweep — precision/recall/F1 at each cutoff
  // over a deterministic score (noisy length proxy) and label, the
  // model-evaluation step of a quality-gate pipeline. The threshold
  // spine EXPLODES per row (no Cartesian plan node); counts are
  // integers, ratios round 4dp.
  q("ml_pr_curve",
    s"""WITH d AS (
      |  SELECT doc_id,
      |    n_chars + (doc_id * 2654435761) % 101 AS score,
      |    CASE WHEN n_chars > 250 THEN 1 ELSE 0 END AS label
      |  FROM documents),
      |s AS (
      |  SELECT unnest([150, 250, 350, 450, 550]) AS thr),
      |m AS (
      |  SELECT thr,
      |    sum(CASE WHEN score >= thr AND label = 1 THEN 1 ELSE 0 END) AS tp,
      |    sum(CASE WHEN score >= thr AND label = 0 THEN 1 ELSE 0 END) AS fp,
      |    sum(CASE WHEN score < thr AND label = 1 THEN 1 ELSE 0 END) AS fn
      |  FROM d, s GROUP BY thr)
      |SELECT CAST(thr AS BIGINT) AS thr, CAST(tp AS BIGINT) AS tp,
      |  CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
      |  ${sqlR4("CASE WHEN tp + fp > 0 THEN tp / CAST(tp + fp AS DOUBLE) ELSE 0 END")} AS precision_,
      |  ${sqlR4("CASE WHEN tp + fn > 0 THEN tp / CAST(tp + fn AS DOUBLE) ELSE 0 END")} AS recall_,
      |  ${sqlR4("CASE WHEN 2 * tp + fp + fn > 0 THEN 2 * tp / CAST(2 * tp + fp + fn AS DOUBLE) ELSE 0 END")} AS f1
      |FROM m ORDER BY thr""".stripMargin) { (s, dir) =>
    val thr = typedLit(Seq(150L, 250L, 350L, 450L, 550L))
    Tables.load(s, dir, "documents")
      .select(
        (col("n_chars") + (col("doc_id") * lit(2654435761L)) % 101L).as("score"),
        when(col("n_chars") > 250, 1L).otherwise(0L).as("label"),
        explode(thr).as("thr"))
      .groupBy("thr")
      .agg(
        sum(when(col("score") >= col("thr") && col("label") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("score") >= col("thr") && col("label") === 0, 1L).otherwise(0L)).as("fp"),
        sum(when(col("score") < col("thr") && col("label") === 1, 1L).otherwise(0L)).as("fn"))
      .select(col("thr"), col("tp"), col("fp"), col("fn"),
        r4(when(col("tp") + col("fp") > 0,
          col("tp") / (col("tp") + col("fp")).cast("double")).otherwise(0.0)).as("precision_"),
        r4(when(col("tp") + col("fn") > 0,
          col("tp") / (col("tp") + col("fn")).cast("double")).otherwise(0.0)).as("recall_"),
        r4(when(lit(2) * col("tp") + col("fp") + col("fn") > 0,
          lit(2) * col("tp") / (lit(2) * col("tp") + col("fp") + col("fn")).cast("double"))
          .otherwise(0.0)).as("f1"))
      .orderBy("thr")
  }

  // Readability scoring — Flesch reading ease from regex-countable
  // proxies (non-space runs = words, [.!?] = sentence ends, vowel
  // runs = syllables; the heuristic is standard for corpus-scale
  // gating where a real syllabifier is too slow). One codegen'd
  // projection; the three regexes mean the same thing in Java and RE2
  // dialects, so counts match exactly.
  q("tx_readability",
    s"""WITH m AS (
      |  SELECT doc_id,
      |    len(regexp_extract_all(text, '\\S+')) AS words,
      |    greatest(1, len(regexp_extract_all(text, '[.!?]'))) AS sentences,
      |    greatest(1, len(regexp_extract_all(lower(text), '[aeiouy]+'))) AS syllables
      |  FROM documents)
      |SELECT doc_id, CAST(words AS BIGINT) AS words,
      |  CAST(sentences AS BIGINT) AS sentences,
      |  CAST(syllables AS BIGINT) AS syllables,
      |  ${sqlR4("206.835 - 1.015 * (words / CAST(sentences AS DOUBLE)) - 84.6 * (syllables / CAST(words AS DOUBLE))")} AS flesch
      |FROM m WHERE words > 0
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).cast("long").as("words"),
        greatest(lit(1L), size(regexp_extract_all(col("text"), lit("[.!?]"), lit(0))).cast("long")).as("sentences"),
        greatest(lit(1L), size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0))).cast("long")).as("syllables"))
      .filter(col("words") > 0)
      .select(col("doc_id"), col("words"), col("sentences"), col("syllables"),
        r4(lit(206.835) - lit(1.015) * (col("words") / col("sentences").cast("double")) -
          lit(84.6) * (col("syllables") / col("words").cast("double"))).as("flesch"))
      .orderBy("doc_id")
  }

  // Per-source document cap — the mixture-control curation step ("at
  // most k docs per domain") as a deterministic window: rank within
  // source by content hash (reproducible across runs/engines — no
  // rand()), keep rank ≤ k. One shuffle on source; at 100 TB the
  // hot-source partitions are exactly what AQE skew-split handles.
  q("tx_cap_per_source",
    """WITH ranked AS (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rn
      |  FROM documents)
      |SELECT doc_id, source FROM ranked WHERE rn <= 50
      |ORDER BY source, doc_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(md5(col("text").cast("binary")), col("doc_id"))
    Tables.load(s, dir, "documents")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 50)
      .select("doc_id", "source")
      .orderBy("source", "doc_id")
  }

  // LM quality GATE in its production shape: the model is trained on
  // a REFERENCE corpus (even doc_ids) and scores an INCOMING batch
  // (odd doc_ids) — unlike the self-scoring twins above, the batch
  // contains tokens the model never saw, so probabilities are
  // Laplace-smoothed over the trained vocabulary (+1 OOV class):
  // seen w → (c(w)+1)/(N+V+1), unseen → 1/(N+V+1). Gate = mean log P
  // under threshold ⇒ flag. The incoming batch left-joins the trained
  // frequency table (vocab never broadcasts at corpus scale).
  q("tx_lm_gate",
    s"""WITH train AS (
      |  SELECT unnest(string_split(text, ' ')) AS term FROM documents
      |  WHERE doc_id % 2 = 0),
      |freq AS (SELECT term, count(*) AS cnt FROM train GROUP BY 1),
      |nv AS (
      |  SELECT CAST(sum(cnt) AS DOUBLE) AS n,
      |    CAST(count(*) AS DOUBLE) AS v FROM freq),
      |incoming AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      |  WHERE doc_id % 2 = 1),
      |scored AS (
      |  SELECT i.doc_id,
      |    ln((coalesce(f.cnt, 0) + 1) / (n + v + 1)) AS logp,
      |    CASE WHEN f.term IS NULL THEN 1 ELSE 0 END AS oov
      |  FROM incoming i LEFT JOIN freq f USING (term) CROSS JOIN nv)
      |SELECT doc_id, count(*) AS n_tokens,
      |  CAST(sum(oov) AS BIGINT) AS n_oov,
      |  ${sqlR4("avg(logp)")} AS avg_logprob,
      |  ${sqlR4("avg(logp)")} < -9.2 AS flagged
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val train = docs.filter(col("doc_id") % 2 === 0)
      .select(explode(tokens(col("text"))).as("term"))
    val freq = train.groupBy("term").agg(count(lit(1)).as("cnt"))
    val nv = freq.agg(sum("cnt").cast("double").as("n"),
      count(lit(1)).cast("double").as("v"))
    val incoming = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    incoming.join(freq.withColumnRenamed("term", "f_term"),
        col("term") === col("f_term"), "left")
      .crossJoin(broadcast(nv))
      .select(col("doc_id"),
        log((coalesce(col("cnt"), lit(0L)) + 1) / (col("n") + col("v") + 1)).as("logp"),
        when(col("f_term").isNull, 1).otherwise(0).as("oov"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("oov").cast("long").as("n_oov"),
        r4(avg("logp")).as("avg_logprob"),
        (r4(avg("logp")) < -9.2).as("flagged"))
      .orderBy("doc_id")
  }

  // Deterministic content-hash train/test split (the reproducible
  // alternative to rand() sampling — split survives re-runs, joins,
  // and engine changes because it keys on content, not randomness):
  // first hex nibble of md5(text) buckets into 16 cells, 12/16 train.
  q("tx_train_test_split",
    """SELECT doc_id,
      |  CASE WHEN substr(md5(text), 1, 1) IN
      |    ('0','1','2','3','4','5','6','7','8','9','a','b')
      |  THEN 'train' ELSE 'test' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        when(substring(md5(col("text").cast("binary")), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7", "8", "9", "a", "b"),
          lit("train")).otherwise(lit("test")).as("split"))
      .orderBy("doc_id")
  }

  // Stratified per-class sampling: top-k docs per language by a
  // deterministic content-hash order (reproducible downsampling for
  // class balancing).
  q("tx_stratified_sample",
    """SELECT doc_id, lang FROM (
      |  SELECT doc_id, lang, row_number() OVER (
      |    PARTITION BY lang ORDER BY md5(text), doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 20
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("text").cast("binary")), col("doc_id"))
    Tables.load(s, dir, "documents")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  // Exact dedup by content digest (SURVEY-mandated exact hash dedup).
  q("dd_exact",
    """SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id,
      |  count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin) { (s, dir) =>
    DedupOps.exactDuplicates(Tables.load(s, dir, "documents"), "doc_id", "text")
      .orderBy("fingerprint")
  }

  /** Posting-list cap for the checked n-gram queries: a shingle seen in
    * more than this many docs is a stop-phrase and is dropped before the
    * inverted-index self-join (skew guard — a shingle in f docs creates
    * f² candidate rows). Mirrored EXACTLY in the DuckDB oracles, so the
    * gate checks the capped semantics it would run at scale.
    */
  val NgramPostingCap = 100

  // Exact n-gram (3-shingle) Jaccard near-dup pairs via inverted-index
  // self-join — complete, so the brute-force SQL oracle must agree.
  // The skew cap is ON (the plan shipped to 100TB), and the oracle
  // applies the identical cap; `shared` counts only uncapped shingles
  // while n_a/n_b stay full-set sizes on both sides.
  q("dd_ngram_jaccard",
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |ngr AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(t) >= 3 THEN list_transform(
      |      generate_series(1, len(t) - 2),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |    ELSE [] END) AS ng
      |  FROM toks),
      |sizes AS (SELECT doc_id, CAST(len(ng) AS BIGINT) AS n_ng FROM ngr),
      |ex0 AS (SELECT doc_id, unnest(ng) AS g FROM ngr),
      |ok AS (SELECT g FROM ex0 GROUP BY g HAVING count(*) <= $NgramPostingCap),
      |ex AS (SELECT ex0.doc_id, ex0.g FROM ex0 JOIN ok USING (g)),
      |shared AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b, shared, sa.n_ng AS n_a, sb.n_ng AS n_b,
      |  ${sqlR4("shared / (sa.n_ng + sb.n_ng - shared)")} AS jaccard
      |FROM shared
      |JOIN sizes sa ON sa.doc_id = id_a
      |JOIN sizes sb ON sb.doc_id = id_b
      |WHERE shared / (sa.n_ng + sb.n_ng - shared) >= 0.2
      |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    DedupOps.ngramJaccardPairs(Tables.load(s, dir, "documents"),
        "doc_id", "text", n = 3, minSim = 0.2,
        maxPosting = Some(NgramPostingCap))
      .withColumn("jaccard", r4(col("jaccard")))
      .orderBy("id_a", "id_b")
  }

  /** Shared oracle prelude: exact n-gram Jaccard pairs (capped
    * postings) → transitive closure → per-doc min-reachable-id cluster
    * label. `dd_clusters` selects it directly; `dd_canonical` layers
    * the keep/drop window on top.
    */
  private val ClusterCte =
    s"""WITH RECURSIVE toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |ngr AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(t) >= 3 THEN list_transform(
      |      generate_series(1, len(t) - 2),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |    ELSE [] END) AS ng
      |  FROM toks),
      |sizes AS (SELECT doc_id, CAST(len(ng) AS BIGINT) AS n_ng FROM ngr),
      |ex0 AS (SELECT doc_id, unnest(ng) AS g FROM ngr),
      |ok AS (SELECT g FROM ex0 GROUP BY g HAVING count(*) <= $NgramPostingCap),
      |ex AS (SELECT ex0.doc_id, ex0.g FROM ex0 JOIN ok USING (g)),
      |shared AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b FROM shared
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE shared / (sa.n_ng + sb.n_ng - shared) >= 0.2),
      |edges AS (
      |  SELECT id_a AS a, id_b AS b FROM pairs
      |  UNION ALL SELECT id_b, id_a FROM pairs),
      |reach(id, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.a, reach.r FROM reach JOIN edges e ON e.b = reach.id),
      |cl AS (SELECT id AS doc_id, min(r) AS cluster_id
      |  FROM reach GROUP BY id)""".stripMargin

  /** Spark side of the shared cluster stage. */
  private def clusterDf(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = Tables.load(s, dir, "documents")
    val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minSim = 0.2,
      maxPosting = Some(NgramPostingCap))
    (docs, RelationalOps.connectedComponents(docs, "doc_id", pairs, "id_a", "id_b"))
  }

  // Duplicate clustering: connected components over the near-dup pair
  // graph (keep-one-per-cluster is the final step of every dedup
  // pipeline). Spark: iterative min-label propagation; oracle: a
  // recursive-CTE transitive closure over the same exact pair set.
  q("dd_clusters",
    s"""$ClusterCte
      |SELECT doc_id, cluster_id FROM cl ORDER BY doc_id""".stripMargin) { (s, dir) =>
    clusterDf(s, dir)._2.orderBy("doc_id")
  }


  // Canonical selection: per duplicate cluster keep the longest doc
  // (n_chars; ties → lowest doc_id), mark the rest dropped — the
  // keep/drop audit a curation pipeline acts on after clustering.
  q("dd_canonical",
    s"""$ClusterCte,
      |q AS (SELECT cl.doc_id, cl.cluster_id, d.n_chars
      |  FROM cl JOIN documents d USING (doc_id)),
      |k AS (SELECT doc_id, cluster_id,
      |    first_value(doc_id) OVER (
      |      PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS keep_id
      |  FROM q)
      |SELECT doc_id, cluster_id, keep_id, doc_id = keep_id AS is_kept
      |FROM k ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val (docs, clusters) = clusterDf(s, dir)
    DedupOps.canonicalPerCluster(clusters, "doc_id", "cluster_id",
        docs, "doc_id", "n_chars")
      .orderBy("doc_id")
  }

  // MinHash+LSH near-dup candidates, exact-verified. The minhash
  // construction isn't ANSI-SQL-expressible, so the hashed row pins
  // measured recall vs the UNCAPPED exact n-gram Jaccard twin at
  // ≥ 0.9 (measured 1.0 at every sf — banded signatures + exact
  // verification recover the full pair set on this corpus), alongside
  // the exact-twin pair count the oracle recomputes in SQL.
  q("dd_minhash_lsh",
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |ngr AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(t) >= 3 THEN list_transform(
      |      generate_series(1, len(t) - 2),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |    ELSE [] END) AS ng
      |  FROM toks),
      |sizes AS (SELECT doc_id, CAST(len(ng) AS BIGINT) AS n_ng FROM ngr),
      |ex AS (SELECT doc_id, unnest(ng) AS g FROM ngr),
      |shared AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs, true AS recall_ok
      |FROM shared
      |JOIN sizes sa ON sa.doc_id = id_a
      |JOIN sizes sb ON sb.doc_id = id_b
      |WHERE shared / (sa.n_ng + sb.n_ng - shared) >= 0.2""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val lsh = DedupOps.minHashLshPairs(docs,
        "doc_id", "text", n = 3, bands = 8, rowsPerBand = 4, minSim = 0.2)
      .select(col("id_a"), col("id_b"), lit(1).as("__hit"))
    val exact = DedupOps.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, minSim = 0.2, maxPosting = None)
      .select(col("id_a"), col("id_b"))
    exact.join(lsh, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_exact_pairs"),
        sum(coalesce(col("__hit"), lit(0))).as("__hits"))
      .select(col("n_exact_pairs"),
        (coalesce(col("__hits"), lit(0)) >= col("n_exact_pairs") * lit(0.9)).as("recall_ok"))
  }

  // SimHash near-dup pairs, Hamming ≤ 3. The 4×16-band pigeonhole is
  // COMPLETE for ≤3 bit flips, so this one pins EXACTNESS, not
  // recall — in two parts, both sub-quadratic (the pre-r9 twin was a
  // full all-pairs Hamming scan, the one O(n²) verification path the
  // sampling wave missed):
  //   - completeness, O(n·s): every true Hamming≤3 pair incident to a
  //     fixed ~512-doc modulus sample must appear in the banded set;
  //   - soundness, O(|pairs|): every banded pair truly has Hamming≤3
  //     (equi-joins back to the signatures, full corpus).
  // SimHashExactnessSpec proves the full property exhaustively on
  // small n; here the driver hashes the sampled pin against the real
  // corpus. Oracle: doc count + literal true.
  q("dd_simhash",
    """SELECT CAST(count(*) AS BIGINT) AS n_docs, true AS exactness_ok
      |FROM documents""".stripMargin) { (s, dir) =>
    import graft.operators.SimilarityOps
    val docs = Tables.load(s, dir, "documents")
    val sigs = docs.select(col("doc_id"), DedupOps.simHash(col("text")).as("sim"))
      .localCheckpoint() // consumers: sample twin + soundness joins
    val k = SimilarityOps.sampleModulus(docs.count(), 512)
    val sampleSigs = sigs.filter(col("doc_id") % k === 0)
    val bruteSample = sigs.as("b")
      .join(broadcast(sampleSigs.as("a")), col("a.doc_id") =!= col("b.doc_id"))
      .filter(bit_count(col("a.sim").bitwiseXOR(col("b.sim"))) <= 3)
      .select(least(col("a.doc_id"), col("b.doc_id")).as("id_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("id_b"))
      .distinct()
    val banded = DedupOps.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint() // two consumers: completeness + soundness
    val complete = bruteSample
      .join(banded.withColumn("__s", lit(1)), Seq("id_a", "id_b"), "left")
      .agg(coalesce(min(col("__s").isNotNull), lit(true)).as("complete_ok"))
    val sound = banded
      .join(sigs.select(col("doc_id").as("id_a"), col("sim").as("sim_a")), "id_a")
      .join(sigs.select(col("doc_id").as("id_b"), col("sim").as("sim_b")), "id_b")
      .agg(coalesce(min(bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) <= 3),
        lit(true)).as("sound_ok"))
    docs.agg(count(lit(1)).as("n_docs")).crossJoin(complete).crossJoin(sound)
      .select(col("n_docs"), (col("complete_ok") && col("sound_ok")).as("exactness_ok"))
  }

  // One-pass heavy hitters over the token stream (Misra-Gries k=12):
  // the "top domains/tokens in 100 TB" answer with 12 counters per
  // partial buffer instead of a groupBy over every distinct key.
  // MG counts are partitioning-dependent lower bounds, so the hashed
  // row pins the sketch's WORST-CASE GUARANTEES against an exact
  // count twin instead of the counts themselves: (a) every token with
  // true count > N/(k+1) is present ("heavy_covered"), (b) every
  // reported count is ≤ truth and undercounts by at most N/(k+1)
  // ("bounds_ok") — both deterministic properties of the algorithm
  // (MgSketchSpec proves them under 1 and 13 partitions). Oracle:
  // the token total + literal trues.
  q("tx_heavy_hitters",
    """SELECT CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |  true AS heavy_covered, true AS bounds_ok
      |FROM documents""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.graftx.MgHeavyHitters.mgHeavyHitters
    val k = 12
    val tok = Tables.load(s, dir, "documents")
      .select(explode(tokens(col("text"))).as("token"))
    val exact = tok.groupBy("token").agg(count(lit(1)).as("c")).cache()
    val nRow = exact.agg(sum("c").as("n_tokens"))
    val mg = tok.agg(mgHeavyHitters(col("token"), k = k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("item"), col("e.min_count").as("min_count"))
    val boundsOk = mg.join(exact, mg("item") === exact("token"))
      .crossJoin(nRow)
      .agg(coalesce(min(
        col("min_count") <= col("c") &&
          col("min_count") >= col("c") - floor(col("n_tokens") / lit(k + 1))),
        lit(true)).as("bounds_ok"))
    val covered = exact.crossJoin(nRow)
      .filter(col("c") > col("n_tokens") / lit((k + 1).toDouble))
      .join(mg, exact("token") === mg("item"), "left_anti")
      .agg((count(lit(1)) === 0).as("heavy_covered"))
    nRow.crossJoin(covered).crossJoin(boundsOk)
      .select(col("n_tokens"), col("heavy_covered"), col("bounds_ok"))
  }

  // Incremental exact dedup: docs < 250 play the historical corpus
  // (as its fingerprint index), docs >= 250 the daily batch — novel
  // content only, deduped within the batch. The daily-increment mode
  // a 100 TB corpus runs instead of full re-deduplication.
  q("dd_incremental",
    """WITH hist AS (
      |  SELECT DISTINCT md5(text) AS fingerprint FROM documents WHERE doc_id < 250),
      |batch AS (
      |  SELECT doc_id, md5(text) AS fingerprint FROM documents WHERE doc_id >= 250),
      |novel AS (
      |  SELECT b.doc_id, b.fingerprint FROM batch b
      |  LEFT JOIN hist h USING (fingerprint) WHERE h.fingerprint IS NULL)
      |SELECT fingerprint, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM novel GROUP BY 1 ORDER BY fingerprint""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    DedupOps.incrementalExact(
        docs.filter(col("doc_id") >= 250), "doc_id", "text",
        DedupOps.fingerprintIndex(docs.filter(col("doc_id") < 250), "text"))
      .orderBy("fingerprint")
  }

  // Two-tier bloom-prefiltered incremental dedup: same answer as
  // dd_incremental (same oracle), but the batch clears the bloom
  // filter map-side and only possibly-seen rows pay the exact
  // anti-join shuffle — the sketch-accelerated-exact pattern.
  q("dd_bloom_incremental",
    """WITH hist AS (
      |  SELECT DISTINCT md5(text) AS fingerprint FROM documents WHERE doc_id < 250),
      |batch AS (
      |  SELECT doc_id, md5(text) AS fingerprint FROM documents WHERE doc_id >= 250),
      |novel AS (
      |  SELECT b.doc_id, b.fingerprint FROM batch b
      |  LEFT JOIN hist h USING (fingerprint) WHERE h.fingerprint IS NULL)
      |SELECT fingerprint, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM novel GROUP BY 1 ORDER BY fingerprint""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    DedupOps.incrementalExactBloom(
        docs.filter(col("doc_id") >= 250), "doc_id", "text",
        DedupOps.fingerprintIndex(docs.filter(col("doc_id") < 250), "text"))
      .orderBy("fingerprint")
  }

  // Incremental NEAR-dup: docs ≥ 250 play the daily batch, joined
  // against the full posting index instead of re-self-joining the
  // corpus — pairs whose greater id is in the batch. Oracle = the
  // full dd_ngram_jaccard result restricted to id_b ≥ 250 (identical
  // pairs, identical cap — replay consistency of the increment mode).
  q("dd_incremental_neardup",
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |ngr AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(t) >= 3 THEN list_transform(
      |      generate_series(1, len(t) - 2),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |    ELSE [] END) AS ng
      |  FROM toks),
      |sizes AS (SELECT doc_id, CAST(len(ng) AS BIGINT) AS n_ng FROM ngr),
      |ex0 AS (SELECT doc_id, unnest(ng) AS g FROM ngr),
      |ok AS (SELECT g FROM ex0 GROUP BY g HAVING count(*) <= $NgramPostingCap),
      |ex AS (SELECT ex0.doc_id, ex0.g FROM ex0 JOIN ok USING (g)),
      |shared AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b, shared, sa.n_ng AS n_a, sb.n_ng AS n_b,
      |  ${sqlR4("shared / (sa.n_ng + sb.n_ng - shared)")} AS jaccard
      |FROM shared
      |JOIN sizes sa ON sa.doc_id = id_a
      |JOIN sizes sb ON sb.doc_id = id_b
      |WHERE shared / (sa.n_ng + sb.n_ng - shared) >= 0.2
      |  AND id_b >= 250
      |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    DedupOps.incrementalNgramPairs(
        docs.filter(col("doc_id") < 250), docs.filter(col("doc_id") >= 250),
        "doc_id", "text", n = 3, minSim = 0.2,
        maxPosting = Some(NgramPostingCap))
      .withColumn("jaccard", r4(col("jaccard")))
      .orderBy("id_a", "id_b")
  }

  // Benchmark decontamination: every 50th doc plays the held-out
  // benchmark set; corpus docs sharing any 5-gram with it are flagged
  // (the n-gram–collision test-set-leakage check run before training).
  // Benchmark shingles broadcast; only per-doc counts shuffle.
  q("tx_decontaminate",
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |ngr AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(t) >= 5 THEN list_transform(
      |      generate_series(1, len(t) - 4),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])
      |    ELSE [] END) AS ng
      |  FROM toks),
      |bg AS (SELECT DISTINCT unnest(ng) AS g FROM ngr WHERE doc_id % 50 = 0),
      |cg AS (SELECT doc_id, unnest(ng) AS g FROM ngr WHERE doc_id % 50 != 0),
      |hits AS (
      |  SELECT cg.doc_id, CAST(count(*) AS BIGINT) AS n_shared
      |  FROM cg JOIN bg USING (g) GROUP BY 1)
      |SELECT d.doc_id,
      |  coalesce(h.n_shared, CAST(0 AS BIGINT)) AS n_shared,
      |  coalesce(h.n_shared, 0) > 0 AS contaminated
      |FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
      |WHERE d.doc_id % 50 != 0
      |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    QualityOps.contaminationScan(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 5)
      .orderBy("doc_id")
  }

  // Repetition gates (the Gopher-style boilerplate filters):
  // duplicate-token fraction + most-frequent-bigram share, with the
  // keep/drop verdict computed on the unrounded values.
  q("tx_repetition",
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |base AS (
      |  SELECT doc_id, CAST(len(t) AS DOUBLE) AS nt,
      |    CAST(len(list_distinct(t)) AS DOUBLE) AS nd
      |  FROM toks),
      |ex AS (
      |  SELECT doc_id, unnest(CASE WHEN len(t) >= 2 THEN list_transform(
      |    generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1])
      |    ELSE [] END) AS g
      |  FROM toks),
      |cnt AS (SELECT doc_id, g, count(*) AS c FROM ex GROUP BY 1, 2),
      |top AS (
      |  SELECT doc_id, max(c) AS top_c, CAST(sum(c) AS BIGINT) AS n_bg
      |  FROM cnt GROUP BY 1)
      |SELECT b.doc_id,
      |  ${sqlR4("1.0 - nd / nt")} AS dup_token_frac,
      |  ${sqlR4("coalesce(CAST(top_c AS DOUBLE) / n_bg, 0.0)")} AS top_bigram_frac,
      |  (1.0 - nd / nt) <= 0.8
      |    AND coalesce(CAST(top_c AS DOUBLE) / n_bg, 0.0) <= 0.1 AS keep
      |FROM base b LEFT JOIN top USING (doc_id)
      |ORDER BY b.doc_id""".stripMargin) { (s, dir) =>
    QualityOps.repetitionMetrics(Tables.load(s, dir, "documents"),
        "doc_id", "text", maxDupTokenFrac = 0.8, maxTopBigramFrac = 0.1)
      .select(col("doc_id"), r4(col("dup_token_frac")).as("dup_token_frac"),
        r4(col("top_bigram_frac")).as("top_bigram_frac"), col("keep"))
      .orderBy("doc_id")
  }

  // Domain-mixture sampling: per-source target rates (6/16 for
  // even-numbered sources, 12/16 for odd) applied via the
  // content-hash predicate — the deterministic re-weighting step that
  // composes training mixes. Reported per source so the realized
  // fractions are visible next to the targets.
  q("tx_domain_mixture",
    """SELECT source, CAST(count(*) AS BIGINT) AS n_total,
      |  CAST(sum(CASE WHEN substr(md5(text), 1, 1) <
      |    CASE WHEN CAST(substr(source, 4) AS INTEGER) % 2 = 0
      |      THEN '6' ELSE 'c' END
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
      |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val idx = substring(col("source"), 4, 10).cast("int")
    val thr = when(idx % 2 === 0, lit(QualityOps.nibbleChar(6)))
      .otherwise(lit(QualityOps.nibbleChar(12)))
    Tables.load(s, dir, "documents")
      .withColumn("sampled", QualityOps.hashSampled(col("text"), thr))
      .groupBy("source")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"))
      .orderBy("source")
  }

  // Classifier-based quality gate (the FineWeb-style curation step):
  // a logistic model trained with WEAK labels (heuristic quality ≥ τ)
  // on the even-id half of the corpus gates the odd-id half. Features
  // are scan-stage Column expressions; scoring is a broadcast-model
  // projection (no shuffle — plan-spec'd in MlGateSpec). Learned
  // coefficients aren't SQL-oracle-able, so the hashed row pins the
  // model's GENERALIZATION: prediction agrees with the held-out
  // half's weak label on ≥ 95% of docs (MlGateSpec's separation
  // threshold; measured 0.99 across sf). Oracle: held-out count +
  // literal true.
  q("tx_ml_gate",
    """SELECT CAST(count(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS BIGINT) AS n_scored,
      |  true AS agreement_ok
      |FROM documents""".stripMargin) { (s, dir) =>
    import graft.operators.MlGate
    val docs = Tables.load(s, dir, "documents")
    val reference = docs.filter(col("doc_id") % 2 === 0)
    val incoming = docs.filter(col("doc_id") % 2 === 1)
    val model = MlGate.train(reference, "text", tau = 0.1)
    MlGate.score(model, incoming, "text")
      .withColumn("__weak",
        when(graft.functions.TextFunctions.qualityScore(col("text")) >= 0.1, 1.0)
          .otherwise(0.0))
      .agg(count(lit(1)).as("n_scored"),
        avg(when(col("prediction") === col("__weak"), 1.0).otherwise(0.0)).as("__agree"))
      .select(col("n_scored"), (col("__agree") >= 0.95).as("agreement_ok"))
  }

  // F19 — array SET algebra (intersect/union/except), the token-set
  // operations vocabulary filters and tag systems are built from.
  // Results are sorted and string-joined: the driver's row comparator
  // can't hash raw arrays, and sorting normalizes the engines'
  // differing element orders.
  q("f19_array_set_ops",
    """WITH d AS (
      |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS t,
      |    ['spark', 'vector', 'data', 'dup'] AS probe
      |  FROM documents)
      |SELECT doc_id,
      |  coalesce(array_to_string(list_sort(list_distinct(list_intersect(t, probe))), ','), '') AS present,
      |  coalesce(array_to_string(list_sort(list_distinct(t || probe)), ','), '') AS vocab,
      |  coalesce(array_to_string(list_sort(list_distinct(
      |    list_filter(probe, x -> NOT list_contains(t, x)))), ','), '') AS missing
      |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val toks = array_distinct(split(col("text"), " "))
    val probe = array(lit("spark"), lit("vector"), lit("data"), lit("dup"))
    Tables.load(s, dir, "documents").select(
      col("doc_id"),
      array_join(array_sort(array_intersect(toks, probe)), ",").as("present"),
      array_join(array_sort(array_union(toks, probe)), ",").as("vocab"),
      array_join(array_sort(array_except(probe, toks)), ",").as("missing"))
      .orderBy("doc_id")
  }

  // Asymmetric containment (quote/subset detection): each document's
  // 30-token PREFIX probed against the full corpus — a fragment fully
  // inside a longer doc scores containment ≈ 1 where Jaccard stays
  // low (the direction dd_ngram_jaccard can't see). Query side is the
  // small relation; corpus-hot shingles capped like the Jaccard path
  // (cap only LOWERS containment — no false positives).
  q("dd_containment",
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |frag AS (SELECT doc_id, t[1:30] AS t FROM toks WHERE len(t) >= 33),
      |fngr AS (SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, len(t) - 2),
      |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS ng FROM frag),
      |cngr AS (SELECT doc_id, list_distinct(
      |    CASE WHEN len(t) >= 3 THEN list_transform(
      |      generate_series(1, len(t) - 2),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |    ELSE [] END) AS ng FROM toks),
      |fsz AS (SELECT doc_id, CAST(len(ng) AS BIGINT) AS n_q FROM fngr),
      |fex AS (SELECT doc_id AS q_id, unnest(ng) AS g FROM fngr),
      |cex0 AS (SELECT doc_id AS c_id, unnest(ng) AS g FROM cngr),
      |ok AS (SELECT g FROM cex0 GROUP BY g HAVING count(*) <= $NgramPostingCap),
      |cex AS (SELECT cex0.c_id, cex0.g FROM cex0 JOIN ok USING (g)),
      |shared AS (
      |  SELECT q_id, c_id, count(*) AS shared FROM fex JOIN cex USING (g)
      |  WHERE q_id <> c_id GROUP BY 1, 2)
      |SELECT q_id, c_id, shared, fsz.n_q AS n_q,
      |  ${sqlR4("shared / fsz.n_q")} AS containment
      |FROM shared JOIN fsz ON fsz.doc_id = q_id
      |WHERE shared / fsz.n_q >= 0.8
      |ORDER BY q_id, c_id""".stripMargin) { (s, dir) =>
    val docs = Tables.load(s, dir, "documents")
    val fragments = docs
      .filter(size(split(col("text"), " ")) >= 33)
      .select(col("doc_id"),
        array_join(slice(split(col("text"), " "), 1, 30), " ").as("text"))
    DedupOps.containmentPairs(fragments, "doc_id", "text",
        docs, "doc_id", "text", n = 3, minContain = 0.8,
        maxPosting = Some(NgramPostingCap))
      .withColumn("containment", r4(col("containment")))
      .orderBy("q_id", "c_id")
  }

  // Generator/UDTF surface: POSITIONAL explode — each token with its
  // 1-based offset (what chunkers and positional n-gram features
  // consume). DuckDB twin: unnest + generate_subscripts expand in
  // lockstep. Restricted to the first 5 positions to keep the checked
  // result focused on offset correctness.
  q("tx_token_positions",
    """SELECT * FROM (
      |  SELECT doc_id,
      |    CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS pos,
      |    unnest(string_split(text, ' ')) AS token
      |  FROM documents)
      |WHERE pos <= 5
      |ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos0", "token")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("token"))
      .filter(col("pos") <= 5)
      .orderBy("doc_id", "pos")
  }

  // Weight-proportional deterministic sampling (engine extra): each doc
  // kept with probability ∝ its length, no rand() — the uniformizer is
  // a Knuth multiplicative hash of the key, selection is pure integer
  // arithmetic (exact on both engines). The continuous-weight
  // complement of tx_domain_mixture's per-source rates: longer docs
  // oversampled, replayable batch-to-batch.
  q("tx_weighted_sample",
    """WITH u AS (
      |  SELECT source, n_chars,
      |    (doc_id * 2654435761) % 1000003 AS h
      |  FROM documents)
      |SELECT source,
      |  CAST(count(*) AS BIGINT) AS n_total,
      |  CAST(sum(CASE WHEN h * 4000 < n_chars * 1000003 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(sum(CASE WHEN h * 4000 < n_chars * 1000003 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
      |FROM u GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val h = (col("doc_id") * lit(2654435761L)) % lit(1000003L)
    val kept = h * lit(4000L) < col("n_chars") * lit(1000003L)
    Tables.load(s, dir, "documents")
      .select(col("source"), col("n_chars"), kept.as("kept"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_chars")).otherwise(0L)).as("kept_chars"))
      .orderBy("source")
  }

  // Deterministic per-group bottom-k-by-hash sample as a MERGEABLE
  // aggregate (graftx.BottomKByKey): each map task keeps ≤ k
  // candidates per group and the shuffle carries only those — the
  // row_number window form the oracle uses would exchange and sort
  // every row at scale. md5-of-id keys make the "random" choice
  // reproducible across engines; the id array flattens to CSV for the
  // hash compare.
  q("tx_bottomk_sample",
    """WITH h AS (
      |  SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS hk,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
      |  FROM documents)
      |SELECT source,
      |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY hk) AS sample_ids
      |FROM h WHERE rn <= 5
      |GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.graftx.BottomKByKey.bottomK
    Tables.load(s, dir, "documents")
      .groupBy("source")
      .agg(bottomK(md5(col("doc_id").cast("string").cast("binary")),
        col("doc_id").cast("long"), 5).as("ids"))
      .select(col("source"),
        array_join(transform(col("ids"), _.cast("string")), ",").as("sample_ids"))
      .orderBy("source")
  }

  // Entity resolution end-to-end: fuzzy match (edit distance ≤ 1) →
  // duplicate clusters (connected components) → one golden record per
  // cluster (longest name, tie → lowest key). The classic
  // match→cluster→survivorship composite, each stage an operator the
  // engine already ships (FuzzyOps / RelationalOps / DedupOps).
  q("er_golden_records",
    """WITH RECURSIVE p AS (
      |  SELECT p_partkey, p_name FROM part WHERE p_partkey < 500),
      |pairs AS (
      |  SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
      |  FROM p a JOIN p b ON a.p_partkey < b.p_partkey
      |  WHERE levenshtein(a.p_name, b.p_name) <= 1),
      |edges AS (
      |  SELECT id_a AS a, id_b AS b FROM pairs
      |  UNION ALL SELECT id_b, id_a FROM pairs),
      |reach(id, r) AS (
      |  SELECT p_partkey, p_partkey FROM p
      |  UNION
      |  SELECT e.a, reach.r FROM reach JOIN edges e ON e.b = reach.id),
      |cl AS (SELECT id AS p_partkey, min(r) AS cluster_id FROM reach GROUP BY id),
      |k AS (
      |  SELECT cl.p_partkey, cl.cluster_id, p.p_name,
      |    first_value(cl.p_partkey) OVER (
      |      PARTITION BY cl.cluster_id
      |      ORDER BY length(p.p_name) DESC, cl.p_partkey) AS keep_id
      |  FROM cl JOIN p USING (p_partkey))
      |SELECT cluster_id, keep_id,
      |  CAST(count(*) AS BIGINT) AS n_members,
      |  max(CASE WHEN p_partkey = keep_id THEN p_name END) AS golden_name
      |FROM k GROUP BY 1, 2 ORDER BY cluster_id""".stripMargin) { (s, dir) =>
    import graft.operators.{DedupOps, FuzzyOps, RelationalOps}
    val parts = Tables.load(s, dir, "part").filter(col("p_partkey") < 500)
    val pairs = FuzzyOps.editDistancePairs(parts, "p_partkey", "p_name", maxDist = 1)
    val clusters = RelationalOps.connectedComponents(
      parts.select(col("p_partkey")), "p_partkey", pairs, "id_a", "id_b")
    val audit = DedupOps.canonicalPerCluster(
      clusters, "p_partkey", "cluster_id",
      parts.select(col("p_partkey"), length(col("p_name")).as("q")),
      "p_partkey", "q")
    audit.join(parts.select(col("p_partkey"), col("p_name")), "p_partkey")
      .groupBy("cluster_id", "keep_id")
      .agg(count(lit(1)).as("n_members"),
        max(when(col("p_partkey") === col("keep_id"), col("p_name"))).as("golden_name"))
      .orderBy("cluster_id")
  }

  // Context-window chunking — the training-prep op that slices long
  // documents into overlapping token windows (size 50, stride 40 ⇒ 10
  // tokens of overlap) before packing/tokenization. Chunk count =
  // 1 + ceil((n-size)/stride) so the tail is covered exactly once;
  // chunk text leaves the query as a digest, not the text itself.
  q("tx_chunk_windows",
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t, len(string_split(text, ' ')) AS n
      |  FROM documents),
      |chunks AS (
      |  SELECT doc_id, n,
      |    unnest(generate_series(0,
      |      CAST(greatest(0, ceil((n - 50) / 40.0)) AS INTEGER))) AS ck
      |  FROM toks)
      |SELECT c.doc_id, CAST(c.ck AS BIGINT) AS chunk_id,
      |  CAST(len(t.t[c.ck*40+1 : c.ck*40+50]) AS BIGINT) AS n_tokens,
      |  md5(array_to_string(t.t[c.ck*40+1 : c.ck*40+50], ' ')) AS chunk_md5
      |FROM chunks c JOIN toks t USING (doc_id)
      |ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .withColumn("t", split(col("text"), " "))
      .withColumn("n", size(col("t")))
      .withColumn("ck",
        explode(sequence(lit(0),
          greatest(lit(0), ceil((col("n") - 50) / 40.0)).cast("int"))))
      .select(col("doc_id"), col("ck").cast("long").as("chunk_id"),
        size(slice(col("t"), col("ck") * 40 + 1, lit(50))).cast("long").as("n_tokens"),
        md5(array_join(slice(col("t"), col("ck") * 40 + 1, lit(50)), " ")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")
  }

  // Sequence-packing plan — assign docs to ~2000-token training bins:
  // exclusive prefix sum of token counts per source shard, bin =
  // ⌊prefix/L⌋. One window per shard (the parallelism unit), no
  // sequential loop; a bin can overflow by at most its last doc —
  // the standard streaming-packing tradeoff, stated not hidden.
  q("tx_pack_bins",
    """WITH toks AS (
      |  SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
      |  FROM documents),
      |pre AS (
      |  SELECT doc_id, source, nt,
      |    coalesce(sum(nt) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
      |  FROM toks)
      |SELECT source, CAST(floor(prefix / 2000.0) AS BIGINT) AS bin_id,
      |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
      |FROM pre GROUP BY 1, 2 ORDER BY source, bin_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .withColumn("prefix", coalesce(sum(col("nt")).over(w), lit(0L)))
      .withColumn("bin_id", floor(col("prefix") / 2000.0).cast("long"))
      .groupBy("source", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
      .orderBy("source", "bin_id")
  }

  // Fuzzy entity matching: part-name pairs within edit distance 2 via
  // q-gram count filtering + levenshtein verify (FuzzyOps) — complete,
  // so the brute-force SQL oracle must agree pair-for-pair. The fixed
  // key subset keeps the O(n²) oracle bounded at any sf; the Spark
  // plan is the candidate-first shape that scales past it.
  q("fz_edit_pairs",
    """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      |FROM part a JOIN part b ON a.p_partkey < b.p_partkey
      |WHERE a.p_partkey < 500 AND b.p_partkey < 500
      |  AND levenshtein(a.p_name, b.p_name) <= 2
      |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    import graft.operators.FuzzyOps
    FuzzyOps.editDistancePairs(
        Tables.load(s, dir, "part").filter(col("p_partkey") < 500),
        "p_partkey", "p_name", maxDist = 2)
      .orderBy("id_a", "id_b")
  }

  // Unrestricted Damerau-Levenshtein pairs — the transposition-aware
  // twin of fz_edit_pairs, verified by the native DamerauLevenshtein
  // expression (full da-array DP, matching DuckDB's builtin exactly;
  // 'CA'/'ABC' = 2 where optimal-string-alignment says 3). Candidate
  // generation is the same complete q-gram count filter with the
  // per-edit destruction bound widened to q+1 for transpositions.
  q("fz_damerau_pairs",
    """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
      |  CAST(damerau_levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      |FROM part a JOIN part b ON a.p_partkey < b.p_partkey
      |WHERE a.p_partkey < 500 AND b.p_partkey < 500
      |  AND damerau_levenshtein(a.p_name, b.p_name) <= 2
      |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    import graft.operators.FuzzyOps
    FuzzyOps.dlDistancePairs(
        Tables.load(s, dir, "part").filter(col("p_partkey") < 500),
        "p_partkey", "p_name", maxDist = 2)
      .orderBy("id_a", "id_b")
  }

  // Blocked Jaro-Winkler entity resolution — native JaroWinkler
  // expression (bit-identical to DuckDB's jaro_winkler_similarity:
  // same match-window/transposition arithmetic order, 0.7 boost
  // threshold, prefix ≤ 4 at 0.1). Blocking (shared first char +
  // length band) is part of the declared semantics and mirrored in
  // the oracle, so the check stays exact; r4 absorbs nothing here —
  // it's belt-and-braces on an already bit-identical double.
  q("fz_jaro_winkler",
    s"""SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
      |  ${graft.functions.DetRound.sqlR4(
             "jaro_winkler_similarity(a.p_name, b.p_name)")} AS jw
      |FROM part a JOIN part b
      |  ON substring(a.p_name, 1, 1) = substring(b.p_name, 1, 1)
      | AND a.p_partkey < b.p_partkey
      | AND abs(len(a.p_name) - len(b.p_name)) <= 4
      |WHERE a.p_partkey < 1000 AND b.p_partkey < 1000
      |  AND jaro_winkler_similarity(a.p_name, b.p_name) >= 0.93
      |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    import graft.operators.FuzzyOps
    FuzzyOps.jaroWinklerPairs(
        Tables.load(s, dir, "part").filter(col("p_partkey") < 1000),
        "p_partkey", "p_name", minSim = 0.93, maxLenDiff = 4)
      .select(col("id_a"), col("id_b"), graft.functions.DetRound.r4(col("jw")).as("jw"))
      .orderBy("id_a", "id_b")
  }

  // Blocklist term redaction — the PII-scrubbing shape (regex scan +
  // global replace + hit count) as one codegen'd projection, no UDFs.
  // The synthetic corpus has no emails/phones, so the blocklist names
  // real tokens to keep the gate signal nonzero; swapping in
  // email/phone regexes is a constant change on both sides (both
  // dialects are \b-compatible). Only the md5 of the redacted text is
  // emitted — the audit row stays narrow no matter how wide the doc.
  q("tx_redact",
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '\b(spark|hash|window)\b')) AS BIGINT)
      |    AS n_hits,
      |  md5(regexp_replace(text, '\b(spark|hash|window)\b', '<TERM>', 'g'))
      |    AS redacted_md5
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val pat = "\\b(spark|hash|window)\\b"
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        regexp_count(col("text"), lit(pat)).cast("long").as("n_hits"),
        md5(regexp_replace(col("text"), pat, "<TERM>")).as("redacted_md5"))
      .orderBy("doc_id")
  }

  // Custom GENERATOR surface (UDTF): graftx.NgramGenerator emits
  // (pos, ngram) rows straight from the token array — no intermediate
  // n-gram ARRAY materialized per document (the explode(token_ngrams)
  // form allocates w·n transient tokens per w-token doc). Registered
  // in SQL as ngram_gen (LATERAL VIEW usable); here via the Column
  // API. Oracle reconstructs the same shingles with list slices.
  q("tx_ngram_gen",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |           FROM documents WHERE doc_id < 50),
      |e AS (SELECT doc_id, toks,
      |        unnest(generate_series(1, len(toks) - 2)) AS pos
      |      FROM t WHERE len(toks) >= 3)
      |SELECT doc_id, pos,
      |  md5(array_to_string(toks[pos:(pos+2)], ' ')) AS ngram_md5
      |FROM e ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.graftx.GraftFunctions
    Tables.load(s, dir, "documents")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"),
        GraftFunctions.ngramGen(split(col("text"), " "), 3).as(Seq("pos", "ngram")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        md5(col("ngram").cast("binary")).as("ngram_md5"))
      .orderBy("doc_id", "pos")
  }

  // BPE merge training — the tokenizer-training op, fully relational.
  // One corpus pass builds the word-frequency table (the standard
  // word-level pre-tokenization); each of 5 iterations then runs on
  // the VOCAB, not the corpus: adjacent-symbol pair counts
  // (map-side-combinable sum over word frequencies) → the top merge as
  // an UNGROUPED min(struct(-cnt, pair)) scalar broadcast back (count
  // desc, pair asc tie-break) → merge applied with a plain
  // left-to-right replace over double-space-joined symbol strings
  // (symbols are space-free, so ' A  B ' anchors exact symbol
  // boundaries; sequential replace IS the BPE greedy-left rule).
  // The oracle unrolls all 5 iterations into CTEs — every iteration's
  // counts, tie-break, and merge application are checked.
  q("tx_bpe_train", {
    val iters = (1 to 5).map { m =>
      s""",
         |e$m AS (SELECT freq, string_split(trim(s), '  ') AS sym FROM c${m - 1}),
         |x$m AS (SELECT freq, sym, unnest(generate_series(1, len(sym)-1)) AS i
         |        FROM e$m WHERE len(sym) >= 2),
         |p$m AS (SELECT sym[i] AS pa, sym[i+1] AS pb,
         |          CAST(sum(freq) AS BIGINT) AS cnt
         |        FROM x$m GROUP BY 1, 2),
         |m$m AS (SELECT pa, pb, cnt FROM p$m ORDER BY cnt DESC, pa, pb LIMIT 1),
         |c$m AS (SELECT freq,
         |          replace(s, ' '||pa||'  '||pb||' ', ' '||pa||pb||' ') AS s
         |        FROM c${m - 1} CROSS JOIN m$m)""".stripMargin
    }.mkString
    val heads = (1 to 5).map(m =>
      s"SELECT $m AS iter, pa, pb, cnt FROM m$m").mkString(" UNION ALL ")
    s"""WITH w AS (
       |  SELECT tok AS word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY 1),
       |c0 AS (SELECT freq,
       |  ' ' || array_to_string(string_split(word, ''), '  ') || ' ' AS s
       |  FROM w)$iters
       |SELECT * FROM ($heads) ORDER BY iter""".stripMargin
  }) { (s, dir) =>
    import graft.operators.TokenizerOps
    TokenizerOps.bpeTrain(Tables.load(s, dir, "documents"), "text", iters = 5)
      .orderBy("iter")
  }

  // BPE ENCODE — the tokenize step after tx_bpe_train: the learned
  // 5-merge table (a driver-held model artifact, like MlGate's
  // coefficients) folds into ONE codegen'd projection and the corpus
  // streams through a single scan — no join, no shuffle. The oracle
  // re-derives the merges with the same unrolled training CTEs and
  // replays the identical greedy-left replace chain per document, so
  // the whole train→encode tokenizer pipeline is hash-checked end to
  // end (per-doc token count + the encoded symbol stream itself).
  q("tx_bpe_apply", {
    // m$m must never be EMPTY: a corpus whose pairs are exhausted
    // before iteration 5 would otherwise empty every downstream CTE
    // through the CROSS JOIN and the oracle would return zero rows
    // while the Spark side (which simply stops learning merges)
    // returns every document. A chr(1) sentinel merge is a no-op on
    // the corpus (control chars never appear as symbols), mirroring
    // the Scala side's shorter merge list.
    val iters = (1 to 5).map { m =>
      s""",
         |e$m AS (SELECT freq, string_split(trim(s), '  ') AS sym FROM c${m - 1}),
         |x$m AS (SELECT freq, sym, unnest(generate_series(1, len(sym)-1)) AS i
         |        FROM e$m WHERE len(sym) >= 2),
         |p$m AS (SELECT sym[i] AS pa, sym[i+1] AS pb,
         |          CAST(sum(freq) AS BIGINT) AS cnt
         |        FROM x$m GROUP BY 1, 2),
         |m$m AS (SELECT pa, pb FROM (
         |          SELECT pa, pb, 0 AS pri FROM
         |            (SELECT pa, pb FROM p$m ORDER BY cnt DESC, pa, pb LIMIT 1)
         |          UNION ALL SELECT chr(1), chr(1), 1)
         |        ORDER BY pri LIMIT 1),
         |c$m AS (SELECT freq,
         |          replace(s, ' '||pa||'  '||pb||' ', ' '||pa||pb||' ') AS s
         |        FROM c${m - 1} CROSS JOIN m$m)""".stripMargin
    }.mkString
    val applies = (1 to 5).map { m =>
      s""",
         |a$m AS (SELECT doc_id, i,
         |          replace(s, ' '||pa||'  '||pb||' ', ' '||pa||pb||' ') AS s
         |        FROM a${m - 1} CROSS JOIN m$m)""".stripMargin
    }.mkString
    s"""WITH w AS (
       |  SELECT tok AS word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY 1),
       |c0 AS (SELECT freq,
       |  ' ' || array_to_string(string_split(word, ''), '  ') || ' ' AS s
       |  FROM w)$iters,
       |dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS wd,
       |         generate_subscripts(string_split(text, ' '), 1) AS i
       |       FROM documents),
       |a0 AS (SELECT doc_id, i,
       |  ' ' || array_to_string(string_split(wd, ''), '  ') || ' ' AS s
       |  FROM dw)$applies,
       |sym AS (SELECT doc_id, i, string_split(trim(s), '  ') AS sy FROM a5)
       |SELECT doc_id, CAST(sum(len(sy)) AS BIGINT) AS n_tokens,
       |  string_agg(array_to_string(sy, ' '), ' ' ORDER BY i) AS encoded
       |FROM sym GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }) { (s, dir) =>
    import graft.operators.TokenizerOps
    val docs = Tables.load(s, dir, "documents")
    // the merge table is the trained model — k rows, driver-held
    val merges = TokenizerOps.bpeTrain(docs, "text", iters = 5)
      .orderBy("iter").select("pa", "pb")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val enc = TokenizerOps.bpeEncode(col("text"), merges)
    docs.select(col("doc_id"),
        size(enc).cast("long").as("n_tokens"),
        array_join(enc, " ").as("encoded"))
      .orderBy("doc_id")
  }

  // Chunk-level global dedup (C4's repeated-line rule on token streams,
  // RefinedWeb-style): every 10-token chunk kept only at its first
  // corpus occurrence; per-doc retention audit. The oracle replays the
  // identical chunking (list slices in lockstep with Spark's `slice`)
  // and the identical first-occurrence rank.
  q("dd_chunk_dedup",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |e AS (SELECT doc_id, toks,
      |        unnest(generate_series(0,
      |          CAST(floor((len(toks) - 1) / 10) AS BIGINT))) AS i
      |      FROM t),
      |c AS (SELECT doc_id, i AS chunk_idx,
      |        md5(array_to_string(toks[(i*10+1):(i*10+10)], ' ')) AS digest
      |      FROM e),
      |r AS (SELECT *, row_number() OVER (
      |        PARTITION BY digest ORDER BY doc_id, chunk_idx) AS rn FROM c)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
      |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks
      |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    DedupOps.chunkDedup(Tables.load(s, dir, "documents"),
        "doc_id", "text", chunkTokens = 10)
      .orderBy("doc_id")
  }

  // Exact-substring dedup (Lee et al., "Deduplicating Training Data
  // Makes Language Models Better" — the ExactSubstr step): maximal
  // character spans of length >= 40 occurring verbatim in >= 2
  // distinct documents, per doc, so curation can excise repeated
  // boilerplate instead of dropping documents. Oracle replays the
  // identical k-gram windows, cross-doc filter, and islands merge.
  q("dd_repeated_spans",
    """WITH g AS (
      |  SELECT doc_id, text,
      |    unnest(generate_series(1, len(text) - 39)) AS p
      |  FROM documents WHERE len(text) >= 40),
      |g2 AS (SELECT doc_id, p, substr(text, p, 40) AS gram FROM g),
      |shared AS (
      |  SELECT gram FROM g2 GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
      |sp AS (
      |  SELECT g2.doc_id, g2.p,
      |    row_number() OVER (PARTITION BY g2.doc_id ORDER BY g2.p) AS rn
      |  FROM g2 JOIN shared USING (gram))
      |SELECT doc_id,
      |  CAST(min(p) AS BIGINT) AS span_start,
      |  CAST(max(p) + 39 AS BIGINT) AS span_end,
      |  CAST(max(p) + 39 - min(p) + 1 AS BIGINT) AS span_len
      |FROM (SELECT doc_id, p, p - rn AS grp FROM sp)
      |GROUP BY doc_id, grp
      |ORDER BY doc_id, span_start""".stripMargin) { (s, dir) =>
    DedupOps.repeatedSpans(Tables.load(s, dir, "documents"),
        "doc_id", "text", k = 40, minDocs = 2)
      .select(col("doc_id"),
        col("span_start").cast("long").as("span_start"),
        col("span_end").cast("long").as("span_end"),
        col("span_len").cast("long").as("span_len"))
      .orderBy("doc_id", "span_start")
  }

  // Composite: the training-shard manifest end-to-end — length gate →
  // exact dedup (keep first) → content-hash shard → per-shard doc and
  // token totals. The whole chain is one scan + two hash shuffles
  // (digest window, shard agg); every stage is a shipped operator.
  q("pipe_shards",
    """WITH g AS (
      |  SELECT doc_id, text, len(string_split(text, ' ')) AS n_tok
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) BETWEEN 20 AND 1000),
      |d AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM g),
      |k AS (SELECT doc_id, text, n_tok FROM d WHERE rn = 1),
      |s AS (SELECT CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 8 AS shard,
      |        n_tok FROM k)
      |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
      |FROM s GROUP BY shard ORDER BY shard""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val gated = Tables.load(s, dir, "documents")
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .filter(col("n_tok").between(20, 1000))
    val kept = gated
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(col("text").cast("binary"))).orderBy("doc_id")))
      .filter(col("rn") === 1)
    kept
      .withColumn("shard",
        conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
          .cast("long") % 8)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .orderBy("shard")
  }

  // Deterministic global shuffle + shard assignment — the
  // training-data writer's last step. NO global sort/row_number (a
  // single-partition window is the classic 100 TB deadend): the shard
  // is a pure content-hash mod, and position-within-shard is a window
  // over the shard partition — both fully parallel, both replayable
  // (content-keyed, no rand()).
  q("tx_shard_shuffle",
    """SELECT doc_id,
      |  CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 16 AS shard,
      |  row_number() OVER (
      |    PARTITION BY CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 16
      |    ORDER BY md5(text), doc_id) AS pos
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val w = Window.partitionBy("shard")
      .orderBy(md5(col("text").cast("binary")), col("doc_id"))
    Tables.load(s, dir, "documents")
      .withColumn("shard", h % 16)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "shard", "pos")
      .orderBy("doc_id")
  }

  // Token-entropy quality gate: Shannon entropy of each document's
  // token distribution — the gibberish/boilerplate signal (low H =
  // repeated tokens, high H = diverse text) C4-style filters cut on.
  // ONE aggregation pass via the identity H = ln n − (Σ c·ln c)/n —
  // no join back for the total, no window. Type-token ratio rides in
  // the same pass.
  q("tx_entropy",
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |cnt AS (
       |  SELECT doc_id, tok, count(*) AS c FROM toks
       |  WHERE tok <> '' GROUP BY doc_id, tok),
       |st AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
       |    CAST(count(*) AS BIGINT) AS n_types,
       |    ln(CAST(sum(c) AS DOUBLE)) - sum(c * ln(CAST(c AS DOUBLE))) / sum(c) AS h
       |  FROM cnt GROUP BY doc_id)
       |SELECT doc_id, n_tok, n_types,
       |  ${sqlR4("CAST(n_types AS DOUBLE) / n_tok")} AS ttr,
       |  ${sqlR4("h")} AS entropy
       |FROM st ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tok"), count(lit(1)).as("n_types"),
        (log(sum("c").cast("double")) -
          sum(col("c") * log(col("c").cast("double"))) / sum("c")).as("h"))
      .select(col("doc_id"), col("n_tok"), col("n_types"),
        r4(col("n_types").cast("double") / col("n_tok")).as("ttr"),
        r4(col("h")).as("entropy"))
      .orderBy("doc_id")
  }

  // ML feature hashing (the "hashing trick", Weinberger ICML'09): each
  // token maps to one of 64 feature slots by content hash, with a
  // ±1 sign from an independent hash bit so collisions cancel in
  // expectation instead of biasing upward. Output is the SPARSE
  // (doc, slot) → value matrix — zero-sum slots dropped. Fixed-width
  // features from unbounded vocabulary, no dictionary, no fit step:
  // the only encoder that needs no global state at 100 TB. Portable
  // md5-prefix arithmetic makes it exactly reproducible cross-engine.
  q("ml_feature_hash",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
      |  FROM documents WHERE doc_id < 200),
      |h AS (
      |  SELECT doc_id,
      |    CAST('0x' || substr(md5(tok), 1, 4) AS BIGINT) % 64 AS fidx,
      |    CASE WHEN CAST('0x' || substr(md5(tok), 5, 1) AS BIGINT) < 8
      |      THEN 1 ELSE -1 END AS sign
      |  FROM toks WHERE tok <> '')
      |SELECT doc_id, fidx, CAST(sum(sign) AS BIGINT) AS fval
      |FROM h GROUP BY doc_id, fidx
      |HAVING sum(sign) <> 0
      |ORDER BY doc_id, fidx""".stripMargin) { (s, dir) =>
    val tokMd5 = md5(col("tok").cast("binary"))
    Tables.load(s, dir, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"),
        (conv(substring(tokMd5, 1, 4), 16, 10).cast("long") % 64).as("fidx"),
        when(conv(substring(tokMd5, 5, 1), 16, 10).cast("long") < 8, lit(1L))
          .otherwise(lit(-1L)).as("sign"))
      .groupBy("doc_id", "fidx")
      .agg(sum("sign").as("fval"))
      .filter(col("fval") =!= 0)
      .orderBy("doc_id", "fidx")
  }

  // Adaptive per-language quality gate (the FineWeb-style curation
  // pattern: a fixed global threshold over-prunes low-resource
  // languages, so the cut is a PER-LANGUAGE quantile). Two passes:
  // (1) per-lang exact interpolated percentile of the det-rounded
  // quality score — a groupBy producing one row per language;
  // (2) broadcast-join the 5-row threshold table back and keep docs at
  // or above their language's cut. At 100 TB pass 1 swaps to the
  // t-digest sketch (plans.ApproxPercentileRewrite is the one-flag
  // switch); the threshold table stays O(languages) and broadcast.
  // Both engines interpolate identically (index = p·(n−1), linear),
  // and both compare the SAME det-rounded doubles, so the gate
  // boundary cannot flip on ulp drift.
  q("tx_quality_quantile_gate",
    s"""WITH sc AS (
      |  SELECT doc_id, lang,
      |    ${sqlR4("least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0)" +
         " * (1.0 - CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)" +
         "     / len(string_split(text, ' ')))" +
         " * (1.0 - CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text))")} AS quality
      |  FROM documents),
      |thr AS (
      |  SELECT lang, ${sqlR4("quantile_cont(quality, 0.3)")} AS lang_threshold
      |  FROM sc GROUP BY lang)
      |SELECT sc.doc_id, sc.lang, sc.quality, thr.lang_threshold
      |FROM sc JOIN thr USING (lang)
      |WHERE sc.quality >= thr.lang_threshold
      |ORDER BY sc.doc_id""".stripMargin) { (s, dir) =>
    val sc = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        r4(qualityScore(col("text"))).as("quality"))
    val thr = sc.groupBy("lang")
      .agg(r4(expr("percentile(quality, 0.3D)")).as("lang_threshold"))
    sc.join(broadcast(thr), "lang")
      .filter(col("quality") >= col("lang_threshold"))
      .select(col("doc_id"), col("lang"), col("quality"), col("lang_threshold"))
      .orderBy("doc_id")
  }

  // Top-k most frequent tokens per language through the custom
  // TopKPerGroup physical operator (graftx.TopKPerGroupExec): the
  // vocabulary-head report every tokenizer-training run starts from.
  // The heap operator caps shuffle volume at k rows per (lang,
  // partition) — the window formulation would shuffle EVERY distinct
  // (lang, term) count and sort it. Tie-break: count desc, term asc.
  q("tx_topk_tokens_heap",
    """WITH t AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
      |c AS (
      |  SELECT lang, term, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1, 2),
      |r AS (
      |  SELECT lang, term, n,
      |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rn
      |  FROM c)
      |SELECT lang, term, n FROM r WHERE rn <= 5
      |ORDER BY lang, n DESC, term""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.graftx.GraftPlans
    val counts = Tables.load(s, dir, "documents")
      .select(col("lang"), explode(tokens(col("text"))).as("term"))
      .groupBy("lang", "term")
      .agg(count(lit(1)).as("n"))
    GraftPlans.topKPerGroup(counts,
      groupCols = Seq("lang"),
      order = Seq("n" -> false, "term" -> true), k = 5)
      .orderBy(col("lang"), col("n").desc, col("term"))
  }
}
