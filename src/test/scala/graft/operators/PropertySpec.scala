package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** ScalaCheck property tests promised by SURVEY §5: dedup idempotence,
  * pivot⁻¹ = unpivot roundtrip, null-default totality. Generators stay
  * tiny (each property evaluation is a Spark job).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withMaxSize(12), p)
    assert(res.passed, res.status.toString)
  }

  private val rowGen = for {
    k <- Gen.choose(0, 3)
    seq <- Gen.choose(0, 50)
    v <- Gen.choose(-100, 100).map(_ / 4.0)
  } yield (k, seq, v)

  private val rowsGen = Gen.nonEmptyListOf(rowGen)

  test("property: dedupKeepFirst is idempotent") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "seq", "v")
      val once = RelationalOps.dedupKeepFirst(df, Seq("k"), Seq(col("seq"), col("v")))
      val twice = RelationalOps.dedupKeepFirst(once, Seq("k"), Seq(col("seq"), col("v")))
      once.collect().toSet == twice.collect().toSet
    })
  }

  test("property: unpivot(pivotAvg(x)) == direct long-form aggregation") {
    val domain = Seq("a", "b", "c")
    val pRowGen = for {
      k <- Gen.choose(0, 2)
      p <- Gen.oneOf(domain)
      v <- Gen.choose(0, 100).map(_ / 2.0)
    } yield (k, p, v)
    check(Prop.forAll(Gen.nonEmptyListOf(pRowGen)) { rows =>
      val df = rows.toDF("k", "p", "v")
      val wide = RelationalOps.pivotAvg(df, Seq("k"), "p", domain, "v")
      val back = wide.unpivot(Array(col("k")), domain.map(col).toArray, "p", "v")
        .filter(col("v").isNotNull)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
      val direct = df.groupBy("k", "p").agg(avg("v").as("v"))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
      back == direct
    })
  }

  test("property: fillDefaults leaves no nulls in filled columns") {
    val optRowGen = for {
      s <- Gen.option(Gen.alphaStr.map(_.take(5)))
      d <- Gen.option(Gen.choose(-10.0, 10.0))
    } yield (s, d)
    check(Prop.forAll(Gen.nonEmptyListOf(optRowGen)) { rows =>
      val df = rows.toDF("s", "d")
      val filled = RelationalOps.fillDefaults(df, Map("s" -> "Unknown"), Map("d" -> 0.0))
      filled.filter(col("s").isNull || col("d").isNull).count() == 0L
    })
  }

  test("property: canonicalPerCluster keeps exactly one doc per cluster, the argmax") {
    val memberGen = for {
      id <- Gen.choose(0L, 30L)
      cl <- Gen.choose(0L, 4L)
      q <- Gen.choose(0L, 9L)
    } yield (id, cl, q)
    check(Prop.forAll(Gen.nonEmptyListOf(memberGen)) { rows0 =>
      val rows = rows0.distinctBy(_._1) // one cluster/quality per doc
      val clusters = rows.map(r => (r._1, r._2)).toDF("doc_id", "cluster_id")
      val quality = rows.map(r => (r._1, r._3)).toDF("doc_id", "q")
      val out = DedupOps
        .canonicalPerCluster(clusters, "doc_id", "cluster_id", quality, "doc_id", "q")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      val byCluster = out.groupBy(_._2)
      byCluster.forall { case (cl, members) =>
        val expectedKeep = rows.filter(_._2 == cl).minBy(r => (-r._3, r._1))._1
        members.count(_._4) == 1 &&
          members.forall(_._3 == expectedKeep) &&
          members.find(_._4).get._1 == expectedKeep
      }
    })
  }

  test("property: incrementalNgramPairs == full-run pairs whose greater id is in the batch") {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val docGen = Gen.listOfN(6, Gen.oneOf(words)).map(_.mkString(" "))
    check(Prop.forAll(Gen.nonEmptyListOf(docGen)) { texts0 =>
      val texts = texts0.take(8).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val split = texts.length / 2
      val docs = texts.toDF("doc_id", "text")
      val full = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3)
        .filter(col("id_b") >= split)
        .select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val inc = DedupOps.incrementalNgramPairs(
          docs.filter(col("doc_id") < split), docs.filter(col("doc_id") >= split),
          "doc_id", "text", 3, 0.3)
        .select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      inc == full
    })
  }

  test("property: rangeJoinBucketed == naive BETWEEN join on random intervals") {
    import java.sql.Timestamp
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val evGen = for { id <- Gen.choose(0L, 40L); m <- Gen.choose(0, 720) } yield (id, m)
    val ivGen = for {
      id <- Gen.choose(100L, 120L); lo <- Gen.choose(0, 720); span <- Gen.choose(-30, 200)
    } yield (id, lo, lo + span) // negative spans → inverted intervals
    check(Prop.forAll(Gen.nonEmptyListOf(evGen), Gen.nonEmptyListOf(ivGen)) { (evs, ivs) =>
      val left = evs.map { case (id, m) => (id, new Timestamp(base + m * 60000L)) }
        .toDF("event_id", "ts")
      val right = ivs.map { case (id, lo, hi) =>
        (id, new Timestamp(base + lo * 60000L), new Timestamp(base + hi * 60000L)) }
        .toDF("iv_id", "lo", "hi")
      val bucketed = RelationalOps.rangeJoinBucketed(left, "ts", right, "lo", "hi", 3600L)
        .select("event_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(identity).view.mapValues(_.length).toMap
      val naive = left.join(right, col("ts") >= col("lo") && col("ts") <= col("hi"))
        .select("event_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(identity).view.mapValues(_.length).toMap
      bucketed == naive // multiset equality: each pair exactly once per match
    })
  }

  test("property: mergeUpsert value columns are idempotent under re-merge") {
    val tGen = for { k <- Gen.choose(0L, 20L); v <- Gen.choose(0, 99) } yield (k, v.toDouble)
    check(Prop.forAll(Gen.nonEmptyListOf(tGen), Gen.nonEmptyListOf(tGen)) { (ts0, ss0) =>
      val target = ts0.distinctBy(_._1).toDF("k", "bal")
      val source = ss0.distinctBy(_._1).toDF("k", "bal")
      val once = RelationalOps.mergeUpsert(target, source, "k", Seq("bal"))
      val twice = RelationalOps.mergeUpsert(once.drop("action"), source, "k", Seq("bal"))
      once.select("k", "bal").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ==
        twice.select("k", "bal").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    })
  }

  test("property: custom TopKPerGroupExec == window row_number formulation") {
    import org.apache.spark.sql.graftx.GraftPlans
    val rGen = for {
      id <- Gen.choose(1L, 500L)   // duplicate ids possible → extend order by grp? keep unique below
      g <- Gen.choose(0, 4)
      v <- Gen.choose(0, 30).map(_.toDouble) // narrow domain → many ties
    } yield (id, g, v)
    check(Prop.forAll(Gen.nonEmptyListOf(rGen), Gen.choose(1, 4)) { (rows0, k) =>
      // unique id per row → (v desc, id asc) is a total order
      val rows = rows0.zipWithIndex.map { case ((_, g, v), i) => (i.toLong, g, v) }
      val df = rows.toDF("id", "grp", "v")
      val got = GraftPlans.topKPerGroup(df, Seq("grp"), Seq("v" -> false, "id" -> true), k)
        .select("id").as[Long].collect().toSet
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("grp").orderBy(col("v").desc, col("id"))
      val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select("id").as[Long].collect().toSet
      got == want
    })
  }

  test("property: containment posting cap only LOWERS containment (no false positives)") {
    val docGen = for {
      n <- Gen.choose(4, 12)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e"))
    } yield toks.mkString(" ")
    check(Prop.forAll(Gen.nonEmptyListOf(docGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong + 1000, t) }
        .toDF("doc_id", "text")
      val q = docs.limit(3)
      def pairs(cap: Option[Int]) =
        DedupOps.containmentPairs(q, "doc_id", "text", docs, "doc_id", "text",
            n = 3, minContain = 0.0, maxPosting = cap)
          .select("q_id", "c_id", "containment").collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val capped = pairs(Some(2))
      val full = pairs(None)
      capped.forall { case (pair, c) => full.get(pair).exists(c <= _ + 1e-9) }
    })
  }

  test("property: triangleCount == brute-force enumeration on random graphs") {
    val edgesGen = Gen.nonEmptyListOf(for {
      u <- Gen.choose(0, 7); v <- Gen.choose(0, 7)
    } yield (u, v))
    check(Prop.forAll(edgesGen) { es =>
      val got = GraphOps.triangleCount(es.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val und = es.collect { case (u, v) if u != v =>
        (math.min(u, v), math.max(u, v)) }.toSet
      val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val ref = (for {
        i <- nodes; j <- nodes if i < j; k <- nodes if j < k
        if und((i, j)) && und((j, k)) && und((i, k))
      } yield Seq(i, j, k)).flatten
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      got == ref
    })
  }

  test("property: bfs == reference shortest-hops within the iteration budget") {
    val edgesGen = Gen.nonEmptyListOf(for {
      u <- Gen.choose(0L, 6L); v <- Gen.choose(0L, 6L)
    } yield (u, v))
    check(Prop.forAll(edgesGen) { es =>
      val iters = 4
      val got = GraphOps.bfs(es.toDF("src", "dst"), "src", "dst", 0L, iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference BFS from 0, capped at `iters` hops
      var dist = Map(0L -> 0L)
      for (_ <- 1 to iters)
        dist = es.filter(e => dist.contains(e._1))
          .map(e => e._2 -> (dist(e._1) + 1))
          .foldLeft(dist) { case (m, (v, d)) =>
            if (m.get(v).forall(_ > d)) m.updated(v, d) else m }
      got == dist
    })
  }

  test("property: chunkDedup conserves chunks and never keeps more than total") {
    val docGen = for {
      n <- Gen.choose(1, 9)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield toks.mkString(" ")
    check(Prop.forAll(Gen.nonEmptyListOf(docGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = DedupOps.chunkDedup(docs, "doc_id", "text", chunkTokens = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val totalKept = out.map(_._3).sum
      val distinctChunks = docs
        .selectExpr("explode(transform(sequence(0, int(floor((size(split(text,' '))-1)/2))," +
          " 1), i -> array_join(slice(split(text,' '), i*2+1, 2), ' '))) AS c")
        .select("c").distinct().count()
      out.forall { case (_, total, kept) => kept >= 0 && kept <= total } &&
        totalKept == distinctChunks // each distinct chunk kept exactly once
    })
  }

  test("property: intervalOverlapJoinBucketed == naive overlap join (random intervals)") {
    val ivGen = for {
      lo <- Gen.choose(0, 5000)            // seconds offset
      len <- Gen.choose(0, 4000)
    } yield (lo, lo + len)
    def df(ivs: List[(Int, Int)], id: String, loC: String, hiC: String) =
      ivs.zipWithIndex.map { case ((lo, hi), i) => (i, lo, hi) }
        .toDF(id, "lo_s", "hi_s")
        .selectExpr(id,
          s"to_timestamp('2024-03-01 00:00:00') + make_interval(0,0,0,0,0,0,lo_s) AS $loC",
          s"to_timestamp('2024-03-01 00:00:00') + make_interval(0,0,0,0,0,0,hi_s) AS $hiC")
    check(Prop.forAll(Gen.nonEmptyListOf(ivGen), Gen.nonEmptyListOf(ivGen)) { (as, bs) =>
      val a = df(as, "a_id", "a_lo", "a_hi")
      val b = df(bs, "b_id", "b_lo", "b_hi")
      val got = RelationalOps.intervalOverlapJoinBucketed(
          a, "a_lo", "a_hi", b, "b_lo", "b_hi", bucketSeconds = 600L)
        .select("a_id", "b_id").collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
      val want = a.join(b, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
        .select("a_id", "b_id").collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
      got == want
    })
  }

  test("property: pattern quantifier (view click+ purchase) == sequential scan") {
    // the w14 islands+adjacency windowed formulation vs an independent
    // per-user sequential run scanner — genuinely different algorithms
    val evGen = for {
      u <- Gen.choose(0, 2)
      t <- Gen.oneOf("view", "click", "purchase", "other")
    } yield (u, t)
    check(Prop.forAll(Gen.nonEmptyListOf(evGen)) { evs =>
      val rows = evs.zipWithIndex.map { case ((u, t), i) => (u.toLong, i.toLong, t) }
      val df = rows.toDF("user_id", "event_id", "event_type")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val isl = df
        .withColumn("rn", row_number().over(w))
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(w) === col("event_type"), lit(0))
            .otherwise(lit(1)))
        .withColumn("island", sum(col("chg")).over(wRun))
        .groupBy("user_id", "island")
        .agg(min("event_type").as("event_type"), count(lit(1)).as("run_len"),
          min("rn").as("srn"), min_by(col("event_id"), col("rn")).as("first_eid"))
      val w2 = Window.partitionBy("user_id").orderBy("srn")
      val got = isl
        .withColumn("prev_type", lag(col("event_type"), 1).over(w2))
        .withColumn("next_type", lead(col("event_type"), 1).over(w2))
        .withColumn("next_eid", lead(col("first_eid"), 1).over(w2))
        .filter(col("event_type") === "click" &&
          col("prev_type") === "view" && col("next_type") === "purchase")
        .select(col("user_id"), col("run_len"), col("next_eid"))
        .as[(Long, Long, Long)].collect().toSet

      val expected = rows.groupBy(_._1).flatMap { case (u, rs) =>
        val sorted = rs.sortBy(_._2)
        val runs = scala.collection.mutable.ListBuffer[(String, List[(Long, Long, String)])]()
        sorted.foreach { r =>
          if (runs.nonEmpty && runs.last._1 == r._3)
            runs(runs.size - 1) = (r._3, runs.last._2 :+ r)
          else runs += ((r._3, List(r)))
        }
        runs.toList.sliding(3).collect {
          case List((pt, _), ("click", cs), (nt, ns))
            if pt == "view" && nt == "purchase" =>
            (u, cs.size.toLong, ns.head._2)
        }
      }.toSet
      got == expected
    })
  }
}
