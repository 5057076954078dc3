package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Dedup, Similarity, TextOps}

class OperatorsSpec extends SparkSpec {

  test("as-of join: greatest right ts <= left ts per key, inclusive") {
    import spark.implicits._
    val left = Seq(("u1", 100L, "p1"), ("u1", 250L, "p2"), ("u2", 50L, "p3"))
      .toDF("k", "ts", "payload")
    val right = Seq(("u1", 90L), ("u1", 100L), ("u1", 240L), ("u2", 60L))
      .toDF("k", "ts")
    val got = AsOfJoin.lastRightAtOrBefore(left, right, "k", "ts", "asof")
      .collect().map(r => r.getAs[String]("payload") -> Option(r.getAs[Long]("asof"))).toMap
    assert(got("p1").contains(100L)) // simultaneous right row matches
    assert(got("p2").contains(240L))
    assert(got("p3").isEmpty || got("p3").contains(0L) == false) // no prior right row
  }

  test("forward as-of and tolerance variants") {
    import spark.implicits._
    val left = Seq(("u1", 100L, "p1"), ("u1", 250L, "p2")).toDF("k", "ts", "payload")
    val right = Seq(("u1", 90L), ("u1", 120L), ("u1", 400L)).toDF("k", "ts")
    val fwd = AsOfJoin.firstRightAtOrAfter(left, right, "k", "ts", "next")
      .collect().map(r => r.getAs[String]("payload") -> r.getAs[Any]("next")).toMap
    assert(fwd("p1") == 120L)
    assert(fwd("p2") == 400L)
    val tol = AsOfJoin.lastRightWithin(left, right, "k", "ts", tolerance = 20L, "prev")
      .collect().map(r => r.getAs[String]("payload") -> Option(r.getAs[Any]("prev"))).toMap
    assert(tol("p1").contains(90L))  // 100-90=10 <= 20
    assert(tol("p2").isEmpty)        // 250-120=130 > 20 -> null
  }

  test("exact dedup keeps min id per key") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "text")
    val got = Dedup.exact(df, Seq("text"), "id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("x" -> ((1L, 2L)), "y" -> ((3L, 1L))))
  }

  test("ngram jaccard: identical docs score 1.0, disjoint docs drop out") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words entirely here now")).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("ngram jaccard df cap: hot-shingle-only pairs are pruned, near-dups survive") {
    import spark.implicits._
    val hot = "common boiler plate" // appears in every doc
    val df = Seq(
      (1L, s"$hot alpha beta gamma delta epsilon"),
      (2L, s"$hot alpha beta gamma delta epsilon"), // near-dup of 1
      (3L, s"$hot totally different content here now"),
      (4L, s"$hot yet another unrelated piece text")).toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.0)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every pair shares the hot shingles -> all 6 pairs generated
    assert(uncapped.size == 6)
    val capped = Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.0, maxShingleDf = Some(2))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the true near-dup pair survives candidate generation
    assert(capped == Set((1L, 2L)))
  }

  test("minhash LSH: exact duplicates always collide; disjoint docs never") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(df, "doc_id", "text")
    val pairs = Dedup.minhashCandidatePairs(sigs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("incremental near-dup: persisted band index == live reference; semi-drop never multiplies") {
    import spark.implicits._
    val release = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"),
      (3L, "lorem ipsum dolor sit amet consectetur adipiscing")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // near-dup of 1
      (11L, "totally fresh content nine ten eleven twelve"),
      (12L, "one two three four five six seven eight")        // near-dup of 2
    ).toDF("doc_id", "text")
    val refBanded = Dedup.bandedBuckets(
      Dedup.minhashSignatures(release, "doc_id", "text"), "doc_id")
    val incBanded = Dedup.bandedBuckets(
      Dedup.minhashSignatures(batch, "doc_id", "text"), "doc_id")

    // freeze-time persist, batch-time read: identical pairs to the live join
    val dir = java.nio.file.Files.createTempDirectory("graft-bandidx").toString
    Dedup.writeMinhashBandIndex(refBanded, dir)
    val fromDisk = Dedup.minhashPairsAgainst(
      incBanded, Dedup.readMinhashBandIndex(spark, dir), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val live = Dedup.minhashPairsAgainst(incBanded, refBanded, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromDisk == live)
    assert(live.contains((10L, 1L)) && live.contains((12L, 2L)))
    assert(!live.exists(_._1 == 11L)) // fresh doc collides with nothing

    // a later release appends to the same index; the new batch's dups
    // against EITHER release surface through one read
    val release2 = Seq((4L, "totally fresh content nine ten eleven twelve"))
      .toDF("doc_id", "text")
    Dedup.writeMinhashBandIndex(
      Dedup.bandedBuckets(Dedup.minhashSignatures(release2, "doc_id", "text"), "doc_id"),
      dir, append = true)
    val afterAppend = Dedup.minhashPairsAgainst(
      incBanded, Dedup.readMinhashBandIndex(spark, dir), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterAppend == live + ((11L, 4L)))

    // the drop path is a left_anti on the pair ids — row count can only
    // shrink, whatever the collision fan-out
    val kept = batch.join(
        Dedup.minhashPairsAgainst(incBanded, refBanded, "doc_id").select("doc_id"),
        Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L))

    // write-time bucket cap: a degenerate release (many docs, one
    // signature) keeps only the m min-id members per bucket, but an
    // incoming dup is still flagged — detection survives, fan-out is
    // bounded
    val degenerate = (1L to 50L).map(i => (i, "same tiny doc")).toDF("doc_id", "text")
    val degBanded = Dedup.bandedBuckets(
      Dedup.minhashSignatures(degenerate, "doc_id", "text"), "doc_id")
    val capDir = java.nio.file.Files.createTempDirectory("graft-bandcap").toString
    Dedup.writeMinhashBandIndex(degBanded, capDir, capPerBucket = Some(("doc_id", 3)))
    val capped = Dedup.readMinhashBandIndex(spark, capDir)
    val perBucket = capped.groupBy("band", "bucket").count()
      .select("count").as[Long].collect()
    assert(perBucket.nonEmpty && perBucket.forall(_ <= 3))
    assert(capped.select("doc_id").distinct().as[Long].collect().toSet == Set(1L, 2L, 3L))
    val dupProbe = Seq((99L, "same tiny doc")).toDF("doc_id", "text")
    val flagged = Dedup.minhashPairsAgainst(
      Dedup.bandedBuckets(Dedup.minhashSignatures(dupProbe, "doc_id", "text"), "doc_id"),
      capped, "doc_id")
    assert(flagged.select("doc_id").as[Long].collect().toSet == Set(99L))
  }

  test("nearDupClusters: transitive closure over pairs, min-id labels, singletons alone") {
    import spark.implicits._
    val docs = (1L to 6L).toDF("doc_id")
    // chain 1-2, 2-3 (transitive); island 4-5; singleton 6
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val got = Dedup.nearDupClusters(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
    // route equality: force the distributed GraphX path (zero envelope) —
    // the in-memory union-find route above must agree exactly
    val prev = sys.props.get("graft.broadcastMaxRows")
    try {
      sys.props("graft.broadcastMaxRows") = "0"
      val dist = Dedup.nearDupClusters(docs, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist == got)
    } finally {
      prev match {
        case Some(v) => sys.props("graft.broadcastMaxRows") = v
        case None => sys.props.remove("graft.broadcastMaxRows")
      }
    }
    // empty pair list: every doc is its own cluster (the in-memory route's
    // empty-label-table join must not lose rows)
    val lone = Dedup.nearDupClusters(docs, Seq.empty[(Long, Long)].toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lone == (1L to 6L).map(i => i -> i).toMap)
  }

  test("contamination: planted n-gram overlap found, clean docs pass, self excluded by caller") {
    import spark.implicits._
    import graft.operators.TextOps
    val evalSet = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "completely unrelated benchmark question about physics")).toDF("doc_id", "text")
    val corpus = Seq(
      // verbatim 7-token run from eval 100 → many shared 4-grams
      (1L, "noise before the quick brown fox jumps over the lazy and after"),
      // only a 3-token run: zero shared 4-grams
      (2L, "has quick brown fox but nothing longer than that run"),
      (3L, "totally clean document with no overlap whatsoever here")).toDF("doc_id", "text")
    val got = TextOps.contamination(corpus, evalSet, "doc_id", "text", n = 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // "the quick brown fox jumps over the lazy" shares five 4-grams
    assert(got.keySet == Set((1L, 100L)), got)
    assert(got((1L, 100L)) == 5L, got)
    // at minShared = 1 the short run still misses (no shared 4-gram at all)
    val loose = TextOps.contamination(corpus, evalSet, "doc_id", "text", n = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == Set((1L, 100L)), loose)
  }

  test("repetitionMetrics: hand-computed counts on planted repetition") {
    import spark.implicits._
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "a b a b a"),     // tokens: a×3 b×2; bigrams: "a b"×2, "b a"×2
      (2L, "x y z"),          // all unique
      (3L, "w"),              // single token: no bigrams
      (4L, "")).toDF("doc_id", "text") // empty -> one "" token
    val got = TextOps.repetitionMetrics(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail.map(_.asInstanceOf[Long])).toMap
    assert(got(1L) == Seq(5L, 2L, 3L, 4L, 2L, 4L), got(1L))
    assert(got(2L) == Seq(3L, 3L, 1L, 2L, 1L, 0L), got(2L))
    assert(got(3L) == Seq(1L, 1L, 1L, 0L, 0L, 0L), got(3L))
    assert(got(4L) == Seq(1L, 1L, 1L, 0L, 0L, 0L), got(4L))
  }

  test("winnowing: shared runs >= w+k-1 tokens share a fingerprint; selection is sparse") {
    import spark.implicits._
    val sharedRun = "quick brown fox jumps over the lazy dog tonight"  // 9 tokens
    val df = Seq(
      (1L, s"alpha beta gamma $sharedRun delta epsilon"),
      (2L, s"one two three four five $sharedRun six seven"),
      (3L, "completely different words without any overlap at all here")).toDF("doc_id", "text")
    val fps = TextOps.winnowFingerprints(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fps.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    // guarantee: 9 shared tokens >= w + k - 1 = 6 → at least one common fingerprint
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
    // density: far fewer fingerprints than shingles (~2/(w+1) of positions)
    val nShingles1 = df.where($"doc_id" === 1L).select(
      size(split(lower(trim($"text")), "\\s+"))).head.getInt(0) - 2
    assert(byDoc(1L).size < nShingles1)
  }

  test("portable hash family: same LSH guarantees as the xxhash64 default") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidatePairs(
      Dedup.minhashSignatures(df, "doc_id", "text", portable = true), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
    // signatures are non-degenerate (bit-63 masking keeps 63 bits of range)
    val sig = Dedup.minhashSignatures(df, "doc_id", "text", portable = true)
      .select("signature").head.getSeq[Long](0)
    assert(sig.forall(_ >= 0L) && sig.distinct.size > 16)

    val sPairs = Dedup.simhashCandidatePairs(
      Dedup.simhash(df, "doc_id", "text", portable = true), "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(sPairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
    assert(!sPairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("portable minhash: flatMap digest hashing is bit-identical to the SQL md5/conv form") {
    import spark.implicits._
    // The d4 oracle recomputes signatures via SQL
    // conv(substring(md5(sh),1,15),16,10) / conv(substring(md5(sh),17,15),16,10);
    // the engine assembles the same 60-bit values from the raw digest bytes
    // inside the shingle flatMap. Any drift here silently breaks the oracle,
    // so pin bit equality of the FULL signature on a mixed corpus (unicode,
    // short docs, repeated shingles).
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "short"),
      (3L, "naïve café über straße 日本語 テキスト mixed in"),
      (4L, "a a a a a a a a"),
      (5L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val fast = Dedup.minhashSignatures(df, "doc_id", "text", portable = true)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // re-derive via the SQL expression chain over the same shingle set
    val numHashes = 32
    val exploded = df.select(col("doc_id"),
      explode(Dedup.shingles(col("text"), 3)).as("_sh"))
      .withColumn("_h1", conv(substring(md5(col("_sh")), 1, 15), 16, 10).cast("long"))
      .withColumn("_h2", conv(substring(md5(col("_sh")), 17, 15), 16, 10).cast("long"))
    val mins = (0 until numHashes).map { i =>
      val rot = shiftleft(col("_h2"), i)
        .bitwiseOR(shiftrightunsigned(col("_h2"), 64 - i))
      min(col("_h1").bitwiseXOR(rot).bitwiseAND(lit(Long.MaxValue))).as(s"_h$i")
    }
    val sql = exploded.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"_h$i")): _*).as("signature"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fast.keySet == sql.keySet)
    fast.foreach { case (id, sig) =>
      assert(sig == sql(id), s"signature drift for doc $id")
    }
  }

  test("default minhash: JVM xxhash pair is bit-identical to the SQL xxhash64 columns") {
    import spark.implicits._
    // the fast-path family must keep producing the bits xxhash64(s) /
    // xxhash64(7, s) produce, or candidate sets silently change under a
    // Spark upgrade that alters the catalyst XXH64 helper surface
    val df = Seq((0L, "alpha beta gamma"), (1L, ""), (2L, "日本語 テキスト"), (3L, "x"))
      .toDF("id", "s")
    val sqlPairs = df.orderBy("id")
      .select(xxhash64(col("s")), xxhash64(lit(7), col("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // one-shingle docs (k over fewer tokens collapses to the full string)
    // make the signature slot 0 = (h1 ^ h2) & MaxValue recomputable exactly
    val sig0 = Dedup.minhashSignatures(df, "id", "s", numHashes = 1, shingleK = 10)
      .orderBy("id").collect().map(_.getSeq[Long](1).head)
    sqlPairs.zip(sig0).foreach { case ((h1, h2), got) =>
      assert(got == ((h1 ^ h2) & Long.MaxValue), s"xx pair drift: $h1/$h2 -> $got")
    }
  }

  test("simhash: identical docs at hamming 0; near-identical within 3") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark is a unified analytics engine for large scale data"),
      (2L, "spark is a unified analytics engine for large scale data"),
      (3L, "cats purr loudly when petted gently every morning")).toDF("doc_id", "text")
    val sigs = Dedup.simhash(df, "doc_id", "text")
    val pairs = Dedup.simhashCandidatePairs(sigs, "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("hot-bucket cap bounds minhash candidates: 1k identical docs → star, not m²") {
    import spark.implicits._
    // 1000 identical docs collapse to ONE signature — every band bucket is
    // degenerate. Uncapped that is ~500k pairs/band; capped it must be the
    // m−1 star, with every doc still reachable from the hub (id 0).
    val df = (0L until 1000L).map(i => (i, "the same exact text in every document"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(df, "doc_id", "text")
    val pairs = Dedup.minhashCandidatePairs(sigs, "doc_id", maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == 999)
    assert(pairs.forall(_._1 == 0L))
    assert(pairs.map(_._2).toSet == (1L until 1000L).toSet)
  }

  test("hot-bucket cap bounds simhash candidates and keeps hamming real") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i, "identical content for the skew bomb test"))
      .toDF("doc_id", "text")
    val sigs = Dedup.simhash(df, "doc_id", "text")
    val pairs = Dedup.simhashCandidatePairs(sigs, "doc_id", 3, maxBucketSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.length == 499)
    assert(pairs.forall(p => p._1 == 0L && p._3 == 0))
  }

  test("brute-force cosine top-k ranks an identical vector first") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (10L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val queries = corpus.where(col("vec_id") === 10L)
    val got = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 2)
      .orderBy("rank").collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rank")))
    assert(got.head == ((1L, 1))) // exact duplicate direction wins
    assert(got(1) == ((2L, 2)))
  }

  test("language id picks the profile with most marker hits") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog of the house is big"),
      (2L, "el perro y la casa de la madre que canta")).toDF("doc_id", "text")
    val got = TextOps.languageId(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "es")
  }

  test("quality metrics: ratios on a known sentence") {
    import spark.implicits._
    val df = Seq((1L, "the cat sat.")).toDF("doc_id", "text")
    val r = TextOps.qualityMetrics(df, "doc_id", "text").collect().head
    assert(r.getAs[Int]("n_chars") == 12)
    assert(r.getAs[Int]("n_tokens") == 3)
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 1.0 / 3) < 1e-9)
    assert(math.abs(r.getAs[Double]("punct_ratio") - 1.0 / 12) < 1e-9)
  }

  test("spanDedup: corpus-wide keep-first per line, doc reassembly, total loss") {
    import spark.implicits._
    val df = Seq(
      (1L, "unique one\nshared line\nunique two"),
      (2L, "shared line\nonly here"),
      (3L, "shared line")) // every span lost -> doc vanishes
      .toDF("doc_id", "text")
    val got = TextOps.spanDedup(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("unique one\nshared line\nunique two", 3L)))
    assert(got(2L) == (("only here", 1L)))
    assert(!got.contains(3L), "a fully-duplicated doc must disappear")
    // the keeper is the smallest (id, pos): doc 1 keeps 'shared line'
  }

  test("spanDedup plan: keeper choice compiles to a map-side group limit") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, s"line a $i\nline b ${i % 5}"))
      .toDF("doc_id", "text")
    val p = TextOps.spanDedup(df, "doc_id", "text")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("WindowGroupLimit"),
      s"hot-fingerprint top-1 must push below the shuffle:\n${p.take(2000)}")
  }

  test("BloomMightContain: no false negatives; non-members mostly rejected") {
    import spark.implicits._
    val members = (1L to 500L).map(_ * 7919L)
    val bloom = members.toDF("h").stat.bloomFilter("h", 1000L, 0.01)
    val bytes = graft.functions.BloomMightContain.serialize(bloom)
    val probe = (df: org.apache.spark.sql.DataFrame) => df.where(
      graft.functions.BloomMightContain.might_contain(bytes, col("h")))
    // a Bloom filter may false-positive but NEVER false-negative
    assert(probe(members.toDF("h")).count() == members.size)
    // at 1% fpp, 1000 non-members keep ~990: anything under 900 means the
    // probe is broken, not unlucky (P < 1e-100)
    val nonMembers = (1L to 1000L).map(_ * 7919L + 3L)
    val rejected = nonMembers.size - probe(nonMembers.toDF("h")).count()
    assert(rejected > 900, s"only $rejected/1000 non-members rejected")
  }

  test("contaminationBloom: identical rows to the exact join at any fpp") {
    import spark.implicits._
    val docs = (1 to 60).map(i =>
      (i.toLong, s"alpha beta gamma delta $i epsilon zeta eta theta ${i % 7}"))
      .toDF("doc_id", "text")
    val evals = docs.where(col("doc_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.where(col("doc_id") =!= col("eval_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = rows(TextOps.contamination(docs, evals, "doc_id", "text", n = 3, minShared = 2))
    assert(exact.nonEmpty, "fixture must actually contaminate")
    // a coarse filter (high fpp) lets more false positives through the
    // probe — every one must die in the exact join
    for (fpp <- Seq(0.5, 0.01))
      assert(rows(TextOps.contaminationBloom(docs, evals, "doc_id", "text",
        n = 3, minShared = 2, expectedEvalShingles = 1000L, fpp = fpp)) == exact,
        s"fpp=$fpp diverged")
  }

  test("piiMetrics: progressive counting — embedded quad counts as email only") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail 1.2.3.4@example.com and host 5.6.7.8 call 555-123-4567"),
      (2L, "no pii here"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextOps.piiMetrics(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    // the dotted quad INSIDE the email local part is consumed by the email
    // redaction and never double-counted as an IP; the free-standing one is
    assert(got(1L) == ((Some(1L), Some(1L), Some(1L))))
    assert(got(2L) == ((Some(0L), Some(0L), Some(0L))))
    assert(got(3L) == ((None, None, None))) // null text -> null counts
    // detect counts equal what the scrub actually replaces
    val red = df.where($"doc_id" === 1L)
      .select(TextOps.piiRedact(col("text"))).collect().head.getString(0)
    assert(red == "mail <EMAIL> and host <IP> call <PHONE>")
  }

  test("chunkDocuments: boundaries, short tails, null/empty docs") {
    import spark.implicits._
    val words33 = (1 to 33).map(i => s"w$i").mkString(" ")
    val words32 = (1 to 32).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, words33),            // 33 tokens: chunks at 0 (32 toks) and 24 (9 toks)
      (2L, words32),            // 32 tokens: full chunk + the stride-24 overlap tail
      (3L, "solo"),             // single token -> one 1-token chunk
      (4L, null.asInstanceOf[String])) // null -> dropped, never an error
      .toDF("doc_id", "text")
    val got = TextOps.chunkDocuments(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(got == Map(
      (1L, 0) -> 32, (1L, 1) -> 9,
      (2L, 0) -> 32, (2L, 1) -> 8, // every stride multiple < n emits, even subsumed
      (3L, 0) -> 1))
    // chunk text round-trips the token windows
    val texts = TextOps.chunkDocuments(df.where($"doc_id" === 1L), "doc_id", "text")
      .orderBy("chunk_id").collect().map(_.getString(3))
    assert(texts(0) == (1 to 32).map(i => s"w$i").mkString(" "))
    assert(texts(1) == (25 to 33).map(i => s"w$i").mkString(" "))
  }

  test("filterLines: rtrim'd terminal punctuation, word floor, empty survivors") {
    import spark.implicits._
    val doc =
      "this line has exactly five words.\n" + // kept
      "this one ends with trailing spaces after punctuation.   \n" + // kept (rtrim)
      "too short.\n" + // dropped: < 5 words
      "five whole words but no terminator\n" + // dropped: no [.!?"']
      "a quoted line of five words.\"" // kept: closing quote after period
    val df = Seq((1L, doc), (2L, "no keepers here")).toDF("doc_id", "text")
    val got = TextOps.filterLines(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(got(1L)._1 == 5 && got(1L)._2 == 3)
    assert(got(1L)._3.split("\n").length == 3)
    assert(got(2L) == ((1, 0, ""))) // zero survivors -> empty text, not null
  }

  test("exactAgainst: shipped content never re-ships; new and null-text rows survive") {
    import spark.implicits._
    val release = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val crawl = Seq(
      (10L, "alpha"), // already shipped -> dropped
      (11L, "gamma"), // new content -> kept
      (12L, null.asInstanceOf[String]), // unparsed text: no fingerprint, kept
      (13L, "beta")) // already shipped -> dropped
      .toDF("doc_id", "text")
    val kept = Dedup.exactAgainst(crawl, release, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L, 12L))
    // a release deduped against itself is empty (full self-overlap)
    assert(Dedup.exactAgainst(release, release, "text").count() == 0)
  }

  test("classifierScore: mean hashed weight, integer score, stable across runs") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta alpha"), (2L, "alpha")).toDF("doc_id", "text")
    val rows = TextOps.classifierScore(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    // doc 2's score_i is w(alpha); doc 1's is 2*w(alpha) + w(beta) — the
    // weights come from the same md5 stream, so the linearity is checkable
    // without re-deriving the hash here
    val wAlpha = rows(2L)._2
    assert(rows(1L)._1 == 3 && rows(2L)._1 == 1)
    assert(wAlpha >= -1000 && wAlpha <= 1000)
    val wBeta = rows(1L)._2 - 2 * wAlpha
    assert(wBeta >= -1000 && wBeta <= 1000)
    assert(rows(2L)._3 == math.rint(wAlpha / 1000.0 * 1e6) / 1e6)
    assert(rows(1L)._4 == (rows(1L)._2 > 0))
    // a different model name re-keys the weight table
    val other = TextOps.classifierScore(df, "doc_id", "text", modelName = "qc2")
      .where(col("doc_id") === 2L).collect()(0).getLong(2)
    assert(other != wAlpha)
  }

  test("bigramSurprisal: hand-computed bits on a 3-doc corpus; short docs absent") {
    import spark.implicits._
    // corpus bigrams: "abab" -> ab,ba,ab ; "ab" -> ab ; "x" -> none
    // counts: ab=3, ba=1, T=4  => bits(T)=3, bits(ab)=2, bits(ba)=1
    val df = Seq((1L, "abab"), (2L, "ab"), (3L, "x")).toDF("doc_id", "text")
    val got = TextOps.bigramSurprisal(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: ab,ba,ab -> (3-2)+(3-1)+(3-2) = 4 bits over 3 bigrams
    assert(got(1L) == ((3L, 4L, math.rint(4.0 / 3 * 1e6) / 1e6)))
    // doc 2: ab -> 1 bit
    assert(got(2L) == ((1L, 1L, 1.0)))
    assert(!got.contains(3L)) // no bigrams -> no row
  }

  test("bigram_counts histogram == exploded substr formulation (unicode, edges)") {
    import spark.implicits._
    import graft.functions.BigramCountsOps.bigram_counts
    // Adversarial inputs: multi-byte code points, surrogate-pair emoji,
    // combining marks, whitespace needing trim, empty/1-char/null docs,
    // repeats that stress the count path.
    val docs = Seq(
      (1L, "abab"), (2L, "  ab  "), (3L, "x"), (4L, ""), (5L, null),
      (6L, "héllo wörld"), (7L, "日本語のテキスト"), (8L, "👍👍🏽a👍"),
      (9L, "ééé"), (10L, "aaaaaaaaaa"),
      (11L, "mixé😀日a😀é"), (12L, " é "), (13L, "ab\ncd\tef")
    ).toDF("doc_id", "text")
    val t = trim(col("text"))
    // the pre-histogram formulation, verbatim (one row per character)
    val exploded = docs.select(col("doc_id"),
        explode(when(length(t) >= 2,
            transform(sequence(lit(1), length(t) - 1), i => t.substr(i, lit(2))))
          .otherwise(array().cast("array<string>"))).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("cd"))
    val hist = docs.select(col("doc_id"),
      explode(bigram_counts(trim(col("text")))).as(Seq("bg", "cd")))
    assert(hist.exceptAll(exploded).isEmpty && exploded.exceptAll(hist).isEmpty)
  }

  test("packGreedy: hand-computed greedy assignment, oversized doc alone") {
    import spark.implicits._
    // one shard: token counts 3,4,2,9,1 with ctx=8 pack as
    // [3,4] (7) | [2] then 9 overflows -> [2] closes at 2? no: 2+9>8 so 9
    // starts seq 2 ALONE (oversized allowed as sole member), 1 then opens
    // seq 3 because 9+1>8.
    val docs = Seq((0L, "a b c"), (8L, "a b c d"), (16L, "a b"),
      (24L, "a b c d e f g h i"), (32L, "a")).toDF("doc_id", "text")
    val got = TextOps.packGreedy(docs, "doc_id", "text", ctxLen = 8, nShards = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(3), r.getInt(4), r.getLong(5)))).toMap
    assert(got(0L) == ((0, 0L, 1, 3L)))
    assert(got(8L) == ((0, 0L, 2, 7L)))
    assert(got(16L) == ((0, 1L, 1, 2L)))
    assert(got(24L) == ((0, 2L, 1, 9L))) // oversized: own sequence, not dropped
    assert(got(32L) == ((0, 3L, 1, 1L)))
  }

  test("packGreedy: invariants hold and assignment ignores physical layout") {
    import spark.implicits._
    val docs = (0L until 200L).map(i =>
      (i, ("tok " * (1 + (i * 7 % 60).toInt)).trim)).toDF("doc_id", "text")
    val packed = TextOps.packGreedy(docs, "doc_id", "text", ctxLen = 64, nShards = 4)
      .persist()
    try {
      // every sequence fits the budget unless it is a single oversized doc
      val bad = packed.groupBy("shard", "seq_id")
        .agg(max("fill_after").as("fill"), count(lit(1)).as("n"))
        .where(col("fill") > 64 && col("n") > 1)
      assert(bad.isEmpty, "multi-doc sequence above the token budget")
      // fill_after is the running sum in pos order; pos is dense from 1
      val rows = packed.collect()
        .groupBy(r => (r.getInt(1), r.getLong(3))).values
      rows.foreach { seqRows =>
        val sorted = seqRows.sortBy(_.getInt(4))
        assert(sorted.map(_.getInt(4)).toSeq == (1 to sorted.size))
        assert(sorted.map(_.getInt(2)).scanLeft(0L)(_ + _).drop(1).toSeq ==
          sorted.map(_.getLong(5)).toSeq)
      }
      // determinism: a hostile input layout produces the identical assignment
      val shuffled = TextOps.packGreedy(
        docs.repartition(13).sortWithinPartitions(col("text")),
        "doc_id", "text", ctxLen = 64, nShards = 4)
      assert(packed.exceptAll(shuffled).isEmpty && shuffled.exceptAll(packed).isEmpty)
    } finally { packed.unpersist(); () }
  }

  test("packGreedy: derived shard default scales with the input; every shard count yields a valid packing") {
    import spark.implicits._
    val docs = (0L until 300L).map(i =>
      (i, ("tok " * (1 + (i * 11 % 50).toInt)).trim)).toDF("doc_id", "text")

    // the default derives nShards from the input's partition count — a
    // 100 TB frame packs at the job's parallelism, not a fixed-8 ceiling
    val wide = docs.repartition(24)
    val derived = TextOps.packGreedy(wide, "doc_id", "text", ctxLen = 64)
    assert(derived.select(col("shard")).distinct().count() == 24,
      "derived default did not track the input's partition count")

    // shard count is part of the layout key: different counts give different
    // assignments, but EVERY count yields a complete, budget-respecting,
    // layout-independent packing
    Seq(1, 3, 24).foreach { n =>
      val p = TextOps.packGreedy(docs, "doc_id", "text", ctxLen = 64, nShards = n)
        .persist()
      try {
        assert(p.count() == 300 &&
          p.select("doc_id").distinct().count() == 300,
          s"nShards=$n lost or duplicated documents")
        val overBudget = p.groupBy("shard", "seq_id")
          .agg(max("fill_after").as("fill"), count(lit(1)).as("k"))
          .where(col("fill") > 64 && col("k") > 1)
        assert(overBudget.isEmpty, s"nShards=$n packed a multi-doc sequence over budget")
        // same count, hostile layout: identical assignment (the layout key
        // is (id, n_tokens, ctxLen, nShards), never physical partitioning)
        val relaid = TextOps.packGreedy(docs.repartition(7), "doc_id", "text",
          ctxLen = 64, nShards = n)
        assert(p.exceptAll(relaid).isEmpty && relaid.exceptAll(p).isEmpty,
          s"nShards=$n assignment depends on the physical layout")
      } finally { p.unpersist(); () }
    }
  }
}
