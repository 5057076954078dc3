package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.tables.Tables
import graft.operators.{Dedup, Sampling, Similarity, TextOps}
import graft.sources.DocSource

/** Training-data-pipeline operator inventory (prompt §"beyond the reference"):
  * deduplication, similarity search, text analysis, multimodal plumbing —
  * each over the `documents` / `embeddings` TESTDATA tables.
  */
object Pipeline {

  /** Word-3-shingle CTEs shared by the n-gram/minhash oracles — the SQL twin
    * of Dedup.shingleRows (same tokenization as every text oracle here).
    */
  private val shingleCtes: String =
    """toks AS (
      |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
      |  FROM documents
      |), idx AS (
      |  SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i FROM toks
      |), sh0 AS (
      |  SELECT doc_id, CASE WHEN len(t) < 3 THEN array_to_string(t, ' ')
      |    ELSE t[i] || ' ' || t[i+1] || ' ' || t[i+2] END AS sh FROM idx
      |), sh AS (
      |  SELECT DISTINCT doc_id, sh FROM sh0
      |)""".stripMargin

  /** Deterministic JSONL ingest fixture (s8): 30 well-formed docs + 4 junk
    * lines (truncated JSON, missing id, string id, blank). Written
    * idempotently to a FIXED path so the registered DuckDB oracle reads the
    * same bytes; content is pure function of the loop index — byte-stable
    * across runs and engines.
    */
  private lazy val jsonlFixture: String = {
    val dir = java.nio.file.Paths.get("/tmp/graft_s8")
    java.nio.file.Files.createDirectories(dir)
    val langs = Seq("en", "de", "zh", "es")
    val good = (0 until 30).map { i =>
      val body = Seq.fill(3 + i % 5)(s"tok${i % 7}").mkString(" ")
      s"""{"doc_id":$i,"text":"doc $i $body","lang":"${langs(i % 4)}","source":"src${i % 3}"}"""
    }
    val junk = Seq(
      """{"doc_id":""", // truncated JSON
      "", // blank line (mid-file: a trailing one is not a line at all)
      """{"text":"no id here","lang":"en"}""", // missing doc_id
      """{"doc_id":"abc","text":"string id"}""") // type-violating doc_id
    val f = dir.resolve("docs.jsonl")
    java.nio.file.Files.write(f, (good ++ junk).mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  /** doc_id-derived PII suffix for t9/t10 (the corpus itself is PII-free):
    * doc_id%3==0 gets an email whose local part embeds a dotted-quad plus a
    * phone; ==1 gets an IPv4; ==2 is untouched. [[piiAugmentSql]] is the
    * bit-identical DuckDB twin.
    */
  private def piiAugmented: org.apache.spark.sql.Column =
    concat(col("text"),
      when(col("doc_id") % 3 === 0,
        lit(" ping 1.2.3.4@example.com or 555-123-4567"))
      .when(col("doc_id") % 3 === 1,
        concat(lit(" from host 10.2."), (col("doc_id") % 256).cast("string"),
          lit(".9 port 80")))
      .otherwise(lit("")))

  private val piiAugmentSql: String =
    """SELECT doc_id, text ||
      |    CASE doc_id % 3
      |      WHEN 0 THEN ' ping 1.2.3.4@example.com or 555-123-4567'
      |      WHEN 1 THEN ' from host 10.2.' || CAST(doc_id % 256 AS VARCHAR) || '.9 port 80'
      |      ELSE '' END AS text
      |  FROM documents""".stripMargin

  /** DuckDB twin of Dedup's portable XOR-rotate hash slot i. The JVM's
    * 64-bit rotation wraps; DuckDB raises on any left shift past 2^63 (even
    * on UBIGINT), so the rotation runs in HUGEINT — shift, take mod 2^64,
    * ADD the rotated-out low part (disjoint bit ranges, so + ≡ |) — then the
    * sign bit is cleared and the value reinterpreted signed: bit-identical
    * to the Spark column.
    */
  private def minhashSlotSql(i: Int): String = {
    val rot =
      if (i == 0) "h2"
      else s"CAST((CAST(h2 AS HUGEINT) << $i) % 18446744073709551616 " +
        s"+ CAST(h2 >> ${64 - i} AS HUGEINT) AS UBIGINT)"
    s"min(CAST(xor(h1, $rot) & 9223372036854775807::UBIGINT AS BIGINT)) AS h$i"
  }

  /** Oracle for d4: recompute the 32-slot portable MinHash signatures, then
    * candidate pairs = collision on any 4-slot band (the engine buckets by a
    * hash OF the band slots, so collision ≡ slot equality).
    */
  private def minhashOracle: String = {
    val slots = (0 until 32).map(minhashSlotSql).mkString(",\n    ")
    val bands = (0 until 8).map { b =>
      (0 until 4).map(r => s"a.h${b * 4 + r} = b.h${b * 4 + r}")
        .mkString("(", " AND ", ")")
    }.mkString("\n   OR ")
    s"""WITH $shingleCtes, hs AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substring(md5(sh), 1, 15)) AS UBIGINT) AS h1,
       |    CAST(('0x' || substring(md5(sh), 17, 15)) AS UBIGINT) AS h2
       |  FROM sh
       |), sig AS (
       |  SELECT doc_id,
       |    $slots
       |  FROM hs GROUP BY doc_id
       |)
       |SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE $bands""".stripMargin
  }

  /** Oracle for d5: portable 60-bit SimHash (bit-sign aggregation of
    * md5-derived token hashes), 16-bit-chunk candidate join, Hamming verify.
    */
  private def simhashOracle: String = {
    val bits = (0 until 60).map(j =>
      s"sum(CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS b$j").mkString(",\n    ")
    val sig = (0 until 60).map(j =>
      s"(CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" +\n    ")
    val chunks = (0 until 4).map(c =>
      s"((a.simhash >> ${c * 16}) & 65535) = ((b.simhash >> ${c * 16}) & 65535)")
      .mkString("\n     OR ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS t
       |  FROM documents
       |), hs AS (
       |  SELECT doc_id, CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT) AS h FROM toks
       |), bits AS (
       |  SELECT doc_id,
       |    $bits
       |  FROM hs GROUP BY doc_id
       |), sig AS (
       |  SELECT doc_id,
       |    $sig AS simhash
       |  FROM bits
       |)
       |SELECT id1, id2, hamming FROM (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
       |    CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |  WHERE $chunks
       |) WHERE hamming <= 3""".stripMargin
  }

  /** Oracle for sim2: recompute the 16-bit hyperplane signatures from the
    * embedded ±1 plane matrix (deterministic in (seed=42, bits=16, dim=64) —
    * [[graft.functions.HyperplaneSig.planeMatrix]]), then 4-bit band
    * collisions → exact cosine re-rank, exactly [[Similarity.lshTopK]].
    */
  private def lshTopKOracle: String = {
    val planes = graft.functions.HyperplaneSig.planeMatrix(seed = 42, bits = 16, dim = 64)
    val sigExpr = planes.zipWithIndex.map { case (plane, p) =>
      val lits = plane.map(w => if (w > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"(CASE WHEN list_sum(list_transform(list_zip(embedding, $lits), " +
        s"x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" +\n      ")
    val bandsPred = (0 until 4).map(b =>
      s"((s.sig >> ${b * 4}) & 15) = ((q.qsig >> ${b * 4}) & 15)")
      .mkString("\n       OR ")
    s"""WITH sigs AS (
       |  SELECT vec_id, embedding,
       |      $sigExpr AS sig
       |  FROM embeddings
       |), q AS (
       |  SELECT vec_id AS query_id, embedding AS qv, sig AS qsig FROM sigs WHERE vec_id < 10
       |), cands AS (
       |  SELECT DISTINCT s.vec_id AS id, q.query_id
       |  FROM sigs s JOIN q ON s.vec_id <> q.query_id
       |  WHERE $bandsPred
       |), scored AS (
       |  SELECT c.query_id, c.id,
       |    list_sum(list_transform(list_zip(s.embedding, q.qv),
       |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
       |    (sqrt(list_sum(list_transform(s.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
       |     sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
       |    AS score
       |  FROM cands c JOIN sigs s ON c.id = s.vec_id JOIN q ON c.query_id = q.query_id
       |), ranked AS (
       |  SELECT query_id, id AS vec_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, vec_id, rank FROM ranked WHERE rank <= 5""".stripMargin
  }

  val queries: Seq[Q] = Seq(

    // ------------------------------------------------------------------- dedup
    Q("d1_exact_dedup",
      (s, d) => Dedup.exact(Tables.documents(s, d), Seq("text"), "doc_id"),
      Some("SELECT text, min(doc_id) AS keep_id, count(*) AS dup_count " +
        "FROM documents GROUP BY text")),

    Q("d2_fingerprint_dedup",
      (s, d) => Tables.documents(s, d)
        .groupBy(TextOps.fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count")),
      Some("SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp, " +
        "min(doc_id) AS keep_id, count(*) AS dup_count FROM documents GROUP BY 1")),

    Q("d3_ngram_jaccard",
      (s, d) => Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
        shingleK = 3, threshold = 0.8),
      Some(
        """WITH toks AS (
          |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
          |  FROM documents
          |), idx AS (
          |  SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i FROM toks
          |), sh0 AS (
          |  SELECT doc_id, CASE WHEN len(t) < 3 THEN array_to_string(t, ' ')
          |    ELSE t[i] || ' ' || t[i+1] || ' ' || t[i+2] END AS sh FROM idx
          |), sh AS (
          |  SELECT DISTINCT doc_id, sh FROM sh0
          |), sizes AS (
          |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
          |), inter AS (
          |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
          |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2
          |)
          |SELECT id1, id2, CAST(i AS DOUBLE) / (s1.n + s2.n - i) AS jaccard
          |FROM inter JOIN sizes s1 ON id1 = s1.doc_id JOIN sizes s2 ON id2 = s2.doc_id
          |WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.8""".stripMargin)),

    // The capped variant — the 100 TB-safe default: shingles with document
    // frequency > cap are dropped from candidate GENERATION (a stopword-run
    // shingle shared by m docs otherwise yields m² join rows), while set
    // sizes keep them. Deterministic semantics, so it oracles exactly.
    Q("d3b_ngram_jaccard_capped",
      (s, d) => Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
        shingleK = 3, threshold = 0.8, maxShingleDf = Some(10L)),
      Some(
        """WITH toks AS (
          |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
          |  FROM documents
          |), idx AS (
          |  SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i FROM toks
          |), sh0 AS (
          |  SELECT doc_id, CASE WHEN len(t) < 3 THEN array_to_string(t, ' ')
          |    ELSE t[i] || ' ' || t[i+1] || ' ' || t[i+2] END AS sh FROM idx
          |), sh AS (
          |  SELECT DISTINCT doc_id, sh FROM sh0
          |), hot AS (
          |  SELECT sh FROM sh GROUP BY sh HAVING count(*) > 10
          |), shc AS (
          |  SELECT s.* FROM sh s WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.sh = s.sh)
          |), sizes AS (
          |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
          |), inter AS (
          |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
          |  FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2
          |)
          |SELECT id1, id2, CAST(i AS DOUBLE) / (s1.n + s2.n - i) AS jaccard
          |FROM inter JOIN sizes s1 ON id1 = s1.doc_id JOIN sizes s2 ON id2 = s2.doc_id
          |WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.8""".stripMargin)),

    // MinHash / SimHash signatures are engine-defined — rows-only gate.
    // Transitive dedup-group assignment: exact-Jaccard pairs (the d3 gate)
    // → GraphX connected components → keep-one-per-cluster labels. Oracle
    // re-derives the pairs in SQL and closes them by recursive min-label
    // propagation to fixpoint (the bk5 pattern).
    Q("d7_neardup_clusters",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // Capped candidate generation (the d3b scale default) feeds the
        // cluster assignment: at 100 TB the uncapped shingle self-join is
        // the part that blows up, and the cap's pair loss is exactly d3b's.
        val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          shingleK = 3, threshold = 0.8, maxShingleDf = Some(10L))
        Dedup.nearDupClusters(docs.select("doc_id"), pairs.select("id1", "id2"))
      },
      Some(s"""WITH RECURSIVE $shingleCtes, hot AS (
        |  SELECT sh FROM sh GROUP BY sh HAVING count(*) > 10
        |), shc AS (
        |  SELECT s.* FROM sh s WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.sh = s.sh)
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
        |  FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT id1, id2 FROM inter
        |  JOIN sizes s1 ON id1 = s1.doc_id JOIN sizes s2 ON id2 = s2.doc_id
        |  WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.8
        |), undirected AS (
        |  SELECT id1 AS a, id2 AS b FROM pairs
        |  UNION ALL SELECT id2, id1 FROM pairs
        |), lbl(doc_id, cluster) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT u.a, l.cluster FROM undirected u JOIN lbl l ON u.b = l.doc_id
        |)
        |SELECT doc_id, min(cluster) AS cluster_id FROM lbl GROUP BY doc_id""".stripMargin)),

    // Registered with the portable (md5-derived) hash family so the full
    // signatures → banding → candidate-pairs path is recomputed exactly by
    // the DuckDB oracle; production callers keep the faster xxhash64 default.
    Q("d4_minhash_pairs",
      (s, d) => {
        val sigs = Dedup.minhashSignatures(Tables.documents(s, d), "doc_id", "text",
          portable = true)
        Dedup.minhashCandidatePairs(sigs, "doc_id")
      },
      Some(minhashOracle)),

    Q("d5_simhash_pairs",
      (s, d) => {
        val sigs = Dedup.simhash(Tables.documents(s, d), "doc_id", "text",
          portable = true)
        Dedup.simhashCandidatePairs(sigs, "doc_id", maxHamming = 3)
          .select(col("id1"), col("id2"), col("hamming").cast("long").as("hamming"))
      },
      Some(simhashOracle)),

    // ----------------------------------------------------------- text analysis
    Q("t1_token_stats",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          length(col("text")).as("len_chars"),
          TextOps.tokenCount(col("text")).as("n_tokens"))
        .withColumn("chars_per_token",
          col("len_chars").cast("double") / col("n_tokens")),
      Some("SELECT doc_id, CAST(length(text) AS INT) AS len_chars, " +
        "CAST(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS INT) " +
        "AS n_tokens, CAST(length(text) AS DOUBLE) / " +
        "len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) " +
        "AS chars_per_token FROM documents")),

    Q("t2_quality_metrics",
      (s, d) => TextOps.qualityMetrics(Tables.documents(s, d), "doc_id", "text"),
      Some("WITH t AS (SELECT doc_id, text, " +
        "string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks " +
        "FROM documents) SELECT doc_id, CAST(length(text) AS INT) AS n_chars, " +
        "CAST(len(toks) AS INT) AS n_tokens, " +
        "CAST(length(text) AS DOUBLE) / len(toks) AS chars_per_token, " +
        "CAST(len(list_filter(toks, w -> w IN ('the','a','an','of','to','and','in','is'))) AS DOUBLE) " +
        "/ len(toks) AS stopword_ratio, " +
        "CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) " +
        "/ length(text) AS punct_ratio FROM t")),

    // Heuristic language-ID — engine-defined prediction, rows-only gate.
    // Oracle mirrors TextOps.languageId exactly: same marker profiles, same
    // tokenization, same argmax tie-break (max score, then max lang — Spark's
    // array_max over (score, lang) structs ≡ ORDER BY score DESC, lang DESC).
    Q("t3_language_id",
      (s, d) => TextOps.languageId(Tables.documents(s, d), "doc_id", "text"),
      Some {
        val profiles = Seq(
          "en" -> Seq("the", "and", "of", "is", "a"),
          "es" -> Seq("el", "la", "de", "que", "y"),
          "de" -> Seq("der", "die", "und", "das", "ist"),
          "fr" -> Seq("le", "la", "les", "et", "est"),
          "zh" -> Seq("的", "是", "了", "在", "我"))
        val scores = profiles.map { case (lang, markers) =>
          val arr = markers.map(m => s"'$m'").mkString("[", ", ", "]")
          s"SELECT doc_id, '$lang' AS lang, len(list_filter(t, w -> list_contains($arr, w))) AS score FROM toks"
        }.mkString("\n  UNION ALL ")
        s"""WITH toks AS (
           |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
           |  FROM documents
           |), scores AS (
           |  $scores
           |), best AS (
           |  SELECT doc_id, lang,
           |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
           |  FROM scores
           |)
           |SELECT doc_id, lang AS predicted_lang FROM best WHERE rn = 1""".stripMargin
      }),

    Q("t4_lang_distribution",
      (s, d) => Tables.documents(s, d)
        .groupBy("lang", "source").agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("total_chars")),
      Some("SELECT lang, source, count(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars " +
        "FROM documents GROUP BY lang, source")),

    // Winnowing fingerprints: the SQL twin replays the same shingle stream
    // (positions from the shared shingle CTEs), the same portable hash, and
    // the same w=4 trailing window.
    Q("t6_winnow_fingerprint",
      (s, d) => TextOps.winnowFingerprints(Tables.documents(s, d), "doc_id", "text"),
      Some("""WITH toks AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents
        |), idx AS (
        |  SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i FROM toks
        |), sh0 AS (
        |  SELECT doc_id, i, CASE WHEN len(t) < 3 THEN array_to_string(t, ' ')
        |    ELSE t[i] || ' ' || t[i+1] || ' ' || t[i+2] END AS sh FROM idx
        |), h AS (
        |  SELECT doc_id, i, CAST(('0x' || substring(md5(sh), 1, 15)) AS BIGINT) AS h FROM sh0
        |), wmin AS (
        |  SELECT doc_id, min(h) OVER (
        |    PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
        |  ) AS fingerprint FROM h
        |)
        |SELECT DISTINCT doc_id, fingerprint FROM wmin""".stripMargin)),

    // ------------------------------------------------------- similarity search
    // Exact brute-force cosine top-k (baseline) and LSH-bucketed approximate
    // variant (scale path) — scores are float-reduction-order sensitive, so
    // rows-only gate.
    // Oracle-backed: cosine is the same left-to-right double accumulation on
    // both sides (see d6), so the (score DESC, vec_id) ranking is bit-stable
    // across engines and the rank column compares exactly.
    Q("sim1_cosine_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") < 10)
        Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("vec_id"), col("rank").cast("long").as("rank"))
      },
      Some("""WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10
        |), scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    list_sum(list_transform(list_zip(e.embedding, q.qv),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
        |    AS score
        |  FROM embeddings e JOIN q ON e.vec_id <> q.query_id
        |), ranked AS (
        |  SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
        |  FROM scored
        |)
        |SELECT query_id, vec_id, rank FROM ranked WHERE rank <= 5""".stripMargin)),

    // Oracle-backed: the hyperplane matrix is deterministic in (seed, bits,
    // dim) and embedded in the SQL as literals; ±1 products are IEEE-exact,
    // the fold is the same left-to-right double accumulation, so signatures,
    // band collisions, and the (score DESC, id) re-rank all reproduce.
    Q("sim2_lsh_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") < 10)
        Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("id").as("vec_id"),
            col("rank").cast("long").as("rank"))
      },
      Some(lshTopKOracle)),

    // IVF (k-means inverted-file) approximate top-k — the recall-at-scale
    // ANN path; scores are engine-defined floats, rows-only gate. Recall vs
    // brute force is spec-gated in SimilaritySpec and re-audited inside
    // every bench run (RecallAudit). The synthetic embeddings are
    // structureless (within-label cosine ≈ cross-label ≈ 0 — measured),
    // which is IVF's worst case: nprobe/nlist = 0.75 buys the audit floor
    // plus real margin here (r15 sat AT the floor at 0.625), where
    // clustered real-world corpora run at 0.05–0.15 for the same recall.
    Q("sim5_ivf_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") < 10)
        Similarity.ivfTopK(emb, queries, "vec_id", "embedding", k = 5,
          nlist = 64, nprobe = 48)
          .select(col("query_id"), col("vec_id"), col("rank"))
      },
      None),

    // Product quantization ADC top-k — the memory-bound ANN path (vectors
    // become m code bytes + a norm; candidate scoring is m table lookups,
    // codegen'd). Approximate scan + exact re-rank of the survivors;
    // rows-only gate, recall >= 0.9 vs brute force spec-gated like sim5.
    Q("sim6_pq_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") < 10)
        graft.operators.ProductQuantizer.pqTopKFor(
          emb, queries, "vec_id", "embedding", k = 5, m = 16, ksub = 32,
          rerank = 100)
          .select(col("query_id"), col("vec_id"), col("rank"))
      },
      None),

    // IVF-PQ — the composed FAISS layout: IVF cells prune WHICH rows a
    // probe scans, PQ codes shrink WHAT each scanned row costs; both
    // reductions multiply. Rows-only gate, recall >= 0.9 vs brute force
    // spec-gated like sim5/sim6.
    Q("sim7_ivfpq_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") < 10)
        graft.operators.ProductQuantizer.ivfPqTopKFor(
          emb, queries, "vec_id", "embedding", k = 5,
          nlist = 64, nprobe = 48, m = 16, ksub = 32, rerank = 200)
          .select(col("query_id"), col("vec_id"), col("rank"))
      },
      None),

    // Embedding norms ARE oracle-checkable exactly: fixed-order double
    // accumulation over the array matches DuckDB's list_aggregate order.
    Q("sim3_norms",
      (s, d) => Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double")).as("sq_norm")),
      Some("SELECT vec_id, label, list_sum(list_transform(embedding, " +
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sq_norm FROM embeddings")),

    // Exact embedding-cosine near-dup (the LSH path's correctness baseline).
    // Both engines fold the arrays left-to-right in double, so the cosine
    // bits agree exactly and the threshold cut is deterministic. exact=true
    // is deliberate: the oracle is all-pairs SQL and the corpus is bounded;
    // the operator's DEFAULT is the LSH-candidate path.
    Q("d6_embedding_neardup",
      (s, d) => Similarity.exactNearDupPairs(
        Tables.embeddings(s, d).where(col("vec_id") < 200), "vec_id", "embedding", 0.35,
        exact = true)
        .select(col("id1"), col("id2"), col("cos")),
      Some("""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
        |scored AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |    list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
        |    AS cos
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |)
        |SELECT id1, id2, cos FROM scored WHERE cos >= 0.35""".stripMargin)),

    // SemDeDup-style semantic dedup: d6's pair surface → transitive
    // closure → keep the min-id representative per semantic group. Same
    // 200-row exact-pairs slice as d6 so the oracle is full-recall; the
    // production default is the banded-LSH candidate path (spec-gated).
    Q("d9_semantic_dedup",
      (s, d) => Similarity.semanticDedup(
        Tables.embeddings(s, d).where(col("vec_id") < 200), "vec_id", "embedding",
        0.35, exact = true),
      Some("""WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
        |scored AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |    list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
        |    AS cos
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |), pairs AS (SELECT id1, id2 FROM scored WHERE cos >= 0.35
        |), undirected AS (
        |  SELECT id1 AS a, id2 AS b FROM pairs UNION ALL SELECT id2, id1 FROM pairs
        |), lbl(vec_id, cluster) AS (
        |  SELECT vec_id, vec_id FROM e
        |  UNION
        |  SELECT u.a, l.cluster FROM undirected u JOIN lbl l ON u.b = l.vec_id
        |), comp AS (
        |  SELECT vec_id, min(cluster) AS cluster_id FROM lbl GROUP BY vec_id
        |), sizes AS (
        |  SELECT cluster_id, count(*) AS n_members FROM comp GROUP BY cluster_id
        |)
        |SELECT c.vec_id, s.n_members FROM comp c JOIN sizes s USING (cluster_id)
        |WHERE c.vec_id = c.cluster_id""".stripMargin)),

    // Incremental (cross-corpus) exact dedup: tonight's crawl anti-joined
    // on content fingerprint against the already-shipped release — the
    // rolling-pipeline complement of d1's within-batch dedup. The
    // "release" here is the deterministic hash-half of the corpus (the ds1
    // selection rule), so the oracle re-derives the same reference set.
    Q("d10_dedup_against_release",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val released = Sampling.stratifiedSample(docs, "doc_id", "lang",
          Map.empty, defaultRate = 0.5)
        Dedup.exactAgainst(docs, released, "text")
      },
      Some("""WITH ref AS (
        |  SELECT DISTINCT md5(text) AS fp FROM documents
        |  WHERE CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) <
        |    CAST(floor(0.5 * 1152921504606846976.0) AS BIGINT)
        |)
        |SELECT d.* FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM ref r WHERE r.fp = md5(d.text))""".stripMargin)),

    // Incremental NEAR-dup against the release: the new batch's MinHash
    // band signatures equi-joined against the release's PERSISTED band
    // index — d10's rolling-pipeline shape upgraded from exact to near-dup,
    // with the release side never re-shingled (O(new) per batch). Release =
    // the same deterministic hash-half as d10, so the oracle re-derives it.
    Q("d11_neardup_against_release",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val released = Sampling.stratifiedSample(docs, "doc_id", "lang",
          Map.empty, defaultRate = 0.5)
        val refBanded = Dedup.bandedBuckets(
          Dedup.minhashSignatures(released, "doc_id", "text", portable = true),
          "doc_id")
        val incoming = docs.join(released.select("doc_id"), Seq("doc_id"), "left_anti")
        val incBanded = Dedup.bandedBuckets(
          Dedup.minhashSignatures(incoming, "doc_id", "text", portable = true),
          "doc_id")
        Dedup.minhashPairsAgainst(incBanded, refBanded, "doc_id")
      },
      Some {
        val bands = (0 until 8).map { b =>
          (0 until 4).map(r => s"a.h${b * 4 + r} = b.h${b * 4 + r}")
            .mkString("(", " AND ", ")")
        }.mkString("\n   OR ")
        val slots = (0 until 32).map(minhashSlotSql).mkString(",\n    ")
        s"""WITH $shingleCtes, hs AS (
           |  SELECT doc_id,
           |    CAST(('0x' || substring(md5(sh), 1, 15)) AS UBIGINT) AS h1,
           |    CAST(('0x' || substring(md5(sh), 17, 15)) AS UBIGINT) AS h2
           |  FROM sh
           |), sig AS (
           |  SELECT doc_id,
           |    $slots
           |  FROM hs GROUP BY doc_id
           |), rel AS (
           |  SELECT doc_id FROM documents
           |  WHERE CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) <
           |    CAST(floor(0.5 * 1152921504606846976.0) AS BIGINT)
           |)
           |SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS ref_id
           |FROM sig a JOIN sig b ON a.doc_id <> b.doc_id
           |WHERE a.doc_id NOT IN (SELECT doc_id FROM rel)
           |  AND b.doc_id IN (SELECT doc_id FROM rel)
           |  AND ($bands)""".stripMargin
      }),

    // d11's collision pairs with the VERIFICATION signal: matched-band count
    // per pair and the estimated Jaccard (matched/B)^(1/r) — the quantity
    // RollingCuration's verifyTau thresholds when history text is
    // unavailable. Oracle recomputes signatures, counts agreeing bands per
    // pair (bucket collision ≡ slot equality, as in d4) and applies the same
    // 6-dp-rounded pow — a one-band accident reads 0.594604, a true near-dup
    // reads near 1.
    Q("d12_band_agreement",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val released = Sampling.stratifiedSample(docs, "doc_id", "lang",
          Map.empty, defaultRate = 0.5)
        val refBanded = Dedup.bandedBuckets(
          Dedup.minhashSignatures(released, "doc_id", "text", portable = true),
          "doc_id")
        val incoming = docs.join(released.select("doc_id"), Seq("doc_id"), "left_anti")
        val incBanded = Dedup.bandedBuckets(
          Dedup.minhashSignatures(incoming, "doc_id", "text", portable = true),
          "doc_id")
        Dedup.minhashBandAgreement(incBanded, refBanded, "doc_id")
      },
      Some {
        val slots = (0 until 32).map(minhashSlotSql).mkString(",\n    ")
        val bandCases = (0 until 8).map { b =>
          val eq = (0 until 4).map(r => s"a.h${b * 4 + r} = b.h${b * 4 + r}")
            .mkString("(", " AND ", ")")
          s"(CASE WHEN $eq THEN 1 ELSE 0 END)"
        }.mkString(" +\n    ")
        s"""WITH $shingleCtes, hs AS (
           |  SELECT doc_id,
           |    CAST(('0x' || substring(md5(sh), 1, 15)) AS UBIGINT) AS h1,
           |    CAST(('0x' || substring(md5(sh), 17, 15)) AS UBIGINT) AS h2
           |  FROM sh
           |), sig AS (
           |  SELECT doc_id,
           |    $slots
           |  FROM hs GROUP BY doc_id
           |), rel AS (
           |  SELECT doc_id FROM documents
           |  WHERE CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) <
           |    CAST(floor(0.5 * 1152921504606846976.0) AS BIGINT)
           |), agree AS (
           |  SELECT a.doc_id AS doc_id, b.doc_id AS ref_id,
           |    CAST($bandCases AS BIGINT) AS matched_bands
           |  FROM sig a JOIN sig b ON a.doc_id <> b.doc_id
           |  WHERE a.doc_id NOT IN (SELECT doc_id FROM rel)
           |    AND b.doc_id IN (SELECT doc_id FROM rel)
           |)
           |SELECT doc_id, ref_id, matched_bands,
           |  round(pow(matched_bands / 8.0, 0.25), 6) AS est_jaccard
           |FROM agree WHERE matched_bands >= 1""".stripMargin
      }),

    // TF-IDF: tf * ln(N/df) — a two-aggregate dataflow, no ML-lib state.
    Q("t5_tfidf",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val n = docs.count()
        TextOps.tfidf(docs.where(col("doc_id") < 100), "doc_id", "text", n)
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents WHERE doc_id < 100
        |), terms AS (
        |  SELECT doc_id, unnest(t) AS term FROM toks
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2
        |), dfreq AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY 1
        |), n AS (SELECT count(*) AS n FROM documents)
        |SELECT tf.doc_id, tf.term,
        |  round(CAST(tf.tf AS DOUBLE) * ln(CAST(n.n AS DOUBLE) / CAST(dfreq.df AS DOUBLE)), 6) AS tfidf
        |FROM tf JOIN dfreq USING (term) CROSS JOIN n""".stripMargin)),

    // Decontamination: training docs sharing >= 2 distinct word-3-grams
    // with any doc of a (stand-in) eval set — the benchmark-leakage check
    // every corpus ships through (real policies run 8–13-grams; the
    // synthetic docs are short, so 3-grams give the gate a real result
    // surface — 86 contaminated pairs at sf0.01). Self-pairs excluded: the
    // eval set here is a slice of the same table.
    Q("t7_decontamination",
      (s, d) => {
        val docs = Tables.documents(s, d)
        TextOps.contamination(docs, docs.where(col("doc_id") < 20),
            "doc_id", "text", n = 3, minShared = 2)
          .where(col("doc_id") =!= col("eval_id"))
      },
      Some(s"""WITH $shingleCtes,
        |she AS (
        |  SELECT doc_id AS eval_id, sh FROM sh WHERE doc_id < 20
        |)
        |SELECT d.doc_id, e.eval_id, count(*) AS shared_ngrams
        |FROM sh d JOIN she e ON d.sh = e.sh
        |WHERE d.doc_id <> e.eval_id
        |GROUP BY d.doc_id, e.eval_id
        |HAVING count(*) >= 2""".stripMargin)),

    // C4-style span dedup over the line-ified corpus (same deterministic
    // replaces as t12; 180 of 2133 spans at sf0.01 are cross-document
    // repeats): repeated lines keep ONE occurrence corpus-wide (smallest
    // (doc_id, pos)), docs reassemble from survivors. Full row-level oracle.
    Q("d8_span_dedup",
      (s, d) => graft.operators.TextOps.spanDedup(
        Tables.documents(s, d).withColumn("text",
          replace(replace(col("text"), lit(" query "), lit(".\n")),
            lit(" table "), lit("? \n"))),
        "doc_id", "text"),
      Some("""WITH aug AS (
        |  SELECT doc_id,
        |    replace(replace(text, ' query ', '.' || chr(10)), ' table ', '? ' || chr(10)) AS text
        |  FROM documents
        |), toks AS (
        |  SELECT doc_id, string_split(text, chr(10)) AS t FROM aug
        |), idx AS (
        |  SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks
        |), sp AS (
        |  SELECT doc_id, i, t[i] AS line, md5(trim(t[i])) AS fp FROM idx
        |), keep AS (
        |  SELECT doc_id, i, line,
        |    row_number() OVER (PARTITION BY fp ORDER BY doc_id, i) AS rn
        |  FROM sp
        |)
        |SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS deduped_text,
        |  CAST(count(*) AS BIGINT) AS kept_spans
        |FROM keep WHERE rn = 1 GROUP BY doc_id""".stripMargin)),

    // The same decontamination through the Bloom-prefilter scale path: the
    // probe expression drops non-eval shingles inside codegen before the
    // join, and the exact join kills false positives — result rows are
    // IDENTICAL to t7, so the oracle is shared verbatim.
    Q("t13_decontaminate_bloom",
      (s, d) => {
        val docs = Tables.documents(s, d)
        TextOps.contaminationBloom(docs, docs.where(col("doc_id") < 20),
            "doc_id", "text", n = 3, minShared = 2,
            expectedEvalShingles = 100000L)
          .where(col("doc_id") =!= col("eval_id"))
      },
      Some(s"""WITH $shingleCtes,
        |she AS (
        |  SELECT doc_id AS eval_id, sh FROM sh WHERE doc_id < 20
        |)
        |SELECT d.doc_id, e.eval_id, count(*) AS shared_ngrams
        |FROM sh d JOIN she e ON d.sh = e.sh
        |WHERE d.doc_id <> e.eval_id
        |GROUP BY d.doc_id, e.eval_id
        |HAVING count(*) >= 2""".stripMargin)),

    // ------------------------------------------------------------- multimodal
    // Real JPEG/PNG header decode over checked-in image-bytes fixtures (the
    // same bytes BlockFileSpec validates structurally): a spec-complete 5x3
    // RGB PNG, a minimal 7x4 greyscale JPEG, garbage, empty, truncated.
    Q("mm1_image_meta",
      (s, _) => {
        import s.implicits._
        val fixtures = Seq(
          (1L, "89504e470d0a1a0a0000000d4948445200000005000000030802000000d45452af" +
            "0000001b49444154789c6360e01291d330b2710b884ac9ab68ea6120c0070006" +
            "bf0c4fd192568a0000000049454e44ae426082"), // PNG 5x3 RGB
          (2L, "ffd8ffe000104a46494600010100000100010000ffc0000b080004000701011100ffd9"), // JPEG 7x4 grey
          (3L, "deadbeef"),
          (4L, ""),
          (5L, "89504e47") // truncated PNG signature
        ).toDF("media_id", "hex")
        graft.operators.Multimodal.decodeImageMeta(
          fixtures.select(col("media_id"), unhex(col("hex")).as("bytes")))
      },
      Some("""WITH expected(media_id, width, height, channels, valid) AS (VALUES
        | (1, 5, 3, 3, TRUE), (2, 7, 4, 1, TRUE),
        | (3, NULL, NULL, NULL, FALSE), (4, NULL, NULL, NULL, FALSE),
        | (5, NULL, NULL, NULL, FALSE))
        |SELECT CAST(media_id AS BIGINT) AS media_id, CAST(width AS INTEGER) AS width,
        |  CAST(height AS INTEGER) AS height, CAST(channels AS INTEGER) AS channels, valid
        |FROM expected""".stripMargin)),

    // Real WAV/RIFF header decode: PCM mono/stereo, a LIST metadata chunk
    // the walk must skip, garbage, truncated, and a RIFF-but-not-WAVE file.
    Q("mm2_audio_meta",
      (s, _) => {
        import s.implicits._
        val fmtMono8k = "666d74201000000001000100401f0000401f000001000800"
        val data8 = "6461746108000000deadbeefdeadbeef"
        val fixtures = Seq(
          (1L, "524946462c00000057415645" + fmtMono8k + data8), // mono 8kHz 8-bit, 8 B
          (2L, "524946463400000057415645" + // stereo 44.1kHz 16-bit, 16 B
            "666d7420100000000100020044ac000010b1020004001000" +
            "646174611000000000112233445566778899aabbccddeeff"),
          (3L, "524946463800000057415645" + "4c4953540400000049" +
            "4e464f" + fmtMono8k + data8), // LIST chunk before fmt
          (4L, "deadbeef"),
          (5L, "52494646"), // truncated
          (6L, "524946462c0000005741564d" + fmtMono8k + data8) // not WAVE
        ).toDF("media_id", "hex")
        graft.operators.Multimodal.decodeAudioMeta(
          fixtures.select(col("media_id"), unhex(col("hex")).as("bytes")))
      },
      Some("""WITH expected(media_id, channels, sample_rate, bits_per_sample, duration_ms, valid) AS (VALUES
        | (1, 1, 8000, 8, 1, TRUE), (2, 2, 44100, 16, 0, TRUE), (3, 1, 8000, 8, 1, TRUE),
        | (4, NULL, NULL, NULL, NULL, FALSE), (5, NULL, NULL, NULL, NULL, FALSE),
        | (6, NULL, NULL, NULL, NULL, FALSE))
        |SELECT CAST(media_id AS BIGINT) AS media_id, CAST(channels AS INTEGER) AS channels,
        |  CAST(sample_rate AS INTEGER) AS sample_rate,
        |  CAST(bits_per_sample AS INTEGER) AS bits_per_sample,
        |  CAST(duration_ms AS BIGINT) AS duration_ms, valid
        |FROM expected""".stripMargin)),

    // Real MP4/ISO-BMFF box walk: classic video file, legacy audio-only
    // (no ftyp), v1 mvhd/tkhd with a 64-bit-largesize mdat, garbage, a
    // truncated download whose moov size overruns the buffer, and a
    // header-only prefix with no moov.
    Q("mm3_video_meta",
      (s, _) => {
        import s.implicits._
        // Fixture bytes generated by an independent (Python struct) builder
        // of spec-conformant boxes; embedded verbatim.
        val fixtures = Seq(
          (1L, "000000186674797069736f6d0000000069736f6d6d703431000000d86d6f6f76" +
            "0000006c6d766864000000000000000000000000000003e8000009c400010000" +
            "0100000000000000000000000001000000000000000000000000000000010000" +
            "0000000000000000000000004000000000000000000000000000000000000000" +
            "000000000000000000000003000000647472616b0000005c746b686400000007" +
            "00000000000000000000000100000000000009c4000000000000000000000000" +
            "0000000000010000000000000000000000000000000100000000000000000000" +
            "00000000400000000140000000f000000000000c6d646174deadbeef"),
          (2L, "000000d86d6f6f760000006c6d7668640000000000000000000000000000ac44" +
            "0001588800010000010000000000000000000000000100000000000000000000" +
            "0000000000010000000000000000000000000000400000000000000000000000" +
            "0000000000000000000000000000000000000003000000647472616b0000005c" +
            "746b686400000007000000000000000000000001000000000001588800000000" +
            "0000000000000000010000000001000000000000000000000000000000010000" +
            "000000000000000000000000400000000000000000000000"),
          (3L, "00000018667479706d7034320000000069736f6d6d703431000000016d646174" +
            "00000000000000180000000000000000000001546d6f6f76000000786d766864" +
            "01000000000000000000000000000000000000000000025800000000000004d2" +
            "0001000001000000000000000000000000010000000000000000000000000000" +
            "0001000000000000000000000000000040000000000000000000000000000000" +
            "00000000000000000000000000000003000000647472616b0000005c746b6864" +
            "0000000700000000000000000000000100000000000004d20000000000000000" +
            "0000000001000000000100000000000000000000000000000001000000000000" +
            "0000000000000000400000000000000000000000000000707472616b00000068" +
            "746b686401000007000000000000000000000000000000000000000200000000" +
            "00000000000004d2000000000000000000000000000000000001000000000000" +
            "0000000000000000000100000000000000000000000000004000000007800000" +
            "04380000"),
          (4L, "deadbeef00000000"),
          (5L, "000000186674797069736f6d0000000069736f6d6d703431000010006d6f6f76" +
            "00000000000000000000000000000000"),
          (6L, "000000186674797069736f6d0000000069736f6d6d7034310000000c66726565" +
            "00000000")
        ).toDF("media_id", "hex")
        graft.operators.Multimodal.decodeVideoMeta(
          fixtures.select(col("media_id"), unhex(col("hex")).as("bytes")))
      },
      Some("""WITH expected(media_id, brand, duration_ms, width, height, track_count, valid) AS (VALUES
        | (1, 'isom', 2500, 320, 240, 1, TRUE),
        | (2, NULL, 2000, NULL, NULL, 1, TRUE),
        | (3, 'mp42', 2056, 1920, 1080, 2, TRUE),
        | (4, NULL, NULL, NULL, NULL, NULL, FALSE),
        | (5, NULL, NULL, NULL, NULL, NULL, FALSE),
        | (6, NULL, NULL, NULL, NULL, NULL, FALSE))
        |SELECT CAST(media_id AS BIGINT) AS media_id, brand,
        |  CAST(duration_ms AS BIGINT) AS duration_ms,
        |  CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
        |  CAST(track_count AS INTEGER) AS track_count, valid
        |FROM expected""".stripMargin)),

    // --------------------------------------------------------- label analytics
    Q("sim4_label_counts",
      (s, d) => Tables.embeddings(s, d)
        .groupBy("label").agg(count(lit(1)).as("n")),
      Some("SELECT label, count(*) AS n FROM embeddings GROUP BY label")),

    // ------------------------------------------- deterministic corpus sampling
    // The md5-derived 60-bit key makes every keep/drop decision recomputable
    // in SQL, so these carry full oracles despite being "random" samples.
    Q("ds1_stratified_sample",
      (s, d) => Sampling.stratifiedSample(Tables.documents(s, d), "doc_id",
        "lang", Map("en" -> 0.125, "zh" -> 1.0), defaultRate = 0.5),
      Some(s"""SELECT * FROM documents
        |WHERE CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) <
        |  CAST(floor((CASE lang WHEN 'en' THEN 0.125 WHEN 'zh' THEN 1.0 ELSE 0.5 END)
        |    * 1152921504606846976.0) AS BIGINT)""".stripMargin)),

    Q("ds2_per_stratum_sample",
      (s, d) => Sampling.perStratumSample(Tables.documents(s, d), "doc_id",
        "lang", k = 20),
      Some("""SELECT doc_id, text, lang, source, n_chars FROM (
        |  SELECT *, row_number() OVER (PARTITION BY lang
        |    ORDER BY CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT), doc_id) AS rn
        |  FROM documents) WHERE rn <= 20""".stripMargin)),

    Q("ds3_temperature_resample",
      (s, d) => Sampling.temperatureResample(Tables.documents(s, d), "doc_id",
        "lang"),
      Some("""WITH c AS (SELECT lang, count(*) AS n FROM documents
        |  WHERE lang IS NOT NULL GROUP BY lang),
        |r AS (SELECT lang, sqrt(CAST((SELECT min(n) FROM c) AS DOUBLE) / n) AS rate FROM c)
        |SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
        |FROM documents d JOIN r USING (lang)
        |WHERE CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) <
        |  CAST(floor(rate * 1152921504606846976.0) AS BIGINT)""".stripMargin)),

    // Gopher-style repetition counts (top token / top 2-gram / duplicated
    // 2-gram mass) — the repetition-rule quality gate, as exact counts.
    Q("t8_repetition",
      (s, d) => TextOps.repetitionMetrics(Tables.documents(s, d), "doc_id", "text"),
      Some("""WITH toks AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents
        |), tcnt AS (
        |  SELECT doc_id, tok, count(*) AS c
        |  FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY 1, 2
        |), tagg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_distinct_tokens,
        |    CAST(max(c) AS BIGINT) AS top_token_count
        |  FROM tcnt GROUP BY 1
        |), bcnt AS (
        |  SELECT doc_id, bg, count(*) AS c FROM (
        |    SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
        |    FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        |          FROM toks WHERE len(t) >= 2)
        |  ) GROUP BY 1, 2
        |), bagg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |    CAST(max(c) AS BIGINT) AS top_bigram_count,
        |    CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT) AS dup_bigram_count
        |  FROM bcnt GROUP BY 1
        |)
        |SELECT t.doc_id, t.n_tokens, t.n_distinct_tokens, t.top_token_count,
        |  CAST(coalesce(b.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  CAST(coalesce(b.top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
        |  CAST(coalesce(b.dup_bigram_count, 0) AS BIGINT) AS dup_bigram_count
        |FROM tagg t LEFT JOIN bagg b USING (doc_id)""".stripMargin)),

    // PII detect/scrub (t9/t10): the synthetic corpus carries no PII, so the
    // queries append a DETERMINISTIC doc_id-derived suffix (an email whose
    // local part embeds a dotted-quad — the overlap case — a phone, an IPv4)
    // before detecting/redacting; the oracle replays the same concat. t9
    // counts on the progressively-redacted text, so the embedded quad counts
    // as part of the email and never as an IP — counts equal exactly what
    // the redaction replaces.
    Q("t9_pii_metrics",
      (s, d) => TextOps.piiMetrics(
        Tables.documents(s, d).withColumn("text", piiAugmented),
        "doc_id", "text"),
      Some {
        val Seq((eP, eR), (iP, iR), (pP, _)) = TextOps.PiiPatterns
        s"""WITH aug AS ($piiAugmentSql),
           |r AS (
           |  SELECT doc_id, text AS t0,
           |    regexp_replace(text, '$eP', '$eR', 'g') AS t1,
           |    regexp_replace(regexp_replace(text, '$eP', '$eR', 'g'), '$iP', '$iR', 'g') AS t2
           |  FROM aug
           |)
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(t0, '$eP')) AS BIGINT) AS n_emails,
           |  CAST(len(regexp_extract_all(t1, '$iP')) AS BIGINT) AS n_ipv4,
           |  CAST(len(regexp_extract_all(t2, '$pP')) AS BIGINT) AS n_phones
           |FROM r""".stripMargin
      }),

    Q("t10_pii_redact",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), TextOps.piiRedact(piiAugmented).as("redacted")),
      Some {
        val folded = TextOps.PiiPatterns.foldLeft("text") {
          case (c, (pat, repl)) => s"regexp_replace($c, '$pat', '$repl', 'g')"
        }
        s"WITH aug AS ($piiAugmentSql)\nSELECT doc_id, $folded AS redacted FROM aug"
      }),

    // Fixed-size overlapping token chunks (32-token windows, stride 24) —
    // the doc → training-example splitter. chunk_id = start/stride since
    // starts are exactly the stride multiples below n_tokens.
    Q("t11_chunk_documents",
      (s, d) => TextOps.chunkDocuments(Tables.documents(s, d), "doc_id", "text"),
      Some("""WITH toks AS (
        |  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents WHERE text IS NOT NULL
        |), st AS (
        |  SELECT doc_id, t,
        |    unnest(generate_series(0, CAST(floor(CAST(len(t) - 1 AS DOUBLE) / 24) AS BIGINT) * 24, 24)) AS s
        |  FROM toks WHERE len(t) > 0
        |)
        |SELECT doc_id, CAST(s // 24 AS INT) AS chunk_id,
        |  CAST(len(t[s+1:s+32]) AS INT) AS n_tokens,
        |  array_to_string(t[s+1:s+32], ' ') AS chunk_text
        |FROM st""".stripMargin)),

    // C4-style line filter: the corpus is single-line, so the query first
    // line-ifies it deterministically (literal replaces shared with the
    // oracle: ' query ' → sentence break, ' table ' → '? ' + newline — the
    // trailing-space case the rtrim fix exists for), then keeps lines with
    // >= 5 words ending in terminal punctuation.
    Q("t12_filter_lines",
      (s, d) => TextOps.filterLines(
        Tables.documents(s, d).withColumn("text",
          replace(replace(col("text"), lit(" query "), lit(".\n")),
            lit(" table "), lit("? \n"))),
        "doc_id", "text"),
      Some("""WITH aug AS (
        |  SELECT doc_id,
        |    replace(replace(text, ' query ', '.' || chr(10)), ' table ', '? ' || chr(10)) AS text
        |  FROM documents
        |), ls AS (
        |  SELECT doc_id, string_split(text, chr(10)) AS lines FROM aug
        |), kept AS (
        |  SELECT doc_id, lines,
        |    list_filter(lines, l -> regexp_matches(rtrim(l), '[.!?"'']$')
        |      AND len(string_split_regex(trim(l), '\s+')) >= 5) AS k
        |  FROM ls
        |)
        |SELECT doc_id, CAST(len(lines) AS INT) AS total_lines,
        |  CAST(len(k) AS INT) AS kept_lines,
        |  CASE WHEN lines IS NULL THEN NULL
        |       ELSE coalesce(array_to_string(k, chr(10)), '') END AS filtered_text
        |FROM kept""".stripMargin)),

    // Deterministic train/val/test split + output shard: the corpus-freeze
    // step of a training run. Hash-range splits are growth-stable (a doc
    // never migrates between splits as the corpus grows — what keeps eval
    // sets honest) and shard = pmod(key) needs no global sort. Both laws
    // are row-level oracle-checked; the threshold longs are computed ONCE
    // driver-side and embedded in both engines, so there is no
    // double-accumulation drift to reconcile.
    {
      val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
      val cuts = Sampling.splitCutKeys(splits)
      Q("ds4_split_shard",
        (s, d) => Sampling.shardAssign(
          Sampling.splitAssign(Tables.documents(s, d), "doc_id", splits),
          "doc_id", numShards = 8)
          .select("doc_id", "lang", "split", "shard"),
        Some(s"""WITH keyed AS (
          |  SELECT doc_id, lang,
          |    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) AS k,
          |    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 15)) AS UBIGINT) AS BIGINT) AS ks
          |  FROM documents
          |)
          |SELECT doc_id, lang,
          |  CASE WHEN ks < ${cuts(0)} THEN 'train'
          |       WHEN ks < ${cuts(1)} THEN 'val'
          |       ELSE 'test' END AS split,
          |  k % 8 AS shard
          |FROM keyed""".stripMargin))
    },

    // Sequence-packing layout: concat-and-chunk docs into 512-token training
    // sequences, per shard in deterministic hash order. Integer-only window
    // arithmetic — full row-level oracle.
    Q("ds5_pack_sequences",
      (s, d) => Sampling.packSequences(Tables.documents(s, d), "doc_id", "text",
        numShards = 4, seqLen = 512),
      Some("""WITH keyed AS (
        |  SELECT doc_id,
        |    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) AS k,
        |    CAST(len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), laid AS (
        |  SELECT doc_id, k % 4 AS shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY k % 4 ORDER BY k, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum_end
        |  FROM keyed
        |)
        |SELECT doc_id, shard, n_tokens,
        |  CAST((cum_end - n_tokens) // 512 AS BIGINT) AS pack_id,
        |  CAST((cum_end - n_tokens) % 512 AS BIGINT) AS pack_offset
        |FROM laid""".stripMargin)),

    // Token-budget freeze: per shard, the greedy hash-order prefix of docs
    // starting inside a 2000-token budget (the "train on N tokens" cut),
    // straddling doc kept. Integer-only window arithmetic — full oracle.
    Q("ds6_token_budget",
      (s, d) => Sampling.tokenBudget(Tables.documents(s, d), "doc_id", "text",
        numShards = 4, budgetPerShard = 2000L),
      Some("""WITH keyed AS (
        |  SELECT doc_id,
        |    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) AS k,
        |    CAST(len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), laid AS (
        |  SELECT doc_id, k % 4 AS shard, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY k % 4 ORDER BY k, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum_end
        |  FROM keyed
        |)
        |SELECT doc_id, shard, n_tokens,
        |  CAST(cum_end - n_tokens AS BIGINT) AS tokens_before
        |FROM laid WHERE cum_end - n_tokens < 2000""".stripMargin)),

    // Domain-mixture rebalance: largest subset hitting a 4:2:1 en:de:zh
    // target exactly (up to integer floor). Integer mixture parts keep the
    // whole selection in exact arithmetic — full row-level oracle. The
    // engine side never windows the corpus by domain: a (domain, hash-range)
    // count cube decides buckets wholesale and ranks only the boundary
    // bucket (see Sampling.mixToTarget).
    Q("ds7_domain_mixture",
      (s, d) => Sampling.mixToTarget(Tables.documents(s, d), "doc_id",
        "lang", Map("en" -> 4L, "de" -> 2L, "zh" -> 1L)),
      Some("""WITH k AS (
        |  SELECT *, CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) AS hkey,
        |    CASE lang WHEN 'en' THEN 4 WHEN 'de' THEN 2 WHEN 'zh' THEN 1 END AS p
        |  FROM documents WHERE lang IN ('en', 'de', 'zh')),
        |c AS (SELECT lang, p, count(*) AS n FROM k GROUP BY lang, p),
        |nt AS (SELECT CAST(min(floor(n * 7.0 / p)) AS BIGINT) AS ntot FROM c),
        |t AS (SELECT lang, CAST(floor(p * 1.0 * ntot / 7) AS BIGINT) AS tq FROM c, nt),
        |r AS (SELECT k.*, row_number() OVER (PARTITION BY k.lang ORDER BY hkey, doc_id) AS rn FROM k)
        |SELECT doc_id, text, lang, source, n_chars
        |FROM r JOIN t USING (lang) WHERE rn <= tq""".stripMargin)),

    // Hashed-linear quality classifier (fastText-shaped): mean md5-derived
    // token weight, integer until the last divide — the weight table is the
    // declared deterministic stand-in for trained weights; the hashing-trick
    // plumbing is the operator. Narrow map, full row-level oracle.
    Q("t14_classifier_score",
      (s, d) => TextOps.classifierScore(Tables.documents(s, d), "doc_id", "text"),
      Some("""SELECT doc_id, n_tokens, score_i,
        |  round(score_i / (n_tokens * 1000.0), 6) AS score,
        |  score_i > 0 AS keep
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(list_sum(list_transform(toks,
        |      t -> CAST(CAST(('0x' || substring(md5('qc1:' || t), 1, 15)) AS UBIGINT) AS BIGINT) % 2001 - 1000)) AS BIGINT) AS score_i
        |  FROM (SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents))""".stripMargin)),

    // Character-bigram surprisal: CCNet-shaped two-pass LM quality score
    // with the corpus as its own model, in integer floor-log2 bits so both
    // engines agree bit-for-bit. Docs under 2 chars have no bigrams and no
    // row.
    Q("t15_bigram_surprisal",
      (s, d) => TextOps.bigramSurprisal(Tables.documents(s, d), "doc_id", "text"),
      Some("""WITH big AS (
        |  SELECT doc_id, substring(trim(text), CAST(i AS INT), 2) AS bg
        |  FROM documents, UNNEST(range(1, length(trim(text)))) AS u(i)),
        |cnt AS (SELECT bg, count(*) AS c FROM big GROUP BY bg),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tt FROM cnt)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  CAST(SUM(length(bin(tt)) - length(bin(c))) AS BIGINT) AS surprisal_bits,
        |  round(SUM(length(bin(tt)) - length(bin(c))) * 1.0 / count(*), 6) AS bits_per_bigram
        |FROM big JOIN cnt USING (bg) CROSS JOIN tot GROUP BY doc_id""".stripMargin)),

    // Greedy sequence packing — documents packed whole into 256-token
    // training sequences (boundary-respecting, vs ds5's concat-and-chunk),
    // shard-parallel (sequential only within shard). The oracle replays the
    // same greedy recurrence as a recursive CTE: rn-ordered per-shard
    // iteration, new sequence exactly when fill would exceed ctx.
    Q("t16_sequence_packing",
      (s, d) => TextOps.packGreedy(Tables.documents(s, d), "doc_id", "text",
        ctxLen = 256, nShards = 8),
      Some("""WITH RECURSIVE tok AS (
        |  SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
        |    CAST(len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS INT) AS n_tokens,
        |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
        |  FROM documents),
        |pack AS (
        |  SELECT doc_id, shard, n_tokens, rn,
        |    CAST(0 AS BIGINT) AS seq_id, CAST(1 AS INT) AS pos_in_seq,
        |    CAST(n_tokens AS BIGINT) AS fill_after
        |  FROM tok WHERE rn = 1
        |  UNION ALL
        |  SELECT t.doc_id, t.shard, t.n_tokens, t.rn,
        |    CASE WHEN p.fill_after + t.n_tokens > 256 THEN p.seq_id + 1 ELSE p.seq_id END,
        |    CAST(CASE WHEN p.fill_after + t.n_tokens > 256 THEN 1 ELSE p.pos_in_seq + 1 END AS INT),
        |    CASE WHEN p.fill_after + t.n_tokens > 256 THEN CAST(t.n_tokens AS BIGINT)
        |         ELSE p.fill_after + t.n_tokens END
        |  FROM pack p JOIN tok t ON t.shard = p.shard AND t.rn = p.rn + 1)
        |SELECT doc_id, shard, n_tokens, seq_id, pos_in_seq, fill_after FROM pack""".stripMargin)),

    // Flagship curation pipeline from raw documents: exact dedup (keep the
    // min-id copy) → quality gate (token count + punctuation ratio) →
    // temperature rebalance across languages. The whole chain — including
    // the "random" sample — is bit-reproducible, so it carries a full
    // row-level oracle: the documents analogue of bk0_e2e_pipeline.
    Q("p0_curation_pipeline",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // dedup on the digest, not the text: the shuffle ships 32 hex chars
        // per row instead of whole documents (the d2 fingerprint shape; the
        // oracle groups the same digest, so equivalence is by construction)
        val keep = docs.groupBy(md5(col("text")).as("_fp"))
          .agg(min("doc_id").as("doc_id"))
        val surviving = docs.join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
        val quality = surviving.join(
          TextOps.qualityMetrics(surviving, "doc_id", "text")
            .where(col("n_tokens") >= 5 && col("punct_ratio") <= 0.2)
            .select("doc_id"),
          Seq("doc_id"), "left_semi")
        Sampling.temperatureResample(quality, "doc_id", "lang")
          .select("doc_id", "lang", "source")
      },
      Some("""WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |s AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
        |q AS (
        |  SELECT doc_id, lang, source FROM s
        |  WHERE len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) >= 5
        |    AND CAST(length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS DOUBLE)
        |        / length(text) <= 0.2
        |), c AS (SELECT lang, count(*) AS n FROM q WHERE lang IS NOT NULL GROUP BY lang),
        |r AS (SELECT lang, sqrt(CAST((SELECT min(n) FROM c) AS DOUBLE) / n) AS rate FROM c)
        |SELECT q.doc_id, q.lang, q.source FROM q JOIN r USING (lang)
        |WHERE CAST(CAST(('0x' || substring(md5(CAST(q.doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) <
        |  CAST(floor(rate * 1152921504606846976.0) AS BIGINT)""".stripMargin)),

    // The complete corpus FREEZE, end-to-end: p0's curation (dedup →
    // quality gate → temperature rebalance) → train/val/test split → the
    // train split's packed-sequence layout. Every stage is deterministic,
    // so the final row-level layout — which pack of which shard each
    // surviving train doc's tokens land in — carries a full oracle. This is
    // the whole §2.11 pipeline composed into the artifact a training job
    // actually consumes.
    {
      val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
      val cut0 = Sampling.splitCutKeys(splits).head
      Q("p2_corpus_freeze",
        (s, d) => {
          val docs = Tables.documents(s, d)
          val keep = docs.groupBy(md5(col("text")).as("_fp"))
            .agg(min("doc_id").as("doc_id"))
          val surviving = docs.join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
          val quality = surviving.join(
            TextOps.qualityMetrics(surviving, "doc_id", "text")
              .where(col("n_tokens") >= 5 && col("punct_ratio") <= 0.2)
              .select("doc_id"),
            Seq("doc_id"), "left_semi")
          val curated = Sampling.temperatureResample(quality, "doc_id", "lang")
          val train = Sampling.splitAssign(curated, "doc_id", splits)
            .where(col("split") === "train")
          Sampling.packSequences(train, "doc_id", "text", numShards = 4, seqLen = 512)
        },
        Some(s"""WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
          |s AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
          |q AS (
          |  SELECT doc_id, lang, text FROM s
          |  WHERE len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) >= 5
          |    AND CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE)
          |        / length(text) <= 0.2
          |), c AS (SELECT lang, count(*) AS n FROM q WHERE lang IS NOT NULL GROUP BY lang),
          |r AS (SELECT lang, sqrt(CAST((SELECT min(n) FROM c) AS DOUBLE) / n) AS rate FROM c),
          |keyed AS (
          |  SELECT q.doc_id, q.text,
          |    CAST(CAST(('0x' || substring(md5(CAST(q.doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) AS k,
          |    CAST(CAST(('0x' || substring(md5(CAST(q.doc_id AS VARCHAR) || ':split'), 1, 15)) AS UBIGINT) AS BIGINT) AS ks
          |  FROM q JOIN r USING (lang)
          |  WHERE CAST(CAST(('0x' || substring(md5(CAST(q.doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) <
          |    CAST(floor(rate * 1152921504606846976.0) AS BIGINT)
          |), train AS (
          |  SELECT doc_id, k,
          |    CAST(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_tokens
          |  FROM keyed WHERE ks < $cut0
          |), laid AS (
          |  SELECT doc_id, k % 4 AS shard, n_tokens,
          |    sum(n_tokens) OVER (PARTITION BY k % 4 ORDER BY k, doc_id
          |      ROWS UNBOUNDED PRECEDING) AS cum_end
          |  FROM train
          |)
          |SELECT doc_id, shard, n_tokens,
          |  CAST((cum_end - n_tokens) // 512 AS BIGINT) AS pack_id,
          |  CAST((cum_end - n_tokens) % 512 AS BIGINT) AS pack_offset
          |FROM laid""".stripMargin))
    },

    // JSONL ingestion front: typed documents out of a crawl-dump file, junk
    // lines quarantined (spec-gated: DocSourceSpec). The oracle reads the
    // SAME fixture file with DuckDB's newline-delimited JSON reader — both
    // engines apply the identical acceptance predicate (doc_id parses).
    Q("s8_jsonl_ingest",
      (s, _) => DocSource.readJsonl(s, jsonlFixture)._1,
      Some("""SELECT doc_id, text, lang, source FROM read_json('/tmp/graft_s8/docs.jsonl',
        |  format='newline_delimited', ignore_errors=true,
        |  columns={'doc_id':'BIGINT','text':'VARCHAR','lang':'VARCHAR','source':'VARCHAR'})
        |WHERE doc_id IS NOT NULL""".stripMargin)),

    // Round-9 curation front as ONE dataflow: exact dedup → hashed-linear
    // classifier gate → exact 4:2:1 domain mixture → deterministic shards.
    // Every stage is individually oracled (d1/t14/ds7/ds4); this composes
    // them end-to-end with a full row-level oracle — the "mix a training
    // corpus to recipe" counterpart of p2's temperature freeze.
    Q("p3_mixture_freeze",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val keep = docs.groupBy(md5(col("text")).as("_fp"))
          .agg(min("doc_id").as("doc_id"))
        val surviving = docs.join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
        val classed = surviving.join(
          TextOps.classifierScore(surviving, "doc_id", "text")
            .where(col("keep")).select("doc_id"),
          Seq("doc_id"), "left_semi")
        val mixed = Sampling.mixToTarget(classed, "doc_id", "lang",
          Map("en" -> 4L, "de" -> 2L, "zh" -> 1L))
        Sampling.shardAssign(mixed, "doc_id", numShards = 8)
          .select("doc_id", "lang", "source", "shard")
      },
      Some("""WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |s AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
        |cls AS (
        |  SELECT doc_id, text, lang, source FROM (
        |    SELECT *, CAST(list_sum(list_transform(
        |      string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |      t -> CAST(CAST(('0x' || substring(md5('qc1:' || t), 1, 15)) AS UBIGINT) AS BIGINT) % 2001 - 1000)) AS BIGINT) AS score_i
        |    FROM s) WHERE score_i > 0),
        |k AS (
        |  SELECT *, CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) AS hkey,
        |    CASE lang WHEN 'en' THEN 4 WHEN 'de' THEN 2 WHEN 'zh' THEN 1 END AS p
        |  FROM cls WHERE lang IN ('en', 'de', 'zh')),
        |c AS (SELECT lang, p, count(*) AS n FROM k GROUP BY lang, p),
        |nt AS (SELECT CAST(min(floor(n * 7.0 / p)) AS BIGINT) AS ntot FROM c),
        |t AS (SELECT lang, CAST(floor(p * 1.0 * ntot / 7) AS BIGINT) AS tq FROM c, nt),
        |r AS (SELECT k.*, row_number() OVER (PARTITION BY k.lang ORDER BY hkey, doc_id) AS rn FROM k)
        |SELECT doc_id, lang, source, hkey % 8 AS shard
        |FROM r JOIN t USING (lang) WHERE rn <= tq""".stripMargin)),

    // Multimodal → ANN end-to-end: opaque blobs → content embedding
    // (byte-histogram × fixed JL sign projection, the declared model-stub
    // boundary) → IVF approximate top-k. The whole chain is deterministic
    // but the scores are engine-defined floats and the top-k approximate —
    // rows-only gate here; recall >= 0.9 vs brute force over the SAME
    // embeddings is spec-gated in SimilaritySpec, and embedMedia itself is
    // property-tested (unit norm, determinism, content sensitivity).
    Q("p1_media_pipeline",
      (s, d) => {
        val media = Tables.documents(s, d)
          .select(col("doc_id").as("media_id"), col("text").cast("binary").as("bytes"))
        val emb = graft.operators.Multimodal.embedMedia(media, dim = 16)
        val queries = emb.filter(col("media_id") < 10)
        Similarity.ivfTopK(emb, queries, "media_id", "embedding", k = 5,
          nlist = 64, nprobe = 40)
          .select(col("query_id"), col("media_id"), col("rank"))
      },
      None)
  )
}
