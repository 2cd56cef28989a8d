package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.algo.{Components, LabelProp, PageRank, Triangles}
import graft.derive.Derive
import graft.graph.GraphOps
import graft.synth.Synth
import graft.walk.Walk
import graft.text.TextOps
import graft.ann.Ann
import graft.multimodal.MultiModal

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query runs over the driver's events table reshaped into the
  * BASELINE.json transcript shape ([[Synth.eventsAsTranscripts]]) and the
  * edge table derived from it ([[Derive.edges]]); each SQL-expressible
  * query has a DuckDB twin in [[oracleSql]] built over the *same*
  * derivation CTE, with every computed column aliased identically.
  */
object SparkEntry {

  /** Transcript-derived edge table of a testdata dir. */
  def eventEdges(spark: SparkSession, sfDir: String): DataFrame =
    Derive.edges(Synth.eventsAsTranscripts(spark, sfDir))

  /** Flagship query on /root/testdata/sf0.001: PageRank over the
    * transcript-derived link graph, top-20 vertices. */
  def entry(spark: SparkSession): DataFrame = {
    val edges = eventEdges(spark, "/root/testdata/sf0.001")
    PageRank.run(edges, tol = 1e-6, maxIter = 60)
      .orderBy(col("rank").desc, col("v"))
      .limit(20)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_edges" -> ((s, dir) =>
      eventEdges(s, dir)
        .select(col("src"), col("dst"), col("weight").cast("long").as("weight"))
        .orderBy("src", "dst")),

    "q_degrees" -> ((s, dir) =>
      GraphOps.degrees(eventEdges(s, dir)).toDF()
        .select(col("v"), col("outDeg").as("out_deg"), col("inDeg").as("in_deg"),
          col("outW").cast("long").as("out_w"))
        .orderBy("v")),

    "q_pagerank" -> ((s, dir) =>
      PageRank.run(eventEdges(s, dir), fixedIter = Some(10))
        .select(col("v"), round(col("rank") * 1e9).cast("long").as("rank_e9"))
        .orderBy("v")),

    "q_pagerank_conv" -> ((s, dir) =>
      // to convergence (north-rule tolerance 1e-6); no SQL oracle —
      // convergence-checked in ScalaTest against dense power iteration
      PageRank.run(eventEdges(s, dir), tol = 1e-6, maxIter = 60)
        .select(col("v"), round(col("rank") * 1e9).cast("long").as("rank_e9"))
        .orderBy("v")),

    "q_cc_conv" -> ((s, dir) =>
      Components.run(Derive.successionEdges(Synth.eventsAsTranscripts(s, dir)))
        .select(col("v"), col("comp"))
        .orderBy("v")),

    "q_cc" -> ((s, dir) =>
      Components.run(eventEdges(s, dir))
        .select(col("v"), col("comp"))
        .orderBy("v")),

    "q_lpa" -> ((s, dir) =>
      LabelProp.run(eventEdges(s, dir), iters = 3)
        .select(col("v"), col("label"))
        .orderBy("v")),

    "q_degree_hist" -> ((s, dir) =>
      // out-degree distribution — the power-law check for the link graph
      GraphOps.degrees(eventEdges(s, dir)).toDF()
        .groupBy(col("outDeg").as("out_deg"))
        .agg(count(lit(1)).as("n_vertices"))
        .orderBy("out_deg")),

    "q_cc_sizes" -> ((s, dir) =>
      // component-size distribution over the succession subgraph
      Components.run(Derive.successionEdges(Synth.eventsAsTranscripts(s, dir)))
        .groupBy("comp").agg(count(lit(1)).as("size"))
        .groupBy("size").agg(count(lit(1)).as("n_components"))
        .orderBy("size")),

    "q_triangles" -> ((s, dir) => Triangles.count(eventEdges(s, dir))),

    "q_triangles_vertex" -> ((s, dir) =>
      Triangles.perVertex(eventEdges(s, dir)).orderBy("v")),

    // walk queries: deterministic (hash-RNG) but not SQL-expressible →
    // rows-only driver check; distribution correctness is in WalkSpec
    "q_deepwalk" -> ((s, dir) => {
      val edges = eventEdges(s, dir)
      val starts = Walk.equalStarts(edges, 2000)
      Walk.pathStrings(Walk.firstOrder(edges, starts, maxSteps = 8, seed = 42))
        .orderBy("walkerId")
    }),

    "q_ppr_visits" -> ((s, dir) => {
      val edges = eventEdges(s, dir)
      val starts = Walk.uniformStarts(edges, 2000, seed = 42)
      Walk.visitCounts(
          Walk.firstOrderChained(edges, starts, maxSteps = 40, keepProb = 0.85, seed = 42))
        .orderBy("v")
    }),

    "q_node2vec" -> ((s, dir) => {
      val edges = eventEdges(s, dir)
      val starts = Walk.equalStarts(edges, 2000)
      Walk.pathStrings(Walk.node2vec(edges, starts, maxSteps = 6, p = 2.0, q = 0.5, seed = 42))
        .orderBy("walkerId")
    }),

    "q_metapath" -> ((s, dir) => {
      // heterogeneous walk: edge type = role-transition class of the edge
      // (derived deterministically); scheme alternates types 0,1 / only 2
      val edges = eventEdges(s, dir)
        .withColumn("etype", pmod(xxhash64(col("src"), col("dst")), lit(3)).cast("int"))
      val schemes = Seq(
        Seq(Seq(true, false, false), Seq(false, true, false)),
        Seq(Seq(false, false, true)))
      val starts = Walk.equalStarts(edges, 2000)
      Walk.pathStrings(Walk.metapath(edges, starts, schemes, maxSteps = 5, seed = 42))
        .orderBy("walkerId")
    }),

    // ------------- training-data pipeline ops (documents / embeddings) --

    "q_doc_tokens" -> ((s, dir) =>
      TextOps.tokenCounts(docs(s, dir)).orderBy("doc_id")),

    "q_doc_quality" -> ((s, dir) =>
      TextOps.qualityScores(docs(s, dir)).orderBy("doc_id")),

    "q_doc_langid" -> ((s, dir) =>
      TextOps.langId(docs(s, dir)).orderBy("doc_id")),

    "q_doc_dedup" -> ((s, dir) =>
      TextOps.exactDupGroups(docs(s, dir)).orderBy("fp")),

    "q_ngram_jaccard" -> ((s, dir) =>
      // brute-force reference bounded to doc_id<1000 (exact oracle at any sf)
      TextOps.ngramJaccardPairs(docs(s, dir).filter(col("doc_id") < 1000), n = 3, threshold = 0.1)
        .orderBy("doc_a", "doc_b")),

    "q_minhash_lsh" -> ((s, dir) =>
      // scale path for near-dup: rows-only check; recall tested in PipelineSpec
      TextOps.minhashLshPairs(docs(s, dir), threshold = 0.5).orderBy("doc_a", "doc_b")),

    "q_simhash" -> ((s, dir) =>
      TextOps.simhashPairs(docs(s, dir), maxDist = 3).orderBy("doc_a", "doc_b")),

    "q_doc_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), TextOps.rollingHash(col("text")).as("fp64"))
        .orderBy("doc_id")),

    "q_ann_topk" -> ((s, dir) => {
      val emb = embeds(s, dir)
      Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("cos_e4"))
        .orderBy("query_id", "rank")
    }),

    "q_embed_neardup" -> ((s, dir) =>
      Ann.bruteForceNearDupPairs(embeds(s, dir).filter(col("vec_id") < 1000), threshold = 0.35)
        .orderBy("vec_a", "vec_b")),

    "q_ann_lsh_topk" -> ((s, dir) => {
      val emb = embeds(s, dir)
      Ann.lshTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
        .orderBy("query_id", "rank")
    }),

    "q_mm_features" -> ((s, dir) =>
      MultiModal.extractFeatures(MultiModal.syntheticAssets(docs(s, dir))).toDF()
        .select(col("asset_id"), col("kind"), col("n_bytes"),
          round(aggregate(col("features"), lit(0.0), (a, x) => a + x.cast("double")) * 1e4)
            .cast("long").as("featsum_e4"))
        .orderBy("asset_id")),

    "q_mm_frames" -> ((s, dir) =>
      MultiModal.sampleFrames(MultiModal.syntheticAssets(docs(s, dir))).toDF()
        .select(col("asset_id"), col("frame_idx"), col("offset"))
        .orderBy("asset_id", "frame_idx")),
  )

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embeds(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  // ---------------------------------------------------------------- oracle

  /** Shared DuckDB CTE mirroring Synth.eventsAsTranscripts + Derive.edges
    * exactly (same thresholds, same window orderings — note conv_id is the
    * VARCHAR cast of user_id, so tool-chain ordering is lexicographic in
    * both engines). */
  private val derivationCte: String =
    s"""WITH t AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS turn_idx,
         event_type AS role,
         CASE WHEN value > ${Synth.ToolValueThreshold} THEN event_type END AS tool,
         user_id * ${Synth.VidStride} + (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) AS vid
  FROM events
), succ AS MATERIALIZED (
  SELECT * FROM (
    SELECT lag(vid) OVER w AS src, vid AS dst,
           lag(role) OVER w AS prev_role, role AS cur_role
    FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
  ) WHERE src IS NOT NULL
), tooluse AS MATERIALIZED (
  SELECT * FROM (
    SELECT vid, tool, row_number() OVER (PARTITION BY tool ORDER BY conv_id, turn_idx) AS rn
    FROM t WHERE tool IS NOT NULL
  ) WHERE rn <= ${Derive.MaxToolChain}
), toolchain AS MATERIALIZED (
  SELECT * FROM (
    SELECT lag(vid) OVER (PARTITION BY tool ORDER BY rn) AS src, vid AS dst FROM tooluse
  ) WHERE src IS NOT NULL
), skipp AS MATERIALIZED (
  SELECT * FROM (
    SELECT lag(vid, 2) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS src, vid AS dst FROM t
  ) WHERE src IS NOT NULL
), alledges AS (
  SELECT src, dst, 1 AS w FROM succ
  UNION ALL SELECT src, dst, 2 AS w FROM succ WHERE prev_role <> cur_role
  UNION ALL SELECT src, dst, 1 AS w FROM toolchain
  UNION ALL SELECT src, dst, 1 AS w FROM skipp
), edges AS MATERIALIZED (
  SELECT src, dst, CAST(SUM(w) AS DOUBLE) AS weight FROM alledges WHERE src <> dst GROUP BY 1, 2
)"""

  /** Graph-prep CTEs shared by pagerank/cc/lpa oracles. */
  private val graphCte: String =
    """, verts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges)
), outw AS MATERIALIZED (
  SELECT src, SUM(weight) AS ow FROM edges GROUP BY 1
), nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)"""

  /** Unrolled 10-iteration PageRank (DuckDB 1.0 has no aggregates in
    * recursive CTEs, so fixed iterations are unrolled; the Spark side
    * runs the identical fixed count). */
  private def pagerankSql(iters: Int, alpha: Double = 0.85): String = {
    val prep = derivationCte + graphCte +
      """, trans AS MATERIALIZED (
  SELECT e.src, e.dst, e.weight / o.ow AS p FROM edges e JOIN outw o ON e.src = o.src
), vflag AS MATERIALIZED (
  SELECT v.v, (o.src IS NOT NULL) AS has_out FROM verts v LEFT JOIN outw o ON v.v = o.src
), r0 AS MATERIALIZED (
  SELECT v, has_out, 1.0 / (SELECT n FROM nn) AS rank FROM vflag
)"""
    val steps = (1 to iters).map { k =>
      val prev = s"r${k - 1}"
      s""", r$k AS MATERIALIZED (
  SELECT f.v, f.has_out,
         (1 - $alpha) / (SELECT n FROM nn)
         + $alpha * (COALESCE(c.c, 0)
                     + (SELECT COALESCE(SUM(rank), 0) FROM $prev WHERE NOT has_out) / (SELECT n FROM nn)) AS rank
  FROM vflag f
  LEFT JOIN (
    SELECT tr.dst AS v, SUM(tr.p * p.rank) AS c
    FROM trans tr JOIN $prev p ON tr.src = p.v GROUP BY 1
  ) c ON f.v = c.v
)"""
    }.mkString
    prep + steps +
      s"\nSELECT v, CAST(ROUND(rank * 1e9) AS BIGINT) AS rank_e9 FROM r$iters ORDER BY v"
  }

  /** Connected components via a recursive CTE (min reachable vertex id)
    * over either the succession-only chain subgraph (`succ`) or the full
    * weighted edge table (`edges`). The recursion materializes O(Σ size²)
    * (v, smaller-reachable-label) pairs — exact and fine at oracle scale
    * (~10M pairs at sf0.01, <1 s in DuckDB). */
  private def ccSql(undFrom: String): String =
    "WITH RECURSIVE " + derivationCte.stripPrefix("WITH ") +
      s""", und AS MATERIALIZED (
  SELECT src, dst FROM $undFrom UNION SELECT dst AS src, src AS dst FROM $undFrom
), sverts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT src AS v FROM und UNION ALL SELECT dst FROM und)
), reach(v, l) AS (
  SELECT v, v FROM sverts
  UNION
  SELECT u.dst, r.l FROM und u JOIN reach r ON u.src = r.v WHERE r.l < u.dst
)
SELECT v, MIN(l) AS comp FROM reach GROUP BY v ORDER BY v"""

  private val ccConvSql: String = ccSql("succ")

  /** LPA, `iters` unrolled synchronous rounds, integer weights, smallest-
    * label tie-break — mirrors graft.algo.LabelProp exactly. */
  private def lpaSql(iters: Int): String = {
    val prep = derivationCte +
      """, und AS MATERIALIZED (
  SELECT src, dst, CAST(weight AS BIGINT) AS w FROM edges
  UNION ALL SELECT dst AS src, src AS dst, CAST(weight AS BIGINT) AS w FROM edges
), verts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges)
), l0 AS MATERIALIZED (SELECT v, v AS label FROM verts)"""
    val steps = (1 to iters).map { k =>
      val prev = s"l${k - 1}"
      s""", l$k AS MATERIALIZED (
  SELECT v, label FROM (
    SELECT u.dst AS v, p.label AS label, SUM(u.w) AS wt,
           row_number() OVER (PARTITION BY u.dst ORDER BY SUM(u.w) DESC, p.label ASC) AS rn
    FROM und u JOIN $prev p ON u.src = p.v
    GROUP BY u.dst, p.label
  ) WHERE rn = 1
)"""
    }.mkString
    prep + steps + s"\nSELECT v, label FROM l$iters ORDER BY v"
  }

  private val trianglesCte: String =
    derivationCte +
      """, ue AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges WHERE src <> dst
), tris AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ue e1 JOIN ue e2 ON e1.b = e2.a
  WHERE EXISTS (SELECT 1 FROM ue e3 WHERE e3.a = e1.a AND e3.b = e2.b)
)"""

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (convergence loops, full-graph CC) → driver records rows-only. */
  def oracleSql: Map[String, String] = Map(
    "q_edges" ->
      (derivationCte +
        "\nSELECT src, dst, CAST(weight AS BIGINT) AS weight FROM edges ORDER BY src, dst"),

    "q_degrees" ->
      (derivationCte +
        """
SELECT COALESCE(o.v, i.v) AS v,
       CAST(COALESCE(o.out_deg, 0) AS BIGINT) AS out_deg,
       CAST(COALESCE(i.in_deg, 0) AS BIGINT) AS in_deg,
       CAST(COALESCE(o.out_w, 0) AS BIGINT) AS out_w
FROM (SELECT src AS v, COUNT(*) AS out_deg, SUM(weight) AS out_w FROM edges GROUP BY 1) o
FULL OUTER JOIN (SELECT dst AS v, COUNT(*) AS in_deg FROM edges GROUP BY 1) i ON o.v = i.v
ORDER BY v"""),

    "q_pagerank" -> pagerankSql(10),

    "q_cc_conv" -> ccConvSql,

    "q_cc" -> ccSql("edges"),

    "q_degree_hist" ->
      (derivationCte + """
, degs AS (
  SELECT COALESCE(o.v, i.v) AS v, COALESCE(o.out_deg, 0) AS out_deg
  FROM (SELECT src AS v, COUNT(*) AS out_deg FROM edges GROUP BY 1) o
  FULL OUTER JOIN (SELECT DISTINCT dst AS v FROM edges) i ON o.v = i.v)
SELECT CAST(out_deg AS BIGINT) AS out_deg, COUNT(*) AS n_vertices
FROM degs GROUP BY 1 ORDER BY out_deg"""),

    "q_cc_sizes" ->
      (ccConvSql
        .replace("SELECT v, MIN(l) AS comp FROM reach GROUP BY v ORDER BY v",
          """SELECT size, COUNT(*) AS n_components FROM (
  SELECT comp, COUNT(*) AS size FROM (
    SELECT v, MIN(l) AS comp FROM reach GROUP BY v
  ) GROUP BY comp
) GROUP BY size ORDER BY size""")),

    "q_lpa" -> lpaSql(3),

    "q_triangles" ->
      (trianglesCte + "\nSELECT COUNT(*) AS triangles FROM tris"),

    "q_triangles_vertex" ->
      (trianglesCte +
        """
SELECT v, COUNT(*) AS triangles FROM (
  SELECT x AS v FROM tris UNION ALL SELECT y FROM tris UNION ALL SELECT z FROM tris
) GROUP BY v ORDER BY v"""),

    "q_doc_tokens" ->
      """SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_subwords_est
FROM documents ORDER BY doc_id""",

    "q_doc_quality" -> {
      val stopList = TextOps.Stopwords.map(s => s"'$s'").mkString(", ")
      s"""WITH q AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS nchar,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS ntok,
         CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) AS punct,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              t -> t IN ($stopList))) AS DOUBLE) AS stops
  FROM documents)
SELECT doc_id, CAST(nchar AS BIGINT) AS n_chars, CAST(ntok AS BIGINT) AS n_tokens,
       ROUND(punct / nchar, 6) AS punct_ratio,
       ROUND(stops / ntok, 6) AS stopword_ratio,
       ROUND(nchar / ntok, 6) AS mean_token_len
FROM q ORDER BY doc_id"""
    },

    "q_doc_langid" -> {
      def inList(l: Seq[String]) = l.map(s => s"'$s'").mkString(", ")
      val m = TextOps.LangMarkers
      s"""WITH tok AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents
), h AS (
  SELECT doc_id,
    len(list_filter(t, x -> x IN (${inList(m("de"))}))) AS h_de,
    len(list_filter(t, x -> x IN (${inList(m("en"))}))) AS h_en,
    len(list_filter(t, x -> x IN (${inList(m("es"))}))) AS h_es,
    len(list_filter(t, x -> x IN (${inList(m("fr"))}))) AS h_fr
  FROM tok)
SELECT doc_id,
  CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
       WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
       WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
       WHEN h_es >= h_fr THEN 'es'
       ELSE 'fr' END AS lang_guess
FROM h ORDER BY doc_id"""
    },

    "q_doc_dedup" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
       COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
FROM documents GROUP BY 1 ORDER BY fp""",

    "q_ngram_jaccard" ->
      """WITH d AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents WHERE doc_id < 1000
), s AS MATERIALIZED (
  SELECT doc_id,
    list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      ELSE list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')) END) AS sh
  FROM d
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    len(list_intersect(a.sh, b.sh)) / len(list_distinct(list_concat(a.sh, b.sh))) AS j
  FROM s a JOIN s b ON a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(ROUND(j * 1000000) AS BIGINT) AS jaccard_e6
FROM p WHERE j >= 0.1 ORDER BY doc_a, doc_b""",

    "q_ann_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
s AS MATERIALIZED (
  SELECT query_id, neighbor_id, $cosSql AS cos
  FROM q, c WHERE query_id <> neighbor_id
), r AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM s)
SELECT query_id, rank, neighbor_id, CAST(ROUND(cos * 10000) AS BIGINT) AS cos_e4
FROM r WHERE rank <= 5 ORDER BY query_id, rank""",

    "q_embed_neardup" ->
      s"""WITH q AS (SELECT vec_id AS vec_a, embedding AS qe FROM embeddings WHERE vec_id < 1000),
c AS (SELECT vec_id AS vec_b, embedding AS ce FROM embeddings WHERE vec_id < 1000),
s AS (
  SELECT vec_a, vec_b, $cosSql AS cos FROM q, c WHERE vec_a < vec_b)
SELECT vec_a, vec_b, CAST(ROUND(cos * 10000) AS BIGINT) AS cos_e4
FROM s WHERE cos >= 0.35 ORDER BY vec_a, vec_b""",

    // rolling 64-bit fingerprint: portable h64 token values + a wraparound
    // fold (HUGEINT mod 2^64 re-signed to BIGINT = JVM long arithmetic)
    "q_doc_fingerprint" ->
      s"""SELECT doc_id,
  CAST(CASE WHEN r >= 9223372036854775808::HUGEINT THEN r - 18446744073709551616::HUGEINT
            ELSE r END AS BIGINT) AS fp64
FROM (
  SELECT doc_id, list_reduce(
      list_prepend(1125899906842597::HUGEINT,
        list_transform(string_split_regex(trim(text), '\\s+'),
          t -> CAST(${h64Sql("t")} AS HUGEINT))),
      (a, b) -> (a * 31 + b) % 18446744073709551616::HUGEINT) AS r
  FROM documents)
ORDER BY doc_id""",

    "q_minhash_lsh" -> minhashLshSql,

    "q_simhash" ->
      s"""WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t FROM documents
), th AS MATERIALIZED (
  SELECT doc_id, ${h64Sql("t")} AS h FROM tok
), bits AS MATERIALIZED (
  SELECT doc_id, i, SUM(CASE WHEN (h >> CAST(i AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM th CROSS JOIN range(0, 60) r(i) GROUP BY 1, 2
), sh AS MATERIALIZED (
  SELECT doc_id,
    CAST(SUM(CASE WHEN acc > 0 THEN (1::BIGINT << CAST(i AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY 1
), chunked AS MATERIALIZED (
  SELECT doc_id, simhash, c, (simhash >> CAST(c * 15 AS INTEGER)) & 32767 AS key
  FROM sh CROSS JOIN range(0, 4) r(c)
), pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, x.simhash AS ha, y.simhash AS hb
  FROM chunked x JOIN chunked y ON x.c = y.c AND x.key = y.key AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
FROM pairs WHERE bit_count(xor(ha, hb)) <= 3 ORDER BY doc_a, doc_b""",

    "q_ann_lsh_topk" -> annLshTopKSql,
  )

  /** DuckDB twin of [[TextOps.h64]] — applied as `h64Sql(expr)`. */
  private def h64Sql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT)"

  /** MinHash-LSH oracle: identical signature family (same driver-derived
    * (A_i, B_i) constants as [[TextOps.hashFamily]]), banding, bucket cap,
    * and signature-similarity filter as [[TextOps.minhashLshPairs]]. */
  private def minhashLshSql: String = {
    val k = 64; val rowsPerBand = 4; val nBands = k / rowsPerBand
    val fam = TextOps.hashFamily(k)
    val sigEntries = fam.map { case (a, b) =>
      s"list_min(list_transform(th, t -> (t * $a + $b) % ${TextOps.HashP}))"
    }.mkString(",\n      ")
    s"""WITH d AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents
), s AS MATERIALIZED (
  SELECT doc_id,
    list_transform(
      list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        ELSE list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')) END),
      sh -> ${h64Sql("sh")} % ${TextOps.HashP}) AS th
  FROM d
), sigs AS MATERIALIZED (
  SELECT doc_id,
    [ $sigEntries ] AS sig
  FROM s
), banded AS MATERIALIZED (
  SELECT doc_id, sig, b AS band,
         md5(array_to_string(sig[b * $rowsPerBand + 1 : b * $rowsPerBand + $rowsPerBand], ',')) AS bucket
  FROM sigs CROSS JOIN range(0, $nBands) r(b)
), sized AS MATERIALIZED (
  SELECT *, COUNT(*) OVER (PARTITION BY band, bucket) AS bn FROM banded
), cand AS MATERIALIZED (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, x.sig AS sa, y.sig AS sb
  FROM sized x JOIN sized y ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
  WHERE x.bn <= 1000 AND y.bn <= 1000
), sims AS (
  SELECT doc_a, doc_b,
    list_sum(list_transform(range(1, ${k + 1}), i -> CASE WHEN sa[i] = sb[i] THEN 1 ELSE 0 END)) / $k.0 AS sim
  FROM cand)
SELECT doc_a, doc_b, CAST(ROUND(sim * 1000000) AS BIGINT) AS sim_e6
FROM sims WHERE sim >= 0.5 ORDER BY doc_a, doc_b"""
  }

  /** ANN LSH top-k oracle: the hyperplane matrices are the SAME
    * driver-computed constants [[Ann.planeMatrix]] embeds in the Spark
    * plan, emitted here as SQL literals. */
  private def annLshTopKSql: String = {
    val nPlanes = 8; val nTables = 4; val dim = 64
    val planeRows = (for { t <- 0 until nTables; p <- 0 until nPlanes } yield {
      val row = Ann.planeMatrix(nPlanes, t * nPlanes, dim)(p)
      s"($t, $p, [${row.mkString(", ")}])"
    }).mkString(",\n    ")
    s"""WITH planes(t, p, comps) AS (VALUES
    $planeRows
), dots AS (
  SELECT e.vec_id, pl.t, pl.p,
    list_sum(list_transform(range(1, ${dim + 1}), i -> CAST(e.embedding[i] AS DOUBLE) * pl.comps[i])) AS dot
  FROM embeddings e CROSS JOIN planes pl
), b AS MATERIALIZED (
  SELECT vec_id, t,
    SUM(CASE WHEN dot >= 0 THEN (1::BIGINT << CAST(p AS INTEGER)) ELSE 0 END) + (CAST(t AS BIGINT) << 32) AS bucket
  FROM dots GROUP BY 1, 2
), qb AS (SELECT vec_id AS query_id, bucket FROM b WHERE vec_id < 10),
cb AS (SELECT vec_id AS neighbor_id, bucket FROM b),
cand AS MATERIALIZED (
  SELECT DISTINCT query_id, neighbor_id FROM qb JOIN cb USING (bucket) WHERE query_id <> neighbor_id
), s AS MATERIALIZED (
  SELECT c.query_id, c.neighbor_id, $cosSql AS cos
  FROM cand c
  JOIN (SELECT vec_id, embedding AS qe FROM embeddings) q ON q.vec_id = c.query_id
  JOIN (SELECT vec_id, embedding AS ce FROM embeddings) e2 ON e2.vec_id = c.neighbor_id
), r AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM s)
SELECT query_id, rank, neighbor_id, CAST(ROUND(cos * 10000) AS BIGINT) AS cos_e4
FROM r WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  /** Double-precision cosine in DuckDB, summation order identical to the
    * Spark aggregate() fold so the doubles match bitwise. */
  private val cosSql: String =
    """(list_sum(list_transform(range(1, len(qe) + 1), i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)))
   / (sqrt(list_sum(list_transform(range(1, len(qe) + 1), i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))))
      * sqrt(list_sum(list_transform(range(1, len(ce) + 1), i -> CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))))))"""
}
