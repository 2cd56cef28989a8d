package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication operators for large-scale training-data
  * pipelines over the `documents` table (doc_id, text, lang, source,
  * n_chars). All operators are pure column expressions or tightly-scoped
  * UDFs over pre-tokenized arrays; everything is deterministic.
  *
  * Scale notes: exact dedup and fingerprinting are single hash-aggregates;
  * MinHash-LSH is the scale path for near-dup (candidates via band-bucket
  * join — linear in docs, no n² pair enumeration); the brute-force n-gram
  * Jaccard exists as the small-scale oracle-checked reference.
  */
object TextOps {

  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "by", "at", "this", "that")

  /** Language marker words for the n-gram/stopword language-ID heuristic
    * (deliberately tiny — the operator shape is what matters; swap lists
    * for real ones in production). */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "nicht"),
    "es" -> Seq("el", "la", "los", "que", "es", "con", "para"),
    "fr" -> Seq("le", "la", "les", "et", "est", "avec", "pour"))

  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** First 60 bits of md5 as a non-negative long — the engine's portable
    * string hash: DuckDB replays it verbatim as
    * `CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)`, so every operator
    * built on it is exactly oracle-checkable (unlike xxhash64 / JVM
    * hashCode, which no other engine reproduces). */
  def h64(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** JVM twin of [[h64]] for driver-side constant derivation. */
  def h64jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Mersenne prime 2^31-1: the universal-hash modulus. Products of two
    * sub-P values stay < 2^62, so the arithmetic is exact (and ANSI-safe)
    * in both Spark and DuckDB BIGINTs. */
  val HashP = 2147483647L

  /** k-member universal hash family over [[HashP]]: h_i(t) = (A_i·t + B_i)
    * mod P with constants derived from [[h64jvm]] — one md5 per input
    * value, k cheap codegen'd multiply-mods (the Kirsch-Mitzenmacher-style
    * alternative to k independent md5 evaluations). */
  def hashFamily(k: Int): IndexedSeq[(Long, Long)] =
    (0 until k).map(i =>
      ((h64jvm(s"graft-mh-a-$i") % (HashP - 1)) + 1, h64jvm(s"graft-mh-b-$i") % HashP))

  /** (doc_id, n_tokens) — whitespace tokenization plus a BPE-ish subword
    * estimate (tokens ≈ ceil(chars/4), the common budget heuristic). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      ceil(length(col("text")) / 4.0).cast("long").as("n_subwords_est"))

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean
    * token length — the standard cheap text-quality features. */
  def qualityScores(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val nChar = length(col("text")).cast("double")
    val puncts = length(regexp_replace(col("text"), "[^.,!?;:]", "")).cast("double")
    val stops = size(filter(toks, t => t.isin(Stopwords: _*))).cast("double")
    docs.select(
      col("doc_id"),
      nChar.cast("long").as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      round(puncts / nChar, 6).as("punct_ratio"),
      round(stops / nTok, 6).as("stopword_ratio"),
      round(nChar / nTok, 6).as("mean_token_len"))
  }

  /** Stopword-marker language ID: argmax of per-language marker-token hits,
    * smallest language code on ties, 'und' when no marker hits. */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(lower(col("text")))
    val scored = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(size(filter(toks, t => t.isin(markers: _*))).as("hits"), lit(lang).as("lang"))
    }
    docs.select(
      col("doc_id"),
      when(greatest(scored.map(_.getField("hits")): _*) === 0, lit("und"))
        .otherwise(
          // argmax by hits, tie-break smallest lang code: sort (hits desc,
          // lang asc) via array_max over (hits, negated-lang) is messy —
          // use a fold over the sorted-by-lang list keeping strict max
          scored.reduceLeft((a, b) =>
            when(b.getField("hits") > a.getField("hits"), b).otherwise(a))
            .getField("lang"))
        .as("lang_guess"))
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text —
    * the exact-dedup key (portable across engines). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Exact duplicate groups: (fp, n_docs, keep_id = min doc_id). */
  def exactDupGroups(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"))

  /** Rolling polynomial 64-bit hash over md5-derived token values
    * (document fingerprinting with wraparound arithmetic). Token hashing
    * is the portable [[h64]] column expression; only the sequential
    * wraparound fold is a (tiny) UDF — DuckDB replays it with
    * `list_reduce` in HUGEINT mod-2^64 arithmetic. */
  val rollingHash: Column => Column = {
    val fold = udf { hs: Seq[Long] =>
      var h = 1125899906842597L
      hs.foreach { t => h = h * 31L + t }
      h
    }
    (text: Column) => fold(transform(tokens(text), t => h64(t)))
  }

  /** Word n-gram shingles (default 3-grams; falls back to the whole token
    * list when the doc is shorter than n). */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(lower(text))
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Exact n-gram Jaccard near-duplicate pairs (brute force over a<b —
    * the small-scale reference; MinHash-LSH below is the scale path). */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(col("doc_id"), array_distinct(shingles(col("text"), n)).as("sh"))
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("shb"))
    a.join(b, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard") * 1e6).cast("long").as("jaccard_e6"))
  }

  /** MinHash signatures: one portable md5 per shingle ([[h64]] mod P),
    * then k universal-hash derivations ([[hashFamily]]); signature(i) =
    * min over shingles. Exactly replayable in DuckDB SQL, and cheaper
    * than k independent full hashes (k multiply-mods per shingle instead
    * of k string hashes).
    *
    * r6: computed in ONE JVM pass per document (tokenize → shingle →
    * md5 → k mins, [[minhashSigUdf]]) instead of the former column
    * pipeline, which materialized the token array, the shingle-string
    * array, the distinct copy, the 60-bit-hash array, and then k
    * transformed arrays + array_min per document — and whose per-shingle
    * h64 went md5 → hex string → substring → conv(16,10) → cast. The
    * guide's §4 trade (row-boundary cost vs per-row allocation storm)
    * favors the fused pass here; values are bit-identical (same md5
    * bytes, same Long arithmetic — BenchExtra A/B + PipelineSpec +
    * q_minhash_lsh oracle). */
  def minhashSignatures(docs: DataFrame, k: Int = 64, n: Int = 3): DataFrame =
    docs.select(col("doc_id"), minhashSigUdf(k, n)(col("text")).as("sig"))

  /** Spark-semantics lower (ASCII fast path, else JVM toLowerCase) —
    * must match UTF8String.toLowerCase exactly. */
  private def sparkLower(s: String): String = {
    var ascii = true
    var i = 0
    while (i < s.length && ascii) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (!ascii) s.toLowerCase
    else {
      val arr = s.toCharArray
      var j = 0
      while (j < arr.length) {
        val c = arr(j)
        if (c >= 'A' && c <= 'Z') arr(j) = (c + 32).toChar
        j += 1
      }
      new String(arr)
    }
  }

  /** Spark-semantics trim: leading/trailing SPACE (0x20) only — JVM
    * String.trim strips all control chars and would disagree. */
  private def sparkTrim(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e)
  }

  private val wsPattern = java.util.regex.Pattern.compile("\\s+")

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** One-pass signature kernel: text → Spark-equivalent lower/trim/split →
    * word n-gram shingles (whole-token-list fallback below n, exactly
    * [[shingles]]) → per distinct shingle the 60-bit md5 prefix mod
    * [[HashP]] → running min of (a_i·t + b_i) mod P for each family
    * member. Every step mirrors the column pipeline bit-for-bit: the
    * 60-bit prefix is (first 8 md5 bytes big-endian) >>> 4 — the numeric
    * value of the first 15 hex digits — and all arithmetic is the same
    * non-negative Long math ANSI pmod performs. */
  def minhashSigUdf(k: Int, n: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val famA = hashFamily(k).map(_._1).toArray
    val famB = hashFamily(k).map(_._2).toArray
    udf { (text: String) =>
      if (text == null) null
      else {
        val toks = wsPattern.split(sparkTrim(sparkLower(text)), -1)
        val shingleSet = new java.util.HashSet[String]()
        if (toks.length < n) shingleSet.add(toks.mkString(" "))
        else {
          val sb = new java.lang.StringBuilder()
          var i = 0
          while (i <= toks.length - n) {
            sb.setLength(0)
            var j = 0
            while (j < n) {
              if (j > 0) sb.append(' ')
              sb.append(toks(i + j))
              j += 1
            }
            shingleSet.add(sb.toString)
            i += 1
          }
        }
        val mins = new Array[Long](k)
        java.util.Arrays.fill(mins, Long.MaxValue)
        val md = md5Local.get()
        val it = shingleSet.iterator()
        while (it.hasNext) {
          val s = it.next()
          md.reset()
          val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // first 15 hex digits = first 60 bits, as a non-negative long
          val h = java.nio.ByteBuffer.wrap(d, 0, 8).getLong >>> 4
          val t = h % HashP
          var f = 0
          while (f < k) {
            val v = (t * famA(f) + famB(f)) % HashP
            if (v < mins(f)) mins(f) = v
            f += 1
          }
        }
        mins
      }
    }
  }

  /** MinHash-LSH near-dup candidates: band the signature (bands of
    * `rowsPerBand`), bucket-join on (band, bandHash), then verify with the
    * exact signature similarity. Linear in corpus size (the scale path:
    * candidates come from bucket groups, never from an n² cross join);
    * hot buckets are bounded by `maxBucket` (drop-with-log semantics).
    * @return (doc_a, doc_b, sim_e6) with estimated Jaccard >= threshold */
  def minhashLshPairs(
      docs: DataFrame, k: Int = 64, rowsPerBand: Int = 4,
      n: Int = 3, threshold: Double = 0.5, maxBucket: Int = 1000): DataFrame = {
    graft.engine.Metrics.ensure(docs.sparkSession)
    val nBands = k / rowsPerBand
    val sigs = minhashSignatures(docs, k, n)
    val banded = sigs.select(col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(nBands - 1)),
          b => md5(array_join(transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
            x => x.cast("string")), ","))))
          .as(Seq("band", "bucket")))
    // ONE shuffle (group by band bucket) replaces the former self-join of a
    // windowed view (two shuffles + double signature computation); the
    // per-bucket pair expansion is bounded by maxBucket, and overflowing
    // buckets are dropped WITH a count (no-silent-caps: observe metric)
    val grouped = banded
      .groupBy("band", "bucket")
      .agg(count(lit(1)).as("bn"),
        collect_list(struct(col("doc_id"), col("sig"))).as("members"))
      .observe("graft_lsh_bucket_cap",
        sum(when(col("bn") > maxBucket, col("bn")).otherwise(0L)).as("dropped_member_rows"),
        sum(when(col("bn") > maxBucket, 1L).otherwise(0L)).as("dropped_buckets"))
      .filter(col("bn") <= maxBucket && col("bn") >= 2)
    val cand = grouped
      .select(explode(flatten(transform(col("members"), a =>
        transform(filter(col("members"), b => b.getField("doc_id") > a.getField("doc_id")),
          b => struct(a.getField("doc_id").as("doc_a"), b.getField("doc_id").as("doc_b"),
            a.getField("sig").as("siga"), b.getField("sig").as("sigb")))))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.siga"), col("p.sigb"))
      .distinct()
    cand
      .select(col("doc_a"), col("doc_b"),
        (aggregate(zip_with(col("siga"), col("sigb"),
          (a, b) => when(a === b, 1).otherwise(0)), lit(0), (acc, x) => acc + x)
          .cast("double") / k).as("sim"))
      .filter(col("sim") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("sim") * 1e6).cast("long").as("sim_e6"))
  }

  /** 60-bit SimHash over tokens: sign-sum of per-token [[h64]] bits.
    * Token hashing is the portable md5 column expression; the per-bit
    * accumulation fold is a tiny UDF that DuckDB replays relationally
    * (unnest tokens × 60 bits, SUM of ±1, re-assemble). 60 bits (not 64)
    * so one md5 prefix yields the whole hash in both engines. */
  def simhash(docs: DataFrame): DataFrame = {
    val fold = udf { hs: Seq[Long] =>
      val acc = new Array[Int](60)
      hs.foreach { z =>
        var i = 0
        while (i < 60) { if (((z >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1; i += 1 }
      }
      var h = 0L
      var i = 0
      while (i < 60) { if (acc(i) > 0) h |= (1L << i); i += 1 }
      h
    }
    docs.select(col("doc_id"),
      fold(transform(tokens(lower(col("text"))), t => h64(t))).as("simhash"))
  }

  /** SimHash near-dup pairs: hamming distance <= maxDist. Blocked by
    * 15-bit chunks (a pair within distance d<=3 must agree on at least one
    * of 4 chunks — pigeonhole), so the join is bucket-local, not n². */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "chunk blocking assumes maxDist <= 3 (4 chunks)")
    val hs = simhash(docs)
    val chunked = hs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("simhash"), i * 15).bitwiseAND(lit(0x7FFFL))): _*))
        .as(Seq("chunk", "key")))
    val pairs = chunked.as("x").join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.simhash").as("ha"), col("y.simhash").as("hb"))
      .distinct()
    pairs
      .withColumn("dist", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("dist").cast("int").as("hamming"))
  }
}
