package graft

import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.multimodal.MultiModal
import graft.text.TextOps

/** Training-data pipeline ops: dedup (exact/MinHash/SimHash/Jaccard),
  * ANN, text analysis, multimodal plumbing. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  /** Corpus with planted near-duplicates: base docs + perturbed copies. */
  lazy val corpus = {
    val rnd = new scala.util.Random(31)
    val vocab = Vector("spark", "scan", "join", "filter", "group", "sort",
      "merge", "hash", "row", "column", "table", "query", "data", "fast")
    val base = (0 until 60).map { i =>
      (i.toLong, Seq.fill(30 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dups = (0 until 20).map { i =>
      val (srcId, text) = base(i)
      val toks = text.split(" ").toSeq
      // perturb: replace one token with a guaranteed-different one
      val pos = rnd.nextInt(toks.size)
      val repl = vocab((vocab.indexOf(toks(pos)) + 1) % vocab.size)
      (100L + srcId, toks.updated(pos, repl).mkString(" "))
    }
    val exact = Seq((200L, base(0)._2), (201L, "  " + base(1)._2.toUpperCase + "  "))
    (base ++ dups ++ exact).toDF("doc_id", "text").cache()
  }

  test("exact dedup: normalized-text groups found, keep_id = min doc_id") {
    val groups = TextOps.exactDupGroups(corpus).filter(col("n_docs") > 1).collect()
    val byKeep = groups.map(r => r.getLong(2) -> r.getLong(1)).toMap
    assert(byKeep === Map(0L -> 2L, 1L -> 2L)) // doc 200 dups 0; doc 201 dups 1 (case/space-insensitive)
  }

  test("n-gram jaccard brute force finds the planted near-dups") {
    val pairs = TextOps.ngramJaccardPairs(corpus, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted perturbed copy pairs with its source at >= 0.5
    val expected = (0 until 20).map(i => (i.toLong, 100L + i)).toSet
    assert(expected.subsetOf(pairs), s"missing ${expected -- pairs}")
  }

  test("minhash-LSH: precision exact vs signature sim, recall vs brute force") {
    val got = TextOps.minhashLshPairs(corpus, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = TextOps.ngramJaccardPairs(corpus, n = 3, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // high-similarity truth pairs must be recalled (j>=0.7 with 8x8 bands
    // has collision prob >= 1-(1-0.7^8)^8 ~ 0.38 per band config; planted
    // dups are ~0.85+ so expect near-total recall)
    val recall = (truth & got).size.toDouble / math.max(1, truth.size)
    assert(recall >= 0.9, s"recall=$recall truth=${truth.size} got=${got.size}")
  }

  test("simhash: near-identical docs within hamming 3, blocking loses nothing <=3") {
    val pairs = TextOps.simhashPairs(corpus, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact dups (after normalization docs 200/201 differ in case only pre-
    // lowering) must collide at distance 0
    assert(pairs.contains((0L, 200L)), s"pairs=$pairs")
    // cross-check vs brute-force hamming on the full corpus
    val hs = TextOps.simhash(corpus).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- hs.keys; b <- hs.keys if a < b
      if java.lang.Long.bitCount(hs(a) ^ hs(b)) <= 3
    } yield (a, b)).toSet
    assert(pairs === brute)
  }

  test("rolling-hash fingerprint: stable, token-sensitive") {
    val fps = corpus.select(col("doc_id"), TextOps.rollingHash(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(0L) === fps(200L)) // identical token stream
    assert(fps(0L) !== fps(100L)) // one token differs
  }

  test("langId picks the marker-dominant language with deterministic ties") {
    val docs = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "el perro es la casa con los gatos"),
      (4L, "xyzzy plugh qwerty"),
      (5L, "the und")).toDF("doc_id", "text") // tie en=1,de=1 -> de (smallest code)
    val got = TextOps.langId(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "und", 5L -> "de"))
  }

  test("ANN brute-force top-k matches driver-side exact cosine ranking") {
    val rnd = new scala.util.Random(17)
    val vecs = (0 until 80).map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding").cache()
    val got = Ann.bruteForceTopK(df, df.filter(col("vec_id") < 3), k = 4)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) * math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    for (q <- 0L until 3L) {
      val exp = vecs.filter(_._1 != q)
        .map { case (id, v) => (id, cos(vecs(q.toInt)._2, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(4).map(_._1)
      val gotIds = (1 to 4).map(r => got((q, r)))
      assert(gotIds === exp, s"query $q")
    }
  }

  test("LSH top-k: all returned neighbours correct-by-construction, decent recall on clustered data") {
    // clustered vectors so LSH recall is meaningful
    val rnd = new scala.util.Random(29)
    val centers = Array.fill(5)(Array.fill(16)(rnd.nextGaussian()))
    val vecs = (0 until 100).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding").cache()
    val queries = df.filter(col("vec_id") < 5)
    val exact = Ann.bruteForceTopK(df, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Ann.lshTopK(df, queries, k = 5, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("LSH bucket fails loudly on an embedding whose length != dim") {
    // pre-fix behaviour: zip_with null-padded, every sign bit read 0, all
    // vectors landed in ONE bucket per table and LSH went quadratic
    val df = Seq((1L, Array.fill(16)(0.5f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Ann.lshTopK(df, df, k = 1, dim = 64).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("embedding length")))
  }

  test("multimodal: image/audio kinds are REAL PNG/WAV decoded by the JDK; stub only for video") {
    val assets = MultiModal.syntheticAssets(corpus)
    val images = assets.filter(_.kind == "image").collect()
    assert(images.nonEmpty)
    images.foreach { a =>
      // the bytes are a valid PNG: the real JDK decoder reproduces the
      // deterministic generator's dimensions and pixels
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.bytes))
      assert(img != null, s"asset ${a.asset_id}: ImageIO could not decode")
      assert(img.getWidth === a.width && img.getHeight === a.height)
      assert(a.bytes.length.toLong ===
        graft.multimodal.Png.expectedLength(a.width, a.height))
      val r = img.getRaster
      for (i <- 0 until math.min(10, a.width * a.height)) {
        val expected = (graft.text.TextOps.h64jvm(s"${a.asset_id}:px:$i") % 256).toInt
        assert(r.getSample(i % a.width, i / a.width, 0) === expected)
      }
    }
    val audios = assets.filter(_.kind == "audio").collect()
    assert(audios.nonEmpty)
    audios.foreach { a =>
      // the bytes are a valid WAV: the real JDK decoder reproduces the
      // deterministic generator's sample stream
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(a.bytes))
      val n = in.getFrameLength.toInt
      val expectedN =
        64 + (graft.text.TextOps.h64jvm(s"${a.asset_id}:ns") % 192).toInt
      assert(n === expectedN)
      assert(a.bytes.length.toLong === graft.multimodal.Wav.expectedLength(n))
      assert(a.duration_ms === n * 1000L / 8000)
      val data = in.readAllBytes()
      for (i <- 0 until math.min(10, n)) {
        val s = ((data(2 * i) & 0xFF) | (data(2 * i + 1) << 8)).toShort
        val expected =
          ((graft.text.TextOps.h64jvm(s"${a.asset_id}:smp:$i") % 65536) - 32768).toShort
        assert(s === expected, s"asset ${a.asset_id} sample $i")
      }
    }
    val feats = MultiModal.extractFeatures(assets, dim = 16).collect()
    assert(feats.length === corpus.count())
    assert(feats.forall(_.features.length == 16))
    // decode is a normalized histogram: sums to ~1
    assert(feats.forall(f => math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-3))
    // image features count PIXELS (n_units = w*h), not encoded bytes
    val fById = feats.map(f => f.asset_id -> f).toMap
    images.foreach { a =>
      assert(fById(a.asset_id).n_units === a.width.toLong * a.height)
      assert(fById(a.asset_id).n_bytes === a.bytes.length.toLong)
    }
    // audio features count decoded SAMPLES (n_units = frames), not bytes
    audios.foreach { a =>
      assert(fById(a.asset_id).n_units === (a.bytes.length - 44L) / 2)
      assert(fById(a.asset_id).n_bytes === a.bytes.length.toLong)
    }
    // deterministic across runs
    val feats2 = MultiModal.extractFeatures(assets, dim = 16).collect()
    assert(feats.sortBy(_.asset_id).zip(feats2.sortBy(_.asset_id))
      .forall { case (a, b) => a.features.sameElements(b.features) })
    // frames: only video assets, contiguous frame_idx, stride offsets
    val frames = MultiModal.sampleFrames(assets, stride = 64, frameLen = 16).collect()
    val kinds = assets.collect().map(a => a.asset_id -> a.kind).toMap
    assert(frames.forall(f => kinds(f.asset_id) == "video"))
    frames.groupBy(_.asset_id).foreach { case (_, fs) =>
      val sorted = fs.sortBy(_.frame_idx)
      assert(sorted.map(_.frame_idx).sameElements(sorted.indices))
      assert(sorted.forall(f => f.offset == f.frame_idx * 64L))
    }
  }
}
