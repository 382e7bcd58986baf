package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextOps
import graft.operators.{Dedup, Multimodal}

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def staged(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("hs", TextOps.tokenHashes($"text"))
    .withColumn("shs", Dedup.shingleHashes($"hs"))
    .withColumn("mh", Dedup.minhashes($"shs"))

  test("minhash: identical texts share the full signature") {
    val df = staged(Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "The quick brown fox jumps over the lazy dog!")).toDF("id", "text"))
    val sigs = df.select($"mh").collect().map(_.getSeq[Long](0))
    assert(sigs(0) === sigs(1)) // tokenization normalizes case/punct
  }

  test("minhash: unrelated texts differ in at least one slot") {
    val df = staged(Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")).toDF("id", "text"))
    val sigs = df.select($"mh").collect().map(_.getSeq[Long](0))
    assert(sigs(0) !== sigs(1))
  }

  test("minhash: short (<3 tokens) docs get the sentinel signature") {
    val df = staged(Seq((1L, "two words")).toDF("id", "text"))
    val sig = df.select($"mh").head().getSeq[Long](0)
    assert(sig.forall(_ === Dedup.P))
  }

  test("band values: duplicates collide on every band") {
    val df = staged(Seq((1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j")).toDF("id", "text"))
      .withColumn("bands", Dedup.bandValues($"mh"))
    val bands = df.select($"bands").collect().map(_.getSeq[Long](0))
    assert(bands(0) === bands(1))
    assert(bands(0).length === Dedup.NumHashes / Dedup.BandRows)
  }

  test("native kernels bit-agree with HOF oracle formulations on the fixture corpus") {
    // real corpus + adversarial edges: empty, 1/2/3 tokens, punctuation-only
    val edge = Seq((9001L, ""), (9002L, "one"), (9003L, "two words"),
      (9004L, "now three tokens"), (9005L, "!!! ??? ..."),
      (9006L, "a a a a a")).toDF("doc_id", "text")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").unionByName(edge)
      .withColumn("hs", TextOps.tokenHashes($"text"))
    val rows = docs.select(
      Dedup.shingleHashes($"hs").as("sh_nat"),
      Dedup.shingleHashesHof($"hs").as("sh_hof"),
      Dedup.minhashes(Dedup.shingleHashesHof($"hs")).as("mh_nat"),
      Dedup.minhashesHof(Dedup.shingleHashesHof($"hs")).as("mh_hof"),
      Dedup.minhashSignature($"hs").as("mh_fused"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1), "shingle native vs HOF")
      assert(r.getSeq[Long](2) === r.getSeq[Long](3), "minhash native vs HOF")
      assert(r.getSeq[Long](4) === r.getSeq[Long](3), "fused vs staged HOF")
    }
  }

  test("simhash: deterministic, equal for equal token streams, 32-bit range") {
    val df = Seq((1L, "spark catalyst codegen"), (2L, "SPARK catalyst CODEGEN"),
      (3L, "something else entirely here")).toDF("id", "text")
      .withColumn("hs", TextOps.tokenHashes($"text"))
      .withColumn("sh", Dedup.simhash32($"hs"))
    val r = df.select($"sh").collect().map(_.getLong(0))
    assert(r(0) === r(1))
    assert(r(0) !== r(2))
    r.foreach(v => assert(v >= 0L && v < (1L << 32)))
  }

  test("simhash native kernel is bit-identical to the HOF reference on the real corpus") {
    val rows = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("hs", TextOps.tokenHashes($"text"))
      .select(Dedup.simhash32($"hs").as("native"),
        Dedup.simhash32Hof($"hs").as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("substring-span dedup: window counts, cross-doc-only matches, overlap-union coverage") {
    import graft.queries.TextQueries
    // w=4; docs 2 and 3 share a 6-token span (3 fully-contained windows,
    // union covers 6 positions each); doc 5 repeats a window INSIDE one
    // doc (must NOT count — cross-doc means >=2 DISTINCT docs); doc 4 is
    // shorter than w (zero windows, zero coverage, frac 0 of 2 tokens).
    val docs = Seq(
      (1L, "apple banana cherry damson elder fig grape honeydew"),
      (2L, "kiwi lemon shared span tokens run exactly here"),
      (3L, "shared span tokens run exactly here mango nectarine"),
      (4L, "only two"),
      (5L, "rose sage thyme umber rose sage thyme umber")
    ).toDF("doc_id", "text")
    val out = TextQueries.spanDedup(docs, 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(out(1L) === ((8L, 5L, 0L, 0L, 0.0)))
    assert(out(2L) === ((8L, 5L, 3L, 6L, 0.75)))
    assert(out(3L) === ((8L, 5L, 3L, 6L, 0.75)))
    assert(out(4L) === ((2L, 0L, 0L, 0L, 0.0)))
    assert(out(5L) === ((8L, 5L, 0L, 0L, 0.0)))
  }

  test("substring-span incremental face: incoming measured against history only") {
    import graft.queries.TextQueries
    val history = Seq(
      (1L, "kiwi lemon shared span tokens run exactly here")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (2L, "shared span tokens run exactly here mango nectarine"), // 6-token overlap w/ history
      (3L, "totally unrelated words appear in this one friend"),
      // 4 and 5 duplicate each OTHER but nothing in history — the
      // incremental face must NOT count cross-incoming duplication
      (4L, "violet walnut xylem yarrow zinnia acorn basil clove"),
      (5L, "violet walnut xylem yarrow zinnia acorn basil clove")
    ).toDF("doc_id", "text")
    val out = TextQueries.spanDupAgainstIndex(incoming, history, 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(out(2L) === ((8L, 5L, 3L, 6L, 0.75)))
    assert(out(3L) === ((8L, 5L, 0L, 0L, 0.0)))
    assert(out(4L) === ((8L, 5L, 0L, 0L, 0.0)))
    assert(out(5L) === ((8L, 5L, 0L, 0L, 0.0)))
    assert(!out.contains(1L)) // history is the index, not a subject
  }

  test("substring-span dedup: fixture corpus injection yields partial-coverage dups") {
    import graft.queries.TextQueries
    val out = SparkEntry.queries("substring_dedup")(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every injected doc (doc_id % 7 == 0, long enough) carries the
    // boilerplate span and must show duplicated windows but NOT full
    // coverage (the license line is a strict prefix of the doc)
    val injected = rows.filter(r => r.getLong(0) % 7 == 0 && r.getLong(1) >= TextQueries.SpanW)
    assert(injected.nonEmpty)
    injected.foreach { r =>
      assert(r.getLong(3) > 0L, s"doc ${r.getLong(0)} should have dup windows")
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0,
        s"doc ${r.getLong(0)} coverage out of range: ${r.getDouble(5)}")
    }
    // partial coverage is the interesting signal: injected docs whose own
    // text is unique show the boilerplate span but NOT full coverage
    // (fixture whole-doc duplicates legitimately reach 1.0)
    assert(injected.count(r => r.getDouble(5) < 1.0) > injected.length / 2)
    // non-injected docs may still collide on natural 8-grams, but the
    // vast majority must be clean
    val clean = rows.filter(r => r.getLong(0) % 7 != 0)
    assert(clean.count(_.getLong(3) === 0L) > clean.length / 2)
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("withPayload: binary column carries exact UTF-8 bytes") {
    val df = Multimodal.withPayload(Seq((7L, "héllo")).toDF("doc_id", "text"))
    val row = df.head()
    assert(row.getAs[Array[Byte]]("payload") === "héllo".getBytes("UTF-8"))
  }

  test("decodePartitions: parses real PNG/BMP headers from synthesized payloads") {
    val docs = Seq((1L, 40L), (2L, 17L), (3L, 8L), (4L, 29L))
      .toDF("doc_id", "n_chars")
    val out = Multimodal.decodePartitions(Multimodal.synthesizeMedia(docs))
      .collect().sortBy(_.doc_id)
    assert(out.map(_.fmt).toSeq === Seq("png", "bmp", "png", "bmp"))
    // dims round-trip the arithmetic derivation through real encoded bytes
    assert(out(0).width === 2 && out(0).height === (1 + 40 % 29))
    assert(out(0).channels === 1) // id%4==1 → grayscale PNG
    assert(out(2).channels === 4) // id%4==3 → RGBA PNG
    assert(out(1).channels === 3 && out(3).channels === 3) // 24bpp BMP
    // determinism: same input → same output
    val again = Multimodal.decodePartitions(Multimodal.synthesizeMedia(docs))
      .collect().sortBy(_.doc_id)
    assert(out === again)
  }
}

class MediaCodecSpec extends AnyFunSuite {
  import graft.operators.MediaCodec

  test("encode→decode roundtrips dims and channels for every color type") {
    for (w <- Seq(1, 3, 31); h <- Seq(1, 7, 29)) {
      assert(MediaCodec.decode(MediaCodec.encodeBmp(w, h)) ===
        MediaCodec.Decoded("bmp", w, h, 3))
      for ((ct, ch) <- Seq(0 -> 1, 2 -> 3, 4 -> 2, 6 -> 4))
        assert(MediaCodec.decode(MediaCodec.encodePng(w, h, ct)) ===
          MediaCodec.Decoded("png", w, h, ch))
    }
  }

  test("payloads are standards-valid: the JDK's own ImageIO decodes them") {
    import javax.imageio.ImageIO
    import java.io.ByteArrayInputStream
    val png = ImageIO.read(new ByteArrayInputStream(MediaCodec.encodePng(13, 9, 2)))
    assert(png != null && png.getWidth === 13 && png.getHeight === 9)
    val bmp = ImageIO.read(new ByteArrayInputStream(MediaCodec.encodeBmp(5, 11)))
    assert(bmp != null && bmp.getWidth === 5 && bmp.getHeight === 11)
  }

  test("unknown container is rejected, not guessed") {
    intercept[IllegalArgumentException](MediaCodec.decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      MediaCodec.decode("plain text bytes, long enough to pass any length gate ......".getBytes))
  }

  test("WAV encode→decode roundtrips rate/channels/frames; javax.sound reads it") {
    for (rate <- Seq(8000, 16000); ch <- Seq(1, 2); frames <- Seq(0, 1, 123)) {
      val d = MediaCodec.decodeWav(MediaCodec.encodeWav(rate, ch, frames))
      assert(d === MediaCodec.DecodedWav(rate, ch, 16, frames))
    }
    // standards-valid: the JDK's own audio stack parses the container
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(MediaCodec.encodeWav(12000, 2, 77)))
    assert(ais.getFormat.getSampleRate === 12000f)
    assert(ais.getFormat.getChannels === 2)
    assert(ais.getFrameLength === 77L)
    intercept[IllegalArgumentException](MediaCodec.decodeWav(new Array[Byte](44)))
  }
}

class AnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("ann_ivf returns k rows, all from a single probed cell") {
    val out = SparkEntry.queries("ann_ivf")(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 5)
    assert(out.map(_.getAs[Int]("label")).distinct.length === 1)
    val sims = out.map(_.getAs[Double]("sim"))
    assert(sims.sameElements(sims.sortBy(-_)))
  }

  test("ann_ivf recall vs exact knn: probed-cell hits are a subset of corpus") {
    val exact = SparkEntry.queries("knn_topk")(spark, "/root/testdata/sf0.001")
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val approx = SparkEntry.queries("ann_ivf")(spark, "/root/testdata/sf0.001")
      .collect().map(_.getAs[Long]("vec_id")).toSet
    // approximate: overlap possible but not required; both non-empty
    assert(exact.nonEmpty && approx.nonEmpty)
  }
}
