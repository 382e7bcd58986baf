package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextOps, VectorOps}

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame): Double = df.head().getDouble(0)

  test("tokens: lowercase, split on non-alphanumerics, drop empties") {
    val df = Seq(Tuple1("Hello, World!  foo_bar 42")).toDF("t")
    val toks = df.select(TextOps.tokens($"t")).head().getSeq[String](0)
    assert(toks === Seq("hello", "world", "foo", "bar", "42"))
  }

  test("hashEmbed: unit L2 norm for non-empty text, zero vector for token-free text") {
    val df = Seq(Tuple1("some sample text here")).toDF("t")
    val n = one(df.select(VectorOps.norm(TextOps.hashEmbed($"t"))))
    assert(math.abs(n - 1.0) < 1e-12)
    val empty = Seq(Tuple1("!!! ... ???")).toDF("t")
    val n0 = one(empty.select(VectorOps.norm(TextOps.hashEmbed($"t"))))
    assert(n0 === 0.0)
  }

  test("hashEmbed: deterministic and prefix-sensitive (query vs passage)") {
    val df = Seq(Tuple1("the quick brown fox")).toDF("t")
    val sim = one(df.select(VectorOps.cosine(
      TextOps.hashEmbed(TextOps.queryText($"t")),
      TextOps.hashEmbed(TextOps.passageText($"t")))))
    assert(sim < 1.0 - 1e-9)  // prefixes must change the embedding
    val selfSim = one(df.select(VectorOps.cosine(
      TextOps.hashEmbed(TextOps.queryText($"t")),
      TextOps.hashEmbed(TextOps.queryText($"t")))))
    assert(math.abs(selfSim - 1.0) < 1e-9)
  }

  test("hashEmbed: 512-token truncation makes long tails irrelevant") {
    val base = (1 to 512).map(i => s"tok$i").mkString(" ")
    val df = Seq((base, base + " extra words beyond the limit")).toDF("a", "b")
    val sim = one(df.select(VectorOps.cosine(
      TextOps.hashEmbed($"a"), TextOps.hashEmbed($"b"))))
    assert(math.abs(sim - 1.0) < 1e-12)
  }

  test("tokenHash: stable rolling hash, distinct for distinct tokens") {
    val df = Seq(Tuple1("abc abc xyz")).toDF("t")
    val hashes = df.select(TextOps.tokenHashes($"t")).head().getSeq[Long](0)
    assert(hashes(0) === hashes(1))
    assert(hashes(0) !== hashes(2))
    // hand-computed: hash("abc") = ((0*31+97)*31+98)*31+99 = 96354
    assert(hashes(0) === (('a'.toInt * 31 + 'b'.toInt) * 31 + 'c'.toInt).toLong)
  }

  test("fingerprint: equal token streams collide, different streams do not") {
    val df = Seq(("Foo  BAR", "foo bar", "foo baz")).toDF("a", "b", "c")
    val r = df.select(TextOps.fingerprint($"a"), TextOps.fingerprint($"b"),
      TextOps.fingerprint($"c")).head()
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getLong(0) !== r.getLong(2))
  }

  test("charShingles: sliding character n-grams over normalized text") {
    val df = Seq(Tuple1("ab cd")).toDF("t")
    val sh = df.select(TextOps.charShingles($"t", 3)).head().getSeq[String](0)
    assert(sh === Seq("ab ", "b c", " cd"))
    val short = Seq(Tuple1("ab")).toDF("t")
    assert(short.select(TextOps.charShingles($"t", 3)).head().getSeq[String](0).isEmpty)
  }

  test("quality metrics: ratios bounded in [0,1]") {
    val df = Seq(Tuple1("The 42 quick foxes and the lazy dog!")).toDF("t")
    val r = df.select(
      TextOps.digitRatio($"t"), TextOps.stopwordRatio($"t"), TextOps.qualityScore($"t")).head()
    (0 to 2).foreach { i => assert(r.getDouble(i) >= 0.0 && r.getDouble(i) <= 1.0) }
  }
}
